package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Dedup / similarity / text operators over crafted micro-fixtures. */
class ExtensionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup of 0
    (3L, "completely different content about spark engines and parquet files")
  ).toDF("doc_id", "text")

  test("dedup exact: identical bodies collapse to one keeper") {
    val out = Dedup.exact(docs).select("keep_id", "dup_count")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("shingles: w-grams of tokens, distinct, short-doc fallback") {
    val out = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq("a b")) // shorter than w -> whole text
  }

  test("minhash LSH: exact dup pair found with jaccard 1.0; near dup scored") {
    val pairs = Dedup.minhashLshPairs(docs, threshold = 0.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((0L, 1L)) == 1.0)
    // identical minhash signatures guarantee the 0-1 candidate; 0-2 may or
    // may not collide in a band, but if present must score below 1
    pairs.get((0L, 2L)).foreach(j => assert(j > 0 && j < 1))
  }

  test("fuzzy contamination: near-duplicate of a benchmark doc flagged, " +
      "unrelated corpus docs pass") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // ~bench 100
      (2L, "completely unrelated corpus content about parquet files")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "some benchmark question nobody copied")
    ).toDF("doc_id", "text")
    val out = Dedup.fuzzyContamination(corpus, bench, threshold = 0.5)
      .select("doc_id", "n_bench_matches")
      .as[(Long, Long)].collect().toMap
    assert(out.contains(1L) && out(1L) >= 1L)
    assert(!out.contains(2L))
  }

  test("incremental LSH: new-batch pairs only, old×old settled pairs " +
      "excluded, scores equal the full run") {
    val full = Dedup.minhashLshPairs(docs, threshold = 0.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // batch split: docs 0,1 are the indexed corpus; 2,3 arrive new
    val out = Dedup.incrementalLshCandidates(
        docs.where($"doc_id" < 2), docs.where($"doc_id" >= 2),
        threshold = 0.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // the settled old×old dup pair must NOT be re-emitted
    assert(!out.contains((0L, 1L)))
    // every emitted pair touches the new batch and matches the full score
    out.foreach { case ((a, b), j) =>
      assert(b >= 2L)
      assert(full((a, b)) === j)
    }
  }

  test("substring spans: verbatim block shared by dissimilar docs found; " +
      "tail fragments don't count") {
    val boiler = "this exact license header block is repeated verbatim!"
    val spans = Seq(
      (0L, boiler + " unique tail alpha beta gamma delta epsilon"),
      (1L, boiler + " other ending entirely zeta eta theta iota"),
      (2L, "nothing in common with the others at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpanPairs(spans, width = 20, stride = 10,
        minShared = 2L)
      .as[(Long, Long, Long)].collect()
    // docs 0,1 share the boilerplate windows; doc 2 pairs with nobody
    assert(out.length === 1 && out.head._1 === 0L && out.head._2 === 1L)
    assert(out.head._3 >= 2L)
  }

  test("ensemble: evidence counts union lexical and semantic signals") {
    val embs = Seq(
      (0L, Array.fill(64)(1.0f)),
      (1L, Array.fill(64)(1.0f)), // semantic dup of 0
      (2L, Array.tabulate(64)(d => if (d % 2 == 0) 1.0f else -1.0f)),
      (3L, Array.tabulate(64)(d => if (d % 3 == 0) -1.0f else 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.ensembleNearDup(docs, embs)
      .select("id_a", "id_b", "n_signals")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // 0-1 is an exact text dup AND an identical embedding: 2 signals
    assert(out((0L, 1L)) === 2)
    assert(out.values.forall(n => n === 1 || n === 2))
  }

  test("ngram jaccard: dup pair 1.0; near pair in (0,1); disjoint absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.0)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.3 &&
      pairs((0L, 2L)) < 1.0)
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs share signatures; hamming 0 pair found") {
    val sigs = Dedup.simhashSignatures(docs)
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((0L, 1L)) == 0)
  }

  test("ngram jaccard df-cap: hot stopword shingle can't explode pairs") {
    // every doc ends with the same 4 tokens → two shingles with df = n
    // (the 100 TB hot-key failure mode); only docs 1 and 2 are real dups
    val hotDocs = (0L until 6L).map { i =>
      val body = if (i == 2L) "unique one1 two1 three1" // dup of doc 1
                 else s"unique one$i two$i three$i"
      (i, s"$body the end of days")
    }.toDF("doc_id", "text")

    // uncapped at threshold 0: every pair appears (all share the hot
    // shingles), the O(n²) blowup in miniature
    val uncapped = Dedup.ngramJaccardPairs(hotDocs, threshold = 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15, s"6 docs all pair up, got $uncapped")

    // df-capped: hot shingles (df=6 > 2) are out of candidate
    // generation, so only the true dup pair survives — and its jaccard
    // is still computed on the FULL shingle set (1.0, hot included)
    val capped = Dedup.ngramJaccardPairs(hotDocs, threshold = 0.0,
      maxShingleDf = Some(2L))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(capped.keySet == Set((1L, 2L)), s"got ${capped.keySet}")
    assert(capped((1L, 2L)) == 1.0,
      "verify must use full shingle sets, not the capped index")
  }

  test("prefix-filter jaccard: identical output to the full inverted " +
      "index at every threshold") {
    // mixed corpus: exact dups, near dups, subsets, disjoint docs, and a
    // hot shingle shared by all — the prefix index must still find every
    // pair the brute-force index finds
    val corpus = (Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta common tail"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta common tail"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota common tail"),
      (3L, "one two three four five six seven eight common tail"),
      (4L, "one two three four five six seven nine common tail"),
      (5L, "totally different content entirely here common tail")
    )).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val brute = Dedup.ngramJaccardPairs(corpus, w = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.prefixJaccardPairs(corpus, w = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref == brute, s"threshold $t: prefix filter lost/added pairs")
    }
  }

  test("containment: small doc inside big doc scores ~1 where jaccard " +
      "stays near 0") {
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 120).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, small),
      (1L, s"$small $filler"), // contains doc 0 verbatim + much more
      (2L, "totally unrelated words only here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, w = 3, threshold = 0.9)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
    val (_, _, _, ca, cb) = pairs.head
    assert(ca === 1.0, "every shingle of the small doc is in the big one")
    assert(cb < 0.1, "the big doc is NOT contained in the small one")
    // symmetric jaccard misses this pair entirely at the same bar
    val jac = Dedup.ngramJaccardPairs(docs, w = 3, threshold = 0.9)
      .collect()
    assert(jac.isEmpty)
  }

  test("chunkDocuments: stride windows cover the text, last chunk short, " +
      "short docs yield one chunk") {
    val docs = Seq(
      (0L, "a" * 553), // 1 + ceil(353/150) = 4 chunks
      (1L, "b" * 200), // exactly one chunk
      (2L, "c" * 48)   // short doc → single short chunk
    ).toDF("doc_id", "text")
    val out = PipelineOps.chunkDocuments(docs, 200, 150)
      .select("doc_id", "chunk_idx", "n_chars")
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set(
      (0L, 0L, 200), (0L, 1L, 200), (0L, 2L, 200), (0L, 3L, 103),
      (1L, 0L, 200), (2L, 0L, 48)))
    // overlap property: consecutive chunks share chunk-stride chars
    val chunks = PipelineOps.chunkDocuments(docs, 200, 150)
      .where(col("doc_id") === 0L).orderBy("chunk_idx")
      .select("chunk").as[String].collect()
    chunks.sliding(2).foreach {
      case Array(a, b) => assert(a.takeRight(50) === b.take(50))
      case _ => ()
    }
  }

  test("connected components: chains merge, min id labels the cluster") {
    // path 1-2-3 plus pair (7,9): two components, reps 1 and 7;
    // transitivity must label 3 with 1 even though (1,3) is no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connected components: seeded random graphs match union-find") {
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 5) {
      val n = 8
      val edges = (0 until 10).map { _ =>
        val a = rng.nextInt(n).toLong; val b = rng.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (edges.nonEmpty) {
        // reference: plain union-find with min-id representatives
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v)).toMap
        // both strategies must agree with the reference: the driver
        // union-find fast path (default threshold) and the distributed
        // propagation loop (threshold forced to 0)
        val viaDriver = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        val viaLoop = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
            driverMaxPairs = 0L)
          .as[(Long, Long)].collect().toMap
        assert(viaDriver == expected, s"driver path, edges=$edges")
        assert(viaLoop == expected, s"distributed path, edges=$edges")
      }
    }
  }

  test("cross-corpus dedup: bodies already in the reference are dropped") {
    val corpus = Seq((10L, "aaa bbb"), (11L, "ccc ddd"), (12L, "eee fff"))
      .toDF("doc_id", "text")
    val reference = Seq((1L, "ccc ddd"), (2L, "zzz"))
      .toDF("doc_id", "text")
    val out = Dedup.crossCorpusNew(corpus, reference)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(10L, 12L))
  }

  test("pack sequences: running token count bins per shard") {
    // 3 tokens per doc, budget 5: start offsets 0,3,6 -> bins 0,0,1
    val docs = Seq(
      ("en", 0L, "a b c"), ("en", 1L, "d e f"), ("en", 2L, "g h i"),
      ("de", 3L, "x y z") // other shard restarts at offset 0
    ).toDF("lang", "doc_id", "text")
    val out = PipelineOps.packSequences(docs, tokenBudget = 5,
      shardCol = "lang")
      .select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(0L -> ((0L, 0L)), 1L -> ((0L, 3L)),
      2L -> ((1L, 1L)), 3L -> ((0L, 0L))))
  }

  test("token budget select: best-quality prefix within the budget") {
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, good), (1L, good + " more words here now"), (2L, "zz !!!! ;;;")
    ).toDF("doc_id", "text")
    val out = PipelineOps.tokenBudgetSelect(docs, tokenBudget = 13)
      .select("doc_id").as[Long].collect().toSet
    // docs 0 and 1 tie on quality (same profile), doc_id breaks the tie:
    // doc 0 (12 tokens) fits; doc 1 (16 more) would blow the budget and
    // so would low-quality doc 2 after it
    assert(out == Set(0L))
  }

  test("contamination check: benchmark shingle overlap flags the leak") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta"), // shares "alpha beta gamma"
      (11L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val bench = Seq((0L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val out = PipelineOps.contaminationCheck(corpus, bench, w = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 1L))
  }

  test("repetition ratio: looping text scores high, prose scores 0") {
    val df = Seq(
      (0L, "a b a b a"),   // grams: ab,ba,ab,ba -> 2/4 distinct -> 0.5
      (1L, "a b c d"),     // all distinct -> 0.0
      (2L, "x")            // shorter than w -> single gram -> 0.0
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextOps.repetitionRatio($"text", 2).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out == Map(0L -> 0.5, 1L -> 0.0, 2L -> 0.0))
  }

  test("pii scan: emails and phones counted, flag set") {
    val df = Seq(
      (0L, "reach me at jane.doe+x@mail.example.org or 555-123-4567 ok"),
      (1L, "no pii in this one 123456789")
    ).toDF("doc_id", "text")
    val (em, ph, flag) = TextOps.piiCounts($"text")
    val out = df.select($"doc_id", em, ph, flag)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(0L -> ((1L, 1L, true)), 1L -> ((0L, 0L, false))))
  }

  test("vec_dot / vec_norm: codegen expression matches manual math") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))
    ).toDF("a", "b")
    val (d, na) = df.select(vec_dot($"a", $"b"), vec_norm($"a"))
      .as[(Double, Double)].head()
    assert(d == 32.0)
    assert(na == math.sqrt(14.0))
  }

  test("cosine: self-similarity is 1, orthogonal is 0, ranking sane") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, emb.where($"vec_id" === 0), k = 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(top(1) == 1L) // identical vector first (cos 1)
    assert(top(2) == 3L) // then the close one
    assert(top(3) == 2L) // orthogonal last
    val nd = Similarity.cosineNearDupPairs(emb, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd == Set((0L, 1L)))
  }

  test("groupCentroids: exact means per dimension, flat output") {
    val emb = Seq(
      (0L, Array(1.0f, 4.0f), "a"), (1L, Array(3.0f, 0.0f), "a"),
      (2L, Array(0.5f, 0.25f), "b")
    ).toDF("vec_id", "embedding", "grp")
    val out = Similarity.groupCentroids(emb, "grp")
      .orderBy("g", "pos").as[(String, Int, Double, Long)].collect()
    assert(out === Array(("a", 0, 2.0, 2L), ("a", 1, 2.0, 2L),
      ("b", 0, 0.5, 1L), ("b", 1, 0.25, 1L)))
  }

  test("LSH topk: buckets preserve identical vectors together") {
    val emb = Seq(
      (0L, Array(1.0f, 0.5f, -0.25f)), (1L, Array(1.0f, 0.5f, -0.25f)),
      (2L, Array(-1.0f, -0.5f, 0.25f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(emb, emb.where($"vec_id" === 0), k = 2,
      planes = 4, dims = 3).select("neighbor_id").as[Long].collect().toSet
    assert(out.contains(1L), "identical vector must share the bucket")
    assert(!out.contains(2L), "opposite vector must hash to another bucket")
  }

  test("semantic dedup: within-cell near-dups pruned, keepers are " +
      "lowest ids, cross-cell dups untouched") {
    // 2 well-separated directions; ids 0 and 1 become the 2 centroids.
    // 0,2,4 cluster on direction A (2,4 near-dups of 0); 1,3 on B;
    // 5 is near direction B but noisy enough to stay below threshold
    val emb = Seq(
      (0L, Array(1.0f, 0.02f, 0f, 0f)),
      (1L, Array(0f, 0f, 1.0f, -0.03f)),
      (2L, Array(0.99f, 0.01f, 0.01f, 0f)),
      (3L, Array(0.01f, 0f, 0.98f, -0.02f)),
      (4L, Array(1.0f, 0.03f, 0f, 0.01f)),
      (5L, Array(0.3f, -0.4f, 0.6f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, threshold = 0.95, nCells = 2)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 6, "every vector gets a decision row")
    assert(!out(0L)._2 && !out(1L)._2, "centroids keep (lowest ids)")
    assert(out(2L)._2 && out(4L)._2, "near-dups of 0 in cell 0 pruned")
    assert(out(3L)._2, "near-dup of 1 in cell 1 pruned")
    assert(!out(5L)._2, "below-threshold vector survives")
    assert(out(2L)._1 == out(0L)._1 && out(4L)._1 == out(0L)._1)
    assert(out(3L)._1 == out(1L)._1)
  }

  test("LSH near-dup pairs: subset of brute force with identical scores, " +
      "identical vectors always recalled") {
    // deterministic pseudo-random corpus with planted duplicates
    val emb = (0L until 60L).map { i =>
      val base = Array.tabulate(8)(d =>
        math.sin(1.0 + i % 20 * 31.0 + d * 7.0).toFloat)
      (i, base) // i and i+20 and i+40 share a direction → near-dups
    }.toDF("vec_id", "embedding")
    val brute = Similarity.cosineNearDupPairs(emb, threshold = 0.9)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.lshNearDupPairs(emb, threshold = 0.9,
        bands = 6, rowsPerBand = 3, dims = 8)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(lsh.keySet.subsetOf(brute.keySet),
      "LSH may miss pairs but must never invent them")
    lsh.foreach { case (k, c) =>
      assert(c == brute(k), s"verify must be exact for $k") }
    // identical vectors agree on every hyperplane → collide in every
    // band → recall 1 for exact duplicates, by construction
    val exactDups = (0L until 20L).flatMap(i =>
      Seq((i, i + 20), (i, i + 40), (i + 20, i + 40)))
    exactDups.foreach { p =>
      assert(lsh.contains(p), s"exact duplicate pair $p must be recalled") }
  }

  test("text ops: token counts, quality bounds, langid, rolling hash") {
    val df = Seq(
      (0L, "The quick brown fox, it jumps over the lazy dog!"),
      (1L, "el la de y que los camino de la montana"),
      (2L, "zz")
    ).toDF("doc_id", "text")
    val stats = df.select($"doc_id",
      TextOps.tokenCount($"text").as("n"),
      TextOps.qualityScore($"text").as("q"),
      TextOps.langId($"text").as("lang"))
      .as[(Long, Int, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(stats(0L)._1 == 10)
    assert(stats(0L)._2 >= 0.75, "clean English prose scores high")
    assert(stats(0L)._3 == "en")
    assert(stats(1L)._3 == "es")
    assert(stats(2L)._3 == "und")
    assert(stats.values.forall(v => v._2 >= 0.0 && v._2 <= 1.0))

    // rolling hash: deterministic and matches a manual fold
    val h = df.where($"doc_id" === 2)
      .select(TextOps.rollingHash($"text")).as[Long].head()
    val expected = "zz".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483647L)
    assert(h == expected)
  }

  test("multimodal: resize dims cap the long edge, keep small images") {
    val feats = Seq(
      (0L, 512, 256),  // long edge 512 -> (256, 128)
      (1L, 100, 200),  // untouched (max 200 <= 256)
      (2L, 300, 300)   // square downscale -> (256, 256)
    ).toDF("media_id", "width", "height")
    val out = Multimodal.resizeDims(feats, maxDim = 256)
      .select("media_id", "out_width", "out_height")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(0L -> ((256, 128)), 1L -> ((100, 200)),
      2L -> ((256, 256))))
  }

  test("multimodal: payload metadata + frame sampling shapes") {
    val docs2 = Seq((7L, "0123456789abcdef" * 4)).toDF("doc_id", "text") // 64 bytes
    val media = Multimodal.withBinaryPayload(docs2)
    val meta = Multimodal.payloadMetadata(media)
      .select("media_id", "byte_len").as[(Long, Int)].head()
    assert(meta == ((7L, 64)))
    val frames = Multimodal.sampleFrames(media, step = 2)
      .select("frame_idx").as[Long].collect()
    assert(frames.toSeq == Seq(0L, 2L)) // n_frames = 4 -> idx 0,2
    // 64 text bytes -> width 8 + 64 % 57 = 15, height ceil(64/15) = 5
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.withPgmPayload(docs2)).collect()
    assert(feats.length == 1 && feats.head.width == 15 &&
      feats.head.height == 5 && feats.head.maxval == 255 &&
      feats.head.byte_len == 12 + 15 * 5 && // "P5\n15 5\n255\n" + raster
      feats.head.feature_hash.length == 32)
  }

  test("PGM codec: encode/decode round-trips, honors comments, and " +
      "rejects malformed input") {
    import Multimodal.{PgmCodec, PgmImage}
    // hand-built 2x2 image round-trip
    val img = PgmCodec.decode(PgmCodec.encode(
      Array[Byte](10, 20, 30, 40), width = 2, height = 2))
    assert(img == PgmImage(2, 2, 255, img.pixels) &&
      img.pixels.toSeq == Seq[Byte](10, 20, 30, 40))
    // short raster is space-padded by the encoder
    val padded = PgmCodec.decode(PgmCodec.encode(
      Array[Byte](1), width = 3, height = 1))
    assert(padded.pixels.toSeq == Seq[Byte](1, 32, 32))
    // Netpbm '#' comments inside the header parse per the spec
    val withComment = ("P5\n# a comment line\n2 1\n" +
      "255\n").getBytes("US-ASCII") ++ Array[Byte](7, 9)
    val ci = PgmCodec.decode(withComment)
    assert(ci.width == 2 && ci.height == 1 &&
      ci.pixels.toSeq == Seq[Byte](7, 9))
    // real failures must throw, not fake features
    intercept[IllegalArgumentException] {
      PgmCodec.decode("not an image".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated raster
      PgmCodec.decode("P5\n4 4\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 3))
    }
    intercept[IllegalArgumentException] { // 16-bit maxval unsupported
      PgmCodec.decode("P5\n1 1\n65535\n".getBytes("US-ASCII") ++
        Array[Byte](1, 1))
    }
  }
}
