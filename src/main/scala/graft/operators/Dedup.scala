package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a `documents(doc_id, text)` table, from
  * exact through three families of near-dup detection. Scale design:
  *
  *  - exact + fingerprint dedup: one hash-groupBy — the shuffle key is the
  *    16-byte digest, not the document body, so 100 TB of text shuffles
  *    only ~(n_docs × 16 B).
  *  - MinHash/LSH: shingle → k minhashes → b bands; candidate generation
  *    is a self-join on (band_id, band_hash) — documents only meet if
  *    they collide in a band, so the join fan-out is data-dependent and
  *    tiny compared to the n² brute force. The verify step recomputes
  *    exact Jaccard ONLY for candidates.
  *  - SimHash: per-doc 16-bit signature, near-dups = Hamming ≤ r; banding
  *    on signature halves gives the scale path (pigeonhole: distance ≤ 1
  *    pairs share at least one half).
  *
  * Determinism contract for oracle parity: hashes are md5 hex strings
  * (identical bytes in every engine), mins/maxes are lexicographic on
  * hex, and all ratios are single IEEE divisions of exact integers.
  */
object Dedup {

  /** Word w-shingles (default w=3) of lowercased whitespace tokens,
    * distinct per document. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    array_distinct(
      when(size(toks) < w, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - w),
          i => concat_ws(" ", slice(toks, i + 1, lit(w))))))
  }

  /** Exact dedup: group identical bodies by digest; emit one keeper (min
    * doc_id) + duplicate count per distinct text. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("dup_count"))

  /** MinHash signature columns: minhash_i = lexicographic min over
    * shingles of md5(i || '|' || shingle). Seeded re-hashing gives k
    * independent permutations without any RNG. */
  def withMinhashes(documents: DataFrame, k: Int = 8, w: Int = 3): DataFrame = {
    val sh = shingles(col("text"), w)
    val cols = (0 until k).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i|"), s))))
        .as(s"minhash_$i")
    }
    documents.select(col("doc_id") +: cols: _*)
  }

  /** LSH candidate pairs from banded minhashes: b bands of r rows
    * (k = b*r); a pair is a candidate iff some band's concatenated
    * minhashes collide. Returns (band, band_hash, doc_id) long-form,
    * ready for the self-join. */
  def lshBuckets(minhashed: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"minhash_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("band_hash"))
    }
    minhashed
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.band_hash").as("band_hash"))
  }

  /** MinHash-LSH near-dup pairs, verified with exact Jaccard ≥ threshold.
    * The self-join key is (band, band_hash); the Jaccard verify joins the
    * (distinct) candidate pairs back to per-doc shingle sets. */
  def minhashLshPairs(documents: DataFrame, k: Int = 8, bands: Int = 4,
      w: Int = 3, threshold: Double = 0.7): DataFrame = {
    val r = k / bands
    val buckets = lshBuckets(withMinhashes(documents, k, w), bands, r)
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(documents, candidates, w, threshold)
  }

  /** Exact n-gram Jaccard over ALL co-shingled pairs (no LSH): pairs that
    * share ≥1 shingle, scored |∩| / |∪|. The inverted-index self-join on
    * the shingle hash avoids the n² cross product — only docs sharing a
    * shingle ever meet. */
  def ngramJaccardPairs(documents: DataFrame, w: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val docShingles = documents
      .select(col("doc_id"), explode(shingles(col("text"), w)).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("sh"))
    val sizes = docShingles.groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"))
    val common = docShingles.as("a")
      .join(docShingles.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes).as("sa"), col("id_a") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_common")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  private def verifyJaccard(documents: DataFrame, candidates: DataFrame,
      w: Int, threshold: Double): DataFrame = {
    val docShingles = documents
      .select(col("doc_id"), explode(shingles(col("text"), w)).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("sh"))
    val sizes = docShingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = candidates
      .join(docShingles.as("a"), col("id_a") === col("a.doc_id"))
      .join(docShingles.as("b"),
        col("id_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes).as("sa"), col("id_a") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_common")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 16-bit SimHash from the first 4 hex chars of each token's md5:
    * bit_j = sign of Σ_tokens (±1 by token-hash bit j). Portable bit
    * extraction: hex digit value via strpos, bit via div/mod. */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(trim(lower(text)), "\\s+"))
    // Σ over tokens per bit, then sign → bit j of the signature
    val sums = (0 until 16).map { j =>
      aggregate(toks, lit(0),
        (acc, t) => {
          val hexChar = substring(md5(t), j / 4 + 1, 1)
          val hexVal = conv(hexChar, 16, 10).cast("int")
          val bit = shiftright(hexVal, 3 - (j % 4)) % 2
          acc + (bit * 2 - 1)
        })
    }
    sums.zipWithIndex.map { case (s, j) =>
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: signatures within Hamming distance ≤ r.
    * Brute signature-pair compare here (signatures are tiny);
    * the banding-on-halves trick is the scale path and is exercised by
    * the LSH operators above. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 2): DataFrame = {
    val sigs = documents.select(col("doc_id"),
      simhash(col("text")).as("sig"))
    sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
