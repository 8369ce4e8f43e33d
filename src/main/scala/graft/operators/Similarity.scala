package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: brute-force top-k is the correctness baseline — a
  * broadcast of the (small) query set against a full scan of the corpus,
  * embarrassingly parallel, no shuffle until the final per-query top-k
  * (`Window` + rank, which AQE executes as a partial top-k per partition).
  * The LSH variant (random-hyperplane signs) buckets the corpus so each
  * query only scans its bucket — the 100 TB path; hyperplanes are
  * deterministic (md5-parity pseudo-signs), so results are reproducible.
  *
  * Determinism: floats are widened to double BEFORE any multiply, the
  * dot product is a sequential left fold (`aggregate`), and `sqrt` is
  * IEEE-correctly-rounded — identical bits in any engine that does the
  * same.
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query row (broadcast) against the
    * whole corpus; per-query rank with deterministic tie-break on
    * neighbor id. Output: (query_id, rank, neighbor_id, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val joined = corpus.as("c")
      .join(broadcast(queries.as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane sign for (plane p, dim d):
    * ±1 from the parity of the first hex digit of md5("p|d"). */
  private def planeSign(p: Int, d: Column): Column = {
    val hexChar = substring(md5(concat(lit(s"$p|"), d.cast("string"))), 1, 1)
    conv(hexChar, 16, 10).cast("int") % 2 * 2 - 1
  }

  /** Random-hyperplane (sign-)LSH signature with `planes` bits: bit p =
    * [Σ_d sign(p,d) · v_d > 0]. */
  def lshSignature(embedding: Column, planes: Int = 8): Column = {
    val sums = (0 until planes).map { p =>
      aggregate(
        zip_with(embedding, sequence(lit(0), size(embedding) - 1),
          (x, d) => x.cast("double") * planeSign(p, d).cast("double")),
        lit(0.0), (acc, v) => acc + v)
    }
    sums.zipWithIndex.map { case (s, p) =>
      when(s > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: queries only meet corpus vectors in
    * the same signature bucket. Recall < 1 by construction; the scale
    * path for 100 TB corpora (bucket count grows 2^planes). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      planes: Int = 8): DataFrame = {
    val sigCorpus = corpus.withColumn("sig",
      lshSignature(col("embedding"), planes))
    val sigQueries = queries.withColumn("sig",
      lshSignature(col("embedding"), planes))
    val joined = sigCorpus.as("c")
      .join(broadcast(sigQueries.as("q")),
        col("q.sig") === col("c.sig") &&
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs within a deterministic id
    * subset (`idFilter`), cosine ≥ threshold. Brute pairwise on the
    * subset — the LSH variant above is the scale path. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
      idModulus: Int = 1): DataFrame = {
    val sub = embeddings.where(col("vec_id") % idModulus === 0)
    sub.as("a").join(sub.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
