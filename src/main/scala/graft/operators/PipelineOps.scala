package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics operators a large-scale training-data pipeline needs
  * beyond the reference's surface: sessionization, vocabulary/term
  * statistics, deterministic sampling, bucketed histograms.
  *
  * Scale notes: sessionization is ONE shuffle (partition by user) and a
  * linear per-partition pass (lag + running sum — Spark executes window
  * frames without re-sorting when the partition ordering is shared);
  * vocabulary is explode + one hash agg; samplers are hash-predicates
  * that push into the scan and need no shuffle at all.
  */
object PipelineOps {

  /** Gap-based sessionization of an event stream: a new session starts
    * when the user's inter-event gap exceeds `gapMinutes`. Returns one
    * row per session with bounds and counts. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val marked = events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new"))
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col(userCol), col("session_idx"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Vocabulary statistics over a document corpus: term frequency and
    * document frequency per token, top-N by TF (token tie-break). */
  def vocabulary(documents: DataFrame, topN: Int = 100): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topN)
  }

  /** Deterministic hash sample: keep rows whose md5(key) starts below the
    * given 2-hex-digit threshold — reproducible in any engine, no RNG,
    * pushes down as a plain predicate. `threshold` "14" ≈ 7.8%. */
  def hashSample(df: DataFrame, keyCol: String,
      thresholdHex: String = "14"): DataFrame =
    df.where(substring(md5(col(keyCol).cast("string")), 1, 2) <
      lit(thresholdHex))

  /** Deterministic stratified sample: at most `perStratum` rows per
    * stratum, chosen by hash order (reproducible shuffle-free ranking
    * within each stratum partition). */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= perStratum).drop("__rn")
  }

  /** Fixed-width bucket histogram of a numeric column. */
  def histogram(df: DataFrame, valueCol: String,
      bucketWidth: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / lit(bucketWidth)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_low", col("bucket") * lit(bucketWidth))
}
