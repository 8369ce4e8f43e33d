package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S5: the reference's written-but-avoided UPDATE path
  * (`/root/reference/src/services/bigquery.ts:168-190` — per-record
  * `UPDATE … WHERE shop AND billing_date`, deliberately bypassed in
  * production for the append-only pattern, `billing.ts:161-163`).
  *
  * Offered here as an explicit MERGE-style operator so engine users get
  * both models: `mergeByKey` is the relational upsert (anti-join +
  * union), `replaceTable` the atomic swap that lands it on parquet.
  * At scale the swap rewrites only what it must when the table is
  * partitioned — callers merge one `billing_date` partition at a time,
  * which is exactly the reference's daily-batch access pattern.
  */
object MergeOps {

  /** Upsert `updates` into `current` by key: rows in `current` whose key
    * appears in `updates` are replaced, others kept. Column sets must
    * match (use `unionByName` semantics). */
  def mergeByKey(current: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    current
      .join(broadcast(updates.select(keyCols: _*).distinct()), keys, "left_anti")
      .unionByName(updates.select(current.columns.map(col): _*))
  }

  /** Atomically replace the table at `path` with `df`: materialize to a
    * sibling tmp dir, then swap via rename (the classic
    * write-new/rename-swap protocol — safe because parquet readers
    * resolve the directory at read time). */
  def replaceTable(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp-" + System.nanoTime())
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(hPath)) fs.delete(hPath, true)
    fs.rename(tmp, hPath)
  }
}
