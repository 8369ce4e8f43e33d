package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table writer: pre-shuffles a table into N buckets by join
  * key at WRITE time so later joins and aggregations on that key run
  * with NO exchange — the storage-layout half of the 100 TB strategy
  * (the daily billing join on `shop` never re-shuffles the big side if
  * sessions and events are co-bucketed).
  *
  * Uses the session catalog (`saveAsTable`) because bucket metadata
  * lives in the table definition, not the files.
  */
final class BucketedStore(spark: SparkSession) {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    // Overwrite must survive an orphaned warehouse dir left by a
    // crashed run (table gone from catalog, files still on disk).
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new Path(spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Same as [[writeBucketed]] but at an explicit filesystem location
    * (external bucketed table) — bucket metadata still lives in the
    * catalog entry, so downstream joins see the bucket spec; the data
    * lands where the caller says (a scratch dir in the verify/bench
    * drivers, a curated lake path in production). */
  def writeBucketedAt(df: DataFrame, table: String, key: String,
      buckets: Int, location: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new Path(location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", location)
      .format("parquet").saveAsTable(table)
  }

  def table(name: String): DataFrame = spark.table(name)

  /** True if the physical plan for `df` contains any shuffle exchange —
    * the property bucketed joins are designed to eliminate. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }
}
