package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query names (fast iteration on
    // a single oracle without re-running the whole suite)
    val only = args.drop(2).headOption.map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "32m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the engine's native functions + optimizer rules (CountInSet
    // rewrite, JW length prune) are part of the product surface —
    // verify WITH them active, exactly as a cluster deployment
    // (spark.sql.extensions=graft.functions.GraftExtensions) would run
    graft.functions.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    val declared = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    declared.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Loss-proofing: a query that throws at plan time must never vanish
    // from the round's accounting — dump every failure (name → message)
    // so the driver can emit an `err` row, and make the count mismatch
    // loud on stderr. |dumped| + |errors| must equal |declared|.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Full declared-query manifest so the checker can assert that every
    // declared name is accounted for (ok / fail / rows-only / err).
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      declared.keys.map(q).mkString("[", ",", "]"))
    val dumped = declared.size - errors.size
    System.err.println(
      s"[verify] declared=${declared.size} dumped=$dumped errors=${errors.size}")
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] FAILED QUERIES: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
