package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Profiling harness for the optimization rounds — NOT a test, run
  * via `Test/runMain graft.ScratchProf <mode>`. Committed as the
  * measurement kit behind the job-count claims in
  * OPTIMIZATION_r18/19.md (test scope only; never on the library's
  * runtime path). */
object ScratchProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "32m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s.range(1000000L).selectExpr("sum(id)").collect()

    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.contains("PROF_VERBOSE")
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet()
          if (verbose) {
            val d = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            val cs = Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("")
            val names = js.stageInfos.map(_.name.takeWhile(_ != '+'))
              .mkString(" | ")
            val tasks = js.stageInfos.map(_.numTasks).mkString("/")
            println(s"[prof-job] ${js.jobId} stages=${js.stageInfos.size} " +
              s"tasks=$tasks $cs $d :: $names")
          }
        }
      })
    def jobsDuring[T](label: String)(f: => T): T = {
      val before = nJobs.get()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(50)
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
        f"  ${nJobs.get() - before}%4d jobs")
      r
    }

    def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(c.cast(DecimalType(18, 4))).cast("double")

    args.headOption.getOrElse("upsert") match {
      case "q" =>
        // generic: run named queries twice with job counts; optional
        // 3rd arg "explain:<suffix>" dumps formatted plans to
        // plans/r19/<name>_<suffix>.txt
        val names = args(1).split(',').toSeq
        val explainSuffix = args.drop(2).headOption
          .filter(_.startsWith("explain:")).map(_.stripPrefix("explain:"))
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          explainSuffix.foreach { suf =>
            val df = fn(s, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val dir = java.nio.file.Paths.get("plans/r19")
            java.nio.file.Files.createDirectories(dir)
            java.nio.file.Files.writeString(
              dir.resolve(s"${name}_$suf.txt"), plan)
          }
          // plan-dump invocations skip the timing loop (the dump
          // itself executes any lifecycle side effects)
          if (explainSuffix.isEmpty) (0 until 2).foreach { i =>
            jobsDuring(s"$name run$i") {
              fn(s, sfDir).write.format("noop").mode("overwrite").save()
            }
            s.catalog.clearCache()
          }
        }

      case "upsert-sp" =>
        // stream_upsert_state with fewer STATE partitions
        (0 until 2).foreach { round =>
          println(s"== upsert-sp round $round ==")
          val ev = SparkEntry.events(s, sfDir).select(col("event_id"),
            col("event_type"), col("value"))
          val base = java.nio.file.Files
            .createTempDirectory("graft-prof-ups").toString
          val srcRoot = s"$base/src"
          val tgt = new graft.catalog.LogStore(s, s"$base/state")
          val src = new graft.catalog.LogStore(s, srcRoot)
          jobsDuring("append half 1") {
            src.append(ev.where(col("event_id") % 10 === 0))
          }
          def agg(): DataFrame = s.readStream.format("graft-log")
            .option("path", srcRoot).load()
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          def lifecycle(label: String): Unit = jobsDuring(label) {
            val saved = s.conf.get("spark.sql.shuffle.partitions")
            s.conf.set("spark.sql.shuffle.partitions", "4")
            val q1 = try graft.streaming.StreamingOps.upsertAggToLog(
              agg(), tgt, Seq("event_type"), s"$base/ckpt")
            finally s.conf.set("spark.sql.shuffle.partitions", saved)
            try q1.processAllAvailable() finally q1.stop()
          }
          lifecycle("lifecycle 1 (sp=4)")
          jobsDuring("append half 2") {
            src.append(ev.where(col("event_id") % 10 === 5))
          }
          lifecycle("lifecycle 2 (sp=4)")
          jobsDuring("final read") {
            tgt.read().orderBy("event_type")
              .write.format("noop").mode("overwrite").save()
          }
        }

      case "upsert" =>
        (0 until 2).foreach { round =>
          println(s"== stream_upsert_state round $round ==")
          val ev = SparkEntry.events(s, sfDir).select(col("event_id"),
            col("event_type"), col("value"))
          val base = java.nio.file.Files
            .createTempDirectory("graft-prof-ups").toString
          val srcRoot = s"$base/src"
          val tgt = new graft.catalog.LogStore(s, s"$base/state")
          val src = new graft.catalog.LogStore(s, srcRoot)
          jobsDuring("append half 1") {
            src.append(ev.where(col("event_id") % 10 === 0))
          }
          def agg(): DataFrame = s.readStream.format("graft-log")
            .option("path", srcRoot).load()
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          def upsert(aggregated: DataFrame):
              org.apache.spark.sql.streaming.StreamingQuery =
            aggregated.writeStream
              .outputMode("update")
              .option("checkpointLocation", s"$base/ckpt")
              .foreachBatch { (batch: DataFrame, batchId: Long) =>
                val t0 = System.nanoTime()
                val collected = batch.collect()
                val t1 = System.nanoTime()
                val dels = batch.limit(0).select(col("event_type"))
                tgt.applyChangesKeyed(batch, dels, Seq("event_type"),
                  batchId): Unit
                val t2 = System.nanoTime()
                println(f"[prof]   batch $batchId: agg-collect " +
                  f"${(t1 - t0) / 1e9}%6.3f s (${collected.length} rows), " +
                  f"applyChangesKeyed ${(t2 - t1) / 1e9}%6.3f s")
              }
              .start()
          jobsDuring("lifecycle 1") {
            val q1 = upsert(agg())
            try q1.processAllAvailable() finally {
              q1.recentProgress.foreach(p =>
                println(s"[prof]   batch ${p.batchId}: " +
                  s"durationMs=${p.durationMs}"))
              q1.stop()
            }
          }
          jobsDuring("append half 2") {
            src.append(ev.where(col("event_id") % 10 === 5))
          }
          jobsDuring("lifecycle 2") {
            val q2 = upsert(agg())
            try q2.processAllAvailable() finally {
              q2.recentProgress.foreach(p =>
                println(s"[prof]   batch ${p.batchId}: " +
                  s"durationMs=${p.durationMs}"))
              q2.stop()
            }
          }
          jobsDuring("final read") {
            tgt.read().orderBy("event_type")
              .write.format("noop").mode("overwrite").save()
          }
        }

      case "append" =>
        // decompose a plain LogStore append with stats
        val ev = SparkEntry.events(s, sfDir).select(col("event_id"),
          col("event_type"), col("value"))
        (0 until 3).foreach { round =>
          println(s"== append round $round ==")
          val base = java.nio.file.Files
            .createTempDirectory("graft-prof-app").toString
          val store = new graft.catalog.LogStore(s, s"$base/t",
            statsCol = Some("event_id"))
          jobsDuring("append 1 (stats)") {
            store.append(ev.where(col("event_id") % 10 === 0))
          }
          jobsDuring("append 2 (stats)") {
            store.append(ev.where(col("event_id") % 10 === 5))
          }
          val plain = new graft.catalog.LogStore(s, s"$base/p")
          jobsDuring("append 3 (no stats)") {
            plain.append(ev.where(col("event_id") % 10 === 0))
          }
          val bl = new graft.catalog.LogStore(s, s"$base/b",
            statsCol = Some("event_id"), bloomCol = Some("event_type"))
          jobsDuring("append 4 (stats+bloom)") {
            bl.append(ev.where(col("event_id") % 10 === 0))
          }
        }

      case "ivfpq" =>
        (0 until 2).foreach { round =>
          println(s"== ann_ivfpq_persisted decomposed round $round ==")
          val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
            .select(col("vec_id"), col("embedding")).cache()
          val root = java.nio.file.Files
            .createTempDirectory("graft-prof-pq").toString
          val corpusStore = new graft.catalog.LogStore(s, s"$root/corpus",
            statsCol = Some("vec_id"))
          val maxId = jobsDuring("maxId") {
            emb.agg(max(col("vec_id"))).head().getLong(0)
          }
          val step = maxId / 4 + 1
          jobsDuring("4 corpus appends") {
            (0 until 4).foreach(i => corpusStore.append(
              emb.where(col("vec_id") >= i * step &&
                col("vec_id") < (i + 1) * step)))
          }
          val idx = jobsDuring("buildIvfPq") {
            graft.operators.AnnIndex.buildIvfPq(s, corpusStore.read(),
              corpusStore.latestVersion(), s"$root/idx", nCells = 16,
              m = 8, dims = 64, ksub = 32, postingSegments = 8)
          }
          jobsDuring("delete + rekey append") {
            corpusStore.deleteWhere("vec_id IN (40, 41)")
            corpusStore.append(emb
              .where(col("vec_id") >= 100 && col("vec_id") < 120)
              .select((col("vec_id") + 100000L).as("vec_id"),
                col("embedding")))
          }
          jobsDuring("maintainIvfPq") {
            graft.operators.AnnIndex.maintainIvfPq(s, corpusStore, idx)
          }
          val postings = graft.catalog.LogStore
            .configured(s, idx.postingsRoot)
          val corpus = corpusStore.read()
          jobsDuring("exactlyOnce checks") {
            postings.lastTxn() == corpusStore.latestVersion() &&
              postings.read().count() == corpus.count()
          }
          val q = corpus.where(col("vec_id") < 8)
          jobsDuring("search wide") {
            val scan = graft.operators.AnnIndex.searchIvfPq(s, idx,
              corpusStore, q, k = 5, nProbe = 4, shortlist = 50)
            scan.results.write.format("noop").mode("overwrite").save()
          }
          jobsDuring("search narrow") {
            graft.operators.AnnIndex.searchIvfPq(s, idx, corpusStore,
              corpus.where(col("vec_id") === 0L), k = 3, nProbe = 2,
              shortlist = 3).results
              .write.format("noop").mode("overwrite").save()
          }
          emb.unpersist()
        }

      case "maint" =>
        // step-by-step replay of maintainIvfPq's internals
        import graft.catalog.LogStore
        (0 until 2).foreach { round =>
          println(s"== maintainIvfPq steps round $round ==")
          val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
            .select(col("vec_id"), col("embedding")).cache()
          val root = java.nio.file.Files
            .createTempDirectory("graft-prof-mt").toString
          val corpusStore = new LogStore(s, s"$root/corpus",
            statsCol = Some("vec_id"))
          corpusStore.append(emb)
          val idx = graft.operators.AnnIndex.buildIvfPq(s,
            corpusStore.read(), corpusStore.latestVersion(),
            s"$root/idx", nCells = 16, m = 8, dims = 64, ksub = 32,
            postingSegments = 8)
          corpusStore.deleteWhere("vec_id IN (40, 41)")
          corpusStore.append(emb
            .where(col("vec_id") >= 100 && col("vec_id") < 120)
            .select((col("vec_id") + 100000L).as("vec_id"),
              col("embedding")))
          val postings = LogStore.configured(s, idx.postingsRoot)
          val cursor = math.max(postings.lastTxn(), -1L)
          val latest = corpusStore.latestVersion()
          val changes = jobsDuring("readChanges+cache") {
            val c = corpusStore.readChanges(cursor + 1, latest).cache()
            c.count()
            c
          }
          val removedKeys = changes
            .where(col("_change_type").isin("delete", "update_preimage"))
            .select(col("vec_id")).distinct()
          jobsDuring("removedKeys probe") {
            removedKeys.limit(1).collect()
          }
          jobsDuring("deleteKeysDV") {
            postings.deleteKeysDV(removedKeys, Seq("vec_id"))
          }
          jobsDuring("maintainLayout") {
            postings.maintainLayout(1L, dvFraction = 0.5,
              clusterBy = Seq(col("cell_id")))
          }
          jobsDuring("maintainIvfPq (rest via API)") {
            graft.operators.AnnIndex.maintainIvfPq(s, corpusStore, idx)
          }
          changes.unpersist()
          emb.unpersist()
        }

      case other =>
        println(s"unknown mode $other")
    }
    s.stop()
  }
}
