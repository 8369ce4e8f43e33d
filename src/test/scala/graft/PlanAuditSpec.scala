package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that decide whether these same
  * queries survive a 100 TB input — filter pushdown to the parquet
  * scan, column pruning, broadcast (not sort-merge) joins for small
  * dims, top-k as TakeOrderedAndProject, whole-stage codegen, and
  * shuffle counts — asserted against the REAL query definitions in
  * SparkEntry, so a regression in any query's plan fails the build,
  * not just the stopwatch. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private def planOf(df: DataFrame): String = {
    df.collect() // let AQE finalize so the plan is the executed one
    df.queryExecution.executedPlan.toString
  }

  /** Every node of the executed plan, descending through the AQE
    * wrappers (`AdaptiveSparkPlanExec` and `QueryStageExec` are LEAF
    * nodes to TreeNode.collect, so a naive collect sees nothing below
    * them and shuffle-count assertions pass vacuously). */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val below = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s.plan)
      case other => other.children
    }
    p +: below.flatMap(flatten)
  }

  /** Distinct data shuffles the query executed (reused exchanges count
    * once — a reuse is free at runtime). */
  private def shufflesOf(df: DataFrame): Seq[ShuffleExchangeLike] = {
    df.collect()
    flatten(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
      .distinct
  }

  test("DSIR model join broadcasts the bucket model, never sort-merges") {
    val plan = planOf(q("text_dsir"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the 256-row bucket model must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join anywhere in text_dsir:\n$plan")
  }

  test("emb_pca projection is shuffle-free after the bounded gram " +
      "collect (literals only, no join)") {
    val df = q("emb_pca")
    // the projection plan (what the query RETURNS) must carry no join:
    // the eigenvector ships as a constant literal, the kmAssign pattern
    val plan = planOf(df)
    assert(!plan.contains("Join"),
      s"emb_pca projection must not join — direction is a literal:\n$plan")
  }

  test("PCA gram pass is a single map-side aggregation: no Generate " +
      "(no per-row d² explode), at most one shuffle") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pass = graft.operators.Similarity.gramPass(emb, dims = 64)
    val df = pass.toDF()
    val plan = planOf(df)
    assert(!plan.contains("Generate"),
      s"gram accumulation must be map-side (no explode):\n$plan")
    assert(shufflesOf(df).size <= 1,
      s"gram pass may shuffle only the partial buffers once:\n$plan")
  }

  test("silhouette: centroid distances are literal arithmetic — no " +
      "join anywhere (the kmAssign pattern)") {
    val plan = planOf(q("emb_silhouette"))
    assert(!plan.contains("Join"),
      s"silhouette must not join — centroids ship as literals:\n$plan")
  }

  test("theta sketch: bounded typed aggregation only — no window " +
      "sort, no cartesian blowup") {
    val plan = planOf(q("sketch_theta"))
    assert(!plan.contains("Window"),
      s"the KMV pass must not rank the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no unbounded product in the sketch pass:\n$plan")
    val plan2 = planOf(q("sketch_theta_setops"))
    assert(!plan2.contains("Window") && !plan2.contains("CartesianProduct"),
      s"set algebra runs on two k-length arrays:\n$plan2")
  }

  test("chi-square grid: marginals broadcast, no shuffle join") {
    val plan = planOf(q("analytics_chi_square"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"the bounded marginals must broadcast into the grid:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"contingency-table relations must never shuffle-join:\n$plan")
  }

  test("grouped entropy stays inside whole-stage codegen") {
    // "*(n) " prefixes are the executed plan's codegen stage markers
    val plan = planOf(q("text_entropy"))
    assert(plan.contains("*(") && plan.contains("HashAggregate"),
      s"entropyByKey's aggregations must be codegen'd:\n$plan")
  }

  test("MAD anomaly joins broadcast the tiny percentile relations") {
    val plan = planOf(q("analytics_mad_anomaly"))
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin"),
      s"med/mad (|event types| rows) must broadcast, never shuffle the " +
        s"event log into a sort-merge join:\n$plan")
  }

  test("daily event slice pushes its date bounds into the parquet scan") {
    val plan = planOf(q("f2_daily_event_filter"))
    assert(plan.contains("PushedFilters: [IsNotNull(ts), " +
      "GreaterThanOrEqual(ts,") || plan.contains("GreaterThanOrEqual(ts,"),
      s"raw-ts bounds must reach the scan:\n$plan")
  }

  test("sessions scan prunes to the projected columns only") {
    val plan = planOf(q("s1_sessions_scan"))
    assert(!plan.contains("c_acctbal") && !plan.contains("c_nationkey"),
      s"unprojected customer columns must not be read:\n$plan")
  }

  test("billing join broadcasts the aggregated small side") {
    val plan = planOf(q("j1_billing_join"))
    assert(plan.contains("BroadcastHashJoin"),
      s"J1 must be a broadcast hash join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"J1 must not shuffle the big side into a sort-merge join:\n$plan")
  }

  test("top-N report query plans as TakeOrderedAndProject") {
    val plan = planOf(q("l2_top_shops"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$plan")
  }

  test("pricing summary aggregation runs inside whole-stage codegen") {
    val plan = planOf(q("q1_pricing_summary"))
    // "*(n) " prefixes are the executed plan's whole-stage-codegen markers
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"hot aggregation path must be codegen'd:\n$plan")
    assert(plan.contains("*(") && plan.contains("HashAggregate"),
      s"aggregate must sit inside a codegen stage:\n$plan")
  }

  test("date-partitioned AppendStore reads prune to one partition") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-prune").toString + "/usage"
    val store = new graft.catalog.AppendStore(spark, path,
      partitionCol = Some("billing_date"))
    store.append(Seq(
      ("s1", "2024-01-14", 10L), ("s2", "2024-01-15", 20L),
      ("s3", "2024-01-16", 30L)
    ).toDF("shop", "billing_date", "page_views"))

    val df = spark.read.parquet(path)
      .where(org.apache.spark.sql.functions.col("billing_date") === "2024-01-15")
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("billing_date"),
      s"date predicate must prune partitions, not filter rows:\n$scan")
    // pruning proof: the scan's own metric says one file was read
    // (df.inputFiles lists the pre-pruning relation, so it can't be used)
    val numFiles = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }
    assert(numFiles.contains(1L),
      s"expected exactly 1 file after pruning, got $numFiles")
  }

  test("Q19 disjunctive branches keep the broadcast join, one pass") {
    val plan = planOf(q("q19_branch_revenue"))
    assert(plan.contains("BroadcastHashJoin"),
      s"part side must broadcast despite OR'd predicates:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("LSH signature path stays fully codegen'd (no CodegenFallback)") {
    val df = q("ann_lsh_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the sign matrix is inlined as literals, so every signature bit is
    // a VecDot inside a codegen stage — per-row md5 through interpreted
    // HOF lambdas would surface here as a fallback marker
    assert(!plan.contains("CodegenFallback") && !plan.contains("md5"),
      s"LSH signature must not interpret per-row hashes:\n$plan")
  }

  test("IVF cell assignment adds no shuffle and no row expansion") {
    val df = q("ann_ivf_topk")
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    // assignment is a per-row argmax over broadcast-literal centroids:
    // the only exchanges allowed are the final top-k window partitioning
    // and the output ordering — the old corpus×centroids formulation had
    // an extra window shuffle over the nCells-times-expanded corpus
    val shuffles = shufflesOf(df)
    assert(shuffles.size <= 2,
      s"cell assignment must not shuffle (got ${shuffles.size}):\n$planStr")
    assert(!planStr.contains("CartesianProduct"),
      s"no corpus×centroid expansion allowed:\n$planStr")
  }

  test("DSv2 synthetic source narrows its interval via pushed filters") {
    val df = q("src_synth_pushdown")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the id range reached the connector (interval narrowed at the
    // source); the bucket predicate stayed a residual Filter node
    assert(plan.contains("GraftSynth[1000,2000)"),
      s"id bounds must push into the scan:\n$plan")
    assert(plan.contains("Filter") && plan.contains("bucket"),
      s"bucket predicate must remain a residual:\n$plan")
  }

  test("DSv2 synthetic source prunes to requested columns") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("graft.sources.SyntheticProvider")
      .option("rows", "1000").load().select(col("id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && !plan.contains("payload"),
      s"unrequested columns must not be materialized:\n$plan")
  }

  test("contamination check broadcasts the benchmark shingles") {
    val plan = planOf(q("pipe_contamination"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the eval set must broadcast, the corpus must stream:\n$plan")
  }

  test("keep list drops members via a broadcast anti-join") {
    val plan = planOf(q("dedup_keep_list"))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"drop set must broadcast into an anti-join:\n$plan")
  }

  test("sequence packing shuffles by shard, never to a single partition") {
    val df = q("pipe_pack_sequences")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the running-token window must partition by the shard column; a
    // SinglePartition exchange would funnel 100 TB through one task
    assert(plan.contains("hashpartitioning(lang") ||
      plan.contains("hashpartitioning('lang"),
      s"window must partition by shard:\n$plan")
    val windowed = plan.linesIterator.filter(_.contains("Window")).mkString
    assert(!windowed.contains("SinglePartition"), s"global window:\n$plan")
  }

  test("as-of join costs exactly one shuffle (union+window, no theta)") {
    val df = q("join_asof_last_view")
    val shuffles = shufflesOf(df)
    // one exchange for the window partitioning; the final orderBy adds
    // a range exchange — anything beyond that means the rewrite broke
    assert(shuffles.size <= 2,
      s"as-of should shuffle once (+1 for output order), got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("tolerance as-of join keeps the one-shuffle union+window shape") {
    val df = q("join_asof_tolerance")
    val shuffles = shufflesOf(df)
    // the second window expression (matched ts) must ride the SAME
    // frame and exchange as the matched pick, not add a shuffle
    assert(shuffles.size <= 2,
      s"tolerance as-of should shuffle once (+1 for output order), got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("skyline: the corpus-sized window is bucket-partitioned, never " +
      "a single global partition") {
    val df = q("analytics_skyline")
    df.collect()
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    // two windows exist: the per-bucket prefix-min (partitioned by b)
    // and the bucket-minima carry (tiny, single partition by design).
    // The one over the full point set must be the partitioned one.
    val single = windows.filter(_.partitionSpec.isEmpty)
    val partitioned = windows.filter(_.partitionSpec.nonEmpty)
    assert(partitioned.nonEmpty, "per-bucket window missing")
    assert(single.forall(_.windowExpression.forall(_.name == "carry")),
      "a single-partition window may only compute the bucket-minima " +
        s"carry, never touch the raw points:\n" +
        s"${df.queryExecution.executedPlan}")
  }

  test("count-min counters collapse map-side before the shuffle") {
    val df = q("sketch_countmin")
    df.collect()
    val aggs = flatten(df.queryExecution.executedPlan)
      .collect { case a: org.apache.spark.sql.execution.aggregate
        .HashAggregateExec => a }
    // the d×w counter groupBy must run a partial aggregate below its
    // exchange: the sketch's whole point is that the shuffle carries
    // ≤ d·w rows per task, not the exploded input stream
    assert(aggs.exists(_.aggregateExpressions.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      s"no partial aggregation:\n${df.queryExecution.executedPlan}")
  }

  test("scd2 interval build costs one shuffle (windows share the key exchange)") {
    val df = q("scd2_user_state")
    val shuffles = shufflesOf(df)
    // one exchange on the key feeds all three windows (the (key,_run)
    // window is clustered by the key hash already); the final orderBy
    // adds its range exchange
    assert(shuffles.size <= 2,
      s"scd2 should shuffle once (+1 for output order), got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("bloom prefilter probes the fact side BELOW the join") {
    val df = q("bloom_semi_join")
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the probe must run in the fact scan stage, under the join node,
    // so pruned rows never reach the join (and at scale, its shuffle)
    val joins = flatten(plan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a join:\n$plan")
    assert(joins.exists(_.children.exists(
        _.toString.contains("might_contain_long"))),
      s"bloom probe must sit below the join, in the fact branch:\n$plan")
  }

  test("DSv2 aggregate pushdown: count/min/max answered by the connector, " +
      "no aggregate node in the plan") {
    val df = q("src_synth_agg_pushdown")
    val rows = df.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 98765L - 1234L)
    assert(r.getLong(1) === 1234L && r.getLong(2) === 98764L)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("GraftSynthAgg"),
      s"scan must be the closed-form aggregate scan:\n$planStr")
    assert(!planStr.contains("HashAggregate") &&
      !planStr.contains("SortAggregate"),
      s"complete pushdown must leave no aggregate node:\n$planStr")
  }

  test("cohort retention costs two data shuffles (user, then cohort-day)") {
    val df = q("analytics_cohort_retention")
    val shuffles = shufflesOf(df)
    // one exchange on user_id builds cohort+day-set in a single agg;
    // one on (cohort, offset); the final orderBy adds its range
    // exchange — a third data shuffle means the op re-joined the log
    assert(shuffles.size <= 3,
      s"cohort retention should be 2 aggs + sort, got ${shuffles.size}:\n" +
        s"${df.queryExecution.executedPlan}")
  }

  test("interval overlap join plans as a hash join, never a nested loop") {
    val df = q("join_interval_overlap")
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    // the bin decomposition exists to turn the interval theta join
    // into an equi join; a BNLJ/cartesian here means it regressed to
    // the quadratic form
    assert(!planStr.contains("BroadcastNestedLoopJoin") &&
      !planStr.contains("CartesianProduct"),
      s"binned overlap join must be an equi join:\n$planStr")
  }

  test("LSH near-dup banding shuffles ids only, never the embeddings") {
    val df = q("dedup_embedding_lsh")
    df.collect()
    val exchanges = flatten(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
    // the candidate self-join moves only (vec_id, band, band_sig) —
    // at test scale one side rides a broadcast instead of a shuffle,
    // so assert over BOTH exchange kinds: wherever the banded stream
    // crosses the wire, a 64-float embedding column riding along would
    // be the 100 TB failure mode this operator exists to avoid
    val broadcasts = flatten(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => e
    }
    val bandingMoves = (exchanges ++ broadcasts).filter(
      _.output.exists(_.name == "band_sig"))
    assert(bandingMoves.nonEmpty,
      s"expected the banded candidate stream to cross an exchange:\n" +
        s"${df.queryExecution.executedPlan}")
    bandingMoves.foreach { e =>
      assert(!e.output.exists(_.name == "embedding"),
        s"embedding column must not ride the banding exchange: ${e.output}")
    }
  }

  test("snapshot diff costs one exchange per side (single full-outer join)") {
    val df = q("snapshot_diff")
    val shuffles = shufflesOf(df)
    // two key exchanges feed the join (zero if bucketed inputs); the
    // final orderBy adds its range exchange — more means the op/changed
    // projection broke into extra stages
    assert(shuffles.size <= 3,
      s"snapshot diff should be one join (2 exchanges +1 order), got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("TPC-H adaptations broadcast every dim side (no sort-merge joins)") {
    // dims (nation/region/supplier/filtered part/one-row scalars) must
    // ride broadcasts; the only shuffles these plans may pay are for
    // their own aggregations and output ordering
    for (name <- Seq("q4_priority_late", "q7_nation_volume",
        "q9_profit_nation_year", "q14_promo_revenue", "q20_promo_shippers")) {
      val plan = planOf(q(name))
      assert(!plan.contains("SortMergeJoin"),
        s"$name must not sort-merge-join a dim:\n$plan")
    }
  }

  test("q18 rolls up lineitem BEFORE joining orders and customer") {
    val df = q("q18_bulk_customers")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the HAVING filter on the per-order quantity sum must sit below the
    // joins: a Filter on sum_qty with joins above it
    val aggIdx = plan.indexOf("HashAggregate")
    val joinIdx = plan.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && joinIdx < aggIdx,
      s"per-order rollup must be the innermost operator (below joins):\n$plan")
  }

  test("q2 part filter reaches below both rollups via the semi join") {
    val df = q("q2_cheapest_shipment")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the lineitem branch must contain a broadcast semi join feeding the
    // first aggregation — i.e. we never aggregate the unfiltered detail
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"q2 must semi-filter lineitem before aggregating:\n$plan")
  }

  test("OHLC resample: window and groupBy share one data exchange") {
    val df = q("ts_ohlc")
    val shuffles = shufflesOf(df)
    // hash(event_type, bucket) feeds BOTH the ordered window pass and
    // the aggregation; the only other exchange is the output orderBy.
    // A second hash exchange means the agg re-partitioned what the
    // window already partitioned — the single-pass design broke.
    assert(shuffles.size <= 2,
      s"OHLC must cost one data shuffle (+1 order), got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("PPS sample: the corpus-sized window is bucket-partitioned, " +
      "only the bucket-offsets window may run single-partition") {
    val df = q("pipe_pps_sample")
    df.collect()
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    val single = windows.filter(_.partitionSpec.isEmpty)
    val partitioned = windows.filter(_.partitionSpec.nonEmpty)
    assert(partitioned.nonEmpty, "per-bucket running-sum window missing")
    assert(single.forall(_.child.output.exists(_.name == "_bsum")),
      "a single-partition window may only consume the nBuckets-row " +
        "bucket-sums relation, never scan the corpus:\n" +
        s"${df.queryExecution.executedPlan}")
  }

  test("PQ-ADC: corpus encode is scan-side only — no shuffle, no row " +
      "expansion before the candidate join") {
    val df = q("ann_pq_adc")
    val shuffles = shufflesOf(df)
    // the corpus side reaches the broadcast NLJ straight from its scan
    // (argmin over constant codebook literals); the only exchanges are
    // the per-query top-k window hash and the output orderBy range
    assert(shuffles.size <= 2,
      s"PQ expects top-k hash + orderBy range only, got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
    val generates = flatten(df.queryExecution.executedPlan)
      .collect { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(generates.isEmpty,
      s"PQ encode must not explode the corpus:\n" +
        s"${df.queryExecution.executedPlan}")
  }

  test("PQ stages stay inside whole-stage codegen at production " +
      "(m, ksub) — the 64 KB Janino regression guard") {
    // the unrolled m·ksub codeword formulation compiled into a method
    // past Janino's hard 64 KB limit: Spark logged 'Whole-stage codegen
    // disabled', paid the failed compile EVERY execution, and ran the
    // stage interpreted. The native PqCodec keeps the generated code a
    // constant few lines, so every Project in these plans must carry
    // the codegen star. Asserted on the rerank query — the heaviest
    // quantizer configuration in the surface (m=8, ksub=32).
    for (name <- Seq("ann_pq_adc", "ann_pq_rerank")) {
      val df = q(name)
      df.collect()
      val inputs = flatten(df.queryExecution.executedPlan)
        .collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
            flatten(w)
        }.flatten.toSet
      val nakedProjects = flatten(df.queryExecution.executedPlan)
        .collect { case p: org.apache.spark.sql.execution.ProjectExec
            if !inputs.contains(p) => p }
      assert(nakedProjects.isEmpty,
        s"$name: Project outside WholeStageCodegen (Janino limit hit?):\n" +
          s"${df.queryExecution.executedPlan}")
    }
  }

  test("curriculum ranking: the corpus window is bucket-partitioned, " +
      "only the bucket-counts window may run single-partition") {
    val df = q("pipe_curriculum")
    df.collect()
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    val single = windows.filter(_.partitionSpec.isEmpty)
    val partitioned = windows.filter(_.partitionSpec.nonEmpty)
    assert(partitioned.nonEmpty, "per-bucket local-rank window missing")
    assert(single.forall(_.child.output.exists(_.name == "_bn")),
      "a single-partition window may only consume the bucket-counts " +
        s"relation, never the corpus:\n${df.queryExecution.executedPlan}")
  }

  test("GLOBAL INVARIANT: no query runs a single-partition WindowExec " +
      "over an unbounded frame") {
    // A WindowExec with an empty partitionSpec serializes its whole
    // input through ONE task — the canonical 100 TB scale-killer. It
    // is legitimate only on a relation that is bounded BY CONSTRUCTION
    // (the ≤nBuckets bucket-totals frames of the two-phase scans, the
    // skyline bucket-minima carry). This test sweeps EVERY declared
    // query's executed plan so a future operator can't reintroduce the
    // pattern unnoticed.
    //
    // Bounded-by-construction markers: the bucket-relation columns of
    // distributedPrefixSum / globalRankByValue / equiDepthHistogram
    // (`_bsum`, `_bn`) — those frames hold ≤ nBuckets rows whatever
    // the input size.
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val df = build(spark, dir)
        df.collect()
        globalWindowViolations(name, df.queryExecution.executedPlan)
    }
    assert(violations.isEmpty,
      s"unbounded single-partition windows:\n${violations.mkString("\n")}")
  }

  /** A per-name waiver for a single-partition window: the count cap
    * and a structural predicate identifying exactly the documented
    * bounded frame — NOT a blanket by-name pass, so a second,
    * genuinely unbounded global window in a waived query still fails. */
  private case class WindowWaiver(reason: String, max: Int,
      accepts: org.apache.spark.sql.execution.window.WindowExec => Boolean)

  /** The window is bounded because a LIMIT-class exec sits below it:
    * whatever the corpus size, at most k rows reach the single
    * partition. (TakeOrderedAndProject is orderBy+limit fused.) */
  private def boundedByLimit(
      w: org.apache.spark.sql.execution.window.WindowExec): Boolean =
    flatten(w.child).exists {
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        true
      case _ => false
    }

  private val windowWaivers: Map[String, WindowWaiver] = Map(
    "analytics_skyline" -> WindowWaiver(
      "bucket-minima carry: the child is the per-bucket minima " +
        "aggregate, ≤nBuckets rows", max = 1,
      w => w.child.output.exists(_.name == "bmin")),
    "pipe_source_mix" -> WindowWaiver(
      "largest-remainder seat window: the child is the per-GROUP " +
        "(language/corpus) share relation, one row per group", max = 1,
      w => w.child.output.exists(_.name == "rem")),
    "pipe_neyman_sample" -> WindowWaiver(
      "largest-remainder seat window (shared apportionment helper): " +
        "the child is the per-STRATUM quota relation, one row per " +
        "stratum", max = 1,
      w => w.child.output.exists(_.name == "rem")),
    "text_bm25" -> WindowWaiver(
      "final rank over a LIMIT k relation", max = 1, boundedByLimit),
    "retrieval_rrf" -> WindowWaiver(
      "fusion rank over two top-k lists (plus the BM25 arm's own " +
        "rank-over-limit)", max = 2, boundedByLimit),
    "retrieval_ndcg" -> WindowWaiver(
      "the BM25 arm's rank over its LIMIT-10 relation", max = 1,
      boundedByLimit),
    "retrieval_metrics" -> WindowWaiver(
      "the BM25 arm's rank over its LIMIT-10 relation", max = 1,
      boundedByLimit)
  )

  /** The audit for one executed plan — extracted so a test can prove
    * the waivers reject plans they do not exactly describe. */
  private def globalWindowViolations(name: String,
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    val boundedMarkers = Set("_bsum", "_bn")
    val singles = flatten(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    val bad = singles.filterNot(w =>
      w.child.output.exists(a => boundedMarkers.contains(a.name)))
    def describe(ws: Seq[org.apache.spark.sql.execution.window.WindowExec]) =
      ws.map(w => s"[${w.windowExpression.map(_.name).mkString(",")}" +
        s" over (${w.child.output.map(_.name).mkString(",")})]")
        .mkString("; ")
    windowWaivers.get(name) match {
      case None =>
        if (bad.isEmpty) Nil else Seq(s"$name: ${describe(bad)}")
      case Some(wv) =>
        val unexpected = bad.filterNot(wv.accepts)
        if (unexpected.nonEmpty)
          Seq(s"$name: window(s) outside its waiver " +
            s"(${wv.reason}): ${describe(unexpected)}")
        else if (bad.size > wv.max)
          Seq(s"$name: ${bad.size} waived-shape windows, cap is " +
            s"${wv.max}: ${describe(bad)}")
        else Nil
    }
  }

  test("GLOBAL INVARIANT: no Filter node re-inlines the tokenizer " +
      "(pushed-predicate alias substitution)") {
    // When a filter on a computed text column is pushed below its
    // projection, Catalyst substitutes the alias and the predicate
    // re-evaluates split(trim(lower(text))) once per REFERENCE — the
    // langid filter inlined it ~16× per scanned row before the
    // explode(array(…)) Generate barrier fixed pipe_prepare_corpus
    // (3.6 → 1.9 s). This sweep keeps the pattern from returning in
    // any query: a Filter carrying ≥4 tokenizer calls is a pushed
    // predicate that should be reading a materialized column.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val df = build(spark, dir)
        df.collect()
        flatten(df.queryExecution.executedPlan)
          .collect { case f: org.apache.spark.sql.execution.FilterExec =>
            "split\\(trim\\(lower\\(".r
              .findAllIn(f.condition.toString).length }
          .filter(_ >= 4)
          .map(n => s"$name: Filter with $n inlined tokenizer calls")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the window waivers reject an injected unbounded global window " +
      "even in a waived query") {
    // an attacker plan: text_bm25's own windows are waived (rank over
    // a LIMIT), but a global row_number over the raw corpus — the
    // exact 100 TB killer the invariant exists for — must still flag
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("__global_rn",
        row_number().over(Window.orderBy(col("doc_id"))))
    docs.collect()
    val v = globalWindowViolations("text_bm25",
      docs.queryExecution.executedPlan)
    assert(v.nonEmpty, "the corpus-wide global window must be flagged")
    assert(v.head.contains("outside its waiver"))
    // and the cap catches a SECOND waived-shape window: two limit-
    // bounded global ranks where text_bm25 documents exactly one
    val twice = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy(col("doc_id")).limit(5)
      .withColumn("rn1", row_number().over(Window.orderBy(col("doc_id"))))
      .withColumn("rn2",
        row_number().over(Window.orderBy(col("doc_id").desc)))
    twice.collect()
    val v2 = globalWindowViolations("text_bm25",
      twice.queryExecution.executedPlan)
    assert(v2.nonEmpty, "two windows must exceed text_bm25's cap of 1")
  }

  test("sliding distinct reach: the calendar-day probe broadcasts") {
    val plan = planOf(q("ts_sliding_distinct"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the days relation is calendar-bounded and must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join in the covered-days probe:\n$plan")
  }

  test("JW blocked matcher: block equality is an equi-join — no " +
      "nested-loop, no cartesian") {
    val plan = planOf(q("er_jw_matches"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the candidate square must come from the block equi-join, " +
        s"never a cross product:\n$plan")
  }

  test("deterministic shuffle order plans as TakeOrderedAndProject") {
    val plan = planOf(q("pipe_shuffle_order"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"ORDER BY shuffle_key LIMIT 50 must not global-sort:\n$plan")
  }

  test("DiD cells collapse map-side: one aggregation, no join") {
    val df = q("analytics_did")
    assert(shufflesOf(df).size <= 1,
      "8 conditional sums must ride ONE aggregation exchange:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("Holt fold: daily collapse + per-key series agg — at most 2 " +
      "data shuffles before the output sort") {
    val df = q("ts_holt_forecast")
    assert(shufflesOf(df).size <= 3, // daily agg, per-key agg, orderBy
      "the sequential fold must run INSIDE the per-key aggregation, " +
        "never as extra exchanges:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("attribution pairing is an equi-join on (user, day) — no " +
      "cartesian, no nested loop") {
    val plan = planOf(q("analytics_attribution"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the purchase x touch pairing must be the day-replicated " +
        s"equi-join:\n$plan")
  }

  test("prefix-Jaccard: verify arrays reuse the window exchanges " +
      "(long form shuffles at most 3 times)") {
    val df = q("dedup_prefix_jaccard")
    val shuffles = shufflesOf(df)
    // the long-form (doc_id, shk) relation may cross the wire exactly
    // thrice: the df window (hash shk), the rank/pack window (hash
    // doc_id — REUSED by the verify-array aggregation), and the prefix
    // self-join (hash shk). Everything after moves only candidate
    // pairs; with the output orderBy that bounds the plan at 7.
    assert(shuffles.size <= 7,
      s"prefix-Jaccard grew an extra long-form exchange, got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("maximal spans: gram self-join is an equi-join on the 8-byte " +
      "key and the run window is (pair, diagonal)-partitioned") {
    val df = q("dedup_substring_maximal")
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram meeting must be the hash equi-join:\n$plan")
    // both sides are one-row-per-char-offset: a broadcast here is a
    // driver-collect of the corpus (the 100x stress failure mode)
    assert(plan.contains("SortMergeJoin"),
      s"gram self-join must be pinned to sort-merge:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"gram relation must never broadcast:\n$plan")
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"the islands row_number must partition by (id_a, id_b, diag) — " +
        s"a global window here serializes every matched gram:\n$plan")
  }

  test("randomization FDR: the corpus crosses the wire once as m " +
      "group rows (B rides as columns), the BH rank join broadcasts, " +
      "and no global window exists") {
    val df = q("analytics_rand_fdr")
    val plan = planOf(df)
    // the replicate dimension must never become a row multiplier: the
    // only corpus-sized exchange is the single group-by aggregation
    // (plus the bounded post-checkpoint stages); rank + k are m-row
    // broadcast joins
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"the m-row BH rank join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the FDR plan justifies a shuffle join:\n$plan")
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty,
      s"BH ranking must be the bounded self-join, not a window:\n$plan")
  }

  test("mSPRT: every window is partitioned per group on the daily " +
      "relation — the corpus collapses in one aggregation first") {
    val df = q("analytics_msprt")
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "the cumulative/running-max windows must exist")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"an unpartitioned window here serializes the daily relation " +
          s"through one task:\n${w.treeString}")
    }
  }

  test("PSI: bin totals and the drift sum ride broadcasts — no " +
      "shuffle join, no window, one corpus-sized exchange") {
    val df = q("analytics_psi")
    val plan = planOf(df)
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the PSI plan justifies a shuffle join:\n$plan")
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty,
      s"PSI is one aggregation + singleton broadcasts, never a window")
  }

  test("JSD: one corpus exchange, totals and grid terms ride " +
      "broadcasts — no shuffle join, no window (the PSI shape)") {
    val df = q("analytics_jsd")
    val plan = planOf(df)
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the JSD plan justifies a shuffle join:\n$plan")
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "JSD is aggregation + singleton broadcasts")
  }

  test("vocab richness + Heaps: the corpus collapses to the token/" +
      "type relations — no cartesian, no unpartitioned corpus window") {
    Seq("text_vocab_richness", "text_heaps_law").foreach { name =>
      val df = q(name)
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct"),
        s"$name must never go cartesian:\n$plan")
      // heaps' prefix scans are the two-phase bucketed form: any
      // single-partition window may only consume the bucket relation
      val singles = flatten(df.queryExecution.executedPlan)
        .collect { case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w }
      assert(singles.forall(_.child.output.exists(_.name == "_bsum")),
        s"$name: a single-partition window may only consume the " +
          s"bounded bucket-offsets relation:\n$plan")
    }
  }

  test("Kruskal-Wallis: rank joins are equi-joins on the cent key — " +
      "no cartesian, no nested loop; every window is bucket- or " +
      "group-partitioned") {
    val df = q("analytics_kruskal_wallis")
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"the tie-group join must never go cartesian:\n$plan")
    // the only broadcast nested loops allowed are the singleton
    // totals/head broadcasts (1-row relations)
    val bnl = flatten(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    // bounded singleton crossJoins: the prefix-sum hi bound, the
    // (n, k) totals, the (h, dof) head, and the tie row — each a
    // 1-row aggregate, and each may plan TWICE because the broadcast
    // subtree is referenced from two consumers (no reuse exchange for
    // tiny aggregates). The load-bearing ban is the CartesianProduct
    // check above; this bound only pins "a few singletons", never a
    // data-sized nested loop.
    assert(bnl.size <= 8,
      s"only the singleton crossJoins may plan as BNL: ${bnl.size}")
  }

  test("trend test + odds ratio + SRM: one aggregation each — no " +
      "join, no window, nothing corpus-shaped after the group-by") {
    Seq("analytics_trend_test", "analytics_odds_ratio",
        "analytics_srm").foreach { name =>
      val df = q(name)
      val plan = planOf(df)
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("BroadcastHashJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name is aggregation-only — nothing justifies a join:\n$plan")
      val windows = flatten(df.queryExecution.executedPlan)
        .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.isEmpty, s"$name must be window-free")
    }
  }

  test("bootstrap: the replicate explode runs over the AGGREGATED " +
      "buffers, never the corpus (the emb_pca one-pass shape)") {
    // the (rows × B) relation must not exist: every Generate in the
    // plan has to sit ABOVE the typed aggregation — i.e. its subtree
    // contains the aggregate whose (group × 1) packed buffers it
    // unrolls. A Generate whose subtree has no aggregate is exploding
    // raw input rows — the 11.9 s shape this audit retires.
    val df = q("analytics_bootstrap_ci")
    df.collect()
    val gens = flatten(df.queryExecution.executedPlan)
      .collect { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.nonEmpty, "expected the bounded posexplode")
    gens.foreach { g =>
      val sub = flatten(g)
      val hasAgg = sub.exists {
        case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
        case _ => false
      }
      assert(hasAgg,
        s"Generate over un-aggregated input:\n${df.queryExecution.executedPlan}")
    }
  }

  test("span coverage: every sweep window partitions by doc_id") {
    val df = q("dedup_span_coverage")
    df.collect()
    val windows = flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "interval-union sweep must stay per-document:\n" +
        df.queryExecution.executedPlan.toString)
  }
}
