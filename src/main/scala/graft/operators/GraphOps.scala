package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph algorithms expressed as repeated join+aggregate
  * plans — each iteration is one ordinary shuffle-on-key round, which
  * is exactly how Pregel-style systems map onto a relational engine.
  * (Connected components lives in [[Dedup.connectedComponents]] beside
  * its dedup use case.)
  */
object GraphOps {

  /** Exact triangle count by DEGREE-ORDERED edge orientation (the
    * Suri–Vassilvitskii / Cohen MapReduce scheme, public): orient every
    * undirected edge from its lower endpoint to its higher endpoint
    * under the total order π(x) = (deg(x), x), enumerate wedges
    * (a→b, a→c) with π(b) < π(c), and keep those whose closing edge
    * b→c exists. Each triangle's π-smallest vertex is the unique wedge
    * apex, so every triangle is counted exactly once.
    *
    * Why the orientation matters at 100 TB: a raw wedge join explodes
    * on hubs (Σ deg² — the "curse of the last reducer"); orienting by
    * degree bounds every out-degree by O(√m), so the wedge relation is
    * O(m^1.5) worst-case and hub wedges distribute across the ranks
    * that point AT the hub instead of collapsing onto it.
    *
    * Input: directed or undirected `(src, dst)` rows; self-loops and
    * duplicate/reverse edges are normalized away. Output: one row
    * `(n_wedges, n_triangles)` — the wedge count doubles as the join's
    * cost audit. */
  /** The shared degree-ordered wedge machinery of the triangle family
    * ([[triangleCount]] / [[localBridges]] /
    * [[localClusteringCoefficient]]): normalize to distinct undirected
    * edges, compute degrees, orient every edge from its
    * degree-π-smaller endpoint (ties by id), and enumerate each wedge
    * exactly once at its apex. Returns (und(u,v), deg(node,deg),
    * oriented(s,t,tdeg), wedges(a,b,c)) — all lazy plans, so a caller
    * that drops a column pays nothing for it. */
  private def orientedWedges(edges: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.as("du"), col("u") === col("du.node"))
      .join(deg.as("dv"), col("v") === col("dv.node"))
      .select(
        when(col("du.deg") < col("dv.deg") ||
            (col("du.deg") === col("dv.deg") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"),
            col("dv.deg").as("tdeg")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"),
            col("du.deg").as("tdeg"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"),
        col("e.tdeg").as("tdeg"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.tdeg") < col("e2.tdeg") ||
            (col("e1.tdeg") === col("e2.tdeg") &&
              col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("a"), col("e1.t").as("b"),
        col("e2.t").as("c"))
    (und, deg, oriented, wedges)
  }

  def triangleCount(edges: DataFrame): DataFrame = {
    val (_, _, oriented, wedges) = orientedWedges(edges)
    // one pass: flag-join the closing edge (unique after distinct), so
    // wedge count and triangle count come from a single aggregation
    wedges.select(col("b"), col("c"))
      .join(oriented.select(col("s"), col("t"), lit(1L).as("hit")),
        col("b") === col("s") && col("c") === col("t"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        coalesce(sum(col("hit")), lit(0L)).as("n_triangles"))
  }

  /** Local bridges (Granovetter 1973's "weak ties" made structural —
    * public): an edge is a local bridge iff its endpoints share NO
    * common neighbor — removing it leaves no 2-hop detour, so these
    * are the edges that actually connect communities (every
    * triangle-supported edge is redundant at distance 2). Emits every
    * undirected edge with its triangle SUPPORT (how many triangles
    * contain it) and the bridge flag (support = 0).
    *
    * Scale: the [[triangleCount]] degree-oriented wedge plan — each
    * triangle is found exactly once at its π-smallest apex
    * (O(m^1.5) wedges, hub-safe) and then charged to its THREE edges
    * with one explode + one (u, v) aggregation; the raw
    * edge-anchored Σ deg(u) join this replaces collapses on hubs. */
  def localBridges(edges: DataFrame): DataFrame = {
    val (und, _, oriented, wedges) = orientedWedges(edges)
    val tris = wedges.join(oriented.select(col("s"), col("t")),
      col("b") === col("s") && col("c") === col("t"))
    val triEdges = tris.select(explode(array(
        struct(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"),
          greatest(col("a"), col("c")).as("v")),
        struct(least(col("b"), col("c")).as("u"),
          greatest(col("b"), col("c")).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val support = triEdges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("support"))
    und.join(support, Seq("u", "v"), "left_outer")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"),
        (coalesce(col("support"), lit(0L)) === 0L).as("is_bridge"))
  }

  /** Per-node local clustering coefficient (Watts–Strogatz 1998 —
    * public): lcc(v) = 2·T_v / (deg_v·(deg_v−1)) where T_v counts the
    * triangles through v — the node-level refinement of
    * [[triangleCount]]'s global census, the standard "how clique-like
    * is this neighborhood" signal of the small-world literature.
    *
    * Same degree-ordered orientation as triangleCount (each triangle
    * enumerated exactly ONCE, hub wedge volume bounded by the
    * orientation), then each closed wedge explodes into its three
    * member nodes for one per-node count — O(#triangles·3) extra rows,
    * bounded by the wedge census already paid. The coefficient is one
    * integer-operand IEEE divide; nodes of degree < 2 read 0.
    * Output: (node, deg, n_tri, lcc). */
  def localClusteringCoefficient(edges: DataFrame): DataFrame = {
    val (_, deg, oriented, wedges) = orientedWedges(edges)
    val tri = wedges.join(oriented.select(col("s"), col("t")),
        col("b") === col("s") && col("c") === col("t"), "left_semi")
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc",
        when(col("deg") >= 2, (col("n_tri") * 2).cast("double") /
          (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** PageRank, `iters` synchronous iterations, damping `d`:
    * `PR₀ = 1/N`, `PRₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} PRₜ(u)/deg(u)`.
    * Dangling mass (sink nodes) is dropped, not redistributed — the
    * simplest standard variant, chosen so the oracle stays a pure
    * relational recurrence; scores then sum to < 1.
    *
    * Determinism: per-edge contributions are IEEE double ops on
    * identical operands in any engine; the per-node Σ — the one
    * order-sensitive step — accumulates in DECIMAL(38,18), so ranks
    * after every iteration are bit-reproducible (the dsum pattern,
    * see SparkEntry's oracle-parity notes).
    *
    * Scale: each iteration shuffles (edge endpoint, contribution)
    * pairs once and the node list once — O(E+V) per round, no
    * driver-side state beyond the node count. Ranks are
    * `localCheckpoint`ed every iteration so the plan does not deepen
    * geometrically with `iters` (lineage cut = the relational form of
    * Pregel's superstep barrier). */
  def pageRank(edges: DataFrame, iters: Int, d: Double = 0.85,
      checkpoint: Boolean = true): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val nD = nodes.count().toDouble
    val outDeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
    val base = (lit(1.0) - lit(d)) / lit(nD)
    var pr = nodes.select(col("node"), (lit(1.0) / lit(nD)).as("pr"))
    for (_ <- 1 to iters) {
      val sums = edges.join(pr, edges("src") === pr("node"))
        .join(outDeg, "src")
        .select(col("dst"),
          (col("pr") / col("deg").cast("double")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 18))).cast("double").as("s"))
      pr = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(nodes("node"),
          (base + lit(d) * coalesce(col("s"), lit(0.0))).as("pr"))
      if (checkpoint) pr = pr.localCheckpoint(true)
    }
    pr
  }

  /** Synchronous label propagation (Raghavan et al. 2007, public) for
    * community detection: every node starts labeled with its own id;
    * each round, every node adopts the most frequent label among its
    * neighbors, ties broken toward the SMALLEST label — fully
    * deterministic, no random visit order (the async variant's
    * nondeterminism is exactly what an oracle-checked engine can't
    * ship). Returns (node, label) after `iters` rounds.
    *
    * Scale shape per round: one join of the adjacency against the
    * label relation (shuffle on node id), one (node, label) count, one
    * per-node argmax via a single max(struct) aggregation — no window,
    * no sort. Labels localCheckpoint each round (the pageRank
    * superstep-barrier pattern) so lineage stays flat. */
  def labelPropagation(edges: DataFrame, iters: Int,
      checkpoint: Boolean = true): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      val nb = adj.join(labels.withColumnRenamed("node", "_ln"),
          col("nb") === col("_ln"))
        .select(col("node"), col("label"))
      // argmax count, min label on ties: max(struct(c, -label)) — one
      // aggregation, no per-node window sort
      labels = nb.groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      if (checkpoint) labels = labels.localCheckpoint(true)
    }
    labels
  }

  /** Common-neighbor / Jaccard node similarity (the classic
    * link-prediction signal): for every unordered node pair that
    * shares at least one neighbor, the number of common neighbors and
    * the neighborhood Jaccard |Γu ∩ Γv| / |Γu ∪ Γv|.
    *
    * Plan: edges normalize to an undirected adjacency relation; each
    * node w emits its neighbor pairs (u < v) — the wedge relation —
    * and a count-per-pair aggregation IS the common-neighbor count
    * (no pair materialization beyond wedges, no node² blowup).
    * Degrees broadcast-join back in for the union denominator.
    *
    * Scale: wedge volume is Σ_w deg(w)², the same quantity the
    * triangle counter audits. Nodes above `maxDegree` are excluded as
    * wedge APEXES (a hub's deg² pairs would dominate Σd² while a
    * shared hub neighbor carries the weakest similarity signal — the
    * standard big-graph cut, same spirit as the minhash df-cap), so
    * pairs whose only shared neighbors are such hubs drop out and
    * common counts ignore hub-mediated paths; endpoint degrees remain
    * the true degrees. The cap is MANDATORY — a scale-critical cut
    * must be chosen against the corpus's own degree distribution, not
    * a magic default; [[suggestedDegreeCap]] derives one from a
    * degree scan. */
  /** Data-derived wedge-apex cap: 100× the p99.9 of the undirected
    * degree distribution (floor 64) — nodes beyond it are the
    * pathological hub tail (≥100× a high-percentile neighborhood)
    * whose deg² wedges would dominate Σdeg² while contributing the
    * weakest similarity evidence. One aggregation over the DEGREE
    * relation (|nodes| rows, never |edges|²); the percentile is the
    * mergeable approx sketch, the right tool when |nodes| is 10⁹ —
    * exact per-group percentile buffers would not be. The multiplier
    * keeps the cap far above every non-pathological degree, so on
    * corpora without a hub tail the cut is a no-op. */
  def suggestedDegreeCap(edges: DataFrame, quantile: Double = 0.999,
      slack: Long = 100L): Long = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
    val p = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .agg(approx_percentile(col("deg"), lit(quantile), lit(10000))
        .as("p"))
      .head().getLong(0)
    math.max(64L, p * slack)
  }

  /** The wedge-apex relation [[commonNeighborJaccard]] self-joins:
    * symmetric adjacency restricted to apex nodes with degree ≤
    * `maxDegree`. Exposed so the scale harness can count the wedge
    * volume (Σ_apex c·(c−1)/2 over this relation's `node` groups — the
    * exact pre-aggregation join cardinality) on the production
    * relation rather than a reimplementation. */
  def commonNeighborWedgeRelation(edges: DataFrame,
      maxDegree: Long): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    // symmetric adjacency: one row per (node, neighbor) direction
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    adj.join(deg, "node").where(col("deg") <= maxDegree)
      .select(col("node"), col("nb"))
  }

  def commonNeighborJaccard(edges: DataFrame,
      maxDegree: Long): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val small = commonNeighborWedgeRelation(edges, maxDegree)
    val wedges = small.as("a").join(small.as("b"),
        col("a.node") === col("b.node") && col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("id_a"), col("b.nb").as("id_b"))
    wedges.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(deg.select(col("node"), col("deg").as("deg_a")),
        col("id_a") === col("node")).drop("node")
      .join(deg.select(col("node"), col("deg").as("deg_b")),
        col("id_b") === col("node")).drop("node")
      .select(col("id_a"), col("id_b"), col("n_common"),
        col("deg_a"), col("deg_b"),
        (col("n_common").cast("double") /
          (col("deg_a") + col("deg_b") - col("n_common")).cast("double"))
          .as("jaccard"))
  }

  /** Resource-allocation link-prediction index (Zhou, Lü & Zhang,
    * EPJ B 2009 — public): RA(a,b) = Σ_{v ∈ Γ(a)∩Γ(b)} 1/deg(v) — each
    * common neighbor forwards one unit of "resource" split equally
    * among its neighbors, so low-degree witnesses count MORE than
    * hubs. The degree-weighted refinement of [[commonNeighborJaccard]]
    * (and of Adamic–Adar, whose 1/log damping needs libm where 1/deg
    * stays rational), consistently among the strongest local link
    * predictors in the published benchmarks.
    *
    * Same wedge shape and hub-cap economics as commonNeighborJaccard —
    * the apex's 1/deg credit rides INSIDE the wedge join, so one
    * (id_a, id_b) aggregation finishes the job. Credit is the exact
    * integer 10¹² div deg (the [[AnalyticsOps.linearAttribution]]
    * fixed-point trick): the cross-partition sum is integer-exact,
    * no float accumulation order exists, and the oracle replays it
    * digit-for-digit. Output: (id_a, id_b, n_common, ra). */
  def resourceAllocation(edges: DataFrame,
      maxDegree: Long): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val small = commonNeighborWedgeRelation(edges, maxDegree)
      .join(deg, "node")
    val wedges = small.as("a").join(small.as("b"),
        col("a.node") === col("b.node") && col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("id_a"), col("b.nb").as("id_b"),
        expr("1000000000000 div a.deg").as("fp"))
    wedges.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"),
        (sum(col("fp")).cast("double") / lit(1e12)).as("ra"))
  }

  /** Adamic–Adar link-prediction index (Adamic & Adar, Social
    * Networks 2003 — public): AA(a,b) = Σ_{v ∈ Γ(a)∩Γ(b)} 1/ln deg(v)
    * — the logarithmic hub damping between raw common-neighbor counts
    * (no damping) and [[resourceAllocation]]'s 1/deg (aggressive
    * damping). Completes the classical local link-prediction trio
    * beside [[commonNeighborJaccard]] and [[resourceAllocation]].
    *
    * Same wedge shape and hub-cap economics as the other two: the
    * apex's 1/ln(deg) credit rides INSIDE the wedge join, one
    * (id_a, id_b) aggregation finishes the job. Cross-engine
    * determinism uses the [[TextOps.elementEntropy]] log-grid recipe:
    * ln is the one libm call two engines may round differently (last
    * few ulps), so each 1/ln(deg) is QUANTIZED to DECIMAL(14,12)
    * before the exact decimal accumulation — the cross-partition sum
    * is order-free and the oracle replays it digit-for-digit. A wedge
    * apex always has ≥ 2 distinct neighbors, so ln(deg) ≥ ln 2 > 0 and
    * the credit is finite. Output: (id_a, id_b, n_common, aa). */
  def adamicAdar(edges: DataFrame, maxDegree: Long): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val small = commonNeighborWedgeRelation(edges, maxDegree)
      .join(deg, "node")
    val wedges = small.as("a").join(small.as("b"),
        col("a.node") === col("b.node") && col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("id_a"), col("b.nb").as("id_b"),
        (lit(1.0) / log(col("a.deg").cast("double")))
          .cast(DecimalType(14, 12)).as("w"))
    wedges.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"),
        sum(col("w")).cast(DecimalType(24, 12)).cast("double").as("aa"))
  }

  /** k-core membership by synchronous peeling (Seidman 1983; the
    * Batagelj–Zaveršnik sequential algorithm's parallel superstep
    * form): starting from the full undirected graph, every round drops
    * the nodes whose degree in the CURRENT induced subgraph is < k,
    * until `iters` rounds have run. With `iters` ≥ the peeling depth
    * the result is the exact k-core (each round removes at least one
    * node until fixpoint, and a fixpoint is reached as soon as one
    * round removes none). Output: (node, core_deg) for surviving
    * nodes — their degree inside the final subgraph.
    *
    * Scale per round: one degree aggregation + two semi-join filters
    * of the adjacency against the survivor set — O(E) shuffled per
    * round, no driver state; the adjacency localCheckpoints each round
    * (the pageRank superstep-barrier pattern) so lineage stays flat.
    * Peeling depth on real web/social graphs is small (tens); a
    * fixpoint-detecting variant would add one driver-side count per
    * round without changing the per-round plan. */
  def kCore(edges: DataFrame, k: Int, iters: Int,
      checkpoint: Boolean = true): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    var adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
    for (_ <- 1 to iters) {
      val alive = adj.groupBy(col("node"))
        .agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("node"))
      adj = adj.join(alive, "node")
        .join(alive.withColumnRenamed("node", "nb"), "nb")
        .select(col("node"), col("nb"))
      if (checkpoint) adj = adj.localCheckpoint(true)
    }
    adj.groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** Personalized PageRank (Jeh–Widom 2003): random walk with restart
    * INTO the seed set — `PR₀ = 1/|S|` on seeds, 0 elsewhere;
    * `PRₜ₊₁(v) = (1−d)·[v∈S]/|S| + d·Σ_{u→v} PRₜ(u)/deg(u)`. The
    * relevance ranking "near these nodes" that plain PageRank can't
    * express; dangling mass drops exactly as in [[pageRank]] so the
    * oracle stays a pure relational recurrence.
    *
    * Determinism and scale: identical to [[pageRank]] — DECIMAL(38,18)
    * contribution sums, one O(E+V) shuffle round per iteration,
    * localCheckpoint superstep barrier; the seed set rides as a
    * broadcast-joined 0/1 column, never a driver loop. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int, d: Double = 0.85,
      checkpoint: Boolean = true): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val seedSet = nodes.join(seeds.withColumnRenamed("node", "_s"),
        col("node") === col("_s"))
      .select(col("node"))
    val sD = seedSet.count().toDouble
    val outDeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
    val withSeed = nodes
      .join(seedSet.withColumn("_is", lit(1.0)),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("_is"), lit(0.0)).as("is_seed"))
    var pr = withSeed.select(col("node"),
      (col("is_seed") / lit(sD)).as("pr"))
    for (_ <- 1 to iters) {
      val sums = edges.join(pr, edges("src") === pr("node"))
        .join(outDeg, "src")
        .select(col("dst"),
          (col("pr") / col("deg").cast("double")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 18))).cast("double")
          .as("s"))
      pr = withSeed.join(sums, withSeed("node") === sums("dst"), "left")
        .select(withSeed("node"),
          ((lit(1.0) - lit(d)) * col("is_seed") / lit(sD) +
            lit(d) * coalesce(col("s"), lit(0.0))).as("pr"))
      if (checkpoint) pr = pr.localCheckpoint(true)
    }
    pr
  }

  /** HITS hubs & authorities (Kleinberg 1999, the JACM paper): on the
    * DIRECTED edge relation, iterate
    * `auth(v) = Σ_{u→v} hub(u)`, `hub(u) = Σ_{u→v} auth(v)`,
    * L1-normalizing each vector after its update (the sum norm keeps
    * the arithmetic a plain positive sum — no sqrt inside the
    * fixpoint, so every intermediate is an order-independent
    * DECIMAL(38,18) accumulation cast back to double, exactly the
    * [[pageRank]] determinism recipe).
    *
    * Scale per iteration: two edge⋈score shuffles (on src, then dst)
    * plus two scalar normalization aggregates broadcast back — O(E+V)
    * rounds with a localCheckpoint superstep barrier, no driver state
    * beyond the two scalar norms. */
  def hits(edges: DataFrame, iters: Int,
      checkpoint: Boolean = true): DataFrame = {
    val dedup = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = dedup.select(col("src").as("node"))
      .union(dedup.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    def l1normalize(scores: DataFrame, c: String): DataFrame = {
      val norm = scores.agg(
        sum(col(c).cast(DecimalType(38, 18))).cast("double").as("_n"))
      scores.crossJoin(broadcast(norm))
        .select(col("node"), (col(c) / col("_n")).as(c))
    }
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
    var auth = nodes.select(col("node"), lit(1.0).as("auth"))
    for (_ <- 1 to iters) {
      val aRaw = dedup.join(hub, dedup("src") === hub("node"))
        .groupBy(col("dst"))
        .agg(sum(col("hub").cast(DecimalType(38, 18))).cast("double")
          .as("s"))
      auth = l1normalize(
        nodes.join(aRaw, nodes("node") === aRaw("dst"), "left_outer")
          .select(nodes("node"), coalesce(col("s"), lit(0.0)).as("auth")),
        "auth")
      if (checkpoint) auth = auth.localCheckpoint(true)
      val hRaw = dedup.join(auth, dedup("dst") === auth("node"))
        .groupBy(col("src"))
        .agg(sum(col("auth").cast(DecimalType(38, 18))).cast("double")
          .as("s"))
      hub = l1normalize(
        nodes.join(hRaw, nodes("node") === hRaw("src"), "left_outer")
          .select(nodes("node"), coalesce(col("s"), lit(0.0)).as("hub")),
        "hub")
      if (checkpoint) hub = hub.localCheckpoint(true)
    }
    hub.join(auth, "node")
      .select(col("node"), col("hub"), col("auth"))
  }

  /** Multi-source BFS hop distance (the frontier-relaxation form of
    * parallel breadth-first search): distance 0 on the seed set, and
    * each round relaxes `dist(v) = min(dist(v), 1 + min_{u∼v} dist(u))`
    * over the UNDIRECTED adjacency. After `iters` rounds every node
    * within `iters` hops of a seed carries its exact hop distance;
    * unreached nodes are absent (the caller left-joins if it wants
    * nulls). Integer-only arithmetic — bit-exact on any engine.
    *
    * Scale per round: one adjacency⋈frontier shuffle plus a min
    * aggregation — O(E) per round, localCheckpoint superstep barrier,
    * no driver state. FIXPOINT early exit: with unit hops a node's
    * first-assigned distance is already minimal, so the reached-node
    * count grows strictly until the frontier dies — when a round
    * reaches nobody new, every remaining round is a provable no-op
    * and the loop stops (`iters` stays the hard cap for graphs whose
    * eccentricity exceeds it). The count IS the superstep barrier: the
    * per-round localCheckpoint is LAZY and the count() materializes
    * it — one action per round exactly as before, with the fixpoint
    * signal riding the job that already had to run. With
    * checkpoint=false there is no per-round barrier to read a signal
    * from (forcing one would evaluate the uncheckpointed lineage
    * O(iters²)), so the loop runs the full cap — the old behavior.
    * (For high-diameter graphs swap in pointer doubling; web/social
    * corpora sit at diameter ≲ 20.) */
  def shortestHops(edges: DataFrame, seeds: DataFrame,
      iters: Int, checkpoint: Boolean = true): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
      .localCheckpoint(true)
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
    var reached = -1L
    var round = 0
    var fixed = false
    while (round < iters && !fixed) {
      round += 1
      val relaxed = adj.join(dist, adj("nb") === dist("node"))
        .select(adj("node"), (col("dist") + lit(1L)).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      if (checkpoint) {
        dist = dist.localCheckpoint(false)
        // one RDD-level count materializes the lazy checkpoint AND
        // reads the fixpoint signal — one job per round, no extra
        // Catalyst query for the signal
        val n = dist.queryExecution.toRdd.count()
        if (n == reached) fixed = true else reached = n
      }
    }
    dist
  }

  /** Double-sweep diameter lower bound (Magnien, Latapy & Habib 2009
    * — public): the two-BFS estimate that is exact on trees and
    * empirically tight on real graphs — BFS from any node, then BFS
    * again from the farthest node found; the second eccentricity
    * lower-bounds the diameter. Each sweep is [[shortestHops]]'s
    * superstep plan capped at `iters` hops (the cap bounds the
    * answer: a capped sweep reports min(ecc, iters) — size iters to
    * the expected radius). The two argmax reads are 1-row
    * TakeOrdered collects with (dist desc, node asc) tie-breaks —
    * deterministic everywhere. Output one row:
    * (seed, ecc1, far1, diameter_lb, far2, n_reached). */
  def doubleSweepDiameter(edges: DataFrame, iters: Int): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val nodes = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node"))).distinct()
    val s0 = nodes.agg(min(col("node")).as("node"))
    val d1 = shortestHops(edges, s0, iters)
    val f1 = d1.orderBy(col("dist").desc, col("node").asc).limit(1)
      .select(col("node").as("far1"), col("dist").as("ecc1"))
    val d2 = shortestHops(edges,
      f1.select(col("far1").as("node")), iters)
    val f2 = d2.orderBy(col("dist").desc, col("node").asc).limit(1)
      .select(col("node").as("far2"), col("dist").as("diameter_lb"))
    val reach = d2.agg(count(lit(1)).as("n_reached"))
    s0.select(col("node").as("seed"))
      .crossJoin(broadcast(f1)).crossJoin(broadcast(f2))
      .crossJoin(broadcast(reach))
      .select(col("seed"), col("ecc1"), col("far1"),
        col("diameter_lb"), col("far2"), col("n_reached"))
  }

  /** Harmonic closeness centrality from a LANDMARK sample (Boldi &
    * Vigna 2014 form: Σ 1/d over reached nodes — finite under
    * disconnection, unlike classic closeness): per-source BFS to
    * `iters` hops, then the reciprocal-distance sum. Exact under
    * cross-engine hashing because 1/d is taken as the INTEGER
    * 10¹²-scaled quotient (10¹² div d) — the sum is integer
    * arithmetic, divided back to a double once at the end.
    *
    * Per-source frontiers ride one relation keyed (source, node), so
    * k landmarks cost k× one BFS's shuffle volume — the standard
    * sampling regime (k ≪ n picked landmarks approximate the full
    * centrality ranking; exact all-pairs would be O(n·E) and is the
    * wrong tool at 100 TB). Output: (source, n_reached, harmonic). */
  def harmonicCloseness(edges: DataFrame, seeds: DataFrame,
      iters: Int, checkpoint: Boolean = true): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val adj = und.select(col("u").as("node"), col("v").as("nb"))
      .union(und.select(col("v").as("node"), col("u").as("nb")))
      .localCheckpoint(true)
    var dist = seeds.select(col("node")).distinct()
      .select(col("node").as("source"), col("node"), lit(0L).as("dist"))
    // the same lazy-checkpoint-materializing fixpoint early exit as
    // shortestHops, per (source, node)
    var reached = -1L
    var round = 0
    var fixed = false
    while (round < iters && !fixed) {
      round += 1
      val relaxed = adj.join(dist, adj("nb") === dist("node"))
        .select(col("source"), adj("node").as("node"),
          (col("dist") + lit(1L)).as("dist"))
      dist = dist.select(col("source"), col("node"), col("dist"))
        .union(relaxed)
        .groupBy(col("source"), col("node"))
        .agg(min(col("dist")).as("dist"))
      if (checkpoint) {
        dist = dist.localCheckpoint(false)
        val n = dist.queryExecution.toRdd.count()
        if (n == reached) fixed = true else reached = n
      }
    }
    dist.where(col("dist") > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000000000 div dist")).as("fp"))
      .select(col("source"), col("n_reached"),
        (col("fp").cast("double") / lit(1e12)).as("harmonic"))
  }

  /** Newman–Girvan modularity of a node partition: per community c,
    * the contribution e_c/m − (d_c/(2m))² where e_c = intra-community
    * edges, d_c = Σ degrees of c's members, m = |undirected edges|;
    * Q is the sum over communities. The quality score that makes a
    * community detector (e.g. [[labelPropagation]]) auditable — a
    * partition with Q ≈ 0 is no better than random.
    *
    * `labels` is any (node, label) relation. Every statistic is an
    * exact integer count; the contribution is a fixed IEEE expression
    * over (e_c, d_c, m). Unlabeled nodes' edges count toward m (the
    * graph's, not the partition's) but belong to no community.
    *
    * Scale: degree and intra-edge counts are two label-keyed joins +
    * aggregations of the edge relation; m broadcasts as one row. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    val m = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val lab = labels.select(col("node"), col("label"))
    val dc = deg.join(lab, "node")
      .groupBy(col("label")).agg(sum(col("deg")).as("d_c"))
    val intra = und
      .join(lab.select(col("node").as("u"), col("label").as("lu")), "u")
      .join(lab.select(col("node").as("v"), col("label").as("lv")), "v")
      .where(col("lu") === col("lv"))
      .groupBy(col("lu").as("label")).agg(count(lit(1)).as("e_c"))
    dc.join(intra, Seq("label"), "left_outer")
      .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
      .crossJoin(broadcast(m))
      .select(col("label"), col("e_c"), col("d_c"),
        (col("e_c").cast("double") / col("m").cast("double") -
          (col("d_c").cast("double") /
            (lit(2.0) * col("m").cast("double"))) *
          (col("d_c").cast("double") /
            (lit(2.0) * col("m").cast("double"))))
          .as("contribution"))
  }

  /** Degree assortativity coefficient (Newman 2002, public): Pearson
    * correlation of the endpoint degrees over all edge STUBS (each
    * undirected edge counted in both directions — the standard
    * convention, which also makes the statistic symmetric). r > 0:
    * hubs attach to hubs (social graphs); r < 0: hubs attach to leaves
    * (web/biology/our halving trees).
    *
    * Exact arithmetic end to end: degrees are integers, every power
    * sum accumulates in DECIMAL(38,0) (deg ≤ n ⇒ Σ deg⁴-scale terms
    * wrap a long long before they wrap the decimal), and the final
    * Pearson form is evaluated in IEEE doubles in a pinned term order.
    * Cost at 100 TB: one degree agg + one join of edges to the degree
    * relation — the same two shuffles any degree statistic costs; no
    * per-node window, no wedge blowup. Output one row
    * (n_edges, n_stubs, assortativity). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val pairs = und
      .join(deg.as("da"), col("u") === col("da.node"))
      .join(deg.as("db"), col("v") === col("db.node"))
      .select(col("da.deg").cast(DecimalType(19, 0)).as("dx"),
        col("db.deg").cast(DecimalType(19, 0)).as("dy"))
    val stubs = pairs.union(
      pairs.select(col("dy").as("dx"), col("dx").as("dy")))
    val d = DecimalType(38, 0)
    stubs.agg(
        count(lit(1)).as("cnt"),
        sum(col("dx")).cast("double").as("sx"),
        sum(col("dy")).cast("double").as("sy"),
        sum((col("dx") * col("dy")).cast(d)).cast("double").as("sxy"),
        sum((col("dx") * col("dx")).cast(d)).cast("double").as("sxx"),
        sum((col("dy") * col("dy")).cast(d)).cast("double").as("syy"))
      .select(
        (col("cnt") / 2).cast("long").as("n_edges"),
        col("cnt").as("n_stubs"),
        ((col("cnt").cast("double") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("cnt").cast("double") * col("sxx") -
              col("sx") * col("sx")) *
            (col("cnt").cast("double") * col("syy") -
              col("sy") * col("sy")))).as("assortativity"))
  }

  /** Truncated Katz centrality (Katz 1953 — public):
    * x = Σ_{k ≤ K} βᵏ·(Aᵀ)ᵏ·1, iterated as x ← β·(Aᵀx) + 1 from
    * x = 1 — every walk of length ≤ K into a node counts, attenuated
    * βᵏ. β = ½ keeps each attenuation an EXACT halving and the
    * per-node sums order-independent DECIMAL(38,18) accumulations
    * (the [[pageRank]] determinism recipe), so the truncated series
    * is bit-reproducible cross-engine with no libm. K bounds the walk
    * length instead of iterating to the fixpoint — the deliberate
    * trade that keeps the operator a fixed number of supersteps
    * (document: with β < 1/λ_max the tail is geometric, so K=4
    * carries all but β⁵/(1−β) of the mass).
    *
    * Scale per iteration: one edge⋈score shuffle + one aggregation —
    * O(E+V) per superstep with a localCheckpoint barrier, the
    * [[personalizedPageRank]] shape. */
  def katzCentrality(edges: DataFrame, iters: Int, beta: Double = 0.5,
      checkpoint: Boolean = true): DataFrame = {
    val dedup = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = dedup.select(col("src").as("node"))
      .union(dedup.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var x = nodes.select(col("node"), lit(1.0).as("katz"))
    for (_ <- 1 to iters) {
      val sums = dedup.join(x, dedup("src") === x("node"))
        .groupBy(col("dst"))
        .agg(sum(col("katz").cast(DecimalType(38, 18))).cast("double")
          .as("s"))
      x = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(nodes("node"),
          (lit(beta) * coalesce(col("s"), lit(0.0)) + lit(1.0))
            .as("katz"))
      if (checkpoint) x = x.localCheckpoint(true)
    }
    x
  }
}
