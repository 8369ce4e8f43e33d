package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operators Spark's DataFrame API lacks as single verbs,
  * composed from built-ins so Catalyst keeps optimizing around them
  * (survey §2.3 note: the reference has no as-of/range joins, but a
  * complete engine offers them).
  *
  * Scale design: `asofBackward` is the union+window formulation — ONE
  * shuffle on the key, a per-partition sort, and no candidate-pair
  * explosion. The naive range-join (`l.ts >= r.ts` theta join) produces
  * O(|left|·|matches|) intermediate rows; this produces |left|+|right|
  * rows total, which is the difference between finishing and OOM at
  * 100 TB. Hot-key skew is the caveat — salt the key upstream
  * (SkewOps) if one entity dominates the log.
  */
object RelationalOps {

  /** Backward as-of join: for every left row, the latest right `pick`
    * value with `right.ts <= left.ts` on the same `key` (NULL when no
    * prior right row). Ties on right `ts` resolve to the largest
    * `pick` value — pinned so results are deterministic.
    *
    * Both inputs must carry `key` and `ts` columns; the left side's
    * other columns pass through unchanged.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      ts: String, pick: String, outCol: String): DataFrame = {
    val r = right.select(col(key), col(ts), col(pick).as("_pick"))
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    // rows frame up to self: right rows sort before left rows at equal
    // ts (_side 0 < 1), so "<= ts" matches are always inside the frame
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc, col("_pick").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol,
        last(when(col("_side") === 0, col("_pick")), ignoreNulls = true)
          .over(w))
      .where(col("_side") === 1)
      .drop("_side", "_pick")
  }

  /** Backward as-of join with a TOLERANCE (pandas `merge_asof
    * tolerance=` semantics): the nearest preceding right row matches
    * only if it lies within `tolSeconds` of the left timestamp;
    * otherwise the left row gets NULL — it does NOT fall back to an
    * even older row. Same one-shuffle union+window shape as
    * [[asofBackward]]; the matched row's own timestamp rides along in
    * a second window expression over the SAME frame (so both exprs
    * resolve to the same right row, one sort), and the tolerance is an
    * exact integer comparison on epoch micros. */
  def asofBackwardWithin(left: DataFrame, right: DataFrame, key: String,
      ts: String, pick: String, outCol: String,
      tolSeconds: Long): DataFrame = {
    val r = right.select(col(key), col(ts), col(pick).as("_pick"))
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc, col("_pick").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_mpick",
        last(when(col("_side") === 0, col("_pick")), ignoreNulls = true)
          .over(w))
      .withColumn("_mts",
        last(when(col("_side") === 0, col(ts)), ignoreNulls = true)
          .over(w))
      .withColumn(outCol,
        when(unix_micros(col(ts)) - unix_micros(col("_mts")) <=
          tolSeconds * 1000000L, col("_mpick")))
      .where(col("_side") === 1)
      .drop("_side", "_pick", "_mpick", "_mts")
  }

  /** Forward as-of: for each left row, the FIRST right row per key with
    * `right.ts >= left.ts` — the mirror of [[asofBackward]], same
    * union+window shape: ONE shuffle, no range-explosion theta join.
    * At equal ts the right row matches (left sorts before right), and
    * among equal-ts right rows the smallest `pick` wins — pinned for
    * determinism. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, pick: String, outCol: String): DataFrame = {
    val r = right.select(col(key), col(ts), col(pick).as("_pick"))
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    // frame from self onward: left rows sort before right rows at equal
    // ts (_side 1 > 0, desc), so ">= ts" matches are inside the frame
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").desc, col("_pick").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol,
        first(when(col("_side") === 0, col("_pick")), ignoreNulls = true)
          .over(w))
      .where(col("_side") === 1)
      .drop("_side", "_pick")
  }

  /** Nearest as-of: for each left row, the right row per key whose
    * timestamp is CLOSEST in either direction (pandas `merge_asof
    * direction='nearest'`); exact distance ties go to the earlier
    * (backward) row, and among multiple right rows sharing the
    * nearest timestamp BOTH directions resolve to the smallest
    * `pick` (the backward window orders `_pick` desc so its `last()`
    * lands on the minimum, mirroring the forward `first()`) — so the
    * choice is symmetric and deterministic even when `pick` is not
    * functionally dependent on (key, ts). Same union shape as
    * [[asofBackward]]/[[asofForward]] — both
    * directions resolve over ONE hash partitioning (the second window
    * re-sorts within partitions but reuses the exchange), so the cost
    * is one shuffle plus one extra in-partition sort, never a
    * range-explosion theta join. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, pick: String, outCol: String): DataFrame = {
    val r = right.select(col(key), col(ts), col(pick).as("_pick"))
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    val wb = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc, col("_pick").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").desc, col("_pick").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bMatch = (c: Column) =>
      last(when(col("_side") === 0, c), ignoreNulls = true).over(wb)
    val fMatch = (c: Column) =>
      first(when(col("_side") === 0, c), ignoreNulls = true).over(wf)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_bp", bMatch(col("_pick")))
      .withColumn("_bt", bMatch(col(ts)))
      .withColumn("_fp", fMatch(col("_pick")))
      .withColumn("_ft", fMatch(col(ts)))
      .withColumn(outCol,
        when(col("_bt").isNull, col("_fp"))
          .when(col("_ft").isNull, col("_bp"))
          .when(unix_micros(col(ts)) - unix_micros(col("_bt")) <=
            unix_micros(col("_ft")) - unix_micros(col(ts)), col("_bp"))
          .otherwise(col("_fp")))
      .where(col("_side") === 1)
      .drop("_side", "_pick", "_bp", "_bt", "_fp", "_ft")
  }

  /** Forward fill: latest non-null `value` per `key` up to each row in
    * `order` — the standard time-series gap-fill step after a spine
    * left-join. One shuffle on `key`. */
  def forwardFill(df: DataFrame, key: String, order: String,
      value: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(col(value), ignoreNulls = true).over(w))
  }

  /** Blocked fuzzy entity matching — the classic entity-resolution
    * shape: a cheap equality BLOCK key (nation, zip prefix, phonetic
    * code…) bounds the candidate space, then exact Levenshtein verifies
    * within each block. The n² cost the naive fuzzy join pays becomes
    * Σ m_block² — the same blocking idea as SemDeDup's cells and LSH's
    * buckets, applied to relational string identity.
    *
    * One shuffle on the block key; the edit-distance verify runs only
    * inside blocks. Skewed blocks are the documented failure mode (a
    * block holding half the table is n²/4 again) — cap block size
    * upstream or refine the key. Output: (id_a, id_b, dist ≤ maxDist),
    * id_a < id_b. */
  def blockedFuzzyMatches(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    val slim = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(nameCol).as("nm"))
    slim.as("a").join(slim.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Edit-distance-1 fuzzy matching via DELETION NEIGHBORHOODS (the
    * FastSS / SymSpell family — public): two strings within Levenshtein
    * distance 1 necessarily share a member of their deletion
    * neighborhoods (the string itself plus every single-character
    * deletion — substitution at i ⟹ both del_i variants equal; indel ⟹
    * one string IS a deletion variant of the other), so candidate pairs
    * come from an inverted-index self-join on variant hashes instead of
    * the all-pairs scan [[blockedFuzzyMatches]] does per block. The
    * superset candidates (variant collisions at distance 2, e.g.
    * del_i(a) = del_j(b)) are removed by the exact Levenshtein verify,
    * making the result IDENTICAL to the brute per-block scan at
    * maxDist = 1.
    *
    * Cost: |s|+1 variant keys per row (8-byte hashes on the shuffle,
    * never the variants) and a join whose width is the variant-bucket
    * size — near-identical strings only — vs. block² comparisons. On
    * uniform-ID corpora (codes, SKUs, names) this is the difference
    * between minutes and seconds per block; a variant bucket shared by
    * a large fraction of the corpus (single-char strings, constant
    * fields) is the residual hot-key caveat, answered by a df-cap as
    * in the shingle indexes. */
  def blockedFuzzyMatchesD1(df: DataFrame, idCol: String,
      nameCol: String, blockCol: String): DataFrame = {
    val slim = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(nameCol).as("nm"))
    val delVariants = transform(sequence(lit(1), length(col("nm"))),
      i => concat(col("nm").substr(lit(1), i - lit(1)),
        col("nm").substr(i + lit(1), length(col("nm")))))
    val v = slim
      .select(col("blk"), col("id"), col("nm"),
        explode(array_distinct(
          concat(array(col("nm")), delVariants))).as("vkey"))
      .select(col("blk"), col("id"), col("nm"),
        xxhash64(col("vkey")).as("vk"))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.vk") === col("b.vk") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.nm").as("nm_a"), col("b.nm").as("nm_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b")).as("dist"))
      .where(col("dist") <= 1)
  }

  /** Linear interpolation fill over a date spine: a null `value` BETWEEN
    * two known points gets the straight-line value
    * `prev + (next − prev) · Δprev/Δspan`; nulls before the first or
    * after the last known point stay null (no extrapolation — that is
    * [[forwardFill]]'s job). The standard resampling companion to
    * gap-fill for numeric sensor/metric series.
    *
    * Scale: one shuffle on `key`; four window functions over the same
    * (key, order) frame pair (prev/next value and their dates), linear
    * per partition. Float parity: the interpolation is four IEEE ops on
    * doubles with day-deltas as exact small integers, so any engine
    * mirroring the expression reproduces it bit-for-bit. */
  def linearInterpolate(df: DataFrame, key: String, order: String,
      value: String, outCol: String): DataFrame = {
    val back = Window.partitionBy(key).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(key).orderBy(col(order))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val knownDay = when(col(value).isNotNull, col(order))
    val out = df
      .withColumn("_pv", last(col(value), ignoreNulls = true).over(back))
      .withColumn("_pd", last(knownDay, ignoreNulls = true).over(back))
      .withColumn("_nv", first(col(value), ignoreNulls = true).over(fwd))
      .withColumn("_nd", first(knownDay, ignoreNulls = true).over(fwd))
      .withColumn(outCol,
        when(col(value).isNotNull, col(value).cast("double"))
          .when(col("_pv").isNotNull && col("_nv").isNotNull,
            col("_pv").cast("double") +
              (col("_nv").cast("double") - col("_pv").cast("double")) *
              (datediff(col(order), col("_pd")).cast("double") /
                datediff(col("_nd"), col("_pd")).cast("double"))))
    out.drop("_pv", "_pd", "_nv", "_nd")
  }

  /** SCD-type-2 interval builder: collapse an event log `(key, ts,
    * state)` into per-key validity intervals — one row per maximal run
    * of consecutive equal states, with `valid_from` (run's first ts),
    * `valid_to` (next run's first ts; NULL on the open current run),
    * `is_current`, and the run's event count. The standard
    * dimension-history build: change points via `lag`, run ids via a
    * running sum of change flags, one row per run, `lead` for the
    * closing bound.
    *
    * Scale: everything is partitioned by `key` — two window passes and
    * a groupBy, no self-join against the log (the naive "match each
    * event with the next different one" formulation is a range
    * self-join that explodes on hot keys). Determinism: rows are
    * ordered by `(ts, state)` within key, so equal-ts ties resolve the
    * same way on every run. */
  def scd2Intervals(df: DataFrame, key: String, ts: String,
      state: String): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy(col(ts), col(state))
    val runs = df
      .withColumn("_chg",
        when(lag(col(state), 1).over(wOrd).isNull ||
          lag(col(state), 1).over(wOrd) =!= col(state), 1).otherwise(0))
      .withColumn("_run", sum(col("_chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-run rollup as a (key, _run) window, NOT a groupBy: hash
    // partitioning on `key` already clusters (key, _run), so this whole
    // chain is ONE shuffle — a groupBy(key, _run) would re-exchange on
    // the composite key. The run's first event (_chg = 1) is its
    // surviving interval row.
    val wRun = Window.partitionBy(col(key), col("_run"))
    val wNext = Window.partitionBy(key).orderBy(col("_run"))
    runs
      .withColumn("n_events", count(lit(1)).over(wRun))
      .where(col("_chg") === 1) // the run's first event: its ts IS valid_from
      .withColumn("valid_to", lead(col(ts), 1).over(wNext))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col(state).as("state"),
        col(ts).as("valid_from"), col("n_events"), col("valid_to"),
        col("is_current"))
  }

  /** Snapshot diff (CDC derivation): given two keyed snapshots of the
    * same table, emit one row per changed key with
    * `op ∈ {insert, update, delete}` plus the old/new value of every
    * compared column (`old_<c>` / `new_<c>`; absent side → NULL).
    * Inserts are keys only in `newSnap`, deletes only in `oldSnap`,
    * updates are keys in both where ANY compared column differs
    * null-safely (`IS DISTINCT FROM`); unchanged keys are dropped.
    * This is how an incremental pipeline turns periodic full dumps
    * into a change stream without the source emitting one.
    *
    * Scale: ONE full-outer hash join on the key — each side shuffles
    * once (zero shuffles if both snapshots are bucketed on the key),
    * and the unchanged bulk (normally ~all of a 100 TB snapshot pair)
    * is filtered in the join's own stage before anything downstream
    * sees it. Presence is detected with per-side marker literals, not
    * key-null checks, so NULLs in compared columns stay legitimate
    * values. Keys must be non-null (snapshot keys are primary keys).
    */
  /** Interval-overlap join via bin decomposition — the scale-safe form
    * of the theta join `l.s <= r.e AND r.s <= l.e` (closed integral
    * intervals). Each interval explodes to the fixed-width bins it
    * covers, overlap candidates meet on an EQUI join over the bin id,
    * and a pair is kept only in the LATER of the two start bins —
    * every overlapping pair shares that bin, so the output is exact
    * and duplicate-free with no distinct step.
    *
    * Scale: Spark plans a raw interval theta join as a broadcast
    * nested loop (quadratic, undistributable when neither side fits
    * a broadcast); the bin key turns it into an ordinary hash join
    * whose shuffle is |rows| × (span/binWidth + 1). Pick binWidth
    * near the typical interval span: row expansion stays ~2× while
    * each bin holds only temporally-local rows — same candidate-
    * bucket shape as the LSH band join. Long outlier intervals fatten
    * their bin count, not the join's skew, because bins stay uniform.
    *
    * Inputs carry (`idCol`, `sCol`, `eCol`); output: both ids, both
    * intervals, and the overlap length in the same integral units. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      binWidth: Long, idCol: String = "id", sCol: String = "s",
      eCol: String = "e"): DataFrame = {
    require(binWidth > 0)
    // integral floor-division bins (non-negative domain): exact, no
    // IEEE rounding at bin edges
    def binned(df: DataFrame, side: String) = df.select(
        col(idCol).as(s"${side}_id"), col(sCol).as(s"${side}_s"),
        col(eCol).as(s"${side}_e"))
      .withColumn("bin", explode(sequence(
        expr(s"${side}_s div $binWidth"), expr(s"${side}_e div $binWidth"))))
    binned(left, "l").join(binned(right, "r"), Seq("bin"))
      .where(col("l_s") <= col("r_e") && col("r_s") <= col("l_e") &&
        col("bin") === greatest(expr(s"l_s div $binWidth"),
          expr(s"r_s div $binWidth")))
      .select(col("l_id"), col("r_id"), col("l_s"), col("l_e"),
        col("r_s"), col("r_e"),
        (least(col("l_e"), col("r_e")) -
          greatest(col("l_s"), col("r_s")) + lit(1L)).as("overlap"))
  }

  /** Incremental aggregate maintenance: apply a [[snapshotDiff]] change
    * stream to stored per-key (cnt, sm) aggregate state, producing the
    * state the FULL aggregation of the new snapshot would produce —
    * without rescanning it. Handles group migration (an update whose
    * group key changed debits the old group and credits the new one)
    * and drops groups whose count reaches zero.
    *
    * `baseAgg` must carry (`key`, cnt: long, sm: DECIMAL-accumulated
    * sum). Keeping stored sums DECIMAL is what makes incremental
    * maintenance EXACT: old + delta telescopes to the new sum with no
    * float drift, so a maintained aggregate is bit-identical to a
    * recompute — re-runnable forever. (A double-typed state would
    * diverge by accumulated rounding after enough increments.) The
    * output keeps the decimal sum; callers cast at the edge.
    *
    * Scale: the diff (changed keys only — normally a sliver of a
    * 100 TB snapshot) aggregates per key in one shuffle, then meets
    * the base state in a second key-partitioned aggregation whose
    * per-key input is exactly two rows. The full history is never
    * touched — this is the batch twin of streaming state-store
    * maintenance, and the reason CDC pipelines keep partial
    * aggregates, not raw history, as their hot state.
    */
  def applyDiffToSumCount(baseAgg: DataFrame, diff: DataFrame,
      key: String, value: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val removed = diff
      .where(col("op").isin("delete", "update"))
      .select(col(s"old_$key").as(key), lit(-1L).as("cnt"),
        (-coalesce(col(s"old_$value"), lit(0.0))).cast(dec).as("d"))
    val added = diff
      .where(col("op").isin("insert", "update"))
      .select(col(s"new_$key").as(key), lit(1L).as("cnt"),
        coalesce(col(s"new_$value"), lit(0.0)).cast(dec).as("d"))
    val deltas = removed.unionByName(added)
      .groupBy(col(key))
      .agg(sum(col("cnt")).as("cnt"), sum(col("d")).as("sm"))
    baseAgg.select(col(key), col("cnt"), col("sm").cast(deltas.schema("sm")
        .dataType).as("sm"))
      .unionByName(deltas)
      .groupBy(col(key))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sm")).as("sm"))
      .where(col("cnt") > 0)
  }

  /** Incremental maintenance of a keyed equi-join view
    * V = A ⋈_{A.fk = B.k} B, keyed by A's primary key (each A row has
    * at most one B partner — the fact⋈dim shape): given the OLD view
    * and the two side deltas (as [[snapshotDiff]] relations), rebuild
    * ONLY the affected view keys and splice them in. Affected =
    * A-delta keys ∪ A rows whose fk hits a changed B key; everything
    * else is carried over untouched by an anti-join.
    *
    * Scale contract: work is proportional to |ΔA| + |ΔB| + |A rows
    * referencing ΔB| + one keyed anti-join/union against the view —
    * never a re-join of the full base tables. The changed-B key set
    * broadcasts (deltas are small by definition — a delta the size of
    * the dim table IS a full refresh); the rebuild join touches B only
    * through `bNew`, pruned by the affected semi-join. Deletes fall
    * out for free: a deleted A row rebuilds to nothing, a deleted B
    * row drops its referencing A rows from the inner join. */
  def maintainJoinView(viewOld: DataFrame, aNew: DataFrame,
      bNew: DataFrame, aDelta: DataFrame, bDelta: DataFrame,
      aKey: String, fkCol: String, bKey: String): DataFrame = {
    val aTouched = aDelta.select(col(aKey)).distinct()
    val bTouched = bDelta.select(col(bKey)).distinct()
    val viaB = aNew.join(broadcast(bTouched),
        aNew(fkCol) === bTouched(bKey), "left_semi")
      .select(col(aKey))
    val affected = aTouched.union(viaB).distinct()
    val rebuilt = aNew.join(affected, Seq(aKey), "left_semi")
      .join(bNew, aNew(fkCol) === bNew(bKey))
      .select(viewOld.columns.map(col): _*)
    viewOld.join(affected, Seq(aKey), "left_anti").unionByName(rebuilt)
  }

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"old_$c")) :+
        lit(1).as("_old_present"): _*)
    val n = newSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"new_$c")) :+
        lit(1).as("_new_present"): _*)
    val joined = o.join(n, keys, "full_outer")
    val differs = compare
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("op",
        when(col("_old_present").isNull, lit("insert"))
          .when(col("_new_present").isNull, lit("delete"))
          .when(differs, lit("update")))
      .where(col("op").isNotNull)
      .drop("_old_present", "_new_present")
  }

  /** Adapt a LogStore change feed (rows stamped `_change_type` /
    * `_commit_version` — see `LogStore.readChanges`) to the
    * [[snapshotDiff]] relation shape, so the incremental maintainers
    * ([[applyDiffToSumCount]], the streaming CDC family) consume the
    * table's OWN feed instead of diffing two full snapshots —
    * O(changed rows) per sync, not O(table). update pre/post images
    * pair up on the table's primary key WITHIN their commit (the only
    * pairing that is unique when several rows of one group change in
    * one commit); multi-commit feeds telescope under the additive
    * maintainers exactly like a composed diff. */
  def cdcToDiff(changes: DataFrame, idCol: String, key: String,
      value: String): DataFrame = {
    val nullK = lit(null).cast(changes.schema(key).dataType)
    val nullV = lit(null).cast(changes.schema(value).dataType)
    val ins = changes.where(col("_change_type") === "insert")
      .select(lit("insert").as("op"), nullK.as(s"old_$key"),
        nullV.as(s"old_$value"), col(key).as(s"new_$key"),
        col(value).as(s"new_$value"))
    val del = changes.where(col("_change_type") === "delete")
      .select(lit("delete").as("op"), col(key).as(s"old_$key"),
        col(value).as(s"old_$value"), nullK.as(s"new_$key"),
        nullV.as(s"new_$value"))
    val pre = changes.where(col("_change_type") === "update_preimage")
      .select(col(idCol).as("_id"), col(key).as(s"old_$key"),
        col(value).as(s"old_$value"), col("_commit_version").as("_v"))
    val post = changes.where(col("_change_type") === "update_postimage")
      .select(col(idCol).as("_id2"), col(key).as(s"new_$key"),
        col(value).as(s"new_$value"), col("_commit_version").as("_v2"))
    val upd = pre.join(post,
        col("_id") === col("_id2") && col("_v") === col("_v2"))
      .select(lit("update").as("op"), col(s"old_$key"),
        col(s"old_$value"), col(s"new_$key"), col(s"new_$value"))
    ins.unionByName(del).unionByName(upd)
  }

  /** Time-bucket resample with OHLC semantics (open/high/low/close — the
    * standard downsampling aggregate for metric/price series): one row
    * per (`keyCol`, truncated bucket) with the first and last value in
    * event order, the extremes, the row count, and a DECIMAL-exact
    * value sum. Null values are dropped first (an empty bucket simply
    * does not appear — matching how resamplers treat missing points).
    *
    * Open/close come from ONE ordered window pass: first-row flag via
    * `row_number`, last-row flag via `row_number = count over the same
    * partition` — not a second descending sort — and the groupBy that
    * follows shares the window's (key, bucket) partitioning, so the
    * whole operator is a single exchange. Ties on `ts` break on
    * `idCol`, making open/close deterministic under replay. */
  def resampleOhlc(events: DataFrame, unit: String = "hour",
      keyCol: String = "event_type", tsCol: String = "ts",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val dec = DecimalType(22, 6)
    val base = events.where(col(valCol).isNotNull)
      .withColumn("bucket", date_trunc(unit, col(tsCol)))
    val part = Window.partitionBy(col(keyCol), col("bucket"))
    val ord = part.orderBy(col(tsCol), col(idCol))
    base
      .withColumn("_rn", row_number().over(ord))
      .withColumn("_n", count(lit(1)).over(part))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(when(col("_rn") === 1, col(valCol))).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max(when(col("_rn") === col("_n"), col(valCol))).as("close"),
        sum(col(valCol).cast(dec)).cast("double").as("vsum"))
  }

  /** Rolling z-score anomaly signal: each row's `value` scored against
    * the mean/variance of its key's PREVIOUS `n` rows (the trailing
    * frame excludes the current row, so the score is a one-step-ahead
    * residual, not self-referential). Rows with fewer than `minPrev`
    * trailing points emit NULL — a z-score against 1–2 samples is
    * noise.
    *
    * The rolling moments are DECIMAL-accumulated frame sums (`Σv`,
    * `Σv²`) — exact integers in decimal space, immune to the
    * accumulation-order nondeterminism of a float rolling sum — and the
    * mean/variance/z derivation is a pinned left-to-right IEEE
    * expression, so results are bit-reproducible across engines and
    * partitionings. One shuffle on `key`; the frame is O(n) per row via
    * the window's sliding accumulation. */
  def rollingZscore(df: DataFrame, key: String, tsCol: String,
      idCol: String, valCol: String, n: Int = 10,
      minPrev: Int = 3): DataFrame = {
    val dec = DecimalType(22, 6)
    val frame = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col(idCol)).rowsBetween(-n, -1)
    df.where(col(valCol).isNotNull)
      .withColumn("n_prev", count(lit(1)).over(frame))
      .withColumn("_s", sum(col(valCol).cast(dec)).over(frame)
        .cast("double"))
      .withColumn("_s2",
        sum((col(valCol) * col(valCol)).cast(dec)).over(frame)
          .cast("double"))
      .withColumn("mean_prev", col("_s") / col("n_prev").cast("double"))
      .withColumn("z",
        when(col("n_prev") >= minPrev,
          (col(valCol) - col("mean_prev")) /
            sqrt((col("_s2") - (col("_s") * col("_s")) /
                col("n_prev").cast("double")) /
              (col("n_prev").cast("double") - lit(1.0)))))
      .drop("_s", "_s2")
  }

  /** Exact rolling median over the trailing `n`-row frame per key — the
    * robust-smoothing twin of [[rollingZscore]] (median filters shrug
    * off the spikes that drag a mean). No approximation: the frame is
    * materialized as a sorted array and the median read off it, which
    * is exactly the right trade at a BOUNDED frame size — O(n log n)
    * per row with n a small constant, still codegen'd, still one
    * key-partitioned window pass, zero extra shuffles. (Unbounded
    * frames are where this shape dies; that variant belongs to the
    * sketch family, not a window.)
    *
    * Exactness: odd frame → the middle element verbatim; even frame →
    * (lo + hi) / 2, one IEEE addition and one division — deterministic
    * in any engine given the same frame contents.
    *
    * Output: input columns (null `valCol` rows dropped — a null has no
    * place in an order statistic) + `n_in_frame`, `rolling_median`. */
  def rollingMedian(df: DataFrame, key: String, tsCol: String,
      idCol: String, valCol: String, n: Int = 7): DataFrame = {
    require(n >= 1, s"frame size must be >= 1, got $n")
    val frame = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col(idCol)).rowsBetween(-(n - 1), 0)
    val sortedF = sort_array(collect_list(col(valCol).cast("double"))
      .over(frame))
    df.where(col(valCol).isNotNull)
      .withColumn("_f", sortedF)
      .withColumn("n_in_frame", size(col("_f")).cast("long"))
      .withColumn("rolling_median",
        when(col("n_in_frame") % 2 === 1,
          element_at(col("_f"), ((col("n_in_frame") + 1) / 2).cast("int")))
        .otherwise(
          (element_at(col("_f"), (col("n_in_frame") / 2).cast("int")) +
            element_at(col("_f"),
              (col("n_in_frame") / 2 + 1).cast("int"))) / lit(2.0)))
      .drop("_f")
  }

  /** Exponentially-weighted moving average (α = ½) over each key's
    * ordered integer series, truncated at the last `span` rows — the
    * classic smoothing/monitoring primitive (Roberts 1959, public;
    * pandas `ewm(adjust=True)` semantics on the truncated window).
    *
    * The α = ½ choice is what makes it exact: the unnormalized weights
    * over the window are the integers 2^(span−1−j), so numerator and
    * denominator are plain long sums of shifted values and the ONLY
    * floating-point op is the final division — bit-reproducible in any
    * engine, unlike a pow()-weighted formulation (transcendental) or a
    * running float recurrence (order-dependent).
    *
    * Scale: one window over (key, order) — partitioned by key, never
    * global; the span lags compile to a single WindowExec pass.
    * Output: input columns + `ewma`. */
  def ewmaSmooth(df: DataFrame, key: String, orderCol: String,
      valCol: String, span: Int = 16): DataFrame = {
    require(span >= 1 && span <= 32,
      s"span must be in [1, 32] (weights are 2^(span-1-j) longs), got $span")
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val terms = (0 until span).map { j =>
      val weight = 1L << (span - 1 - j)
      val xj = if (j == 0) col(valCol) else lag(col(valCol), j).over(w)
      (coalesce(xj, lit(0L)) * lit(weight),
        when(xj.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma", num.cast("double") / den.cast("double"))
  }

  /** CUSUM drift detection per key (Page 1954, public): the classic
    * change-point monitor. `S_t = Σ_{s≤t}(v_s) − t·μ` tracks cumulative
    * deviation from the reference mean, and `drift_t = S_t − min_{s≤t}
    * S_s` — the rise since the running minimum — crosses `threshold`
    * when the series' level has genuinely shifted upward, where any
    * single noisy point would not.
    *
    * Determinism: the running Σv is DECIMAL-accumulated (exact), μ
    * derives once from a decimal-exact global sum, and `S`/`drift` are
    * pinned-order IEEE expressions over those exact inputs — so alerts
    * reproduce bit-for-bit across engines and partitionings, which a
    * float running sum cannot promise. One shuffle on `key` plus a
    * broadcast scalar. */
  def cusumDrift(df: DataFrame, key: String, tsCol: String,
      idCol: String, valCol: String, threshold: Double): DataFrame = {
    val dec = DecimalType(22, 6)
    val base = df.where(col(valCol).isNotNull)
    val mu = base.agg((sum(col(valCol).cast(dec)).cast("double") /
      count(lit(1)).cast("double")).as("__mu"))
    val ord = Window.partitionBy(col(key)).orderBy(col(tsCol), col(idCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.crossJoin(broadcast(mu))
      .withColumn("s",
        sum(col(valCol).cast(dec)).over(run).cast("double") -
          row_number().over(ord).cast("double") * col("__mu"))
      .withColumn("drift", col("s") - min(col("s")).over(run))
      .withColumn("alert", col("drift") > lit(threshold))
      .drop("__mu")
  }

  /** Exact global prefix sum WITHOUT a single-partition window — the
    * scalable form of `sum(...) over (order by ...)`. Rows bucket by a
    * range split of `orderCol` (assumed unique, non-negative); each
    * bucket computes its local running sum in parallel, and the
    * cross-bucket carry-in is a running total over the per-bucket sums
    * — a `nBuckets`-row relation whose own window is bounded, then
    * broadcast back. Output adds `cum`, the INCLUSIVE running total in
    * `orderCol` order. Identical to the global window because bucket
    * order refines the total order.
    *
    * This is the textbook two-phase parallel scan mapped onto
    * DataFrames: at 100 TB the naive global window funnels the corpus
    * through one task; here the only serial step is over `nBuckets`
    * rows. `valueCol` must be integral (BIGINT sums are exact;
    * overflow-widen to decimal upstream if Σ exceeds 2^63). The
    * bucket split multiplies `orderCol` by `nBuckets` in DECIMAL(38,0)
    * — exact for ANY 64-bit key, where a Long multiply would wrap
    * above 2^63/nBuckets and scramble bucket order. */
  def distributedPrefixSum(df: DataFrame, orderCol: String,
      valueCol: String, nBuckets: Int = 64): DataFrame = {
    val hi = df.agg((max(col(orderCol)).cast("decimal(38,0)") +
      lit(1)).as("_hi"))
    val bucketed = df.crossJoin(broadcast(hi))
      .withColumn("_b", floor(col(orderCol).cast("decimal(38,0)") *
        lit(nBuckets.toLong) / col("_hi")).cast("long"))
      .drop("_hi")
    // serial step: nBuckets rows — the unpartitioned window is bounded
    // by construction, not by data size
    val offsets = bucketed.groupBy(col("_b"))
      .agg(sum(col(valueCol)).as("_bsum"))
      .withColumn("_off", coalesce(
        sum(col("_bsum")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    val local = Window.partitionBy(col("_b"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), Seq("_b"))
      .withColumn("cum", col("_off") + sum(col(valueCol)).over(local))
      .drop("_b", "_off")
  }

  /** Sorted-neighborhood entity resolution (Hernández–Stolfo): rows
    * sort by the blocking key, and only rows within `w` positions of
    * each other are compared — the classic alternative to disjoint
    * blocking when near-duplicates share a PREFIX rather than an exact
    * block value. Output: (id_a, id_b, dist) for pairs with
    * `levenshtein ≤ maxDist`, ids normalized so id_a < id_b.
    *
    * Scale: the global sort position comes from a RANGE-BUCKET
    * decomposition, never one sorting task — an order-preserving
    * 7-byte prefix proxy of the key range-splits via one
    * `percentile_approx` aggregate (splitter accuracy only affects
    * bucket balance; equal proxies always share a bucket, so bucket
    * order refines key order and the rank is exact), each bucket ranks
    * locally in parallel, and the cross-bucket offset is a window over
    * the ≤nBuckets per-bucket totals (the `_bn` bounded-serial-step
    * marker). The neighborhood join then explodes each row into its
    * `w` forward offsets and hash-joins on rank — |rows|·w candidate
    * rows, ONE shuffle on a long key, no block² blowup and no skew
    * ceiling (ranks are unique by construction). */
  def sortedNeighborhoodMatches(df: DataFrame, idCol: String,
      nameCol: String, window: Int, maxDist: Int,
      nBuckets: Int = 32): DataFrame =
    sortedNeighborhoodCandidates(df, idCol, nameCol, window, nBuckets)
      .where(col("dist") <= maxDist)

  /** Blocked fuzzy-name matcher on Jaro–Winkler — the record-linkage
    * similarity the ER literature prefers for person/org names (prefix
    * typos score high where Levenshtein's unit costs flatten them).
    * Candidates come from an equality BLOCK (the standard quadratic
    * guard: candidates = Σ_b |block_b|², one shuffle on the block
    * key — pick a key whose blocks stay bounded, or pre-split hot
    * blocks with SkewOps); the codegen'd [[graft.functions.JaroWinklerExpr]]
    * verifies each pair. Output (id_a, id_b, jw), id_a < id_b. */
  def jaroBlockedMatches(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("_blk"), col(idCol).as("id_a"),
      col(nameCol).as("_na"))
    val b = df.select(col(blockCol).as("_blk"), col(idCol).as("id_b"),
      col(nameCol).as("_nb"))
    val jw = graft.functions.EditDistanceFunctions
      .jaro_winkler(col("_na"), col("_nb"))
    a.join(b, Seq("_blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("jw", jw)
      .where(col("jw") >= threshold)
      .select(col("id_a"), col("id_b"), col("jw"))
  }

  /** The pre-verify neighborhood candidate relation of
    * [[sortedNeighborhoodMatches]]: every (id_a, id_b, dist) pair
    * within `window` positions in the global key order, BEFORE the
    * `dist ≤ maxDist` filter. Exposed so the scale harness can count
    * candidates on the exact production relation — the count is
    * |rows|·w by construction (minus the tail), i.e. linear in the
    * corpus, and ScaleStress measures exactly that. */
  def sortedNeighborhoodCandidates(df: DataFrame, idCol: String,
      nameCol: String, window: Int,
      nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val slim = df.select(col(idCol).as("id"), col(nameCol).as("nm"))
      .where(col("nm").isNotNull)
    // order-preserving numeric proxy: first 7 UTF-8 bytes, zero-padded
    // (14 hex digits → < 2^56, exact in a long). Byte order == Spark's
    // and DuckDB's binary string order, so proxy ranges respect it.
    val proxy = conv(rpad(substring(hex(encode(col("nm"), "UTF-8")),
      1, 14), 14, "0"), 16, 10).cast("long")
    val withP = slim.withColumn("_p", proxy)
    val probs = array((1 until nBuckets)
      .map(i => lit(i.toDouble / nBuckets)): _*)
    val splitters = withP.agg(
      percentile_approx(col("_p"), probs, lit(10000)).as("_sp"))
    val bucketed = withP.crossJoin(broadcast(splitters))
      .withColumn("_b", aggregate(col("_sp"), lit(0),
        (acc, s) => acc + when(col("_p") >= s, 1).otherwise(0)))
      .drop("_sp", "_p")
    // bounded serial step: ≤ nBuckets rows
    val offsets = bucketed.groupBy(col("_b"))
      .agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(
        sum(col("_bn")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    val local = Window.partitionBy(col("_b"))
      .orderBy(col("nm"), col("id"))
    val ranked = bucketed.join(broadcast(offsets), Seq("_b"))
      .withColumn("rk", col("_off") + row_number().over(local))
      .select(col("id"), col("nm"), col("rk"))
    val probesFwd = ranked.select(col("id"), col("nm"),
      explode(sequence(col("rk") + 1, col("rk") + window)).as("rk"))
    probesFwd.as("a").join(ranked.as("b"), Seq("rk"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("dist"))
  }

  /** Single change-point detection per key (offline CUSUM / binary-
    * segmentation first split): for each key's value series in time
    * order, pick the split that maximizes the between-segment
    * sum-of-squares gain  S_L²/n_L + S_R²/n_R − S²/n  — the exact
    * variance-reduction objective of one binary-segmentation step
    * under a mean-shift model (equivalently the CUSUM-squared
    * statistic). Output: one row per key with ≥ `minN` observations:
    * (key, n_obs, split_ts, gain); the split is AFTER the reported
    * timestamp.
    *
    * Determinism: prefix sums accumulate in DECIMAL(22,6) (exact, any
    * order), the gain is derived from those exact sums with three IEEE
    * divisions, and the argmax tie-breaks on (ts, id) ascending.
    *
    * Scale: everything is windowed BY KEY (one shuffle, per-partition
    * linear passes over shared sort order) — no global window, no
    * pairwise segment enumeration. Key cardinality is the parallelism:
    * this is the per-entity monitoring shape (a metric per user /
    * shop / host), embarrassingly parallel at 100 TB. A single global
    * series would instead ride the bucket-decomposed prefix-sum scan
    * ([[distributedPrefixSum]]). */
  def changepointMeanShift(df: DataFrame, key: String, tsCol: String,
      idCol: String, valCol: String, minN: Int): DataFrame = {
    val dec = DecimalType(22, 6)
    val byKey = Window.partitionBy(col(key))
    val ord = byKey.orderBy(col(tsCol), col(idCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = df.where(col(valCol).isNotNull && col(key).isNotNull)
      .withColumn("_n", count(lit(1)).over(byKey))
      .where(col("_n") >= minN)
      .withColumn("_i", row_number().over(ord))
      .withColumn("_sl", sum(col(valCol).cast(dec)).over(run))
      .withColumn("_s", sum(col(valCol).cast(dec)).over(byKey))
      .where(col("_i") < col("_n"))
      .withColumn("_nl", col("_i").cast("double"))
      .withColumn("_nr", (col("_n") - col("_i")).cast("double"))
      .withColumn("_sld", col("_sl").cast("double"))
      .withColumn("_srd", (col("_s") - col("_sl")).cast("double"))
      .withColumn("_sd", col("_s").cast("double"))
      .withColumn("gain",
        col("_sld") * col("_sld") / col("_nl") +
          col("_srd") * col("_srd") / col("_nr") -
          col("_sd") * col("_sd") / (col("_nl") + col("_nr")))
    val best = byKey.orderBy(desc("gain"), col(tsCol), col(idCol))
    cand.withColumn("_rn", row_number().over(best))
      .where(col("_rn") === 1)
      .select(col(key), col("_n").as("n_obs"),
        col(tsCol).as("split_ts"), col("gain"))
  }
}
