package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.BloomPrune

/** Relational/warehouse-family registry over the TPC-H-ish tables and
  * the events log: temporal joins (as-of / range), OLAP shapes
  * (rollup, pivot, grouped top-k, TPC-H Q3), change management (SCD-2,
  * CDC apply, upsert, reconciliation diff), event analytics (funnel,
  * cohorts, gap-fill, rolling stats), skew machinery (salted join,
  * two-phase agg, bloom pruning), sketches (count-min, HLL rollup,
  * approx percentile), and the distributed EquiDepth/PrefixSum/
  * connected-components operators. Split out of ExtensionQueries
  * (round 8) purely for navigation — registry contents and oracle
  * rules are unchanged. */
private[graft] object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_asof_join" -> ((s, dir) => asofJoin(s, dir)),
    "x_asof_forward" -> ((s, dir) => asofForwardJoin(s, dir)),
    "x_range_join" -> ((s, dir) => rangeJoin(s, dir)),
    "x_hll_rollup" -> ((s, dir) =>
      // The pre-aggregation pattern approx_count_distinct can't do:
      // DataSketches HLL sketches as a PERSISTABLE per-(day, type)
      // column, re-aggregated to per-type cardinalities by merging
      // sketches — never rescanning the raw events. At 100 TB the
      // daily sketch table is the only thing the rollup reads (a few
      // KB per key), and it composes across arbitrary regroupings.
      // Estimates are implementation-specific but deterministic per
      // dataset, so the oracle-checked columns are the exact counts,
      // the merge width, and the error-bound bit (lgConfigK=12 →
      // rsd ≈ 1.6%; gate at 15%).
      hllRollup(s, dir)),
    "x_connected_components" -> ((s, dir) => connectedComponentsCensus(s, dir)),
    "x_zorder" -> ((s, dir) =>
      // Z-curve bucket census over (l_partkey, l_suppkey): the
      // driver-checkable face of ZOrder.clusterByZOrder — bucket
      // membership IS the curve arithmetic (pure bit interleave,
      // replayed bit-for-bit by the oracle), and the per-bucket
      // min/max columns exhibit the bounded bounding boxes that make
      // z-clustered files prunable on BOTH dimensions. Layout-level
      // locality (partition bounding boxes vs a single-column sort)
      // is pinned in ZOrderSpec.
      Tables.lineitem(s, dir)
        .select(
          graft.io.ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey")), 16).as("z"),
          col("l_partkey"), col("l_suppkey"))
        .groupBy(shiftright(col("z"), 16).as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).cast("long").as("min_part"),
          max(col("l_partkey")).cast("long").as("max_part"),
          min(col("l_suppkey")).cast("long").as("min_supp"),
          max(col("l_suppkey")).cast("long").as("max_supp"))
        .orderBy(col("z_bucket"))),
    "x_funnel" -> ((s, dir) => funnel(s, dir)),
    "x_cohort_retention" -> ((s, dir) => cohortRetention(s, dir)),
    "x_salted_join" -> ((s, dir) => saltedJoinRevenue(s, dir)),
    "x_skewed_agg" -> ((s, dir) =>
      // Two-phase skew-safe aggregation (partial on (key, salt), final
      // merge on key) — algebraic, so the result equals a direct
      // groupBy, which is the oracle. count's final phase SUMS the
      // partial counts (see Skew.skewedAgg's contract).
      graft.ext.Skew.skewedAgg(
          Tables.events(s, dir).select(col("event_type")),
          "event_type", salt = 16)(
          count(lit(1)).as("n"), sum(col("n")).as("n"))
        .orderBy(col("event_type"))),
    "x_approx_percentile" -> ((s, dir) => approxPercentileBound(s, dir)),
    "x_bloom_prune" -> ((s, dir) => bloomPrune(s, dir)),
    "x_upsert" -> ((s, dir) => upsertMerge(s, dir)),
    "x_gap_fill" -> ((s, dir) => gapFillDaily(s, dir)),
    "x_corr_regression" -> ((s, dir) => corrRegression(s, dir)),
    "x_rolling_stats" -> ((s, dir) => rollingStats(s, dir)),
    "x_winsorize" -> ((s, dir) => {
      // Exact-rank winsorization of events.value at [p1, p99] via the
      // distributed order statistic (EquiDepth.percentileValues — the
      // same two-pass rank construction as x_ntile_buckets, never a
      // single-task sort): bounds are the values at ranks
      // max(1, n DIV 100) and n − that + 1 under the unique
      // (value, event_id) order; the clip census sums decimal-exact
      // (events.value is 2-decimal by construction).
      val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
      val n = ev.count()
      // SmokeCheck asserts events is non-empty at every sf; if it ever
      // isn't, fail loudly here instead of a bare bounds-map lookup
      // (rank 0 matches nothing and the lookup would NPE-style throw).
      require(n > 0, "x_winsorize requires a non-empty events table")
      val loRank = math.max(1L, n / 100)
      val hiRank = n - loRank + 1
      val bounds = graft.operators.EquiDepth.percentileValues(
          ev, Seq("value", "event_id"), Seq(loRank, hiRank))
        .select(col("rank"), col("value")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val (vLo, vHi) = (bounds(loRank), bounds(hiRank))
      val clipped = least(greatest(col("value"), lit(vLo)), lit(vHi))
      ev.agg(
          count(lit(1)).as("n"),
          sum((col("value") < vLo).cast("long")).as("n_low"),
          sum((col("value") > vHi).cast("long")).as("n_high"),
          sum(clipped.cast("decimal(18,2)")).cast("double").as("sum_winsorized"))
        .withColumn("v_lo", lit(vLo))
        .withColumn("v_hi", lit(vHi))
    }),
    "x_ntile_buckets" -> ((s, dir) => {
      // Equi-DEPTH histogram via DISTRIBUTED exact NTILE(10) — the
      // quantile-bucket complement of q_histogram_price's equi-width
      // bins. The order key is a UNIQUE composite (price, orderkey,
      // linenumber) so remainder distribution is deterministic on both
      // engines. graft.operators.EquiDepth computes the identical
      // bucket assignment as the window form via range-partition +
      // per-partition offsets — no empty-PARTITION-BY WindowExec
      // funneling every row through one task (EquiDepthSpec pins both
      // the equivalence and the plan shape); the sketch path at 100 TB
      // stays x_approx_percentile.
      graft.operators.EquiDepth.ntileBuckets(
          Tables.lineitem(s, dir)
            .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          Seq("l_extendedprice", "l_orderkey", "l_linenumber"), 10)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).cast("double").as("lo"),
          max(col("l_extendedprice")).cast("double").as("hi"))
        .orderBy(col("bucket"))
    }),
    "x_rollup" -> ((s, dir) =>
      // ROLLUP subtotal lattice over (returnflag, linestatus): detail,
      // per-flag subtotal, grand total in ONE pass — Spark's Expand
      // operator replicates each row per grouping set and partial
      // aggregation collapses all three levels map-side. grouping_id
      // disambiguates rollup nulls from data nulls; keys coalesce to
      // '(all)' so the ordering is engine-portable.
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("gid"), col("rf"), col("ls"))),
    "x_pivot" -> ((s, dir) => {
      // Day × event-type PIVOT with an EXPLICIT value list — never let
      // pivot run its values-discovery distinct job at scale; with the
      // list given it is one groupBy pass, one shuffle. Absent cells
      // coalesce to 0 to match SQL conditional counts.
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", types)
        .count()
        .select(col("day") +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy(col("day"))
    }),
    "x_topk_group" -> ((s, dir) => {
      // Top-3 orders by price per priority. The rank-filter pattern
      // triggers Spark's WindowGroupLimit rule: each map task keeps
      // only its local top-3 per group BEFORE the shuffle, so the
      // exchange carries O(groups·k) rows, not the table (plan pinned
      // in TopKSpec).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rk"))
    }),
    "x_scd2" -> ((s, dir) =>
      // SCD-2 history build (operators/Scd2): each user's event-type
      // change stream collapsed to validity intervals — run heads +
      // lead() sharing one key shuffle. valid_to null = current.
      graft.operators.Scd2.intervals(
          Tables.events(s, dir)
            .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
          "user_id", "ts", "event_type", tieCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"),
          unix_millis(col("valid_from")).as("valid_from_ms"),
          unix_millis(col("valid_to")).as("valid_to_ms"), col("event_type"))
        .orderBy(col("user_id"), col("valid_from_ms"), col("event_id"))),
    "x_table_diff" -> ((s, dir) => {
      // Cutover reconciliation (operators/Reconcile): orders vs a
      // deterministically drifted twin — 1/499 keys dropped
      // (only_left), 1/997 prices bumped (differs), 1/631 re-keyed
      // negative (only_right) — full-outer key join + null-safe
      // column compares, no engine-specific hashing.
      val orders = Tables.orders(s, dir)
      val extra = orders.where(col("o_orderkey") % 631 === 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
      val drifted = orders.where(col("o_orderkey") % 499 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 997 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(extra)
      graft.operators.Reconcile.diffCensus(orders, drifted, Seq("o_orderkey"))
    }),
    "x_k_anonymity" -> ((s, dir) =>
      // Privacy-audit census (quality/Uniqueness.kAnonymityProfile):
      // equivalence-class-size histogram over the quasi-identifiers
      // (nation, market segment) — min k in this profile IS the
      // table's k-anonymity.
      graft.quality.Uniqueness.kAnonymityProfile(
        Tables.customer(s, dir), Seq("c_nationkey", "c_mktsegment"))),
    "x_compaction_bins" -> ((s, dir) => {
      // Compaction planning: pseudo-files (one per orderkey, size =
      // its line count) packed into 64-row bins by GLOBAL start
      // offset. The running total is operators/PrefixSum — range
      // partition + per-partition offsets — NOT an empty-PARTITION-BY
      // window (which would funnel every file through one task).
      val files = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("size"))
      graft.operators.PrefixSum.runningTotal(files, Seq("l_orderkey"), "size")
        .withColumn("bin", expr("(cum - size) DIV 64"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("size")).as("rows_in_bin"),
          min(col("l_orderkey")).as("first_key"), max(col("l_orderkey")).as("last_key"))
        .orderBy(col("bin"))
    }),
    "x_count_min" -> ((s, dir) => countMinCensus(s, dir)),
    "x_cdc_apply" -> ((s, dir) => {
      // CDC apply (operators/Cdc): snapshot + ordered I/U/D change
      // feed -> final state in ONE plan (union + WindowGroupLimit
      // latest-per-key; deletes drop the key). Feed is deterministic
      // drift over orders: 1/5 updated (seq 1), 1/7 deleted (seq 2 —
      // delete beats update on keys divisible by 35), 1/11 inserted
      // under a fresh negative key. The dump is the final state's
      // (count, key-sum, exact price-sum) — a full multiset pin in 1
      // row; the oracle replays feed and window.
      val o = Tables.orders(s, dir)
      val upd = o.where(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
        .withColumn("op", lit("U")).withColumn("seq", lit(1L))
      val del = o.where(col("o_orderkey") % 7 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(2L))
      val ins = o.where(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .withColumn("op", lit("I")).withColumn("seq", lit(1L))
      graft.operators.Cdc.applyChanges(
          o, upd.unionByName(del).unionByName(ins), Seq("o_orderkey"), "seq", "op")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_keys"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),
    "x_shipping_priority" -> ((s, dir) =>
      // TPC-H Q3 shape: selective dim filter -> 3-way join -> keyed
      // agg -> top-10 (TakeOrderedAndProject — never a global sort).
      // Catalyst broadcasts the filtered customer side; the
      // lineitem/orders join stays shuffle-keyed. Revenue is the
      // exact-decimal sum of double products (identical order-free
      // arithmetic on both engines).
      Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir)
            .where(col("o_orderdate") < lit("1998-06-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir)
            .where(col("l_shipdate") > lit("1998-06-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10))
  )

  /** Backward as-of join over events: each click event picks up the
    * most recent error event of the same user at or before its
    * timestamp (graft.operators.AsOfJoin — union + one keyed window,
    * no join node, no row explosion). The right side is pre-aggregated
    * to one row per (user_id, ts) so the tie pick is deterministic on
    * both engines; the oracle is DuckDB's native ASOF LEFT JOIN. */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("err_id"))
    graft.operators.AsOfJoin.asOfBackward(
        clicks, errors, "user_id", "ts", Seq("err_id"), "prev_")
      .select(col("event_id"), col("user_id"), col("prev_err_id"))
      .orderBy(col("event_id"))
  }

  /** Forward twin of [[asofJoin]]: each click's NEXT error at or after
    * it (time-to-next-failure shape) — checked against DuckDB's native
    * forward ASOF (`c.ts <= e.ts`). Right side pre-aggregated per
    * (user, ts) with MIN so the at-ts pick is deterministic. */
  private def asofForwardJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("err_id"))
    graft.operators.AsOfJoin.asOfForward(
        clicks, errors, "user_id", "ts", Seq("err_id"), "next_")
      .select(col("event_id"), col("user_id"), col("next_err_id"))
      .orderBy(col("event_id"))
  }

  /** Bounded-gap range join (graft.operators.RangeJoin): same-customer
    * order pairs at most 7 days apart, summarized per customer. The
    * interval-bucketing rewrite turns the range predicate into an
    * equi-join on (key, week-bucket); the oracle is the naive
    * inequality join in SQL — identical pairs, different plan. */
  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), unix_date(col("o_orderdate").cast("date")).as("d"))
    graft.operators.RangeJoin.temporalPairs(o, "o_custkey", "d", maxGap = 7L)
      .groupBy(col("k").as("o_custkey"))
      .agg(count(lit(1)).as("n_close_pairs"),
        min(col("t_a")).cast("long").as("first_day"),
        max(col("t_b")).cast("long").as("last_day"))
      .orderBy(col("o_custkey"))
  }

  /** Two-level distinct-user rollup where the second level reads ONLY
    * the first level's sketches: day×type HLL sketches (the shape a
    * 100 TB pipeline materializes once per day), merged per type with
    * `hll_union_agg` — exactness of the final estimate is gated
    * against an independently-computed exact COUNT(DISTINCT). */
  private def hllRollup(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    // Level 1: the persistable daily sketch table. Checkpointed so the
    // rollup provably consumes materialized sketches, not a rewritten
    // scan of the raw events.
    val daily = graft.ext.Checkpoints.stage(
      events
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk")))
    // Level 2: merge-only rollup.
    val rolled = daily
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_day_sketches"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = events
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
    rolled.join(exact, "event_type")
      .select(col("event_type"), col("n_day_sketches"), col("n_exact"),
        (abs(col("est").cast("double") / col("n_exact").cast("double") - 1.0) < 0.15)
          .cast("long").as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Census of the connected components of the star-schema membership
    * graph (customer—nation—region edges, ids offset into disjoint
    * ranges), computed by the generic alternating large-star /
    * small-star operator. Components are exactly the five regions, so
    * every label and size is value-checkable by a recursive-CTE
    * transitive closure in the oracle — the driver-visible gate for an
    * operator whose per-round internals no SQL engine exposes. */
  private def connectedComponentsCensus(s: SparkSession, dir: String): DataFrame = {
    val nationEdges = Tables.nation(s, dir)
      .select((col("n_nationkey") + 100).cast("long").as("src"),
        col("n_regionkey").cast("long").as("dst"))
    val customerEdges = Tables.customer(s, dir)
      .select((col("c_custkey") + 1000).cast("long").as("src"),
        (col("c_nationkey") + 100).cast("long").as("dst"))
    graft.operators.ConnectedComponents
      .run(nationEdges.union(customerEdges), "src", "dst")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_nodes"), max(col("node")).as("max_node"))
      .orderBy(col("component"))
  }

  /** Ordered funnel over the events stream: per user, the FIRST
    * occurrence of each stage (conditional min — one keyed aggregation,
    * no self-joins), then strict-ordering counts view → click →
    * purchase. The single-pass conditional-aggregate shape is the one
    * that survives 100 TB; a per-stage self-join would shuffle the
    * event log once per stage. */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def firstOf(t: String) = min(when(col("event_type") === t, col("ts")))
    ev.groupBy(col("user_id"))
      .agg(firstOf("view").as("t_view"), firstOf("click").as("t_click"),
        firstOf("purchase").as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("t_view").isNotNull.cast("long")).as("n_view"),
        sum((col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_click") > col("t_view")).cast("long")).as("n_view_click"),
        sum((col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_purchase").isNotNull && col("t_click") > col("t_view") &&
          col("t_purchase") > col("t_click")).cast("long")).as("n_full_funnel"))
  }

  /** Daily cohort retention: users grouped by first-seen day, with
    * day-1 and day-7+ return counts — two keyed aggregations and one
    * equi-join on the user key (the distinct (user, day) activity set
    * is the small derived table, never the raw log twice). */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val firstDay = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    active.join(firstDay, Seq("user_id"))
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count_distinct(when(col("offset") === 1, col("user_id"))).as("n_d1"),
        count_distinct(when(col("offset") >= 7, col("user_id"))).as("n_d7plus"))
      .orderBy(col("cohort_day"))
  }

  /** Salted fact-to-dim join (graft.ext.Skew.saltedJoin, salt 8): the
    * hot-key fallback for joins AQE can't split. The salt spreads each
    * key over 8 shuffle partitions and NEVER changes the result, which
    * is exactly what the oracle checks — the plain SQL join aggregated
    * identically. House decimal-sum rules for the measure. */
  private def saltedJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderstatus"))
    graft.ext.Skew.saltedJoin(li, o, "okey", salt = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** x_approx_percentile: the sketch path for quantiles (what
    * q_percentiles' exact pass-through becomes at 100 TB — a
    * fixed-size digest instead of a full sort/shuffle), gated by its
    * own guarantee: approx_percentile(accuracy = A) returns a corpus
    * element whose TRUE rank is within n/A of the target rank. The
    * query re-derives the true ranks with one exact counting pass and
    * emits the bound check as a bit; the sketch is deterministic for
    * a given dataset, so the bit is stable. */
  private def approxPercentileBound(s: SparkSession, dir: String): DataFrame = {
    val acc = 1000
    val ps = Seq(0.5, 0.9, 0.99)
    val v = Tables.lineitem(s, dir).select(col("l_extendedprice").cast("double").as("v"))
    // 3 scalars (the sketch output) — house driver-scalar pattern.
    val approx = v.agg(percentile_approx(col("v"),
        array(ps.map(lit): _*), lit(acc)).as("ap"))
      .first().getSeq[Double](0)
    // The guarantee is that SOME rank of the returned element lies
    // within slack of p·n. A duplicated element occupies the rank
    // interval [count(v < a) + 1, count(v <= a)] — so the check is
    // interval INTERSECTION, not a point test on the max rank (which
    // would spuriously fail when the returned value has multiplicity
    // greater than the slack).
    val checks = ps.zip(approx).map { case (p, a) =>
      val rankLo = sum((col("v") < a).cast("long"))
      val rankHi = sum((col("v") <= a).cast("long"))
      val n = count(lit(1))
      val slack = n.cast("double") / acc + 1.0
      (rankHi.cast("double") >= n.cast("double") * p - slack) &&
        (rankLo.cast("double") + 1.0 <= n.cast("double") * p + slack)
    }
    v.agg(checks.reduce(_ && _).cast("long").as("rank_bound_ok"))
  }

  /** Bloom-pruned fact-to-dim join (graft.ext.BloomPrune): lineitem is
    * pre-filtered by a Bloom filter over the selective order-key set
    * before the exact join. The oracle is the PLAIN join — pruning is
    * plan-internal, and the equality IS the no-false-negative proof. */
  private def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.orders(s, dir).where(col("o_orderstatus") === "P")
      .select(col("o_orderkey").as("okey"))
    // The dim-side cardinality sizes the sketch — one scalar count on
    // the SMALL side (house pattern), never on the fact side. That is
    // a second dim scan (count + the sketch aggregation); a catalog
    // row-count estimate would fold it away at cluster scale, and
    // overestimating expectedKeys only grows the sketch, never breaks
    // correctness.
    val nKeys = math.max(keys.count(), 1L)
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    BloomPrune.prunedJoin(li, keys, "okey", nKeys, fpp = 0.01)
      .agg(count(lit(1)).as("n_matches"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
  }

  /** SCD-1 MERGE over orders (graft.operators.Upsert): a deterministic
    * updates batch (keys ≡ 0 mod 3, doubled price) replaces its base
    * rows (base drops keys ≡ 0 mod 5, so updates both overwrite and
    * insert); the merged state is summarized per status. The oracle
    * replays the merge relationally (updates ∪ base-minus-updated). */
  private def upsertMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Upsert
    val orders = Tables.orders(s, dir)
    val base = orders.where(col("o_orderkey") % 5 =!= 0)
    // ×2 on a double is exponent arithmetic — exact on both engines.
    val updates = orders.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Upsert.upsert(base, updates, Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Calendar gap-fill (graft.quality.Timeliness.gapFill) over a
    * deliberately sparse daily series (events with id ≡ 0 mod 997):
    * counts zero-fill, the max-value gauge carries forward (LOCF). */
  private def gapFillDaily(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Timeliness
    val obs = Tables.events(s, dir)
      .where(col("event_id") % 997 === 0)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
    Timeliness.gapFill(s, obs, "day", countCols = Seq("n"), gaugeCols = Seq("mx"))
  }

  /** Single-pass Pearson correlation + OLS slope between quantity and
    * extended price, built from EXACT decimal sums: the five sums are
    * decimal (order-independent, overflow-checked at this scale), cast
    * to double only once summed, and the r/slope formulas then run in
    * IEEE double with the same operation order as the SQL twin — so
    * the compare is exact, unlike builtin corr()'s order-dependent
    * float accumulation. One aggregate, no shuffle beyond it. */
  private def corrRegression(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("decimal(18,2)").as("x"),
      col("l_extendedprice").cast("decimal(18,2)").as("y"))
    val sums = li.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    val nd = col("n").cast("double")
    val covN = nd * col("sxy") - col("sx") * col("sy")
    val varXN = nd * col("sxx") - col("sx") * col("sx")
    val varYN = nd * col("syy") - col("sy") * col("sy")
    sums.select(col("n"),
      (covN / (sqrt(varXN) * sqrt(varYN))).as("pearson_r"),
      (covN / varXN).as("slope"))
  }

  /** Rolling time-series stats over the daily event counts: 7-day
    * trailing sum and day-over-day delta — all integers. Unpartitioned
    * window, but over the AGGREGATED daily series (one row per day):
    * the single-partition sort is calendar-bounded, never row-count
    * bounded — same argument as Timeliness.gapFill. */
  private def rollingStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = graft.quality.Timeliness.dailyCounts(Tables.events(s, dir), col("ts"))
    val byDay = Window.orderBy(col("day"))
    daily
      .withColumn("n_7d", sum(col("n")).over(byDay.rowsBetween(-6, 0)))
      .withColumn("delta", col("n") - lag(col("n"), 1).over(byDay))
      .orderBy(col("day"))
  }

  /** Count–min sketch frequency estimation over event types — the
    * point-frequency member of the sketch family (HLL = distincts,
    * approx_percentile = quantiles, Bloom = membership, Misra–Gries =
    * top-k; CMS = per-item counts). One aggregation builds the
    * constant-size sketch (partial merges are cell-wise adds — one
    * small blob per partition crosses the shuffle, same 100 TB shape
    * as MisraGries); the sketch itself is the only driver value (a
    * 2-cell scalar row, like the IVF centroids). The exact-vs-estimate
    * comparison is DISTRIBUTED: the serialized sketch ships as a
    * binary literal and the codegen'd `graft_cms_estimate` kernel
    * probes it executor-side next to each exact group count — at n
    * distinct keys the comparison stays an n-row distributed frame
    * instead of an n-row driver collect (the generic shape's
    * scale-killer, fixed round 8). Estimates are hash-dependent, so
    * the output carries the CMS GUARANTEE bits instead of raw
    * estimates: est >= exact always, and est <= exact + ⌈eps·N⌉ with
    * confidence 0.99 — deterministic for a fixed seed, so the bits are
    * stable across runs and the oracle replays them as constants over
    * the exact census. */
  private def countMinCensus(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val eps = 0.001
    val agg = events.agg(
      count_min_sketch(col("event_type"), lit(eps), lit(0.99), lit(42)).as("cms"),
      count(col("event_type")).as("total")).head()
    val bound = math.ceil(eps * agg.getLong(1)).toLong
    val est = call_function("graft_cms_estimate",
      col("event_type"), lit(agg.getAs[Array[Byte]](0)))
    events.where(col("event_type").isNotNull)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        (est >= col("n")).cast("long").as("est_ge_exact"),
        (est <= col("n") + lit(bound)).cast("long").as("est_within_eps"))
      .orderBy(col("event_type"))
  }

  // ----------------------------------------------------------------- oracle

  val oracle: Map[String, String] = Map(
    "x_approx_percentile" -> "SELECT CAST(1 AS BIGINT) AS rank_bound_ok",
    // As-of join vs DuckDB's NATIVE ASOF LEFT JOIN — an independent
    // implementation of the same temporal-join semantics.
    "x_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        | errors AS (SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS err_id
        |   FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        | SELECT c.event_id, c.user_id, e.err_id AS prev_err_id
        | FROM clicks c ASOF LEFT JOIN errors e
        |   ON c.user_id = e.user_id AND c.ts >= e.ts
        | ORDER BY c.event_id""".stripMargin.replaceAll("\n", " "),
    "x_asof_forward" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        | errors AS (SELECT user_id, ts, CAST(MIN(event_id) AS BIGINT) AS err_id
        |   FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        | SELECT c.event_id, c.user_id, e.err_id AS next_err_id
        | FROM clicks c ASOF LEFT JOIN errors e
        |   ON c.user_id = e.user_id AND c.ts <= e.ts
        | ORDER BY c.event_id""".stripMargin.replaceAll("\n", " "),
    "x_range_join" ->
      """WITH o AS (SELECT o_custkey, (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d FROM orders),
        | p AS (SELECT a.o_custkey AS k, a.d AS t_a, b.d AS t_b
        |   FROM o a JOIN o b ON a.o_custkey = b.o_custkey AND b.d > a.d AND b.d - a.d <= 7)
        | SELECT k AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n_close_pairs,
        |   CAST(MIN(t_a) AS BIGINT) AS first_day, CAST(MAX(t_b) AS BIGINT) AS last_day
        | FROM p GROUP BY k ORDER BY o_custkey""".stripMargin.replaceAll("\n", " "),
    // Sketch estimates are implementation-internal; the oracle checks
    // the exact cardinalities, the number of daily sketches each
    // rollup merged, and that the merged estimate hit its error bound.
    "x_hll_rollup" ->
      """WITH d AS (SELECT event_type, CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_day_sketches
        |   FROM events GROUP BY event_type),
        | x AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |   FROM events GROUP BY event_type)
        | SELECT d.event_type, d.n_day_sketches, x.n_exact, CAST(1 AS BIGINT) AS approx_ok
        | FROM d JOIN x USING (event_type) ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    // The Morton interleave replayed bit-for-bit — the SQL is
    // GENERATED from the same (bit, dimension) -> position enumeration
    // as the Column form (ZOrder.zValueSql), so they cannot drift.
    "x_zorder" ->
      s"""WITH z AS (SELECT (${graft.io.ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 16)}) AS z,
        |   l_partkey, l_suppkey FROM lineitem)
        | SELECT z >> 16 AS z_bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(MIN(l_partkey) AS BIGINT) AS min_part, CAST(MAX(l_partkey) AS BIGINT) AS max_part,
        |   CAST(MIN(l_suppkey) AS BIGINT) AS min_supp, CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
        | FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin.replaceAll("\n", " "),
    // Component labels are the deterministic min-node-id per
    // component, so the oracle can replay them with a recursive-CTE
    // transitive closure (node count per min-reachable-id).
    "x_connected_components" ->
      """WITH RECURSIVE
        | e0 AS (SELECT CAST(n_nationkey + 100 AS BIGINT) AS a, CAST(n_regionkey AS BIGINT) AS b FROM nation
        |   UNION ALL SELECT CAST(c_custkey + 1000 AS BIGINT), CAST(c_nationkey + 100 AS BIGINT) FROM customer),
        | e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        | r AS (SELECT a AS node, b AS reach FROM e
        |   UNION SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        | lab AS (SELECT node, LEAST(MIN(reach), node) AS component FROM r GROUP BY node)
        | SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes, MAX(node) AS max_node
        | FROM lab GROUP BY component ORDER BY component""".stripMargin.replaceAll("\n", " "),
    // Salting is plan-internal: the oracle is the PLAIN aggregation.
    "x_skewed_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
        | GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    // Salting is plan-internal: the oracle is the PLAIN join.
    "x_salted_join" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replaceAll("\n", " "),
    "x_funnel" ->
      """WITH f AS (SELECT user_id,
        |   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        | SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
        |    AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
        |    AND t_purchase IS NOT NULL AND t_click > t_view
        |    AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        | FROM f""".stripMargin.replaceAll("\n", " "),
    "x_cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        | fd AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
        | SELECT cohort_day,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(DISTINCT CASE WHEN e.day - f.cohort_day = 1 THEN e.user_id END) AS BIGINT) AS n_d1,
        |  CAST(COUNT(DISTINCT CASE WHEN e.day - f.cohort_day >= 7 THEN e.user_id END) AS BIGINT) AS n_d7plus
        | FROM ev e JOIN fd f USING (user_id)
        | GROUP BY cohort_day ORDER BY cohort_day""".stripMargin.replaceAll("\n", " "),
    // Rolling window + lag replayed in SQL — all integer arithmetic.
    "x_rolling_stats" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |   FROM events GROUP BY 1)
        | SELECT day, n,
        |   CAST(SUM(n) OVER (ORDER BY day ROWS 6 PRECEDING) AS BIGINT) AS n_7d,
        |   n - lag(n) OVER (ORDER BY day) AS delta
        | FROM d ORDER BY day""".stripMargin.replaceAll("\n", " "),
    // MERGE replayed relationally: updates ∪ (base minus updated keys).
    "x_upsert" ->
      """WITH updates AS (SELECT * REPLACE (o_totalprice * 2 AS o_totalprice)
        |   FROM orders WHERE o_orderkey % 3 = 0),
        | base AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
        | merged AS (SELECT * FROM updates UNION ALL
        |   SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates))
        | SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        | FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replaceAll("\n", " "),
    // Gap-fill replayed in SQL: calendar spine, zero-fill counts,
    // IGNORE NULLS LOCF for the gauge.
    "x_gap_fill" ->
      """WITH obs AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n, MAX(value) AS mx
        |   FROM events WHERE event_id % 997 = 0 GROUP BY 1),
        | cal AS (SELECT CAST(unnest(generate_series(
        |     (SELECT MIN(day) FROM obs), (SELECT MAX(day) FROM obs), INTERVAL 1 DAY)) AS DATE) AS day),
        | j AS (SELECT cal.day AS day, obs.n, obs.mx FROM cal LEFT JOIN obs USING (day))
        | SELECT day, COALESCE(n, 0) AS n,
        |   last_value(mx IGNORE NULLS) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS mx_filled
        | FROM j ORDER BY day""".stripMargin.replaceAll("\n", " "),
    // Pearson/OLS from exact decimal sums: the sums are exact on both
    // engines, the final r/slope arithmetic is IEEE double in the
    // same operation order — bit-identical, unlike builtin corr().
    "x_corr_regression" ->
      """WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem)
        | SELECT n,
        |   (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |     (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS pearson_r,
        |   (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
        | FROM s""".stripMargin.replaceAll("\n", " "),
    // Bloom pruning is plan-internal: the oracle is the PLAIN join,
    // and the equality is the no-false-negative proof.
    "x_bloom_prune" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        | FROM lineitem JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P') o
        |   ON l_orderkey = o_orderkey""".stripMargin.replaceAll("\n", " "),
    // Winsorization replayed in SQL: same rank formula on the same
    // unique order, same clip, same decimal-exact sum.
    "x_winsorize" ->
      """WITH n AS (SELECT COUNT(*) AS n FROM events),
        | r AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rank FROM events),
        | b AS (SELECT
        |   (SELECT value FROM r, n WHERE rank = GREATEST(1, n // 100)) AS v_lo,
        |   (SELECT value FROM r, n WHERE rank = n - GREATEST(1, n // 100) + 1) AS v_hi)
        | SELECT CAST(n.n AS BIGINT) AS n,
        |  CAST((SELECT COUNT(*) FROM events, b WHERE value < b.v_lo) AS BIGINT) AS n_low,
        |  CAST((SELECT COUNT(*) FROM events, b WHERE value > b.v_hi) AS BIGINT) AS n_high,
        |  (SELECT CAST(SUM(CAST(LEAST(GREATEST(value, b.v_lo), b.v_hi) AS DECIMAL(18,2))) AS DOUBLE) FROM events, b) AS sum_winsorized,
        |  b.v_lo AS v_lo, b.v_hi AS v_hi
        | FROM n, b""".stripMargin.replaceAll("\n", " "),
    // NTILE over the same unique total order — bucket assignment and
    // remainder distribution are pinned by the standard.
    "x_ntile_buckets" ->
      """WITH t AS (SELECT l_extendedprice,
        |   NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
        |  FROM lineitem)
        | SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(MIN(l_extendedprice) AS DOUBLE) AS lo, CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
        | FROM t GROUP BY bucket ORDER BY bucket""".stripMargin.replaceAll("\n", " "),
    // GROUPING() bit order (first arg = MSB) matches Spark's
    // grouping_id(); both cast to BIGINT.
    "x_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | COALESCE(l_returnflag, '(all)') AS rf, COALESCE(l_linestatus, '(all)') AS ls,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        | ORDER BY gid, rf, ls""".stripMargin.replaceAll("\n", " "),
    "x_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        | FROM events GROUP BY 1 ORDER BY day""".stripMargin.replaceAll("\n", " "),
    "x_topk_group" ->
      """WITH r AS (SELECT o_orderpriority,
        |   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |   o_orderkey, o_totalprice FROM orders)
        | SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        | FROM r WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin.replaceAll("\n", " "),
    // Run-head detection replayed exactly: first row per key OR
    // attr distinct from previous (null-safe both ways).
    "x_scd2" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |   LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        | c AS (SELECT user_id, ts, event_id, event_type FROM s
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        | SELECT user_id, event_id, epoch_ms(ts) AS valid_from_ms,
        |  epoch_ms(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms,
        |  event_type
        | FROM c ORDER BY user_id, valid_from_ms, event_id""".stripMargin.replaceAll("\n", " "),
    "x_table_diff" ->
      """WITH drift AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |   CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |   o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 499 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 631 = 0),
        | j AS (SELECT CASE WHEN d.o_orderkey IS NULL THEN 'only_left'
        |   WHEN o.o_orderkey IS NULL THEN 'only_right'
        |   WHEN (o.o_custkey IS NOT DISTINCT FROM d.o_custkey)
        |    AND (o.o_orderstatus IS NOT DISTINCT FROM d.o_orderstatus)
        |    AND (o.o_totalprice IS NOT DISTINCT FROM d.o_totalprice)
        |    AND (o.o_orderdate IS NOT DISTINCT FROM d.o_orderdate)
        |    AND (o.o_orderpriority IS NOT DISTINCT FROM d.o_orderpriority) THEN 'equal'
        |   ELSE 'differs' END AS status
        |  FROM orders o FULL OUTER JOIN drift d ON o.o_orderkey = d.o_orderkey)
        | SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM j
        | GROUP BY status ORDER BY status""".stripMargin.replaceAll("\n", " "),
    "x_k_anonymity" ->
      """SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups, CAST(SUM(k) AS BIGINT) AS n_rows
        | FROM (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM customer
        |  GROUP BY c_nationkey, c_mktsegment) g
        | GROUP BY k ORDER BY k""".stripMargin.replaceAll("\n", " "),
    // The running total replays as a window here (the oracle runs at
    // gate scale; the ENGINE path is the distributed PrefixSum).
    "x_compaction_bins" ->
      """WITH f AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS size FROM lineitem GROUP BY 1),
        | c AS (SELECT l_orderkey, size,
        |   SUM(size) OVER (ORDER BY l_orderkey ROWS UNBOUNDED PRECEDING) AS cum FROM f),
        | b AS (SELECT (cum - size) // 64 AS bin, size, l_orderkey FROM c)
        | SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(size) AS BIGINT) AS rows_in_bin,
        |  MIN(l_orderkey) AS first_key, MAX(l_orderkey) AS last_key
        | FROM b GROUP BY bin ORDER BY bin""".stripMargin.replaceAll("\n", " "),
    "x_cdc_apply" ->
      """WITH chg AS (
        |  SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice, 'U' AS op, 1 AS seq
        |   FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'D', 2 FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_totalprice, 'I', 1 FROM orders WHERE o_orderkey % 11 = 0),
        | allr AS (SELECT o_orderkey, o_totalprice, 'I' AS op, 0 AS seq FROM orders
        |  UNION ALL SELECT * FROM chg),
        | r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM allr)
        | SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        | FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin.replaceAll("\n", " "),
    "x_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        | FROM customer, orders, lineitem
        | WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        | GROUP BY l_orderkey, o_orderdate, o_orderpriority
        | ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin.replaceAll("\n", " "),
    // CMS estimates are sketch-internal (hash-dependent); the output
    // is the exact census + the sketch's guarantee bits, which are
    // deterministic for the fixed seed — the oracle replays them as
    // constants (same pattern as the LSH/ANN invariant oracles).
    "x_count_min" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(1 AS BIGINT) AS est_ge_exact, CAST(1 AS BIGINT) AS est_within_eps
        | FROM events WHERE event_type IS NOT NULL
        | GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " ")
  )
}
