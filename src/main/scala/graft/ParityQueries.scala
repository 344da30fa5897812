package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.etl.TimeDerivation
import graft.quality.{Accuracy, Completeness, Consistency, Timeliness, Uniqueness, Validity}

/** Reference-parity queries — one named entry per operator family of
  * SURVEY.md §2, each with DuckDB-equivalent oracle SQL.
  *
  * Determinism rules (required for the driver's hash compare):
  *   - every query ends in an ORDER BY over a unique key;
  *   - float aggregates are EXACT decimal sums cast to double at the
  *     end (sum order can't change the value), and any double math
  *     after that is written as the same IEEE expression tree in both
  *     the Spark code and the oracle SQL;
  *   - column names are aliased identically on both sides;
  *   - DuckDB sums of integers are HUGEINT → always CAST(... AS BIGINT)
  *     in the oracle to match Spark's LongType.
  *
  * Operator coverage map (SURVEY §2 id → query):
  *   S4 q_json_extract · S5/S6 q_csv_roundtrip · S6/S7/Y1–Y3
  *   q_parquet_roundtrip · S8/X10 q_range_datedim · P1–P3 passim ·
  *   P4–P7/X14 q_validity_report · P8 q_compound_dups · P9/A1/A2
  *   q_nonnull_census,q_null_census · A3 q_count_events · A4
  *   q_describe_lineitem · A5/O1 q_freq_event_type · A6
  *   q_dup_groups_exact · A7 q_dedup_count · A8 q_compound_dups · A9
  *   q_daily_counts · A10/J1 q_calendar_gaps · O1/O2 q_topk_orders ·
  *   U1 q_union_split · X1–X8 q_time_derivation · X11–X13
  *   q_calendar_gaps/q_agg_pricing · V1 q_histogram_price · Y4
  *   q_sql_view_revenue · joins q_join_geo,q_join_revenue,
  *   q_left_anti_customers · window (engine extension, SURVEY §2.5)
  *   q_window_latest_event.
  */
object ParityQueries {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Per-JVM scratch root for round-trip queries, deleted on exit —
    * per-invocation dirs stay race-free between concurrent sessions
    * without accumulating full table copies in /tmp across runs. */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p
  }

  private def scratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString

  /** lineitem column names (TESTDATA.md schema; static so the oracle
    * SQL can enumerate them). */
  private val lineitemCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate")
  private val lineitemNumCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax")
  private val eventsCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Validity rules over lineitem (reference P4–P7 shapes re-keyed to
    * the test schema; the Year-bound rule's dynamic `current_date` is
    * replaced by an injectable fixed bound per SURVEY §7.5.6). */
  private def lineitemRules: Seq[Validity.Rule] = Seq(
    Validity.Rule("disc_range", col("l_discount") >= 0 && col("l_discount") <= 0.1),
    Validity.Rule("price_pos", col("l_extendedprice") > 0),
    Validity.Rule("qty_range", col("l_quantity") >= 1 && col("l_quantity") <= 50),
    Validity.Rule("ship_past", col("l_shipdate") < lit("2026-01-01").cast("timestamp")),
    Validity.Rule("tax_range", col("l_tax") >= 0 && col("l_tax") <= 0.1))

  // ---------------------------------------------------------------- queries

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_gap_report" -> ((s, dir) => pipelineGapReport(s, dir)),
    "q_count_events" -> ((s, dir) =>
      Tables.events(s, dir).agg(count(lit(1)).as("n"))),
    "q_agg_pricing" -> ((s, dir) => aggPricing(s, dir)),
    "q_nonnull_census" -> ((s, dir) =>
      Completeness.nonNullCensus(Tables.lineitem(s, dir))),
    "q_null_census" -> ((s, dir) =>
      Completeness.nullCensus(Tables.events(s, dir))),
    "q_freq_event_type" -> ((s, dir) =>
      Consistency.freqTable(Tables.events(s, dir), "event_type")),
    "q_dup_groups_exact" -> ((s, dir) =>
      Uniqueness.exactDupGroups(Tables.events(s, dir))),
    "q_dedup_count" -> ((s, dir) =>
      Uniqueness.dropDups(Tables.lineitem(s, dir)).agg(count(lit(1)).as("n"))),
    "q_compound_dups" -> ((s, dir) =>
      Uniqueness.compoundDupGroups(
          Tables.events(s, dir).withColumn("day", col("ts").cast("date")),
          Seq("user_id", "day"))
        .orderBy(col("user_id"), col("day"))),
    "q_daily_counts" -> ((s, dir) =>
      Timeliness.dailyCounts(Tables.events(s, dir), col("ts")).orderBy(col("day"))),
    "q_calendar_gaps" -> ((s, dir) => pipelineGapReport(s, dir)),
    "q_describe_lineitem" -> ((s, dir) =>
      Accuracy.summaryStats(Tables.lineitem(s, dir), lineitemNumCols)),
    "q_histogram_price" -> ((s, dir) =>
      Accuracy.histogram(Tables.lineitem(s, dir), "l_extendedprice", 20)),
    "q_validity_report" -> ((s, dir) =>
      Validity.report(Tables.lineitem(s, dir), lineitemRules)),
    "q_union_split" -> ((s, dir) => unionSplit(s, dir)),
    "q_time_derivation" -> ((s, dir) => timeDerivation(s, dir)),
    "q_sql_view_revenue" -> ((s, dir) => sqlViewRevenue(s, dir)),
    "q_grouping_sets" -> ((s, dir) => groupingSets(s, dir)),
    "q_topk_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),
    "q_join_geo" -> ((s, dir) => joinGeo(s, dir)),
    "q_join_revenue" -> ((s, dir) => joinRevenue(s, dir)),
    "q_left_anti_customers" -> ((s, dir) => leftAntiCustomers(s, dir)),
    "q_window_latest_event" -> ((s, dir) => windowLatestEvent(s, dir)),
    "q_json_extract" -> ((s, dir) => jsonExtract(s, dir)),
    "q_range_datedim" -> ((s, dir) =>
      Timeliness.dateDim(s, java.sql.Date.valueOf("2024-01-01"),
          java.sql.Date.valueOf("2024-01-30"))
        .orderBy(col("day"))),
    "q_case_buckets" -> ((s, dir) => caseBuckets(s, dir)),
    "q_csv_roundtrip" -> ((s, dir) => csvRoundtrip(s, dir)),
    "q_parquet_roundtrip" -> ((s, dir) => parquetRoundtrip(s, dir)),
    "q_orc_roundtrip" -> ((s, dir) => orcRoundtrip(s, dir)),
    "q_text_roundtrip" -> ((s, dir) => textRoundtrip(s, dir)),
    "q_describe_strings" -> ((s, dir) => describeStrings(s, dir)),
    "q_describe_mixed" -> ((s, dir) =>
      // The reference's single-call df.describe() over numeric AND
      // string columns as ONE relation (notebook.py:134) — the split
      // q_describe_lineitem / q_describe_strings twins remain the
      // typed-column forms.
      graft.quality.Accuracy.summaryStatsMixed(Tables.lineitem(s, dir),
        lineitemNumCols, Seq("l_returnflag", "l_linestatus"))),
    "q_fs_listing" -> ((s, dir) =>
      graft.etl.Sources.ls(s, dir)
        .select(col("name"), col("size"))
        .orderBy(col("name"))),
    "q_json_roundtrip" -> ((s, dir) => jsonRoundtrip(s, dir)),
    "q_current_year" -> ((s, dir) =>
      // P6/X9: predicate vs the dynamic year(current_date()) scalar —
      // evaluated engine-side in both Spark and the oracle (same day).
      Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) < year(current_date()))
        .agg(count(lit(1)).as("n"))),
    "q_preview" -> ((s, dir) =>
      // P10/O2/O3: deterministic preview = orderBy unique key + limit.
      Tables.events(s, dir)
        .orderBy(col("event_id"))
        .limit(5)
        .select(col("event_id"), col("event_type"))),
    "q_schema_introspect" -> ((s, dir) => schemaIntrospect(s, dir)),
    "q_semi_customers" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"))),
    "q_join_full_nation" -> ((s, dir) => joinFullNation(s, dir)),
    "q_stream_daily_counts" -> ((s, dir) =>
      // Structured Streaming twin of q_daily_counts: readStream →
      // watermark → tumbling 1-day window → memory sink, bounded run.
      // Same rows as the batch query — one oracle serves both.
      graft.streaming.StreamOps.withScaledStatePartitions(s,
          graft.streaming.StreamOps.eventsBytes(s, dir))(
        graft.streaming.StreamOps.runAvailableNow(
          graft.streaming.StreamOps.dailyCounts(
            graft.streaming.StreamOps.eventsStream(s, dir)),
          "stream_daily_counts"))
        .orderBy(col("day"))),
    "q_window_running_sum" -> ((s, dir) => windowRunningSum(s, dir)),
    "q_rollup_pricing" -> ((s, dir) =>
      // Multi-dimensional aggregation: rollup with subtotal rows.
      // grouping() disambiguates subtotal NULLs from data NULLs.
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))),
    "q_cube_pricing" -> ((s, dir) =>
      // CUBE: every grouping-set combination including the cross
      // margins rollup omits; grouping() disambiguates subtotal NULLs.
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))),
    "q_except_parts" -> ((s, dir) =>
      // Set difference: parts never ordered (EXCEPT = distinct anti).
      Tables.part(s, dir).select(col("p_partkey").as("k"))
        .except(Tables.lineitem(s, dir).select(col("l_partkey").as("k")))
        .orderBy(col("k"))),
    "q_intersect_keys" -> ((s, dir) =>
      Tables.part(s, dir).select(col("p_partkey").as("k"))
        .intersect(Tables.lineitem(s, dir).select(col("l_partkey").as("k")))
        .agg(count(lit(1)).as("n"))),
    "q_percentiles" -> ((s, dir) =>
      // Exact interpolated percentiles (sort-based; the approximate
      // sketch upgrade at scale is approx_percentile/t-digest).
      Tables.lineitem(s, dir).agg(
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))),
    "q_topn_per_group" -> ((s, dir) => {
      // Window top-n: the 3 highest-value orders per status — the
      // general row_number()-filter family q_topk_orders' global
      // TakeOrdered can't express. Deterministic tiebreak on the key.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("o_orderstatus"), col("rk").cast("long").as("rk"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("rk"))
    }),
    "q_group_percentiles" -> ((s, dir) =>
      // Per-group exact percentiles — the grouped sibling of
      // q_percentiles (one sort-based aggregation per group key).
      Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
        .orderBy(col("l_returnflag"))),
    "q_pivot_status" -> ((s, dir) =>
      // Pivot: one count column per line status value.
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("l_returnflag")))
  )

  /** Window with an explicit frame spec (rows unbounded-preceding to
    * current): running revenue per customer in order date order. */
  private def windowRunningSum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** A4 string-column describe() parity: count + lexicographic min/max,
    * mean/stddev null (the reference stringifies; we keep typed columns
    * with NULL where a stat is undefined for strings). */
  private def describeStrings(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_returnflag", "l_linestatus")
    val df = Tables.lineitem(s, dir)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"), min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}_n").as("n"),
        lit(null).cast("double").as("mean"), lit(null).cast("double").as("stddev"),
        col(s"${c}_min").as("min"), col(s"${c}_max").as("max"))
    }
    wide.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
      .orderBy(col("col_name"))
  }

  /** S4: JSON write → schema-INFERRING read round-trip (the reference's
    * metadata.json path), aggregated on exact integer sums only so the
    * result is independent of JSON double formatting. */
  private def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    // Per-invocation temp dir: a fixed hash-derived path would race
    // when two sessions verify the same sf dir concurrently.
    val tmp = scratchDir("json_")
    Tables.events(s, dir).select(col("event_id"), col("event_type"))
      .write.mode("overwrite").json(tmp)
    graft.etl.Sources.json(s, tmp)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
      .orderBy(col("event_type"))
  }

  /** M1–M3: schema introspection surfaced as a relation (name, type),
    * types rendered in ANSI SQL names so the oracle can read DuckDB's
    * information_schema. */
  private def schemaIntrospect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = Tables.lineitem(s, dir).schema.fields.toSeq.map { f =>
      val sqlType = f.dataType match {
        case LongType => "BIGINT"
        case IntegerType => "INTEGER"
        case DoubleType => "DOUBLE"
        case StringType => "VARCHAR"
        // Parquet timestamps surface as NTZ (isAdjustedToUTC=false) —
        // both map to the ANSI name the oracle's information_schema uses.
        case TimestampType | TimestampNTZType => "TIMESTAMP"
        case dt => dt.sql
      }
      (f.name, sqlType)
    }
    s.createDataFrame(fields).toDF("column_name", "data_type")
      .orderBy(col("column_name"))
  }

  /** Full-outer join: per-nation customer and supplier presence, nulls
    * coalesced — exercises the one join type the parity suite lacked. */
  private def joinFullNation(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, Seq("nk"), "full_outer")
      .select(col("nk"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nk"))
  }

  /** Flagship (SURVEY §7.2): events → derive day → drop a synthetic day
    * (min+14) → daily counts → calendar-gap left join → the gap day.
    * Driver-level adaptivity: min day and the gap bounds are 1-row aggs
    * collected to the driver (reference A10/E1-step-4 pattern).
    */
  def pipelineGapReport(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir).select(col("ts").cast("date").as("day"))
    val minDay = days.agg(min(col("day"))).first().getDate(0)
    val gapDay = java.sql.Date.valueOf(minDay.toLocalDate.plusDays(14))
    val daily = days.where(col("day") =!= lit(gapDay))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    Timeliness.calendarGaps(s, daily)
  }

  /** TPC-H Q1 shape: exact-decimal sums, double division at the end. */
  private def aggPricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty", col("sum_qty") / col("n_rows").cast("double"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** U1 union-all (positional) of two disjoint slices, re-aggregated. */
  private def unionSplit(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.where(col("o_orderkey") % 2 === 0)
      .union(o.where(col("o_orderkey") % 2 === 1))
      .agg(count(lit(1)).as("n"),
           sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
  }

  /** X1–X8: the reference's digit-exact HHmm→timestamp derivation
    * applied to a synthetic HHmm column (event_id % 2500 covers the
    * '24xx' wrap, the <3-digit, the 3-digit, and the invalid-minute
    * cases). `mi` stays UN-padded exactly like the reference's
    * right(s,2); padding happens only inside the timestamp concat.
    */
  private def timeDerivation(s: SparkSession, dir: String): DataFrame = {
    val hhmm = (col("event_id") % 2500).cast("int")
    val hh = TimeDerivation.hhmmHour(hhmm)
    val mi = TimeDerivation.hhmmMin(hhmm)
    // try_to_timestamp, not to_timestamp: invalid minutes (event_id %
    // 2500 produces e.g. minute 99) must yield null under ANSI mode
    // too, matching the oracle's try_strptime (and the ANSI-safety of
    // TimeDerivation.hhmmTimestamp).
    val ets = try_to_timestamp(
      concat(col("ts").cast("date").cast("string"), lit(" "),
        lpad(hh, 2, "0"), lit(":"), lpad(mi, 2, "0")),
      lit("yyyy-MM-dd HH:mm"))
    Tables.events(s, dir)
      .select(col("event_id"), hh.as("hh"), mi.as("mi"), ets.as("ets"))
      .orderBy(col("event_id"))
  }

  /** Y4: temp-view registration + spark.sql as the query surface. */
  private def sqlViewRevenue(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql("""
      SELECT c.c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY seg""")
  }

  /** Explicit GROUPING SETS — the general form behind rollup/cube
    * (q_rollup_pricing / q_cube_pricing cover the shorthands); the
    * DataFrame API has no direct grouping-sets call, so this rides the
    * SQL surface like sqlViewRevenue. One shuffle: Spark expands the
    * sets map-side, it does not re-aggregate per set. */
  private def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql("""
      SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      FROM lineitem_v
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""")
  }

  /** Broadcast star join: tiny dims are explicitly broadcast. */
  private def joinGeo(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("r_name"), col("n_name"))

  /** 5-table revenue rollup; fact-to-fact join shuffles on the key,
    * dimension joins broadcast. */
  private def joinRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("r_name"), col("n_name"))

  /** Anti join: customers that never ordered. */
  private def leftAntiCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Window function (engine extension per SURVEY §2.5): latest event
    * per user via row_number. */
  private def windowLatestEvent(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy(col("user_id"))
  }

  /** S4 analogue: semi-structured JSON column → typed field (from_json). */
  private def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy(col("event_type"))

  /** X1-style CASE bucketing over a numeric column. */
  private def caseBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(when(col("value") < 50, "low")
        .when(col("value") < 150, "mid")
        .otherwise("high").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** S5+S6: CSV write→explicit-schema read round-trip, then aggregate.
    * Doubles survive the text round-trip exactly (Java shortest-repr
    * toString ↔ parse), so the oracle can aggregate the parquet source
    * directly.
    */
  private def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("csv_")
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag")
    Tables.lineitem(s, dir).select(cols.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("l_orderkey", org.apache.spark.sql.types.LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", org.apache.spark.sql.types.DoubleType),
      StructField("l_extendedprice", org.apache.spark.sql.types.DoubleType),
      StructField("l_returnflag", org.apache.spark.sql.types.StringType)))
    graft.etl.Sources.csv(s, tmp, schema)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** S6+S7+Y1–Y3: size-aware parquet write → read back → daily counts. */
  private def parquetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("pq_")
    graft.io.Writer.sizedParquet(Tables.events(s, dir), tmp)
    Timeliness.dailyCounts(graft.etl.Sources.parquet(s, tmp), col("ts"))
      .orderBy(col("day"))
  }

  /** ORC write → read back → per-status revenue: Spark's second
    * columnar builtin (vectorized read, predicate pushdown — the same
    * scan contract as parquet). The oracle computes the aggregate from
    * the original table, so the compare proves roundtrip identity. */
  private def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("orc_")
    Tables.orders(s, dir).write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Plain text-lines sink/source (one document per line — the rawest
    * corpus interchange format). Writers drop nothing here: the
    * fixture is newline-free and non-null, and the oracle aggregates
    * the original table, so equality proves the line roundtrip
    * lossless. A corpus with embedded newlines would need the json or
    * parquet path instead. */
  private def textRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("txt_")
    Tables.documents(s, dir).select(col("text"))
      .write.mode("overwrite").text(tmp)
    s.read.text(tmp)
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("value"))).cast("long").as("n_chars"))
  }

  // ----------------------------------------------------------------- oracle

  private def censusOracle(table: String, cols: Seq[String]): String =
    "SELECT " + cols.map(c => s"CAST(COUNT($c) AS BIGINT) AS $c").mkString(", ") +
      s" FROM $table"

  private def nullCensusOracle(table: String, cols: Seq[String]): String =
    "SELECT " + cols.map(c =>
      s"CAST(COUNT(*) - COUNT($c) AS BIGINT) AS ${c}_nulls, " +
      s"CAST(COUNT(*) - COUNT($c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ${c}_null_ratio"
    ).mkString(", ") + s" FROM $table"

  // Caveat (sf0.1+ only): once the exact decimal sums exceed 2^53 the
  // final cast-to-double must round; Spark (BigDecimal.doubleValue,
  // correctly rounded) and DuckDB (int128 → double, not always) can
  // then differ by 1–2 ulp in stddev. Exact at the sf0.01 gate.
  private def describeOracle(table: String, cols: Seq[String]): String =
    cols.map { c =>
      val sm = s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
      // DECIMAL(19,4) factors force DuckDB onto its int128 multiply path
      // (18-digit decimals multiply in int64 and overflow); values are
      // identical to Spark's decimal(18,4)² exact products.
      val sq = s"CAST(SUM(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(19,4))) AS DOUBLE)"
      val n = s"CAST(COUNT($c) AS DOUBLE)"
      s"""SELECT '$c' AS col_name, CAST(COUNT($c) AS BIGINT) AS n,
         | $sm / $n AS mean,
         | SQRT(GREATEST(($sq - $sm * $sm / $n) / ($n - 1), 0)) AS stddev,
         | CAST(MIN($c) AS DOUBLE) AS min, CAST(MAX($c) AS DOUBLE) AS max
         | FROM $table""".stripMargin.replaceAll("\n", " ")
    }.mkString("SELECT * FROM (", " UNION ALL ", ") t ORDER BY col_name")

  /** Mixed describe() oracle: numeric rows replay the exact-decimal
    * mean/stddev with DECIMAL(18,4)-text extrema; string rows carry
    * null mean/stddev and raw lexicographic extrema. Fixed-scale
    * decimal text prints identically on both engines (raw double
    * text would not — see Accuracy.summaryStatsMixed). */
  private def describeMixedOracle(table: String, numCols: Seq[String],
                                  strCols: Seq[String]): String = {
    val numSelects = numCols.map { c =>
      val sm = s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
      val sq = s"CAST(SUM(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(19,4))) AS DOUBLE)"
      val n = s"CAST(COUNT($c) AS DOUBLE)"
      s"""SELECT '$c' AS col_name, CAST(COUNT($c) AS BIGINT) AS n,
         | $sm / $n AS mean,
         | SQRT(GREATEST(($sq - $sm * $sm / $n) / ($n - 1), 0)) AS stddev,
         | CAST(CAST(MIN($c) AS DECIMAL(18,4)) AS VARCHAR) AS min_s,
         | CAST(CAST(MAX($c) AS DECIMAL(18,4)) AS VARCHAR) AS max_s
         | FROM $table""".stripMargin.replaceAll("\n", " ")
    }
    val strSelects = strCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT($c) AS BIGINT) AS n,
         | CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS stddev,
         | MIN($c) AS min_s, MAX($c) AS max_s FROM $table""".stripMargin.replaceAll("\n", " ")
    }
    (numSelects ++ strSelects)
      .mkString("SELECT * FROM (", " UNION ALL ", ") t ORDER BY col_name")
  }

  private val validityOracle: String = {
    val conds = Seq(
      "disc_range" -> "l_discount >= 0 AND l_discount <= 0.1",
      "price_pos" -> "l_extendedprice > 0",
      "qty_range" -> "l_quantity >= 1 AND l_quantity <= 50",
      "ship_past" -> "l_shipdate < TIMESTAMP '2026-01-01'",
      "tax_range" -> "l_tax >= 0 AND l_tax <= 0.1")
    conds.map { case (name, cond) =>
      s"SELECT '$name' AS rule, CAST(SUM(CASE WHEN NOT($cond) THEN 1 ELSE 0 END) AS BIGINT) AS failures FROM lineitem"
    }.mkString("SELECT * FROM (", " UNION ALL ", ") t ORDER BY rule")
  }

  private val timeDerivationOracle: String =
    """SELECT event_id, hh, mi,
      | try_strptime(CAST(d AS VARCHAR) || ' ' || lpad(hh, 2, '0') || ':' || lpad(mi, 2, '0'), '%Y-%m-%d %H:%M') AS ets
      | FROM (
      |  SELECT event_id, d,
      |   CASE WHEN substr(st, 1, 2) = '24' THEN '00'
      |        WHEN length(st) < 3 THEN '00'
      |        WHEN length(st) = 3 THEN substr(st, 1, 1)
      |        ELSE substr(st, 1, 2) END AS hh,
      |   right(st, 2) AS mi
      |  FROM (SELECT event_id, CAST(ts AS DATE) AS d,
      |        CAST(CAST(event_id % 2500 AS INT) AS VARCHAR) AS st FROM events) a
      | ) b ORDER BY event_id""".stripMargin.replaceAll("\n", " ")

  private val gapOracle: String =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day FROM events),
      | ex AS (SELECT MIN(day) + 14 AS gap FROM d),
      | daily AS (SELECT day, COUNT(*) AS n FROM d WHERE day <> (SELECT gap FROM ex) GROUP BY day),
      | mm AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
      | dim AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM mm)
      | SELECT dim.day AS day FROM dim LEFT JOIN daily ON dim.day = daily.day
      | WHERE COALESCE(daily.n, 0) = 0 ORDER BY day""".stripMargin.replaceAll("\n", " ")

  val oracle: Map[String, String] = Map(
    "pipeline_gap_report" -> gapOracle,
    "q_calendar_gaps" -> gapOracle,
    "q_count_events" -> "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events",
    "q_agg_pricing" -> """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      | CAST(COUNT(*) AS BIGINT) AS n_rows,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
      | FROM lineitem GROUP BY l_returnflag, l_linestatus
      | ORDER BY l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q_nonnull_census" -> censusOracle("lineitem", lineitemCols),
    "q_null_census" -> nullCensusOracle("events", eventsCols),
    "q_freq_event_type" ->
      "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "q_dup_groups_exact" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS dup_groups FROM (SELECT " +
        eventsCols.mkString(", ") +
        " FROM events GROUP BY " + eventsCols.mkString(", ") +
        " HAVING COUNT(*) > 1) t"),
    "q_dedup_count" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT DISTINCT * FROM lineitem) t",
    "q_compound_dups" ->
      """SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        | FROM events GROUP BY user_id, CAST(ts AS DATE)
        | HAVING COUNT(*) > 1 ORDER BY user_id, day""".stripMargin.replaceAll("\n", " "),
    "q_daily_counts" ->
      "SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY day",
    "q_describe_lineitem" -> describeOracle("lineitem", lineitemNumCols),
    "q_describe_mixed" -> describeMixedOracle("lineitem", lineitemNumCols,
      Seq("l_returnflag", "l_linestatus")),
    "q_histogram_price" ->
      """WITH mm AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem),
        | b AS (SELECT LEAST(CAST(FLOOR((l_extendedprice - mm.lo) / ((mm.hi - mm.lo) / 20)) AS BIGINT), 19) AS bucket FROM lineitem, mm)
        | SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bucket ORDER BY bucket""".stripMargin.replaceAll("\n", " "),
    "q_validity_report" -> validityOracle,
    "q_union_split" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        | FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0
        |       UNION ALL SELECT * FROM orders WHERE o_orderkey % 2 = 1) t""".stripMargin.replaceAll("\n", " "),
    "q_time_derivation" -> timeDerivationOracle,
    "q_sql_view_revenue" ->
      """SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        | GROUP BY c.c_mktsegment ORDER BY seg""".stripMargin.replaceAll("\n", " "),
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        | FROM lineitem
        | GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        | ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q_topk_orders" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_join_geo" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin.replaceAll("\n", " "),
    "q_join_revenue" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin.replaceAll("\n", " "),
    "q_left_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        | ORDER BY c_custkey""".stripMargin.replaceAll("\n", " "),
    "q_window_latest_event" ->
      """SELECT user_id, event_id, ts FROM (
        |  SELECT user_id, event_id, ts,
        |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin.replaceAll("\n", " "),
    "q_json_extract" ->
      """SELECT event_type,
        | CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(COUNT(props) AS BIGINT) AS n_k
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    "q_range_datedim" ->
      """SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day
        | ORDER BY day""".stripMargin.replaceAll("\n", " "),
    "q_case_buckets" ->
      """SELECT CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS bucket,
        | CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY bucket""".stripMargin.replaceAll("\n", " "),
    "q_csv_roundtrip" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " "),
    "q_parquet_roundtrip" ->
      "SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY day",
    "q_text_roundtrip" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
        | CAST(SUM(length(text)) AS BIGINT) AS n_chars FROM documents""".stripMargin.replaceAll("\n", " "),
    // Computed from the ORIGINAL table — equality proves the ORC
    // write/read roundtrip is lossless.
    "q_orc_roundtrip" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        | FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replaceAll("\n", " "),
    "q_describe_strings" ->
      """SELECT * FROM (
        | SELECT 'l_returnflag' AS col_name, CAST(COUNT(l_returnflag) AS BIGINT) AS n,
        |  CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS stddev,
        |  MIN(l_returnflag) AS min, MAX(l_returnflag) AS max FROM lineitem
        | UNION ALL
        | SELECT 'l_linestatus', CAST(COUNT(l_linestatus) AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  MIN(l_linestatus), MAX(l_linestatus) FROM lineitem
        |) t ORDER BY col_name""".stripMargin.replaceAll("\n", " "),
    // The correctness gate always runs at sf0.01 (TESTDATA.md), so the
    // oracle's listing path is pinned to that directory.
    "q_fs_listing" ->
      """SELECT regexp_extract(filename, '[^/]+$') AS name, CAST(size AS BIGINT) AS size
        | FROM read_blob('/root/testdata/sf0.01/*') ORDER BY name""".stripMargin.replaceAll("\n", " "),
    "q_json_roundtrip" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_id
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    // Pinned to UTC on both sides: Spark's session runs UTC, while
    // DuckDB's current_date is host-local — near midnight across a
    // year boundary the two could otherwise disagree.
    "q_current_year" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE year(l_shipdate) < year(CAST((now() AT TIME ZONE 'UTC') AS DATE))",
    "q_preview" ->
      "SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 5",
    "q_schema_introspect" ->
      """SELECT column_name, data_type FROM information_schema.columns
        | WHERE table_name = 'lineitem' ORDER BY column_name""".stripMargin.replaceAll("\n", " "),
    "q_semi_customers" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin.replaceAll("\n", " "),
    "q_join_full_nation" ->
      """SELECT COALESCE(c.nk, s.nk) AS nk,
        | CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
        | CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
        | FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        | FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        | ON c.nk = s.nk ORDER BY nk""".stripMargin.replaceAll("\n", " "),
    "q_stream_daily_counts" ->
      "SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY day",
    "q_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        | FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin.replaceAll("\n", " "),
    "q_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        | FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        | ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q_cube_pricing" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        | FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        | ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q_except_parts" ->
      """SELECT p_partkey AS k FROM part
        | EXCEPT SELECT l_partkey AS k FROM lineitem ORDER BY k""".stripMargin.replaceAll("\n", " "),
    "q_intersect_keys" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        | SELECT p_partkey AS k FROM part
        | INTERSECT SELECT l_partkey AS k FROM lineitem) t""".stripMargin.replaceAll("\n", " "),
    "q_percentiles" ->
      """SELECT quantile_cont(l_extendedprice, 0.25) AS p25,
        | quantile_cont(l_extendedprice, 0.5) AS p50,
        | quantile_cont(l_extendedprice, 0.95) AS p95 FROM lineitem""".stripMargin.replaceAll("\n", " "),
    "q_topn_per_group" ->
      """SELECT o_orderstatus, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice FROM (
        | SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) t
        | WHERE rk <= 3 ORDER BY o_orderstatus, rk""".stripMargin.replaceAll("\n", " "),
    "q_group_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.25) AS p25,
        | quantile_cont(l_extendedprice, 0.5) AS p50,
        | quantile_cont(l_extendedprice, 0.95) AS p95
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " "),
    "q_pivot_status" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        | CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " ")
  )
}
