package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.{Completeness, Timeliness, Uniqueness, Validity}

/** The reference's end-to-end flight pipeline, re-expressed Spark-first
  * (reference: /root/reference/Processing Flight Data with Spark on
  * Databricks.py — load notebook.py:125–149, completeness 166–194,
  * dedup 249–294, SQL timestamp derivation 260–291, validity 314–352,
  * timeliness 364–401, persist 419–437).
  *
  * Differences from the reference, by design (SURVEY §4):
  *   - the post-drop and post-dedup tables are persisted — the
  *     reference rescans the CSV for every check (10 full passes in the
  *     validity block alone); caching changes no semantics and is the
  *     single biggest win at scale;
  *   - validity runs as ONE aggregation pass (Validity.report), not 10
  *     filter+count jobs.
  */
object FlightPipeline {

  /** Compound flight key (notebook.py:258). */
  val compoundKey: Seq[String] =
    Seq("Origin", "UniqueCarrier", "FlightNum", "DepTime_Timestamp")

  /** The reference's 10 validity rules (notebook.py:314–352) paired
    * with the column each guards (one table defines both the rule and
    * the dropped-column filter), the `year(current_date())` bound
    * injectable for determinism (SURVEY §7.5.6). */
  def referenceRulesWithColumns(asOfYear: Int): Seq[(Validity.Rule, String)] = Seq(
    (Validity.Rule("year_past", col("Year") < asOfYear), "Year"),
    (Validity.Rule("month_range", col("Month").between(1, 12)), "Month"),
    (Validity.Rule("dayofmonth_range", col("DayofMonth").between(1, 31)), "DayofMonth"),
    (Validity.Rule("dayofweek_range", col("DayOfWeek").between(1, 7)), "DayOfWeek"),
    (Validity.Rule("deptime_range", col("DepTime").between(1, 2400)), "DepTime"),
    (Validity.Rule("crsdeptime_range", col("CRSDepTime").between(1, 2400)), "CRSDepTime"),
    (Validity.Rule("arrtime_range", col("ArrTime").between(1, 2400)), "ArrTime"),
    (Validity.Rule("crsarrtime_range", col("CRSArrTime").between(1, 2400)), "CRSArrTime"),
    (Validity.Rule("flightnum_pos", col("FlightNum") > 0), "FlightNum"),
    (Validity.Rule("distance_pos", col("Distance") > 0), "Distance"))

  def referenceRules(asOfYear: Int): Seq[Validity.Rule] =
    referenceRulesWithColumns(asOfYear).map(_._1)

  /** S5: explicit-schema PERMISSIVE CSV load. */
  def load(spark: SparkSession, path: String): DataFrame =
    Sources.csv(spark, path, FlightSchema.schema)

  /** Column-API timestamp derivation (X1–X8). `DepTime_Date` derives
    * from Year/Month/DayofMonth ONLY (reference notebook.py:365–377) —
    * a row with null/malformed DepTime still has its calendar date, so
    * cancelled flights count toward their day in the timeliness check.
    */
  def deriveTimestamps(df: DataFrame): DataFrame =
    df.withColumn("DepTime_Hour", TimeDerivation.hhmmHour(col("DepTime")))
      .withColumn("DepTime_Min", TimeDerivation.hhmmMin(col("DepTime")))
      .withColumn("DepTime_Timestamp", TimeDerivation.hhmmTimestamp(
        col("Year"), col("Month"), col("DayofMonth"), col("DepTime")))
      .withColumn("DepTime_Date", try_to_timestamp(
        concat(col("Year").cast("string"), lit("-"),
          lpad(col("Month").cast("string"), 2, "0"), lit("-"),
          lpad(col("DayofMonth").cast("string"), 2, "0")),
        lit("yyyy-MM-dd")))

  /** SQL-surface twin of deriveTimestamps (Y4/E2: temp view +
    * spark.sql), semantically identical to the reference's embedded SQL
    * (notebook.py:260–291). Tests assert SQL ≡ Column-API. */
  def deriveTimestampsSql(spark: SparkSession, df: DataFrame): DataFrame = {
    // Unique per-call view name: a fixed name would clobber a caller's
    // view and race between concurrent calls in one session.
    val view = "flights_v_" + java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceTempView(view)
    try deriveSql(spark, view)
    finally spark.catalog.dropTempView(view)
  }

  private def deriveSql(spark: SparkSession, view: String): DataFrame = {
    val hourCase =
      """CASE WHEN substring(CAST(DepTime AS STRING), 1, 2) = '24' THEN '00'
        |     WHEN length(CAST(DepTime AS STRING)) < 3 THEN '00'
        |     WHEN length(CAST(DepTime AS STRING)) = 3 THEN substring(CAST(DepTime AS STRING), 1, 1)
        |     ELSE substring(CAST(DepTime AS STRING), 1, 2) END""".stripMargin
    spark.sql(
      s"""SELECT *,
         |  $hourCase AS DepTime_Hour,
         |  right(CAST(DepTime AS STRING), 2) AS DepTime_Min,
         |  try_to_timestamp(concat(
         |    CAST(Year AS STRING), '-',
         |    lpad(CAST(Month AS STRING), 2, '0'), '-',
         |    lpad(CAST(DayofMonth AS STRING), 2, '0'), ' ',
         |    lpad($hourCase, 2, '0'), ':',
         |    lpad(right(CAST(DepTime AS STRING), 2), 2, '0')),
         |   'yyyy-MM-dd HH:mm') AS DepTime_Timestamp,
         |  try_to_timestamp(concat(
         |    CAST(Year AS STRING), '-',
         |    lpad(CAST(Month AS STRING), 2, '0'), '-',
         |    lpad(CAST(DayofMonth AS STRING), 2, '0')),
         |   'yyyy-MM-dd') AS DepTime_Date
         |FROM $view""".stripMargin)
  }

  /** Full pipeline report — every reference golden in one struct. */
  final case class Report(
    droppedColumns: Seq[String],
    totalRows: Long,
    exactDupGroups: Long,
    rowsAfterDedup: Long,
    compoundDupGroups: Long,
    validity: Map[String, Long],
    gapDays: Seq[java.sql.Date],
    cleaned: DataFrame)

  def run(spark: SparkSession, path: String, asOfYear: Int): Report = {
    val raw = load(spark, path)
    // Census → drop-all-null (driver-level adaptivity, SURVEY §3 E1).
    val (dropped, kept) = Completeness.dropAllNull(raw)
    // The timestamp derivation and the compound key read these columns;
    // if the census dropped one (e.g. a file of only cancelled flights
    // has all-null DepTime) re-add it as a typed null column — the data
    // was all null anyway, so derived values are identical and nothing
    // crashes downstream.
    val required = Seq("Year", "Month", "DayofMonth", "DepTime",
      "FlightNum", "Origin", "UniqueCarrier")
    val derivable = required.foldLeft(kept) { (df, c) =>
      if (df.columns.contains(c)) df
      // Type comes from the authoritative schema, never restated here.
      else df.withColumn(c, lit(null).cast(FlightSchema.schema(c).dataType))
    }
    val cached = derivable.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalRows = cached.count()
    val exactDups = Uniqueness.exactDupGroups(cached).first().getLong(0)
    val deduped = deriveTimestamps(Uniqueness.dropDups(cached))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowsAfterDedup = deduped.count()
    // Everything downstream reads `deduped` (now materialized) — the
    // pre-dedup cache has no further consumers; don't pin it.
    cached.unpersist()
    val compoundDups = Uniqueness.compoundDupGroups(deduped, compoundKey)
      .agg(count(lit(1))).first().getLong(0)
    val applicableRules = referenceRulesWithColumns(asOfYear).collect {
      case (rule, column) if !dropped.contains(column) => rule
    }
    val validity = Validity.report(deduped, applicableRules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val daily = Timeliness.dailyCounts(deduped, col("DepTime_Date"))
    val gaps = Timeliness.calendarGaps(spark, daily)
      .collect().map(_.getDate(0)).toSeq
    Report(dropped, totalRows, exactDups, rowsAfterDedup, compoundDups,
      validity, gaps, deduped)
  }
}
