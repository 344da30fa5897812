package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  * One parquet directory per table under the given sf dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events table's `ts` encoding has varied across testdata
    * generations; this loader absorbs every encoding seen so far and
    * always yields a session-tz TimestampType column:
    *
    *  - parquet TIMESTAMP(NANOS): Spark does not read it natively —
    *    read the raw nanos as long and floor-divide to micros
    *    (integral DIV: doubles would lose precision above 2^53),
    *    matching DuckDB's nanos→micros truncation.
    *  - parquet timestamp[us] WITHOUT timezone: Spark 4.x infers
    *    TIMESTAMP_NTZ — cast to TimestampType. The session timezone is
    *    pinned UTC by every entry point (Verify/Bench/tests), so the
    *    cast reinterprets the naive value as the same UTC instant the
    *    DuckDB oracle reads from the file, value-identical to the old
    *    nanos path.
    *  - timestamp[us] with timezone: already TimestampType, pass
    *    through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The nanosAsLong flag is only consulted while the relation is
    // resolved (schema inference reads it from SQLConf — a per-read
    // option does NOT reach it), so scope it save/restore style: a
    // loader must not flip a session-global flag under a host
    // application that reads other nanos parquet. Actions on the
    // returned frame stay valid after restore — the resolved relation
    // carries its conversion.
    val flag = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(flag)
    spark.conf.set(flag, "true")
    try {
      val df = load(spark, dir, "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } finally prev match {
      case Some(v) => spark.conf.set(flag, v)
      case None => spark.conf.unset(flag)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (events normalized like the
    * typed loader), making the full star schema queryable through
    * plain `spark.sql` — the drop-in surface for a SQL-first user of
    * the reference (Y4 generalized).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
