package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Digit-exact goldens + exhaustive domain sweep for the reference's
  * HHmm→hour/min/timestamp derivation (notebook.py:263–291 semantics;
  * SURVEY §7.5.1 calls this the hardest single parity item).
  */
class TimeDerivationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def derive(values: Seq[Integer]): Seq[(Integer, String, String, String)] = {
    values.toDF("t")
      .select(col("t"),
        TimeDerivation.hhmmHour(col("t")).as("hh"),
        TimeDerivation.hhmmMin(col("t")).as("mi"),
        TimeDerivation.hhmmTimestamp(lit(2008), lit(1), lit(15), col("t"))
          .cast("string").as("ts"))
      .collect()
      .map(r => (r.getAs[Integer]("t"), r.getAs[String]("hh"),
        r.getAs[String]("mi"), r.getAs[String]("ts"))).toSeq
  }

  test("reference edge cases derive digit-exactly (FIXTURES.md §1a set)") {
    val got = derive(Seq(5, 9, 55, 630, 955, 1430, 2359, 2400, 2430, null)
      .map(v => if (v == null) null else Integer.valueOf(v.asInstanceOf[Int])))
    val expected = Map[Integer, (String, String, String)](
      Integer.valueOf(5)    -> (("00", "5",  "2008-01-15 00:05:00")),
      Integer.valueOf(9)    -> (("00", "9",  "2008-01-15 00:09:00")),
      Integer.valueOf(55)   -> (("00", "55", "2008-01-15 00:55:00")),
      Integer.valueOf(630)  -> (("6",  "30", "2008-01-15 06:30:00")),
      Integer.valueOf(955)  -> (("9",  "55", "2008-01-15 09:55:00")),
      Integer.valueOf(1430) -> (("14", "30", "2008-01-15 14:30:00")),
      Integer.valueOf(2359) -> (("23", "59", "2008-01-15 23:59:00")),
      // '24xx' wraps to hour 00 of the SAME day — no rollover
      Integer.valueOf(2400) -> (("00", "00", "2008-01-15 00:00:00")),
      Integer.valueOf(2430) -> (("00", "30", "2008-01-15 00:30:00")))
    got.foreach { case (t, hh, mi, ts) =>
      if (t == null) {
        assert(hh == null && mi == null && ts == null, s"null input must derive nulls")
      } else {
        val (ehh, emi, ets) = expected(t)
        assert(hh == ehh, s"hour of $t")
        assert(mi == emi, s"minute of $t")
        assert(ts == ets, s"timestamp of $t")
      }
    }
  }

  test("exhaustive 1..2400: hour always in 00..23, timestamp null iff minutes > 59") {
    val rows = derive((1 to 2400).map(Integer.valueOf))
    assert(rows.size == 2400)
    rows.foreach { case (t, hh, mi, ts) =>
      val hour = ("00" + hh).takeRight(2).toInt
      assert(hour >= 0 && hour <= 23, s"hour of $t out of range: $hh")
      val minute = mi.toInt
      if (minute <= 59) assert(ts != null, s"$t with minute $mi must parse")
      else assert(ts == null, s"$t with minute $mi must NOT parse")
    }
  }

  test("derivation yields null (not an error) under ANSI mode too") {
    // Spark 4 defaults to ANSI; a user session without our legacy
    // setting must still get the reference's null-on-invalid semantics.
    val ansi = spark.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    import ansi.implicits._
    val out = Seq(1299, 630).toDF("t")
      .select(TimeDerivation.hhmmTimestamp(lit(2008), lit(1), lit(15), col("t"))
        .cast("string").as("ts"), col("t"))
      .collect().map(r => r.getAs[Integer]("t").intValue() -> r.getAs[String]("ts")).toMap
    assert(out(1299) == null)                      // minute 99 → null, no throw
    assert(out(630) == "2008-01-15 06:30:00")
  }

  test("SQL twin produces identical derivation to the Column API") {
    val df = graft.etl.FlightPipeline.load(spark,
      getClass.getResource("/flights_mini.csv").getPath)
    val cols = Seq("DepTime", "DepTime_Hour", "DepTime_Min",
      "DepTime_Timestamp", "DepTime_Date")
    val api = FlightPipeline.deriveTimestamps(df).select(cols.head, cols.tail: _*)
    val sql = FlightPipeline.deriveTimestampsSql(spark, df).select(cols.head, cols.tail: _*)
    assert(api.exceptAll(sql).count() == 0 && sql.exceptAll(api).count() == 0)
  }
}
