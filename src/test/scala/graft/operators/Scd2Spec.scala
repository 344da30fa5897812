package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervals collapse runs and chain valid_from/valid_to per key") {
    // key 1: gold → gold → silver → gold  (4 events, 3 runs)
    // key 2: bronze (single event, one open-ended run)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "gold"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "gold"),   // no change: absorbed
      (1L, ts("2024-01-03 00:00:00"), 12L, "silver"),
      (1L, ts("2024-01-04 00:00:00"), 13L, "gold"),
      (2L, ts("2024-02-01 00:00:00"), 20L, "bronze")
    ).toDF("k", "ts", "id", "tier")

    val got = Scd2.intervals(events, "k", "ts", "tier", tieCols = Seq("id"))
      .select(col("k"), col("valid_from"), col("valid_to"), col("tier"))
      .as[(Long, Timestamp, Option[Timestamp], String)]
      .collect().sortBy(r => (r._1, r._2.getTime)).toSeq

    assert(got == Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), "gold"),
      (1L, ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), "silver"),
      (1L, ts("2024-01-04 00:00:00"), None, "gold"),
      (2L, ts("2024-02-01 00:00:00"), None, "bronze")))
  }

  test("null attribute values: null runs collapse, null→value and value→null are changes") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("a")),
      (1L, ts("2024-01-02 00:00:00"), 2L, None),       // a → null: change
      (1L, ts("2024-01-03 00:00:00"), 3L, None),       // null → null: absorbed
      (1L, ts("2024-01-04 00:00:00"), 4L, Some("a"))   // null → a: change
    ).toDF("k", "ts", "id", "tier")
    val got = Scd2.intervals(events, "k", "ts", "tier", tieCols = Seq("id"))
      .select(col("valid_from"), col("tier"))
      .as[(Timestamp, Option[String])].collect().sortBy(_._1.getTime).toSeq
    assert(got == Seq(
      (ts("2024-01-01 00:00:00"), Some("a")),
      (ts("2024-01-02 00:00:00"), None),
      (ts("2024-01-04 00:00:00"), Some("a"))))
  }

  test("intervals tile each key's timeline: from < to, chained, one open end per key") {
    val events = graft.Tables.events(spark, graft.TestSpark.sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val iv = Scd2.intervals(events, "user_id", "ts", "event_type", tieCols = Seq("event_id"))
      .select(col("user_id"), col("valid_from"), col("valid_to"))
      .as[(Long, Timestamp, Option[Timestamp])].collect()
      .groupBy(_._1).values
    iv.foreach { rows =>
      val sorted = rows.sortBy(_._2.getTime)
      assert(sorted.count(_._3.isEmpty) == 1, "exactly one current version per key")
      assert(sorted.last._3.isEmpty, "the open interval is the latest")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), "valid_to must chain to the next valid_from")
        case _ =>
      }
    }
  }
}
