package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Interval-bucketed range join: exact same pairs as the naive
  * inequality join, found through an equi-join (no nested-loop node).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("temporalPairs equals the naive inequality join, including bucket-boundary pairs") {
    // Gaps straddling bucket boundaries (maxGap 10): (3,9) same
    // bucket, (9,12) adjacent buckets, (12,22) exactly maxGap apart
    // (inclusive), (22,33) beyond maxGap (excluded), key isolation.
    val df = Seq((1L, 3L), (1L, 9L), (1L, 12L), (1L, 22L), (1L, 33L),
      (2L, 9L), (3L, 11L)).toDF("k", "t")
    val got = RangeJoin.temporalPairs(df, "k", "t", maxGap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = df.select(col("k"), col("t").as("t_a"))
      .join(df.select(col("k"), col("t").as("t_b")), Seq("k"))
      .where(col("t_b") > col("t_a") && col("t_b") - col("t_a") <= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, s"bucketed != naive:\n$got\nvs\n$naive")
    assert(got == Set((1L, 3L, 9L), (1L, 3L, 12L), (1L, 9L, 12L),
      (1L, 12L, 22L)), s"unexpected pairs: $got")
  }

  test("temporalPairs plans an equi-join, not a nested loop") {
    val df = Seq((1L, 3L), (1L, 9L)).toDF("k", "t")
    val plan = RangeJoin.temporalPairs(df, "k", "t", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join degraded to a nested loop:\n$plan")
  }
}
