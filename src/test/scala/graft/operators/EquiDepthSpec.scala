package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** EquiDepth.ntileBuckets must be row-for-row identical to
  * `NTILE(n) OVER (ORDER BY …)` — including the remainder rule that
  * gives the first (total % n) buckets one extra row — while planning
  * NO empty-partition-spec WindowExec (the single-task scale trap the
  * operator exists to avoid). */
class EquiDepthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowNtile(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val w = Window.orderBy(col("a"), col("b"))
    df.withColumn("bucket", ntile(n).over(w).cast("long"))
  }

  private def assertMatchesWindow(rows: Seq[(Int, Int)], n: Int): Unit = {
    val df = rows.toDF("a", "b")
    val got = EquiDepth.ntileBuckets(df, Seq("a", "b"), n)
      .select(col("a"), col("b"), col("bucket"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
    val want = windowNtile(df, n)
      .select(col("a"), col("b"), col("bucket"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("matches window NTILE when total divides evenly") {
    assertMatchesWindow((1 to 20).map(i => (i % 7, i)), 4)
  }

  test("matches window NTILE with remainder (first r buckets get the extra row)") {
    assertMatchesWindow((1 to 23).map(i => (i % 5, i)), 4)
    assertMatchesWindow((1 to 101).map(i => (i * 31 % 97, i)), 10)
  }

  test("matches window NTILE when rows < buckets (one row per bucket)") {
    assertMatchesWindow(Seq((3, 1), (1, 2), (2, 3)), 10)
  }

  test("plans no empty-partition-spec Window (and survives skewed input)") {
    // All rows share `a`; order key stays unique via `b`. The window
    // form would still run ONE task for everything; the operator's
    // plan must contain no WindowExec at all.
    val df = (1 to 50).map(i => (1, i)).toDF("a", "b")
    val out = EquiDepth.ntileBuckets(df, Seq("a", "b"), 7)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "EquiDepth must not plan a WindowExec")
    val sizes = out.groupBy(col("bucket")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 50 = 7*7 + 1 → bucket 1 holds 8 rows, buckets 2..7 hold 7.
    assert(sizes == Map(1L -> 8L, 2L -> 7L, 3L -> 7L, 4L -> 7L,
      5L -> 7L, 6L -> 7L, 7L -> 7L))
  }

  test("percentileValues: exact order statistics at requested ranks, out-of-range ignored") {
    val df = (1L to 1000L).map(i => ((i * 7919) % 1000, i)).toDF("a", "b")
    val got = EquiDepth.percentileValues(df, Seq("a", "b"), Seq(1L, 500L, 1000L, 5000L))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    // Truth via a plain sorted collect at fixture scale.
    val sorted = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.keySet == Set(1L, 500L, 1000L), s"ranks wrong: ${got.keySet}")
    assert(got(1L) == sorted(0) && got(500L) == sorted(499) && got(1000L) == sorted(999),
      s"order statistics diverge: $got")
    // The plan must not contain the empty-partition-spec Window trap.
    val plan = EquiDepth.percentileValues(df, Seq("a", "b"), Seq(1L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"single-task window present:\n$plan")
  }

  test("driver query x_ntile_buckets plans no empty-partition-spec Window") {
    val q = graft.SparkEntry.queries("x_ntile_buckets")(spark, TestSpark.sf0001)
    assert(!q.queryExecution.executedPlan.toString.contains("Window"),
      "x_ntile_buckets must not plan a WindowExec")
  }
}
