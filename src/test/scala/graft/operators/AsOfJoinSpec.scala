package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Backward as-of join: latest right row at or before each left row,
  * per key — with left-outer semantics, tie-at-equal-ts matching, and
  * a window-only plan (one exchange, no join node, no row explosion).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("asOfBackward: latest-at-or-before match, ties match, no-match is null") {
    val left = Seq(
      (1L, ts(10), "l10"), (1L, ts(20), "l20"), (1L, ts(5), "l5"),
      (2L, ts(10), "m10")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(7), "r7"), (1L, ts(20), "r20"), (1L, ts(25), "r25"),
      (3L, ts(1), "x1")).toDF("k", "t", "rv")
    val out = AsOfJoin.asOfBackward(left, right, "k", "t", Seq("rv"), "prev_")
      .select(col("k"), col("t"), col("lv"), col("prev_rv"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
        r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 5L, "l5", null),        // before any right row
      (1L, 10L, "l10", "r7"),      // latest at-or-before 10 is 7
      (1L, 20L, "l20", "r20"),     // tie at equal ts matches
      (2L, 10L, "m10", null)),     // key with no right rows at all
      s"unexpected as-of result: $out")
  }

  test("asOfBackward: a matched right row with a NULL payload yields null (not LOCF)") {
    // Right rows at 5 (payload "r5") and 15 (payload NULL): a left row
    // at 20 must surface the null from the MATCHED row at 15 — an
    // implementation carrying per-column last(ignoreNulls) would skip
    // it and leak "r5" forward (last-observation-carried-forward,
    // which is a different operator).
    val left = Seq((1L, ts(20), "l20")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(5), Some("r5")), (1L, ts(15), Option.empty[String])
    ).toDF("k", "t", "rv")
    val out = AsOfJoin.asOfBackward(left, right, "k", "t", Seq("rv"))
      .select(col("asof_rv")).collect()
    assert(out.length == 1 && out(0).isNullAt(0),
      s"matched-but-null payload must stay null, got ${out.toSeq}")
    // Multi-payload: both fields come from the SAME matched row.
    val right2 = Seq(
      (1L, ts(5), Some("r5"), Some(50L)), (1L, ts(15), Option.empty[String], Some(150L))
    ).toDF("k", "t", "rv", "rn")
    val out2 = AsOfJoin.asOfBackward(left, right2, "k", "t", Seq("rv", "rn"))
      .select(col("asof_rv"), col("asof_rn")).first()
    assert(out2.isNullAt(0) && out2.getLong(1) == 150L,
      "payload fields must be carried atomically from the matched row")
  }

  test("asOfBackward plans one exchange and no join node") {
    val left = Seq((1L, ts(10), "a")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(7), "b")).toDF("k", "t", "rv")
    val plan = AsOfJoin.asOfBackward(left, right, "k", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"as-of should shuffle exactly once (key partitioning):\n$plan")
  }

  test("asOfForward: earliest-at-or-after match, ties match, no-match is null") {
    val left = Seq(
      (1L, ts(10), "l10"), (1L, ts(20), "l20"), (1L, ts(30), "l30"),
      (2L, ts(10), "m10")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(7), "r7"), (1L, ts(20), "r20"), (1L, ts(25), "r25"),
      (3L, ts(1), "x1")).toDF("k", "t", "rv")
    val out = AsOfJoin.asOfForward(left, right, "k", "t", Seq("rv"), "next_")
      .select(col("k"), col("t"), col("lv"), col("next_rv"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
        r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 10L, "l10", "r20"),     // earliest at-or-after 10 is 20
      (1L, 20L, "l20", "r20"),     // tie at equal ts matches
      (1L, 30L, "l30", null),      // after every right row
      (2L, 10L, "m10", null)),     // key with no right rows at all
      s"unexpected forward as-of result: $out")
  }

  test("asOfForward mirrors backward: null payloads stay null, plan is window-only") {
    val left = Seq((1L, ts(2), "l2")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(5), Option.empty[String]), (1L, ts(15), Some("r15"))
    ).toDF("k", "t", "rv")
    val out = AsOfJoin.asOfForward(left, right, "k", "t", Seq("rv"))
      .select(col("asof_rv")).collect()
    assert(out.length == 1 && out(0).isNullAt(0),
      s"matched-but-null payload must stay null, got ${out.toSeq}")
    val plan = AsOfJoin.asOfForward(left, right, "k", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"forward as-of must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"forward as-of should shuffle exactly once:\n$plan")
    // The frame must be the INCREMENTAL unboundedpreceding->currentrow
    // (descending scan). An unboundedfollowing frame is recomputed
    // from scratch per row — O(m²) on a hot key.
    assert(!plan.toLowerCase.contains("unboundedfollowing"),
      s"forward as-of must use the incremental descending frame:\n$plan")
  }

  test("asOfBackward result size equals the left side (never explodes)") {
    // 1 key, 50 left rows, 50 right rows — a naive range join would
    // build ~1275 pairs before filtering; as-of must emit exactly 50.
    val left = spark.range(50).select(lit(1L).as("k"),
      timestamp_millis(col("id") * 60000).as("t"), col("id").as("lv"))
    val right = spark.range(50).select(lit(1L).as("k"),
      timestamp_millis(col("id") * 60000 + 1).as("t"), col("id").as("rv"))
    val out = AsOfJoin.asOfBackward(left, right, "k", "t", Seq("rv"))
    assert(out.count() == 50)
    // Row i (at ms i*60000) sees right rows at j*60000+1 for j < i →
    // carried payload j = i−1; row 0 has none.
    val got = out.select(col("lv"), col("asof_rv")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(0L) == -1L && got(1L) == 0L && got(49L) == 48L, s"wrong carries: $got")
  }
}
