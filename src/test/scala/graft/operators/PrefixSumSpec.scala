package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PrefixSum must be row-for-row identical to the single-task window
  * form while keeping the empty-partition-spec WindowExec OUT of its
  * plan — the same contract EquiDepthSpec pins for NTILE.
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("running total equals SUM OVER (ORDER BY) across partitionings") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(100).toLong))
    Seq(1, 3, 13).foreach { parts =>
      val df = rows.toDF("k", "v").repartition(parts)
      val got = PrefixSum.runningTotal(df, Seq("k"), "v")
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      val expected = df
        .withColumn("cum", sum(col("v")).over(
          Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("empty partitions and empty input are safe") {
    val df = Seq((1L, 5L), (2L, 7L)).toDF("k", "v")
    // numPartitions far above the row count: most range partitions
    // empty — offsets must still line up.
    val got = PrefixSum.runningTotal(df, Seq("k"), "v", numPartitions = 16)
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 12L))
    val empty = PrefixSum.runningTotal(
      spark.emptyDataset[(Long, Long)].toDF("k", "v"), Seq("k"), "v")
    assert(empty.count() == 0)
  }

  test("null values contribute nothing, exactly like the SUM OVER window twin") {
    val df = Seq(
      (1L, Some(5L)), (2L, Option.empty[Long]), (3L, Some(7L)), (4L, Option.empty[Long])
    ).toDF("k", "v")
    val got = PrefixSum.runningTotal(df, Seq("k"), "v")
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    // cum at a null row equals the previous row's total (SUM skips
    // nulls); no NPE, offsets and scan agree.
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 12L, 4L -> 12L))
  }

  test("plan has no empty-partition-spec WindowExec (the single-task trap)") {
    val df = spark.range(0, 10000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val plan = PrefixSum.runningTotal(df, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"distributed prefix sum must not plan a Window:\n$plan")
  }

  test("rejects non-long value columns") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      PrefixSum.runningTotal(df, Seq("k"), "v")
    }
  }

  test("keyed running total equals SUM OVER (PARTITION BY g ORDER BY k) across partitionings") {
    val rnd = new scala.util.Random(23)
    // 3 groups with very different sizes — including one dominant
    // group that the window form would drag through a single task.
    val rows = (1L to 4000L).map { i =>
      val g = if (i % 10 == 0) "small" else if (i % 10 == 1) "mid" else "huge"
      (i, g, rnd.nextInt(100).toLong)
    }
    Seq(1, 3, 13).foreach { parts =>
      val df = rows.toDF("k", "g", "v").repartition(parts)
      val got = PrefixSum.keyedRunningTotal(df, "g", Seq("k"), "v")
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      val expected = df
        .withColumn("cum", sum(col("v")).over(
          Window.partitionBy(col("g")).orderBy(col("k"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("keyed: null groups, null values, empty partitions, empty input") {
    val df = Seq(
      (1L, Option("a"), Some(5L)), (2L, Option.empty[String], Some(3L)),
      (3L, Option("a"), Option.empty[Long]), (4L, Option.empty[String], Some(4L)),
      (5L, Option("a"), Some(7L))
    ).toDF("k", "g", "v")
    // Way more partitions than rows: group runs split across sparse
    // partitions, offsets must still line up; the null group is ONE
    // group like the window twin.
    val got = PrefixSum.keyedRunningTotal(df, "g", Seq("k"), "v", numPartitions = 16)
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 3L, 3L -> 5L, 4L -> 7L, 5L -> 12L))
    val empty = PrefixSum.keyedRunningTotal(
      spark.emptyDataset[(Long, String, Long)].toDF("k", "g", "v"), "g", Seq("k"), "v")
    assert(empty.count() == 0)
  }

  test("keyed: one dominant group spans many partitions — no Window in the plan") {
    val df = spark.range(0, 20000)
      .select(col("id").as("k"), lit("the_one_source").as("g"), (col("id") % 7).as("v"))
    val out = PrefixSum.keyedRunningTotal(df, "g", Seq("k"), "v", numPartitions = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"keyed prefix sum must not plan a Window:\n$plan")
    // The single group really is spread: the last row's cum is the
    // group total, computed across 8 range partitions.
    val total = out.agg(max(col("cum"))).first().getLong(0)
    assert(total == (0L until 20000L).map(_ % 7).sum)
  }
}
