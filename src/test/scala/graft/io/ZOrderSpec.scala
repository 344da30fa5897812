package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Z-order semantics (hand-computed Morton goldens, Column/SQL twin
  * agreement) and the layout property that justifies the operator:
  * curve-clustered partitions have bounded bounding boxes in EVERY
  * dimension, where a single-column sort leaves the trailing dimension
  * unclustered (full-range boxes).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue matches hand-interleaved goldens") {
    // x=5 (101), y=3 (011), 3 bits: z bits (msb..lsb) y2 x2 y1 x1 y0 x0
    // = 0 1 1 0 1 1 = 27. Plus axis cases.
    val got = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L), (1L, 1L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(27L, 0L, 0x15L, 0x2AL, 3L))
  }

  test("zValue truncates to the requested bits and masks sign bits") {
    val got = Seq((0xFFL, 0x100L), (-1L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // 0xFF -> low 2 bits 11 -> z x-bits at 0,2 = 0b0101; 0x100 -> 00.
    // -1 masks to 11 the same way: no sign leakage into high bits.
    assert(got == Seq(5L, 5L))
    assert(got.forall(_ >= 0L))
  }

  test("Column form and generated SQL form agree on real keys") {
    val li = graft.Tables.lineitem(spark, graft.TestSpark.sf0001)
    li.select(col("l_partkey"), col("l_suppkey")).createOrReplaceTempView("zo_keys")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 16)} AS z FROM zo_keys")
      .agg(sum(col("z")), count(lit(1))).head()
    val viaColumn = li
      .select(ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey")), 16).as("z"))
      .agg(sum(col("z")), count(lit(1))).head()
    assert(viaSql == viaColumn)
  }

  test("curve clustering bounds boxes in BOTH dimensions; a sort only in one") {
    // Uniform 64x64 grid, 16 partitions. An ideal curve split gives
    // each partition one 16x16 quadrant; range boundaries land mid-
    // segment, so allow 2 quadrants — still <= half the domain per
    // dimension. A single-column sort leaves y at the full 64.
    val grid = spark.range(0, 64).select(col("id").as("x"))
      .crossJoin(spark.range(0, 64).select(col("id").as("y")))

    def spans(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      df.groupBy(spark_partition_id().as("p"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .select(col("sx"), col("sy"))
        .as[(Long, Long)].collect()

    val zSpans = spans(ZOrder.clusterByZOrder(grid, Seq("x", "y"), 6, 16))
    assert(zSpans.length == 16)
    zSpans.foreach { case (sx, sy) =>
      assert(sx <= 32 && sy <= 32, s"z-order box ($sx, $sy) exceeds 2 quadrants")
    }

    val sortSpans = spans(grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    assert(sortSpans.exists(_._2 >= 63L),
      "single-column sort should leave y unclustered — benchmark premise broken")
  }

  test("z-clustered parquet skips row groups for a SECOND-dimension predicate; x-sort reads all") {
    // The file-level proof of the class doc's pruning claim: write the
    // same 64x64 grid z-clustered and x-sorted (16 files each, one row
    // group per file), filter on y — the dimension the sort does NOT
    // cluster — and compare what the scan ACTUALLY emitted. Parquet
    // pushdown skips a row group only when its min/max excludes the
    // predicate, so the scan's numOutputRows is the surviving
    // row-group mass: the measurable twin of "files read".
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    val grid = spark.range(0, 64).select(col("id").as("x"))
      .crossJoin(spark.range(0, 64).select(col("id").as("y")))

    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_prune").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_xsort_prune").toString
    ZOrder.clusterByZOrder(grid, Seq("x", "y"), 6, 16)
      .write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(sDir)
    assert(new java.io.File(zDir).listFiles().count(_.getName.endsWith(".parquet")) == 16)
    assert(new java.io.File(sDir).listFiles().count(_.getName.endsWith(".parquet")) == 16)

    // Rows the scan emitted (post row-group skip, pre re-filter).
    def scanOutputRows(df: DataFrame): Long = {
      assert(df.collect().length == 64 * 4, "predicate must keep the y<4 strip")
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collectLeaves().collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty, s"expected a FileSourceScanExec leaf:\n$plan")
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val zRows = scanOutputRows(spark.read.parquet(zDir).where(col("y") < 4))
    val sRows = scanOutputRows(spark.read.parquet(sDir).where(col("y") < 4))
    // x-sorted files all span y 0..63: min/max can never exclude y<4,
    // every row group survives — the scan emits the whole table.
    assert(sRows == 64L * 64L, s"x-sorted scan should read everything, got $sRows")
    // z-clustered files have y-boxes <= 32 wide: at most half the curve
    // segments can intersect the y<4 strip. Strictly fewer rows read,
    // and by a margin that holds at any scale (boxes shrink with more
    // files; the strip mass doesn't grow).
    assert(zRows < sRows, s"z-order must skip row groups: z=$zRows sort=$sRows")
    assert(zRows <= 64L * 64L / 2, s"z-order should skip >= half the row groups, got $zRows")
  }
}
