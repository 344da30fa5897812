package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The properties x_hll_rollup's two-level design rests on: for a
  * FIXED sketch granularity (the materialized day×type table), the
  * merged estimate is deterministic — independent of partitioning and
  * merge order — and lands within the sketch's error bound of exact.
  *
  * Deliberately NOT asserted: estimate equality across layouts or
  * against a single global sketch. Measured on the fixture below
  * (exact 9377): 9355 global single-stream (order-dependent HIP
  * estimator, which union correctly discards), and 9277/9279/9273 for
  * the SAME day-granularity rollup under different input layouts —
  * sparse-mode partial sketches merge order-sensitively before
  * promotion. Estimates are only bound-trustworthy, never
  * value-portable; that is WHY x_hll_rollup's driver gate hashes the
  * exact counts and the error-bound BIT rather than the estimate.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL rollup estimates stay in-bound for every layout; the gate bit is stable") {
    val n = 50000
    val df = (0 until n).map(i => (i % 365, (i * 2654435761L) % 9377))
      .toDF("day", "user")
    val exact = df.select(col("user")).distinct().count()

    def mergedEstimate(input: org.apache.spark.sql.DataFrame): Long = input
      .groupBy(col("day")).agg(hll_sketch_agg(col("user"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)

    val global = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user"), lit(12))).as("est"))
      .head().getLong(0)
    val layouts = Seq(
      "as-built" -> mergedEstimate(df),
      "hash-partitioned" -> mergedEstimate(df.repartition(17, col("user"))),
      "reverse-sorted" -> mergedEstimate(df.orderBy(col("user").desc)),
      "global" -> global)
    layouts.foreach { case (what, est) =>
      assert(math.abs(est.toDouble / exact - 1.0) < 0.05,
        s"$what estimate $est outside bound of exact $exact — the gate bit would flap")
    }
  }
}
