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

  test("count-min estimates are one-sided and in-bound under any partitioning (x_count_min's bits)") {
    import org.apache.spark.util.sketch.CountMinSketch
    // Skewed stream: token i of 500 appears ~n/(i+1) times.
    val items = (0 until 60000).map(i => s"t${(i * 2654435761L) % ((i % 500) + 1)}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val eps = 0.001
    val bound = math.ceil(eps * items.size).toLong
    Seq(1, 7, 32).foreach { parts =>
      val bytes = items.toDF("t").repartition(parts)
        .agg(count_min_sketch(col("t"), lit(eps), lit(0.99), lit(42)).as("s"))
        .head().getAs[Array[Byte]](0)
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      exact.foreach { case (t, n) =>
        val est = cms.estimateCount(t)
        assert(est >= n, s"parts=$parts $t: CMS must never undercount ($est < $n)")
        assert(est <= n + bound, s"parts=$parts $t: est $est above $n + eps*N=$bound")
      }
      // Cell-wise merge makes the sketch layout-independent for a
      // fixed seed — the driver-probe bits can never flap.
      assert(java.util.Arrays.equals(bytes,
        items.toDF("t").repartition(parts)
          .agg(count_min_sketch(col("t"), lit(eps), lit(0.99), lit(42)).as("s"))
          .head().getAs[Array[Byte]](0)))
    }
  }
}
