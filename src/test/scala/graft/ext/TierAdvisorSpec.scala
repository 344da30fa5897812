package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The ANN tier advisor: integer-coordinate fixtures make every
  * cosine and every quantization EXACT (maxAbs = 127 → scale 1.0 →
  * qv = the integers themselves, zero int8 noise), so each regime's
  * decision is forced by construction:
  *
  *   - margin 1.0 (identical twin vs orthogonal crowd) → "ivfadc"
  *   - margin ~7e-4 (two near-angles, below 2×pq_res, noise 0) →
  *     "int8"
  *   - margin 0 (tied top-2, identical vectors) → "float"
  *
  * Plus rule consistency on the real corpus: whatever the census
  * measures, the emitted tier must equal the published decision rule
  * applied to the emitted census columns.
  */
class TierAdvisorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def advise(corpus: Seq[(Long, Seq[Float])]) = {
    val c = df(corpus)
    TierAdvisor.advise(c, "vec_id", "embedding",
      c.where(col("vec_id") === 0)).collect().head
  }

  test("wide margin (identical twin vs orthogonal crowd) recommends ivfadc") {
    val r = advise(Seq(
      0L -> Seq(127f, 0f),
      1L -> Seq(127f, 0f),   // cos 1.0
      2L -> Seq(0f, 127f)))  // cos 0.0 -> margin 1e6 micro
    assert(r.getString(5) == "ivfadc", r.toString)
    assert(r.getLong(1) == 1000000L && r.getLong(2) == 0L, r.toString)
  }

  test("sub-PQ-resolution margin with zero int8 noise recommends int8") {
    // cos(a, v1) = 127/sqrt(127^2+5^2), cos(a, v2) = 127/sqrt(127^2+7^2):
    // margin ~ 7.4e-4 micro-floored — below 2 x 4000 but above 2 x 1.
    val r = advise(Seq(
      0L -> Seq(127f, 0f),
      1L -> Seq(127f, 5f),
      2L -> Seq(127f, 7f)))
    assert(r.getString(5) == "int8", r.toString)
    assert(r.getLong(1) > 2L && r.getLong(1) < 8000L, r.toString)
    assert(r.getLong(2) == 0L, r.toString)
  }

  test("tied top-2 (margin 0) recommends float") {
    val r = advise(Seq(
      0L -> Seq(127f, 0f),
      1L -> Seq(127f, 3f),
      2L -> Seq(127f, 3f))) // identical pair -> margin 0
    assert(r.getString(5) == "float", r.toString)
    assert(r.getLong(1) == 0L, r.toString)
  }

  test("on the real corpus the emitted tier equals the published rule over the emitted census") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val r = TierAdvisor.advise(e, "vec_id", "embedding",
      e.where(col("vec_id") < 8)).collect().head
    val (n, margin, noise, pqRes, mult, tier) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))
    assert(n == 8L)
    val expected =
      if (margin >= mult * pqRes) "ivfadc"
      else if (margin >= mult * math.max(noise, 1L)) "int8"
      else "float"
    assert(tier == expected, s"census ($margin, $noise) -> $tier != $expected")
  }
}
