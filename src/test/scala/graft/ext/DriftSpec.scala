package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The snapshot drift census: whole-bit integer arithmetic makes
  * every row hand-checkable — the fixture's expected values are
  * computed in the comments, digit by digit. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(vs: Seq[Int]) = {
    import spark.implicits._
    vs.toDF("v")
  }

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("hand fixture: exact milli-shares, whole-bit odds, drift scores") {
    // width 10, maxBucket 3 -> smoothing mass B = 4; N_old = N_new = 5.
    // old [1,5,12,35,99] -> buckets {0:2, 1:1, 3:2}
    // new [2,14,16,18,99] -> buckets {0:1, 1:3, 3:1}
    // bucket 0: d = floor(2000/9) - floor(3000/9) = 222 - 333 = -111;
    //   odds = bits(2*9=18)=4 minus bits(3*9=27)=4 -> 0; score 0.
    // bucket 1: d = floor(4000/9) - floor(2000/9) = 444 - 222 = 222;
    //   odds = bits(4*9=36)=5 minus bits(2*9=18)=4 -> 1; score 222.
    // bucket 3: mirror of bucket 0 with old/new swapped -> -111, 0, 0.
    val got = rows(Drift.census(df(Seq(1, 5, 12, 35, 99)),
      df(Seq(2, 14, 16, 18, 99)), col("v"), 10.0, 3))
    assert(got == Seq(
      (0L, 2L, 1L, -111L, 0L, 0L),
      (1L, 1L, 3L, 222L, 1L, 222L),
      (3L, 2L, 1L, -111L, 0L, 0L)), got.toString)
  }

  test("identical snapshots drift to zero everywhere") {
    val vs = Seq(3, 17, 17, 42, 77, 103, 999)
    val got = rows(Drift.census(df(vs), df(vs), col("v"), 25.0, 8))
    assert(got.nonEmpty)
    got.foreach { case (_, no, nn, d, ob, sc) =>
      assert(no == nn && d == 0L && ob == 0L && sc == 0L, got.toString)
    }
  }

  test("values below zero and beyond the cap clamp to the edge buckets") {
    val got = rows(Drift.census(df(Seq(-5, 1000)), df(Seq(-1, 5000)),
      col("v"), 10.0, 3))
    assert(got.map(_._1) == Seq(0L, 3L), got.toString)
  }

  test("censusMulti slices equal the single-metric censuses exactly") {
    import spark.implicits._
    val old = Seq((1, 10.0), (5, 220.0), (12, 35.0), (35, 99.0), (99, 7.0))
      .toDF("a", "b")
    val nw = Seq((2, 14.0), (14, 16.0), (16, 5.0), (18, 990.0), (99, 44.0))
      .toDF("a", "b")
    val metrics = Seq(
      Drift.Metric("a", col("a"), 10.0, 3),
      Drift.Metric("b", col("b"), 25.0, 8))
    val multi = Drift.censusMulti(old, nw, metrics).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    metrics.foreach { m =>
      val single = rows(Drift.census(old, nw, m.value,
        m.bucketWidth, m.maxBucket))
        .map { case (b, no, nn, d, ob, sc) => (m.name, b, no, nn, d, ob, sc) }
      assert(multi.filter(_._1 == m.name) == single,
        s"metric ${m.name}: multi ${multi.filter(_._1 == m.name)} != " +
          s"single $single")
    }
  }

  test("NULL metric values are dropped, not bucketed (ADVICE r18)") {
    import spark.implicits._
    def dfN(vs: Seq[Option[Int]]) = vs.toDF("v")
    // With the nulls stripped the two snapshots are IDENTICAL — so the
    // census must be all-zero drift, and no null-bucket row may appear
    // (a null bucket would also break the sink schema and the replay).
    val got = rows(Drift.census(
      dfN(Seq(Some(1), None, Some(15), Some(35), None)),
      dfN(Seq(Some(1), Some(15), None, Some(35))), col("v"), 10.0, 3))
    assert(got.map(_._1) == Seq(0L, 1L, 3L), got.toString)
    got.foreach { case (_, no, nn, d, ob, sc) =>
      assert(no == nn && d == 0L && ob == 0L && sc == 0L, got.toString)
    }
  }
}
