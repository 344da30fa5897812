package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Reciprocal-rank fusion semantics: hand-computed fused scores,
  * absence handling, the agreement property (consensus beats one
  * list's head), and deterministic tie-breaks. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed fusion: ranks, absences, and exact doubles") {
    // List A ranks: doc 1 (0.9) r1, doc 2 (0.8) r2, doc 3 (0.7) r3.
    // List B ranks: doc 2 (5.0) r1, doc 4 (4.0) r2.
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("doc_id", "s")
    val b = Seq((2L, 5.0), (4L, 4.0)).toDF("doc_id", "s")
    val out = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expect = Map(
      1L -> (1.0 / 61, 1L),
      2L -> (1.0 / 62 + 1.0 / 61, 2L),
      3L -> (1.0 / 63, 1L),
      4L -> (1.0 / 62, 1L))
    assert(out.length == 4)
    out.foreach { case (id, s, n) =>
      assert(s == expect(id)._1, s"doc $id fused score")
      assert(n == expect(id)._2, s"doc $id n_lists")
    }
    // Order: doc 2 (both lists) first, then 1 (r1 in A), 4 (r2 in B),
    // 3 (r3 in A).
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
  }

  test("agreement property: consensus mid-rankers beat a single #1") {
    // Doc 10 is #1 in one list only; doc 20 is rank 30 in BOTH.
    val a = ((Seq((10L, 99.0)) ++ (1L to 29L).map(i => (i, 50.0 - i))) :+
      (20L, 0.5)).toDF("doc_id", "s")
    val b = ((1L to 29L).map(i => (100L + i, 50.0 - i)) :+ (20L, 0.5))
      .toDF("doc_id", "s")
    val top = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 1).collect()
    // 2/(60+30) = 0.0222 > 1/61 = 0.0164.
    assert(top.head.getLong(0) == 20L,
      "a doc both retrievers agree on must outrank one list's head")
  }

  test("ties break by id; rejects malformed inputs") {
    val a = Seq((7L, 1.0), (3L, 1.0)).toDF("doc_id", "s")
    val out = Retrieval.rrfFuse(Seq(a), topK = 2).collect()
    // Equal scores: rank by id ascending — doc 3 is r1.
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 7L))
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(Seq((1L, 1.0, 2.0)).toDF("a", "b", "c")))
    }
  }
}
