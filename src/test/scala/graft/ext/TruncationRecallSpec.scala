package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The matryoshka truncation-recall census: identity at full width,
  * and a hand fixture where the 1-dim cut provably flips the winner
  * (1-dim cosine is sign-only, so the tie falls to the id order). */
class TruncationRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("truncating at full width is the truth: recall 1000 milli") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .where(col("vec_id") < 60).select(col("vec_id"), col("embedding"))
    val r = Similarity.truncationRecall(e, "vec_id", "embedding",
      e.where(col("vec_id") < 4), dims = Seq(64), k = 5).collect().head
    assert(r.getLong(1) == 4L && r.getLong(3) == 20L &&
      r.getLong(4) == 1000L, r.toString)
  }

  test("the truth top-k is staged once: corpus scans in the plan = one per cut") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .where(col("vec_id") < 60).select(col("vec_id"), col("embedding"))
    val dims = Seq(8, 16, 32)
    val r = Similarity.truncationRecall(e, "vec_id", "embedding",
      e.where(col("vec_id") < 4), dims = dims, k = 5)
    // Per union branch: ONE corpus relation (the cut's scan) + one
    // bounded anchor relation for the broadcast, + one anchor relation
    // for n_anchors — the truth enters as a staged LogicalRDD, never a
    // re-derived scan. The old shape re-derived the full-dim scan (and
    // an n_anchors aggregation over it) inside every branch.
    val plan = r.queryExecution.optimizedPlan
    val rels = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    val staged = plan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    assert(rels.size == 2 * dims.size + 1,
      s"expected ${2 * dims.size + 1} relation scans, got ${rels.size}")
    assert(staged.nonEmpty, "expected the staged truth LogicalRDD")
  }

  test("a 1-dim cut flips the winner on the hand fixture: recall 0") {
    import spark.implicits._
    // anchor 0 = (1, 0); truth top-1 is id 2 (cos 0.8); id 1's full
    // cosine is ~0.707 but both 1-dim cosines are exactly 1.0, so the
    // cut's tie-break (id ASC) picks id 1 — overlap 0.
    val c = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(0.9f, -0.9f)),
      (2L, Seq(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val r = Similarity.truncationRecall(c, "vec_id", "embedding",
      c.where(col("vec_id") === 0), dims = Seq(1), k = 1).collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L, r.toString)
  }
}
