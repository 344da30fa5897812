package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The persist-and-reuse ANN index: build once, probe many — the probe
  * plan must read only the probed buckets (bucket pruning) and carry
  * no shuffle exchange, and its results must match the on-the-fly
  * annTopK exactly (same bits, same probes, same cosine).
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val table = "ann_index_spec"

  test("probe of a saved index: bucket-pruned scan, no exchange, annTopK-identical results") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val corpus = e.where(col("vec_id") =!= 0).select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") === 0).select("embedding").first().getSeq[Float](0)
    AnnIndex.build(corpus, "vec_id", "embedding", table, bits = 8, nBuckets = 16)
    try {
      // Default-path contract: probeTopK itself scopes the
      // autoBucketedScan flag (no session conf here), so the plan it
      // executes is file-skipping and shuffle-free.
      val plan = AnnIndex.probePlanString(spark, table, "vec_id", "embedding", q, 10, bits = 8)
      assert(plan.contains("SelectedBucketsCount"),
        s"bucket pruning missing from the probe scan:\n$plan")
      assert(!plan.contains("Exchange"), s"probe plan shuffles:\n$plan")
      // probeTopK must leave the session flag exactly as it found it.
      val before = spark.conf.getOption("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      val probe = AnnIndex.probeTopK(spark, table, "vec_id", "embedding", q, 10, bits = 8)
      assert(spark.conf.getOption("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        == before, "probeTopK must restore the autoBucketedScan conf")
      // Same candidates, same exact re-rank as the on-the-fly path.
      val direct = Similarity.annTopK(corpus, "vec_id", "embedding", q, 10, bits = 8)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val served = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served == direct, s"index probe diverges from annTopK:\n$served\nvs\n$direct")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
