package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The persisted IVF index: train + assign once, probe many. The probe
  * plan must partition-prune to the probed clusters and carry no
  * shuffle, and its results must be identical to the on-the-fly
  * Similarity.ivfTopK with the same trained centroids.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val table = "ivf_index_spec"

  test("probe of a saved IVF index: partition-pruned scan, no exchange, ivfTopK-identical") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val corpus = e.where(col("vec_id") =!= 0).select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") === 0).select("embedding").first().getSeq[Float](0)
    val built = IvfIndex.build(corpus, "vec_id", "embedding", table, k = 8, iters = 2)
    try {
      // Centroids round-trip exactly (floats are lossless in parquet).
      assert(IvfIndex.centroids(spark, table) == built)
      val probe = IvfIndex.probeTopK(spark, table, "vec_id", "embedding", q, 10, nProbe = 2)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
        s"probe scan must partition-prune on cluster_id:\n$plan")
      assert(!plan.contains("Exchange"), s"probe plan shuffles:\n$plan")
      // Identical to the on-the-fly path with the same centroids: same
      // driver-side cluster ranking, same cosine expression.
      val direct = Similarity.ivfTopK(corpus, "vec_id", "embedding", q, 10, built, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val served = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served == direct, s"index probe diverges from ivfTopK:\n$served\nvs\n$direct")
      // Probing every cluster through the index is exhaustive (equals
      // brute force), exactly like on-the-fly IVF.
      val all = IvfIndex.probeTopK(spark, table, "vec_id", "embedding", q, 10, nProbe = 8)
        .collect().map(_.getLong(0)).toSet
      val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      assert(all == brute, "full-probe index scan must equal brute force")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${IvfIndex.centroidsTable(table)}")
    }
  }

  test("quantized probe: int8 pre-rank scans only qv, float re-rank matches the float probe") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val corpus = e.where(col("vec_id") =!= 0).select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") === 0).select("embedding").first().getSeq[Float](0)
    val t = table + "_q"
    IvfIndex.build(corpus, "vec_id", "embedding", t, k = 8, iters = 2)
    try {
      // The saved index carries the int8 column as real tinyints.
      assert(spark.table(t).schema("qv").dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ByteType, containsNull = true))
      val flt = IvfIndex.probeTopK(spark, t, "vec_id", "embedding", q, 10, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val qnt = IvfIndex.probeTopKQuantized(spark, t, "vec_id", "embedding", q, 10, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      // Same probed clusters + exact float re-rank: every id surviving
      // the 4x shortlist carries the IDENTICAL score; overlap >= 8.
      val fm = flt.toMap
      qnt.foreach { case (id, s) =>
        fm.get(id).foreach(fs => assert(fs == s,
          s"re-ranked score for $id diverges: $s vs $fs"))
      }
      assert(qnt.map(_._1).toSet.intersect(flt.map(_._1).toSet).size >= 8,
        s"quantized probe lost recall vs float: ${qnt.toSeq} vs ${flt.toSeq}")
      // The scan contract (pre-rank reads ONLY qv; re-rank reaches the
      // float column via a pushed In(vec_id) shortlist) is pinned in
      // PlanAuditSpec with the other plan audits.
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${IvfIndex.centroidsTable(t)}")
    }
  }
}
