package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Writer

/** Persist-and-reuse IVF index — the trained twin of [[AnnIndex]].
  *
  * `build` pays the expensive part ONCE: Lloyd training (one distributed
  * pass per iteration) plus one assignment pass, saved as a catalog
  * table PARTITIONED by `cluster_id` alongside a k-row centroids side
  * table. `probeTopK` then serves any number of queries from the saved
  * layout: centroid ranking is driver-side over k small vectors, and
  * the `cluster_id IN (...)` filter is a PARTITION filter — the scan
  * opens only the probed clusters' directories (~nProbe/k of the data,
  * `PartitionFilters` in the plan, pinned by IvfIndexSpec) and the
  * probe plan carries no shuffle: filter → project →
  * TakeOrderedAndProject.
  *
  * Without this shape every consumer retrains: round-4's x_ivf_recall
  * ran ~5 full corpus passes per execution. On a repeated-query
  * pipeline the index is built at ingest and probed per request.
  */
object IvfIndex {

  def centroidsTable(table: String): String = table + "_centroids"

  /** Train (Lloyd, exact-decimal means — deterministic), assign, and
    * save. Returns the trained centroids so a caller that also wants
    * on-the-fly queries needn't read them back. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, table: String,
            k: Int = 16, iters: Int = 2): Seq[Seq[Float]] = {
    val spark = corpus.sparkSession
    Writer.dropTableAndLocation(spark, table)
    Writer.dropTableAndLocation(spark, centroidsTable(table))
    val cents = Similarity.ivfTrain(corpus, idCol, vecCol, k, iters)
    Similarity.ivfAssign(corpus, idCol, vecCol, cents)
      .select(col(idCol), col(vecCol), col("cluster_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster_id")
      .format("parquet")
      .saveAsTable(table)
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("cluster_id", "centroid")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(centroidsTable(table))
    cents
  }

  /** Centroids of a saved index, in cluster-id order (k small rows). */
  def centroids(spark: SparkSession, table: String): Seq[Seq[Float]] =
    spark.table(centroidsTable(table)).orderBy(col("cluster_id"))
      .select(col("centroid")).collect().map(_.getSeq[Float](0)).toSeq

  /** Top-k cosine over the `nProbe` most-query-similar clusters of a
    * saved index. Results are identical to `Similarity.ivfTopK` with
    * the same centroids (same driver-side ranking, same cosine
    * expression) — only the training and assignment work is amortized
    * away, and the scan is partition-pruned to the probed clusters. */
  def probeTopK(spark: SparkSession, table: String, idCol: String,
                vecCol: String, query: Seq[Float], k: Int,
                nProbe: Int): DataFrame = {
    val cents = centroids(spark, table)
    val probe = Similarity.probeClusters(cents, query, nProbe)
    val q = array(query.map(v => lit(v.toDouble)): _*)
    spark.table(table)
      .where(col("cluster_id").isin(probe: _*))
      .select(col(idCol), Similarity.cosineIn(spark)(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
