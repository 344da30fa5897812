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
    * on-the-fly queries needn't read them back.
    *
    * Alongside the float vector, the saved row carries `qv` — the
    * per-vector-scaled int8 quantization (graft.ext.Quantize) stored
    * as array<tinyint>: [[probeTopKQuantized]] pre-ranks off that
    * column alone, cutting the probe's scan bytes ~3.8× vs the float
    * column (measured as compressed chunk bytes by ScaleBench's
    * ivf_quantized point; parquet stores tinyint as physical INT32,
    * so the cut comes through encoding+snappy rather than raw width —
    * slightly under the nominal 4×). */
  def build(corpus: DataFrame, idCol: String, vecCol: String, table: String,
            k: Int = 16, iters: Int = 2): Seq[Seq[Float]] = {
    val spark = corpus.sparkSession
    Writer.dropTableAndLocation(spark, table)
    Writer.dropTableAndLocation(spark, centroidsTable(table))
    val cents = Similarity.ivfTrain(corpus, idCol, vecCol, k, iters)
    // COMPACT layout: repartition on cluster_id before the partitioned
    // save — one file per cluster directory instead of one per input
    // partition per cluster (up to 32x fewer files; measured: probe
    // input bytes were DOMINATED by footer reads of the tiny files,
    // not column data). Rows sorted by id within each file so the
    // quantized re-rank's pushed In(id) filter can skip row groups at
    // volume. A cluster is one write task here; a deployment whose
    // single cluster exceeds a task adds a salt expression to the
    // repartition (more, still-large files per cluster).
    Quantize.withQuantized(
        Similarity.ivfAssign(corpus, idCol, vecCol, cents), vecCol, "qv")
      .withColumn("qv", col("qv").cast("array<tinyint>"))
      .select(col(idCol), col(vecCol), col("qv"), col("cluster_id"))
      .repartition(col("cluster_id"))
      .sortWithinPartitions(col("cluster_id"), col(idCol))
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

  /** [[probeTopK]] with an INT8 pre-rank: the probed partitions are
    * first ranked by quantized cosine reading ONLY the `qv`
    * array<tinyint> column (~3.8× fewer scan bytes than the float
    * column — at 100 TB the probe cost IS that scan; measured by
    * ScaleBench's ivf_quantized point), then the top `shortlist`
    * (default 4k) ids
    * are re-ranked with the exact float cosine, so the returned scores
    * are identical to [[probeTopK]]'s for every id that survives the
    * pre-rank. Recall vs the float probe is bounded by the shortlist
    * (a true top-k member must rank ≤ shortlist in quantized score —
    * int8 rounding noise is tiny next to a 4× margin; measured in
    * IvfIndexSpec and gated by x_ivf_quantized).
    *
    * The shortlist ids are collected to the driver (shortlist rows —
    * a k-scale scalar collect, same class as [[centroids]]) so the
    * float re-rank reads the shortlist through a PUSHED `In` filter
    * instead of rescanning every probed partition's float column — a
    * semi-join shape would scan exactly the bytes the int8 pre-rank
    * just saved.
    *
    * Arithmetic: byte values promote to double EXACTLY, so the
    * quantized dot is the same integers Quantize.dotQ computes; the
    * query is quantized driver-side with the identical scheme. The
    * query-norm factor is a constant and cannot change ranking, so the
    * pre-rank divides by |qv| only (zero vectors guard to null and
    * sort last, never NaN-first). */
  /** The int8 pre-rank of [[probeTopKQuantized]], split out LAZY so
    * its scan shape is plan-pinnable (PlanAuditSpec: ReadSchema carries
    * `qv`, never the float column): quantized cosine over the probed
    * partitions, top-`shortlist` ids. */
  private[graft] def quantizedPreRank(spark: SparkSession, table: String,
                                      idCol: String, query: Seq[Float],
                                      nProbe: Int, shortlist: Int): DataFrame = {
    val cents = centroids(spark, table)
    val probe = Similarity.probeClusters(cents, query, nProbe)
    val qq = Quantize.quantizeLocal(query)
    val qlit = array(qq.toIndexedSeq.map(lit(_)): _*)
    val qnorm2 = Similarity.dotIn(spark)(col("qv"), col("qv"))
    spark.table(table).where(col("cluster_id").isin(probe: _*))
      .select(col(idCol),
        when(qnorm2 === 0.0, lit(null).cast("double"))
          .otherwise(Similarity.dotIn(spark)(col("qv"), qlit) / sqrt(qnorm2))
          .as("qscore"))
      .orderBy(col("qscore").desc_nulls_last, col(idCol))
      .limit(shortlist)
  }

  def probeTopKQuantized(spark: SparkSession, table: String, idCol: String,
                         vecCol: String, query: Seq[Float], k: Int,
                         nProbe: Int, shortlist: Int = 0): DataFrame = {
    val sl = if (shortlist > 0) shortlist else 4 * k
    val shortIds = quantizedPreRank(spark, table, idCol, query, nProbe, sl)
      .select(col(idCol)).collect().map(_.get(0))
    val cents = centroids(spark, table)
    val probe = Similarity.probeClusters(cents, query, nProbe)
    val q = array(query.map(v => lit(v.toDouble)): _*)
    spark.table(table).where(col("cluster_id").isin(probe: _*))
      .where(col(idCol).isin(shortIds.toIndexedSeq: _*))
      .select(col(idCol), Similarity.cosineIn(spark)(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
