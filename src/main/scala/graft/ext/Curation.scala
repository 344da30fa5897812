package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The streaming CURATION pipeline — the micro-batched composition
  * twin of the batch curationPipeline (VERDICT r19 next #4): every
  * stage already existed with a streaming twin of its own
  * (streamClassify, streamTokenBudget, streamIngest, streamDsir), but
  * the COMPOSITION a year-long crawl actually runs — normalize → gate
  * → dedup-probe → split → sink, per arriving shard — did not.
  *
  * Stage semantics per micro-batch (all but the dedup probe are pure
  * per-document functions, which is what makes accumulated ≡ one-shot
  * replayable):
  *
  *   1. NFC normalize (TextAnalysis.nfcNormalize — the codegen'd
  *      graft_nfc kernel) and content-fingerprint the normalized text.
  *   2. EXACT-dedup probe against the accumulated fingerprint index:
  *      first arrival survives — within a batch the min-id doc per
  *      fingerprint, across batches any fingerprint already registered
  *      by a COMMITTED batch suppresses the newcomer. The index is the
  *      exact tier of the dedup-index family (the MinHash band index
  *      is the near-dup tier; its streaming ingest is
  *      DedupIndex.streamIngest).
  *   3. The five-predicate quality GATE (the curationPipeline /
  *      x_quality_gate set, all integer arithmetic; the repetition
  *      rule aggregates within the document only).
  *   4. Deterministic split assignment (TextAnalysis.assignSplit).
  *   5. SINK: curated rows land batch-tagged; the fingerprint index
  *      append rides as the side write of the same batch.
  *
  * Crash discipline is the streamIngest house standard: both tables
  * are batch-tagged and written via dynamic partition overwrite (a
  * redelivered batch REPLACES its crashed attempt's rows), the probe
  * EXCLUDES the current batch id (a crashed attempt's own fingerprints
  * must not suppress its redelivery), and with a checkpoint the run is
  * restartable (committed batches are never reprocessed; the
  * resume-aware table maker keeps table and checkpoint in lockstep).
  * CurationSpec pins restart and crashed-attempt redelivery;
  * x_stream_curation gates accumulated ≡ the batch composition with
  * arrival-order survivors against the DuckDB replay.
  *
  * Scale: per-batch contact is the batch itself (per-row codegen'd
  * work + one within-batch fingerprint shuffle) plus one bucket-pruned
  * anti-join against the fingerprint index — at 100 TB the index
  * contact is fingerprint-column-sized, never a corpus rescan, and the
  * accumulated output is bounded by one table partition per batch
  * (StreamOps.sinkBatches doc).
  */
object Curation {

  /** The per-document curation tail shared by the stream and any batch
    * caller: quality-gate the NFC'd survivors and assign splits.
    * Input must carry `idCol`, `n_chars`, and the NFC'd text in
    * `__norm`. Pure per-document (the repetition census aggregates
    * within the doc), so per-batch application equals one-shot
    * application — the replay contract. */
  private[ext] def gateAndSplit(b: DataFrame, idCol: String): DataFrame = {
    val t = col("__norm")
    val base = b.select(col(idCol), col("n_chars"),
      TextAnalysis.wsTokenCount(t).as("n_tok"),
      length(regexp_replace(t, " ", "")).cast("long").as("n_cns"),
      size(filter(TextAnalysis.tokens(t), w => w.isin("the", "a")))
        .cast("long").as("n_stop"))
    val rep = b.select(col(idCol), explode(TextAnalysis.tokens(t)).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("max_tok"))
    val kept = base.join(rep, Seq(idCol))
      .where(!(col("n_tok") < 20 ||
        col("n_cns") < lit(3) * col("n_tok") ||
        col("n_cns") > lit(10) * col("n_tok") ||
        col("n_stop") * 50 < col("n_tok") ||
        col("max_tok") * 5 >= col("n_tok")))
    TextAnalysis.assignSplit(kept, idCol)
      .select(col(idCol), col("split"), col("n_chars"), col("n_tok"))
  }

  /** Run the curation pipeline over a micro-batched document stream.
    * `table` accumulates curated rows (id, split, n_chars, n_tok),
    * batch-tagged; `<table>_fp` is the exact-dedup fingerprint index
    * (id, fp), also batch-tagged. The stream must carry `idCol`,
    * `textCol`, and `n_chars`. Returns (accumulated curated rows minus
    * the tag, batches processed). */
  def streamCurate(spark: SparkSession, table: String, stream: DataFrame,
                   idCol: String, textCol: String,
                   queryName: String = "graft_stream_curation",
                   checkpointLocation: Option[String] = None)
      : (DataFrame, Int) = {
    import graft.streaming.StreamOps
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val idType = stream.schema(idCol).dataType
    val fpIdx = fingerprintIndexOf(table)
    val mk = IndexLifecycle.resumeAwareTableMaker(spark, checkpointLocation)
    // Sink buckets from the stream's source bytes (r22, guide §6 —
    // StreamOps.scaledSinkBuckets doc).
    val nBuckets = StreamOps.scaledSinkBuckets(stream)
    mk(spark, fpIdx,
      StructType(Seq(
        StructField("id", idType), StructField("fp", StringType),
        StructField(StreamOps.BatchTag, LongType))),
      StreamOps.BatchTag, "fp", nBuckets)
    mk(spark, table,
      StructType(Seq(
        StructField("id", idType), StructField("split", StringType),
        StructField("n_chars", LongType), StructField("n_tok", LongType),
        StructField(StreamOps.BatchTag, LongType))),
      StreamOps.BatchTag, "id", nBuckets)
    StreamOps.sinkBatches(spark, stream, queryName, table,
        checkpointLocation) { (b, batchId) =>
      // Refresh the index's cached file listing at probe start (the
      // previous batch's append ran concurrently with its sink write).
      spark.catalog.refreshTable(fpIdx)
      val withFp = TextAnalysis.nfcNormalize(b, textCol, "__norm")
        .withColumn("fp", TextAnalysis.fingerprint(col("__norm")))
      // Within-batch survivor: the min-id doc per fingerprint.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col(idCol))
      val inBatch = withFp
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
      // Cross-batch survivor: fingerprints no COMMITTED batch holds.
      // excludeBatch discipline: a crashed attempt's own rows (same
      // batch id, checkpoint never committed) must not suppress the
      // redelivery — they are about to be overwritten by it.
      val seen = spark.table(fpIdx)
        .where(col(StreamOps.BatchTag) =!= batchId)
        .select(col("fp"))
      // Staged once: survivors feed BOTH the gate chain and the index
      // append, and the barrier materializes the index contact so the
      // two writes share no live table and overlap in writeBatchSinks.
      val survivors = Checkpoints.stage(
        inBatch.join(seen, Seq("fp"), "left_anti"))
      val curated = gateAndSplit(survivors, idCol)
        .select(col(idCol).cast(idType).as("id"), col("split"),
          col("n_chars").cast("long").as("n_chars"), col("n_tok"))
      (curated,
        Seq(fpIdx -> survivors.select(col(idCol).as("id"), col("fp"))))
    }
  }

  /** The exact-dedup fingerprint index accumulated by [[streamCurate]]
    * for `table`. */
  def fingerprintIndexOf(table: String): String = table + "_fp"
}
