package graft.ext

import org.apache.spark.sql.DataFrame

/** The single decision point for the "spread an under-partitioned
  * source" policy: a small input (one parquet file → one split) would
  * otherwise pin CPU-heavy per-row work on a single core, while a
  * well-partitioned 100 TB source already runs at full parallelism and
  * must NOT pay an unconditional shuffle of its raw bytes. Used before
  * every heavy per-document derivation (MinHash banding, shingle
  * explodes, bigram pair explodes, quality gating).
  */
object Spread {

  /** Repartition up to the session's default parallelism iff the
    * input's ESTIMATED split count is below it.
    *
    * The estimate comes from the analyzed plan's size statistics
    * (bytes ÷ `spark.sql.files.maxPartitionBytes`, the same ratio the
    * file-scan planner uses to cut splits) — NOT from `df.rdd`, which
    * would force physical planning and RDD materialization eagerly at
    * pipeline-CONSTRUCTION time for every caller and defeat plan
    * reuse. Analyzed-plan stats are pre-optimization (no filter
    * selectivity), which errs toward "big enough already" — the cheap
    * direction: a false skip costs parallelism only on a source that
    * was large before filtering, never a pointless full shuffle of a
    * genuinely large input.
    *
    * Streaming DataFrames pass through untouched (their parallelism
    * is the source's concern, and consulting `.rdd` on one would
    * throw — SpreadSpec uses exactly that to pin "no physical
    * planning here").
    */
  def ensure(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val sizeInBytes = df.queryExecution.analyzed.stats.sizeInBytes
    val estSplits =
      (sizeInBytes + maxPartitionBytes - 1) / maxPartitionBytes
    if (estSplits < parallelism) df.repartition(parallelism) else df
  }
}
