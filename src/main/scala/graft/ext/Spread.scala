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
    * current partition count is below it. NOTE: consults `df.rdd`,
    * which forces physical planning eagerly at call time. */
  def ensure(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism) else df
  }
}
