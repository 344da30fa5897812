package graft.ext

import org.apache.spark.sql.DataFrame

/** The one materialization-barrier policy for every multi-pass
  * pipeline (MinHash banding, pair sets, label propagation, the exact
  * inverted index): each needs an EAGER barrier — both as the
  * CollapseProject stop and so several consumers share one
  * computation — and the storage class is a deployment decision, not
  * an operator one.
  *
  * Default: `localCheckpoint(eager)` — executor-storage blocks, freed
  * by the ContextCleaner on GC, no configuration. The blocks do NOT
  * survive executor loss: a cluster with dynamic allocation /
  * preemption that loses one mid-query fails the job.
  *
  * Set `spark.graft.checkpointDir` to a reliable location (HDFS, S3,
  * NFS) and every barrier in the library becomes a RELIABLE
  * `checkpoint(eager)` there instead: slower per barrier (a
  * filesystem write), immune to executor loss — the right trade on a
  * 1000-executor run where losing a node an hour into dedup must not
  * restart the pipeline.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpointDir"

  def stage(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir mints a UUID subdirectory; only (re)point it
        // when the configured base changes, so one session's barriers
        // share a directory instead of spraying one per call.
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }

  /** [[stage]] with the materialization DEFERRED to the caller's next
    * action over the returned frame — the one-job-per-round shape for
    * iterative operators (optimization guide §2.6: actions are only
    * sequential because the driver calls them sequentially; here two
    * driver round trips per round — eager barrier, then convergence
    * aggregate — become one, because the aggregate's own job computes
    * AND persists the barrier RDD en route). r22, VERDICT r21 #1: the
    * alternating-star loop was round-LATENCY-bound at ~2 jobs/round.
    *
    * Contract for callers (all local to the loop that uses this):
    *   - run exactly ONE action over the result before ANY other
    *     reference to it — the first action materializes every
    *     partition and finalizes the checkpoint (Spark's
    *     LocalRDDCheckpointData self-heals partitions a short-circuit
    *     skipped, so an aggregate is always enough);
    *   - do NOT [[release]] the frames it was derived from until that
    *     action has run (their blocks are still the lineage).
    *
    * With `spark.graft.checkpointDir` configured this falls back to
    * the EAGER [[stage]]: a reliable Dataset.checkpoint(eager=false)
    * writes its files by RECOMPUTING the plan after the first action —
    * two computations, strictly worse than eager-then-aggregate. */
  def stageLazy(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(_) => stage(df)
      case None => df.localCheckpoint(eager = false)
    }

  /** Free the storage behind a [[stage]]d frame NOW instead of waiting
    * for the async ContextCleaner. Iterative operators (label
    * propagation, large/small-star rounds) retire one barrier per
    * round; relying on GC + ContextCleaner lets dead rounds' blocks
    * pile up across iterations (and across bench reps), inflating
    * executor storage monotonically. No-op for frames that are not a
    * materialized barrier; for reliable checkpoints it drops the block
    * copies (the files remain until context shutdown — harmless). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
