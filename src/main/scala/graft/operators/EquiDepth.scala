package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exact NTILE — equi-depth bucketing over a total order
  * WITHOUT the single-task trap.
  *
  * `NTILE(n) OVER (ORDER BY …)` with no PARTITION BY plans a
  * WindowExec whose partition spec is empty: Spark routes EVERY row
  * into one task (SinglePartition), which dies at cluster scale no
  * matter how many executors exist. Exact equi-depth doesn't need
  * that: NTILE is a pure function of a row's GLOBAL RANK and the
  * total count, and global ranks distribute as
  *
  *   1. range-partition + sort locally        (fully parallel)
  *   2. count rows per partition              (one tiny agg → driver)
  *   3. global rank = partition's cumulative
  *      offset + local position               (fully parallel)
  *
  * — two passes, no global sort on one task, the classic distributed
  * ranking construction. Pass 3 maps the rank through the standard
  * NTILE arithmetic (first `total % n` buckets hold ⌈total/n⌉ rows,
  * the rest ⌊total/n⌋), so the output is row-for-row identical to the
  * window form — EquiDepthSpec pins both the equivalence and the
  * absence of an empty-partition-spec WindowExec from the plan.
  *
  * The range-partitioned sort is materialized once (eager
  * localCheckpoint): the per-partition counts and the rank pass MUST
  * observe the same partition boundaries, and RangePartitioner
  * re-samples its boundaries per action. One bounded materialization
  * of (the projected) rows is the honest cost of exactness at scale —
  * the sketch alternative is approx_percentile.
  *
  * Ordering columns must form a UNIQUE key (standard NTILE determinism
  * requirement — same contract as the window form).
  */
object EquiDepth {

  /** The shared rank core: range-partition + local sort (staged once),
    * per-partition counts to the driver (metadata), then the narrow
    * rank pass appending `colName` (1-based global rank, long).
    * Returns the ranked frame and the total row count. */
  private def rankedWithTotal(df: DataFrame, orderCols: Seq[String],
                              numPartitions: Int,
                              colName: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = orderCols.map(col)
    // Barrier via Checkpoints.stage: local blocks by default, reliable
    // checkpoint(dir) under spark.graft.checkpointDir like every other
    // multi-pass barrier in the library.
    val sorted = graft.ext.Checkpoints.stage(
      df.repartitionByRange(parts, cols: _*)
        .sortWithinPartitions(cols: _*))
    // One small row per partition — metadata, not data (same class of
    // driver scalar as the reference's own adaptive collects).
    val counts = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, c) => val o = acc; acc += c; pid -> o }.toMap
    }
    val outSchema = sorted.schema.add(colName, LongType, nullable = false)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // Rank pass: narrow over the checkpointed partitions — the stored
    // within-partition sort order is the global order restricted to
    // each range, so offset + position IS the global rank.
    val ranked = sorted.mapPartitions { it =>
      val off = bOffsets.value.getOrElse(TaskContext.getPartitionId(), 0L)
      var i = 0L
      it.map { row =>
        i += 1
        Row.fromSeq(row.toSeq :+ (off + i))
      }
    }(Encoders.row(outSchema))
    (ranked, total)
  }

  /** Appends a `bucket` column (1-based, long) = NTILE(`n`) over
    * `ORDER BY orderCols`. `numPartitions` 0 → the session's shuffle
    * partitions. */
  def ntileBuckets(df: DataFrame, orderCols: Seq[String], n: Int,
                   numPartitions: Int = 0): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val (ranked, total) = rankedWithTotal(df, orderCols, numPartitions, "__edq_rank")
    val quot = total / n
    val rem = total % n
    // The standard NTILE arithmetic on the global rank, in integer
    // expressions (DIV, not double division).
    ranked.withColumn("bucket",
        when(col("__edq_rank") <= lit(rem * (quot + 1)),
          expr(s"(__edq_rank - 1) DIV ${quot + 1} + 1"))
          .otherwise(expr(
            s"$rem + (__edq_rank - ${rem * (quot + 1)} - 1) DIV ${math.max(quot, 1L)} + 1")))
      .drop("__edq_rank")
  }

  /** EXACT order statistics without a single-task global sort: the
    * rows sitting at the given 1-based `ranks` of `ORDER BY
    * orderCols`, each with a `rank` column — the same two-pass
    * construction as [[ntileBuckets]] (range shuffle + per-partition
    * offsets), exact at any cardinality. Out-of-range ranks simply
    * match nothing. The result is |ranks| rows — a percentile /
    * winsorization-bound lookup (p1 = rank max(1, n·1/100), etc.). */
  def percentileValues(df: DataFrame, orderCols: Seq[String], ranks: Seq[Long],
                       numPartitions: Int = 0): DataFrame = {
    // The output APPENDS `rank`; a pre-existing column of that name
    // would silently duplicate in the schema — refuse loudly instead.
    require(!df.columns.contains("rank"),
      "input already has a 'rank' column — rename it before percentileValues")
    val (ranked, _) = rankedWithTotal(df, orderCols, numPartitions, "__edq_rank")
    ranked.where(col("__edq_rank").isin(ranks: _*))
      .withColumnRenamed("__edq_rank", "rank")
  }
}
