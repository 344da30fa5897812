package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exact running total (inclusive prefix sum) over a total
  * order — `SUM(v) OVER (ORDER BY …)` WITHOUT the single-task trap.
  *
  * The window form with an empty PARTITION BY routes every row through
  * ONE task (same failure mode EquiDepth closes for NTILE). A prefix
  * sum distributes identically to a rank:
  *
  *   1. range-partition + sort locally          (fully parallel)
  *   2. sum values per partition                (one tiny agg → driver)
  *   3. running total = partition's cumulative
  *      offset + local running total            (fully parallel)
  *
  * The sorted frame is materialized once (Checkpoints.stage): the
  * per-partition sums and the scan pass must observe the SAME
  * partition boundaries, and RangePartitioner re-samples per action.
  *
  * This is the backbone of layout planning at 100 TB — compaction
  * bin-packing, contiguous shard assignment, token-budget splitting —
  * anywhere "where does this row start in the global order" is the
  * question. Ordering columns must form a unique key (same determinism
  * contract as EquiDepth / the window form).
  */
object PrefixSum {

  /** Appends `outCol` = inclusive running total of `valueCol` over
    * `ORDER BY orderCols`. `valueCol` must be LongType (callers cast —
    * keeps the scan pass allocation-free and the semantics exact).
    * Null values contribute nothing — the running total at a null row
    * equals the previous row's, exactly like the `SUM OVER` window
    * twin (which skips nulls) and the per-partition `sum()` offsets
    * pass. `numPartitions` 0 → the session's shuffle partitions. */
  def runningTotal(df: DataFrame, orderCols: Seq[String], valueCol: String,
                   numPartitions: Int = 0, outCol: String = "cum"): DataFrame = {
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType, got ${df.schema(valueCol).dataType}")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = orderCols.map(col)
    val sorted = graft.ext.Checkpoints.stage(
      df.repartitionByRange(parts, cols: _*)
        .sortWithinPartitions(cols: _*))
    // One row per partition — metadata-sized driver collect, the same
    // class of adaptive scalar as EquiDepth's counts.
    val sums = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(coalesce(sum(col(valueCol)), lit(0L)).as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      sums.map { case (pid, s) => val o = acc; acc += s; pid -> o }.toMap
    }
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = sorted.schema.add(outCol, LongType, nullable = false)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      var acc = bOffsets.value.getOrElse(TaskContext.getPartitionId(), 0L)
      it.map { row =>
        if (!row.isNullAt(vIdx)) acc += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))
  }

  /** KEYED prefix sum — `SUM(v) OVER (PARTITION BY g ORDER BY …)`
    * without WindowExec's one-task-per-group funnel. The window form
    * is fine when groups are many and small (each task gets a group),
    * but the quota/budget workloads this backs are the OPPOSITE shape:
    * a handful of huge sources, each of which the window would drag
    * through a single task. Here every group is range-partitioned
    * ACROSS tasks like any other data:
    *
    *   1. range-partition + sort on (group, orderCols)  (fully parallel;
    *      each group a contiguous run of partitions)
    *   2. per-(partition, group) subtotals → driver     (contiguity
    *      bounds the collect at #groups + parts − 1 rows: a group
    *      crossing b partition boundaries yields b+1 rows, and only
    *      parts − 1 boundaries exist)
    *   3. running total = group's mass in earlier partitions + local
    *      group-run scan                                 (fully parallel)
    *
    * Same determinism contract as [[runningTotal]]: (groupCol ++
    * orderCols) must form a unique key; `valueCol` must be LongType;
    * nulls contribute nothing. The null group is one group, exactly
    * like the window twin. Regime note for the driver collect: at
    * millions of DISTINCT groups prefer the plain window form — that
    * shape is already parallel and needs no offsets. */
  def keyedRunningTotal(df: DataFrame, groupCol: String, orderCols: Seq[String],
                        valueCol: String, numPartitions: Int = 0,
                        outCol: String = "cum"): DataFrame = {
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType, got ${df.schema(valueCol).dataType}")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = (groupCol +: orderCols).map(col)
    val sorted = graft.ext.Checkpoints.stage(
      df.repartitionByRange(parts, cols: _*)
        .sortWithinPartitions(cols: _*))
    // ≤ #groups + parts − 1 rows (see scaladoc) — the same metadata
    // class as runningTotal's one-per-partition collect.
    val sums = sorted
      .groupBy(spark_partition_id().as("__pid"), col(groupCol).as("__g"))
      .agg(coalesce(sum(col(valueCol)), lit(0L)).as("__s"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
      .sortBy(_._1)
    // offset(pid, g) = g's mass in partitions < pid. Zero offsets are
    // omitted: a group that starts in this partition needs none.
    val offsets: Map[(Int, Any), Long] = {
      val acc = scala.collection.mutable.HashMap.empty[Any, Long]
      val out = Map.newBuilder[(Int, Any), Long]
      sums.foreach { case (pid, g, s) =>
        val prior = acc.getOrElse(g, 0L)
        if (prior != 0L) out += ((pid, g) -> prior)
        acc(g) = prior + s
      }
      out.result()
    }
    val gIdx = sorted.schema.fieldIndex(groupCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = sorted.schema.add(outCol, LongType, nullable = false)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val off = bOffsets.value
      var started = false
      var curG: Any = null
      var acc = 0L
      it.map { row =>
        val g = row.get(gIdx)
        if (!started || !java.util.Objects.equals(g, curG)) {
          started = true
          curG = g
          acc = off.getOrElse((pid, g), 0L)
        }
        if (!row.isNullAt(vIdx)) acc += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))
  }
}
