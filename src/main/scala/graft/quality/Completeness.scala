package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Completeness dimension (reference notebook.py:166–194):
  * per-column non-null / null censuses and the drop-all-null rule.
  *
  * Both censuses are a SINGLE aggregation pass over all columns
  * (partial + final hash agg, one shuffle to 1 row) — at 100 TB this is
  * one full scan, map-side combined, with a 1-row result per partition;
  * never one job per column.
  */
object Completeness {

  /** Non-null count per column, one row. `count(col)` skips nulls. */
  def nonNullCensus(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    df.agg(count(col(cs.head)).as(cs.head),
           cs.tail.map(c => count(col(c)).as(c)): _*)
  }

  /** Null count + null ratio per column, one row:
    * `<c>_nulls` (long) and `<c>_null_ratio` (double = nulls / total).
    */
  def nullCensus(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs: Seq[Column] = cs.flatMap { c =>
      val nulls = count(lit(1)) - count(col(c))
      Seq(nulls.cast("long").as(s"${c}_nulls"),
          (nulls / count(lit(1))).as(s"${c}_null_ratio"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Two-phase driver-level adaptivity (SURVEY §3 E1 step 4): census →
    * drop list → reshaped plan. Returns (droppedColumns, df without them).
    */
  def dropAllNull(df: DataFrame): (Seq[String], DataFrame) = {
    val row = nonNullCensus(df).first()
    val drop = df.columns.toSeq.filter(c => row.getAs[Long](c) == 0L)
    (drop, if (drop.isEmpty) df else df.drop(drop: _*))
  }
}
