package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consistency dimension (reference notebook.py:227–231): frequency
  * table per categorical column. One shuffle keyed on the column; at
  * scale the partial aggregation collapses each partition to its
  * distinct categories before the exchange, so the shuffle is tiny for
  * genuinely categorical data.
  */
object Consistency {

  /** `groupBy(column).count().orderBy(column)` with a stable long count. */
  def freqTable(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column))
      .agg(count(lit(1)).as("n"))
      .orderBy(col(column))

  /** Frequency tables for every string-typed column (reference M2). */
  def stringColumns(df: DataFrame): Seq[String] =
    df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
}
