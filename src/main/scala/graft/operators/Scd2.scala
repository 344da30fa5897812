package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 history build: collapse a change-event stream into
  * validity intervals — one row per run of consecutive equal attribute
  * values per key, with `valid_from` = the run's first timestamp and
  * `valid_to` = the next run's start (null for the current version).
  *
  * The complement of [[Upsert]] (SCD-1 keeps only the latest version;
  * SCD-2 keeps them all with validity ranges) — together they are the
  * two canonical MERGE shapes of a warehouse ingest path.
  *
  * Shape at scale: both window passes partition BY THE KEY — no empty
  * partition spec, no single-task funnel — and share one hash shuffle
  * (the change filter preserves partitioning and order, so the second
  * window reuses the first's exchange and sort). Order columns must
  * make the per-key order total (pass a unique tiebreaker).
  */
object Scd2 {

  /** `attrCol`'s change history per `keyCol`, ordered by `orderCols`
    * within key. Output: key, order cols (run head values, `tsCol`
    * renamed `valid_from`), attr, `valid_to` (same type as `tsCol`,
    * null = current). */
  def intervals(df: DataFrame, keyCol: String, tsCol: String,
                attrCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    // Run heads: first event of the key, or value changed. Null-safe
    // BOTH ways: lag()=null is ambiguous (first row OR previous attr
    // was null), so first-row detection uses row_number, and the
    // change test is <=> (a null→null step is NOT a change).
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .where(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .drop("__rn", "__prev")
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "valid_from")
  }
}
