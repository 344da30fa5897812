package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply: materialize the final state of a snapshot + change feed
  * — the third MERGE shape next to [[Upsert]] (SCD-1, latest row wins)
  * and [[Scd2]] (full history): a changelog carries ordered
  * insert/update/delete operations and the result is the snapshot with
  * every key's LAST operation applied, deletes removing the key.
  *
  * Shape at scale: one union + one key-partitioned window whose
  * row_number()-filter triggers WindowGroupLimit — each map task keeps
  * only its local latest row per key before the shuffle, so the
  * exchange carries O(keys) rows no matter how long the change feed
  * is. No driver-side loop over batches: the whole feed applies in
  * one plan.
  */
object Cdc {

  /** Applies `changes` to `base`. `changes` must carry base's columns
    * plus `opCol` ('I' | 'U' | 'D' — D rows may leave non-key columns
    * null) and `seqCol` (a monotonically increasing version; must be
    * unique per key and > 0 — the snapshot seeds at sequence 0).
    * Returns base's schema: the final state after the highest-sequence
    * operation per key, with deleted keys absent. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   seqCol: String, opCol: String): DataFrame = {
    val seeded = base
      .withColumn(opCol, lit("I"))
      .withColumn(seqCol, lit(0L))
    // seqCol is documented unique per key; if a caller violates that,
    // the opCol tiebreak keeps the winner deterministic (op-desc:
    // U > I > D) instead of partition-order-dependent.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    seeded.unionByName(changes.select(seeded.columns.map(col).toIndexedSeq: _*))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", opCol, seqCol)
  }
}
