package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation: row-level diff between two relations sharing
  * a schema and a key — the migration-cutover / anti-entropy check
  * ("does the new pipeline's output match the old one, and where
  * not?"). One full-outer equi-join on the key, null-safe (<=>)
  * equality on every data column; no hashing, so the verdict is
  * portable across engines (an engine-specific row hash would not be).
  *
  * Shape at scale: a single key shuffle on each side (sort-merge under
  * AQE; broadcast if one side is small), then a per-row comparison
  * inside codegen and a tiny status census. For 100 TB vs 100 TB this
  * is the minimal possible plan — every row must be looked at once,
  * and is looked at exactly once.
  */
object Reconcile {

  /** Per-row verdicts joined on `keyCols`: the input schema plus
    * `status` ∈ only_left / only_right / differs / equal. Key columns
    * must be non-null (standard PK contract). */
  def diff(left: DataFrame, right: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(left.columns.sorted.sameElements(right.columns.sorted),
      s"schemas must match: ${left.columns.mkString(",")} vs ${right.columns.mkString(",")}")
    val dataCols = left.columns.filterNot(keyCols.contains).toSeq
    val l = left.alias("l")
    val r = right.alias("r")
    // Backtick-quoted references: a column name containing a dot would
    // otherwise parse as a nested-field path and fail resolution.
    def lc(c: String) = col(s"l.`$c`")
    def rc(c: String) = col(s"r.`$c`")
    val cond = keyCols.map(k => lc(k) === rc(k)).reduce(_ && _)
    val allEq =
      if (dataCols.isEmpty) lit(true)
      else dataCols.map(c => lc(c) <=> rc(c)).reduce(_ && _)
    val status = when(rc(keyCols.head).isNull, "only_left")
      .when(lc(keyCols.head).isNull, "only_right")
      .when(allEq, "equal")
      .otherwise("differs")
    val keyOut = keyCols.map(k => coalesce(lc(k), rc(k)).as(k))
    l.join(r, cond, "full_outer")
      .select(keyOut :+ status.as("status"): _*)
  }

  /** The one-line cutover report: row counts by diff status. */
  def diffCensus(left: DataFrame, right: DataFrame, keyCols: Seq[String]): DataFrame =
    diff(left, right, keyCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
}
