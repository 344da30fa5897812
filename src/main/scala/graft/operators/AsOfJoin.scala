package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the temporal join training-data and event
  * pipelines need (latest right-side state at or before each left
  * event) that Spark has no native operator for.
  *
  * NOT implemented as a join: a naive `l.join(r, key && r.ts <= l.ts)`
  * explodes to every (left, earlier-right) pair per key before a
  * row_number filter — quadratic within a key, the same hazard as an
  * uncapped similarity block — and a pure range condition degrades to
  * BroadcastNestedLoop. Instead both sides are tagged and UNIONED,
  * then ONE window pass per key ordered by (ts, side) carries the most
  * recent right payload forward into each left row — the sort-merge
  * shape native as-of implementations use, expressed in Spark's window
  * machinery. Cost: one shuffle of (left + right) on the key, one
  * sort, zero row explosion; AQE-splittable like any keyed window.
  *
  * Tie semantics: a right row at EXACTLY left.ts matches (right sorts
  * before left at equal ts), matching SQL `ASOF JOIN ... ON l.ts >=
  * r.ts`. Left rows with no earlier right row keep null payloads
  * (left-outer semantics). If several right rows share (key, ts) the
  * carried payload is the last in (ts, side) order — pre-aggregate the
  * right side to one row per (key, ts) when that pick must be
  * deterministic.
  *
  * Null payloads keep as-of semantics: each right row is carried as
  * ONE non-null struct of all its payload fields, and last(...,
  * ignoreNulls) skips only left rows' null STRUCTS — so a matched
  * right row whose payload VALUE is null projects null, exactly like
  * SQL ASOF JOIN. (Per-column last(payload, ignoreNulls) would skip
  * the null and carry an older non-null value forward — LOCF, a
  * different operator.)
  */
object AsOfJoin {

  /** Tagged union of both sides: left rows carry a null payload
    * STRUCT, right rows carry null left-only columns and a non-null
    * struct (possibly of null fields). Side values order the tie at
    * equal ts — whichever side must win the match sorts toward the
    * matching frame edge. */
  private def taggedUnion(left: DataFrame, right: DataFrame, keyCol: String,
                          tsCol: String, payloadCols: Seq[String],
                          leftSide: Int, rightSide: Int): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema
    val leftSchema = left.schema
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(p => rightSchema(p)))
    val taggedLeft = left
      .withColumn("__side", lit(leftSide))
      .select(col(keyCol) +: col(tsCol) +: col("__side") +:
        (leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) :+
          lit(null).cast(payloadType).as("__asof_p")): _*)
    val taggedRight = right
      .withColumn("__side", lit(rightSide))
      .select(col(keyCol) +: col(tsCol) +: col("__side") +:
        (leftCols.filterNot(c => c == keyCol || c == tsCol).map(c =>
          lit(null).cast(leftSchema(c).dataType).as(c)) :+
          struct(payloadCols.map(col): _*).as("__asof_p")): _*)
    taggedLeft.unionByName(taggedRight)
  }

  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, payloadCols: Seq[String],
                   prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right, 1 = left: at equal ts the right row precedes the
    // left row, so an exactly-at-ts right row matches (l.ts >= r.ts).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedUnion(left, right, keyCol, tsCol, payloadCols, leftSide = 1, rightSide = 0)
      .withColumn("__asof_c", last(col("__asof_p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col("__asof_c").getField(p).as(prefix + p)): _*)
  }

  /** Forward as-of: the EARLIEST right row at or after each left row
    * (time-to-next-event analytics; SQL `ASOF JOIN ... ON l.ts <=
    * r.ts`). Same union-plus-one-window construction as backward, run
    * over ts DESCENDING: in that order "latest seen so far" IS the
    * smallest right ts >= left ts, so the frame stays unbounded-
    * preceding → current-row — the INCREMENTAL frame Spark evaluates
    * in O(m) per key. (The tempting mirror — current-row → unbounded-
    * FOLLOWING with first() — is recomputed from scratch per row,
    * O(m²) per key: a hot key would hang exactly at the scale this
    * operator targets.) Tie order: right sorts before left at equal
    * ts in the descending scan too, so an exactly-at-ts right row
    * matches. If several right rows share (key, ts) the carried
    * payload is the last in scan order — pre-aggregate the right side
    * when that pick must be deterministic. Left rows with no later
    * right row keep null payloads. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, payloadCols: Seq[String],
                  prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedUnion(left, right, keyCol, tsCol, payloadCols, leftSide = 1, rightSide = 0)
      .withColumn("__asof_c", last(col("__asof_p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col("__asof_c").getField(p).as(prefix + p)): _*)
  }
}
