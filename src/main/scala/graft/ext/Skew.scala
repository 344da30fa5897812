package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for cluster-scale joins and aggregations.
  *
  * AQE's skew-join handling (on by default) splits oversized shuffle
  * partitions at runtime and is the first line of defense. Salting is
  * the explicit fallback for the cases AQE can't fix — e.g. a single
  * hot key whose rows must still meet EVERY matching row of the other
  * side, or a skewed aggregation key.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key` where a few left-side keys are
    * hot: left rows get a salt in [0, salt) (spread arbitrarily — the
    * salt only balances partitions, it never changes the result), the
    * right side is replicated once per salt value, and the join runs on
    * (key, salt). A hot key's rows now land in `salt` shuffle
    * partitions instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltVals = array((0 until salt).map(lit): _*)
    val l = left.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__salt", explode(saltVals))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (key, salt), then final-aggregate on key. For algebraic aggregates
    * the result is identical to a direct groupBy; the hot key's partial
    * work is spread over `salt` reducers. The final phase MERGES
    * partials — sum/min/max re-apply themselves, but count's final
    * phase must SUM the partial counts, never count() again (that
    * would count salt partitions):
    * `skewedAgg(df, "k", 16)(sum(col("v")).as("v"), sum(col("v")).as("v"))`
    * `skewedAgg(df, "k", 16)(count(lit(1)).as("n"), sum(col("n")).as("n"))`
    */
  def skewedAgg(df: DataFrame, key: String, salt: Int)
               (partial: Column, fin: Column): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial)
      .groupBy(col(key))
      .agg(fin)
  }
}
