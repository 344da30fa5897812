package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Uniqueness dimension (reference notebook.py:249–294): exact-duplicate
  * census, dedup, compound-key duplicate census.
  *
  * Scale notes: all three are hash aggregations keyed on (all columns |
  * compound key). Partial aggregation makes the shuffle proportional to
  * the number of DISTINCT keys per partition, not rows; AQE coalesces
  * the post-shuffle partitions. For 100 TB wide rows, an all-columns
  * groupBy shuffles the full payload — `dropDuplicates` on a hash of the
  * row (see graft.ext.Dedup.exactByFingerprint) is the cheaper scale
  * path when byte-identical rows are the target.
  */
object Uniqueness {

  /** Number of groups of byte-identical rows occurring more than once. */
  def exactDupGroups(df: DataFrame): DataFrame =
    df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
      .agg(count(lit(1)).as("dup_groups"))

  /** All-columns dedup (reference A7). */
  def dropDups(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Groups of a compound key occurring more than once, with counts. */
  def compoundDupGroups(df: DataFrame, key: Seq[String]): DataFrame =
    df.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)

  /** k-anonymity profile over quasi-identifier columns: for each
    * equivalence-class size k, how many classes and rows have exactly
    * that size. A released table is k-anonymous iff the smallest k in
    * this profile is >= k — the privacy-audit complement of the dup
    * censuses above (there big groups are the defect; here SMALL
    * groups are). Two keyed aggregations, both with partial combine:
    * the first shuffles one row per distinct quasi-identifier tuple,
    * the second one row per distinct class size — tiny. */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("k")).as("n_rows"))
      .orderBy(col("k"))
}
