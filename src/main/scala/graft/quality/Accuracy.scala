package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Accuracy dimension (reference notebook.py:134, 180, 205–216):
  * summary statistics + per-column distribution histograms.
  *
  * Unlike the reference (which collects 2.4M rows per column to the
  * driver for matplotlib — SURVEY §1.1), the histogram here is computed
  * ENGINE-SIDE: min/max in one pass, bucketing + count in a second.
  * At 100 TB this is two scans with tiny shuffles instead of a driver
  * OOM.
  *
  * Determinism: all floating-point aggregates are derived from
  * decimal-exact sums cast to double at the end, so results are
  * independent of partition/merge order (required for oracle
  * hash-equality and, at scale, for reproducible runs).
  */
object Accuracy {

  /** describe()-style stats for numeric columns, long format:
    * (column, n, mean, stddev, min, max). Sums are computed in exact
    * DECIMAL (order-independent), variance derived in double from
    * those exact sums: var = (sumsq - sum²/n) / (n-1).
    */
  def summaryStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    // Overflow headroom: x² is decimal(37,8), its sum decimal(38,8) —
    // 30 integer digits. Values up to 1e9 squared over 1e12 rows sum to
    // ≤1e30: within range at 100 TB scale. Columns beyond that domain
    // need a Welford-style two-level aggregation instead.
    val aggs: Seq[Column] = cols.flatMap { c =>
      val x = col(c).cast("decimal(18,4)")
      Seq(
        count(col(c)).as(s"${c}_n"),
        sum(x).cast("double").as(s"${c}_sum"),
        sum(x * x).cast("double").as(s"${c}_sumsq"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val n = col(s"${c}_n").cast("double")
      val mean = col(s"${c}_sum") / n
      // Exact decimal sums make this deterministic; the greatest(…, 0)
      // guards the tiny negative variance that double cancellation can
      // produce for (near-)constant columns (sqrt of it would be NaN).
      val variance = (col(s"${c}_sumsq") - col(s"${c}_sum") * col(s"${c}_sum") / n) / (n - 1)
      struct(
        lit(c).as("col_name"),
        col(s"${c}_n").as("n"),
        mean.as("mean"),
        sqrt(greatest(variance, lit(0.0))).as("stddev"),
        col(s"${c}_min").as("min"),
        col(s"${c}_max").as("max"))
    }
    wide.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
      .orderBy(col("col_name"))
  }

  /** Single-call MIXED-type describe(): numeric AND string columns in
    * ONE relation — the reference's `df.describe()` shape (its output
    * stringifies every stat over all 29 columns at once; notebook.py
    * 134, 180). One pass, one wide aggregate.
    *
    * Schema: (col_name, n, mean, stddev, min_s, max_s). mean/stddev
    * are doubles, null for string columns — exactly the reference's
    * null cells. min_s/max_s are STRINGS for both families: raw values
    * for string columns, and numeric extrema pinned to DECIMAL(18,4)
    * text (fixed scale prints identically on any engine, unlike raw
    * Double.toString, whose shortest-round-trip formatting is
    * engine-specific — the one deliberate deviation from the
    * reference's cell text).
    */
  def summaryStatsMixed(df: DataFrame, numCols: Seq[String],
                        strCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = numCols.flatMap { c =>
      val x = col(c).cast("decimal(18,4)")
      Seq(
        count(col(c)).as(s"${c}_n"),
        sum(x).cast("double").as(s"${c}_sum"),
        sum(x * x).cast("double").as(s"${c}_sumsq"),
        min(col(c)).cast("decimal(18,4)").cast("string").as(s"${c}_min"),
        max(col(c)).cast("decimal(18,4)").cast("string").as(s"${c}_max"))
    } ++ strCols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = numCols.map { c =>
      val n = col(s"${c}_n").cast("double")
      val mean = col(s"${c}_sum") / n
      val variance = (col(s"${c}_sumsq") - col(s"${c}_sum") * col(s"${c}_sum") / n) / (n - 1)
      struct(
        lit(c).as("col_name"),
        col(s"${c}_n").as("n"),
        mean.as("mean"),
        sqrt(greatest(variance, lit(0.0))).as("stddev"),
        col(s"${c}_min").as("min_s"),
        col(s"${c}_max").as("max_s"))
    } ++ strCols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}_n").as("n"),
        lit(null).cast("double").as("mean"),
        lit(null).cast("double").as("stddev"),
        col(s"${c}_min").as("min_s"),
        col(s"${c}_max").as("max_s"))
    }
    wide.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
      .orderBy(col("col_name"))
  }

  /** Equirange histogram: `bins` buckets over [min, max], engine-side.
    * Returns (bucket, n) with bucket ∈ [0, bins-1]; the max value is
    * clamped into the last bucket.
    */
  def histogram(df: DataFrame, column: String, bins: Int): DataFrame = {
    val mm = df.agg(min(col(column)).cast("double"), max(col(column)).cast("double")).first()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / bins
    // Constant column (width 0) → everything in bucket 0, not div-by-zero.
    val bucket =
      if (width == 0) lit(0L)
      else least(floor((col(column).cast("double") - lit(lo)) / lit(width)),
                 lit((bins - 1).toLong))
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }
}
