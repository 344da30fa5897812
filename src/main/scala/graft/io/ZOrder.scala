package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional layout clustering — the
  * `OPTIMIZE ZORDER BY` capability: sort data along a space-filling
  * curve over several columns so that per-file min/max ranges stay
  * narrow on EVERY clustered dimension at once, and a predicate on any
  * of them prunes most files. A plain sort clusters only its leading
  * column; at 100 TB the difference is reading one dimension's worth
  * of files versus all of them.
  *
  * `zValue` is pure builtin bit arithmetic (shiftright / & / shiftleft
  * / | folded over bit positions — whole-stage codegen, no UDF), so
  * the curve position is engine-independent and the DuckDB oracle
  * replays it bit-for-bit (x_zorder).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of each dimension:
    * bit b of dimension i lands at position `b * dims.length + i`.
    * Inputs are truncated to `bits` bits (callers with wider domains
    * should range-rank first); negative inputs are masked the same
    * way, so the fold never sees a sign bit. Total bits must fit a
    * long. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, s"z-order needs >= 2 dimensions, got ${dims.size}")
    require(bits >= 1 && bits * dims.size <= 63,
      s"bits * dims must fit a signed long, got $bits * ${dims.size}")
    val terms = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield shiftleft(
      shiftright(d.cast("long"), b).bitwiseAND(lit(1L)),
      b * dims.size + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster rows along the curve: range-partition by z-value (balanced
    * output files via the range sampler), then sort within partitions
    * so parquet row-group stats are tight too. The returned frame is
    * ready for a plain `.write` — every file covers a compact curve
    * segment, i.e. a small bounding box in every dimension. */
  def clusterByZOrder(df: DataFrame, dimCols: Seq[String], bits: Int,
                      numPartitions: Int): DataFrame = {
    val z = zValue(dimCols.map(col), bits).as("__graft_z")
    df.withColumn("__graft_z", z)
      .repartitionByRange(numPartitions, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }

  /** The oracle twin of [[zValue]] as portable SQL — generated from
    * the same (b, i) -> position enumeration so the two cannot drift. */
  def zValueSql(dimSql: Seq[String], bits: Int): String = {
    val terms = for {
      b <- 0 until bits
      (d, i) <- dimSql.zipWithIndex
    } yield s"(((CAST($d AS BIGINT) >> $b) & 1) << ${b * dimSql.size + i})"
    terms.mkString(" | ")
  }
}
