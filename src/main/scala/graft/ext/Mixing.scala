package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted mixing of training-data sources: each group
  * (source, language, quality tier, …) keeps a configured percentage
  * of its rows, chosen by the portable multiplicative id-hash rather
  * than rand() — so the mix is reproducible run-to-run, stable under
  * repartitioning and appends (a row's fate never changes), and
  * auditable by an independent engine (the x_weighted_mix oracle
  * replays it in SQL).
  *
  * Scale shape: the decision is a per-row codegen'd predicate — no
  * shuffle, no sampling pass, no driver state; exactly what a 100 TB
  * re-mix wants (contrast rand()-based sampleBy: irreproducible, and
  * per-stratum fractions drift between runs).
  */
object Mixing {

  /** Keep a row iff its id-hash bucket (0–99) falls under the group's
    * percentage. Groups absent from `pctByGroup` keep `defaultPct`. */
  def sampleByPct(df: DataFrame, idCol: String, groupCol: String,
                  pctByGroup: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val pct: Column = pctByGroup.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (g, p)) =>
        when(col(groupCol) === g, lit(p)).otherwise(acc)
      }
    df.where(TextAnalysis.splitBucket(col(idCol)) < pct)
  }
}
