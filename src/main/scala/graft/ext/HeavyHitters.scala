package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heavy-hitters (frequent items) over an item column, sketch-first.
  *
  * The exact census `groupBy(item).count` shuffles one row per
  * DISTINCT item — at 100 TB a token census is itself a giant table.
  * The Misra–Gries summary (graft.functions.MisraGriesTopK) is a
  * k-counter partial aggregate: map-side partials collapse each
  * partition to one small map, the shuffle moves one blob per
  * partition, and the candidate set is guaranteed to contain every
  * item with frequency > n/(k+1) regardless of partitioning.
  *
  * `confirmedHeavy` then joins the (tiny) candidate set back against
  * the data for exact counts and keeps items above the n/(k+1)
  * threshold — a two-pass sketch-then-confirm whose OUTPUT is fully
  * deterministic (the sketch can only over-generate candidates, and
  * the confirm pass filters with exact counts), which is what makes it
  * oracle-checkable value-for-value against an exact SQL replay. The
  * second pass aggregates only rows whose item survives a broadcast
  * semi-join on the candidates, so it is a filtered scan, not a full
  * census.
  */
object HeavyHitters {

  /** MG candidate map as a 1-row DataFrame `map<string,bigint>`;
    * requires the graft extension (registered in every engine
    * session). Estimates are order-dependent lower bounds — treat as
    * candidates, not counts. */
  def sketch(items: DataFrame, itemCol: String, k: Int): DataFrame =
    items.agg(call_function("graft_mg_topk", col(itemCol), lit(k)).as("candidates"))

  /** Exact heavy hitters via sketch-then-confirm: items whose exact
    * count `n` satisfies `n * (k+1) > total`, with exact counts.
    * Deterministic regardless of partitioning (see class doc).
    *
    * Exactly two passes over `items`: the sketch pass also carries the
    * total count (one aggregation, two outputs), and the confirm pass
    * counts only rows surviving the broadcast candidate join.
    *
    * Signature note (round 6): this method no longer takes a
    * SparkSession — the plan is built entirely from `items`' own
    * session, so the old first parameter was dead weight. Callers
    * pass `(items, itemCol, k)`.
    *
    * Null semantics: `total` is `count(itemCol)` — null items are
    * excluded, matching the MG sketch (which skips nulls) and the
    * confirm equi-join (which drops them). Counting nulls into the
    * denominator would inflate the n*(k+1) > total threshold and
    * could drop true heavy hitters of the non-null stream.
    */
  def confirmedHeavy(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val it = col(itemCol)
    // 1 row: (candidate map, corpus total) — staged so the two
    // consumers below share one computation instead of re-scanning.
    val sketchAndTotal = Checkpoints.stage(
      items.agg(
        call_function("graft_mg_topk", it, lit(k)).as("candidates"),
        count(it).as("total")))
    val candidates = sketchAndTotal
      .select(explode(map_keys(col("candidates"))).as(itemCol))
    val confirmed = items
      .join(broadcast(candidates), itemCol)
      .groupBy(it)
      .agg(count(lit(1)).as("n"))
    // The 1-row total attaches as a broadcast cross join (plans as a
    // nested-loop with a single build row — O(candidates), same as the
    // engine's other 1-row report assemblies; a constant equi-key
    // does not help, Catalyst folds it away and re-plans the loop).
    confirmed
      .crossJoin(broadcast(sketchAndTotal.select(col("total"))))
      .where(col("n") * (k + 1) > col("total"))
      .select(it, col("n"))
      .orderBy(it)
  }
}
