package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1 upsert — the MERGE INTO shape of incremental ingest: rows in
  * `updates` replace base rows with the same key; update rows with no
  * base match insert. The core maintenance operation of any
  * continuously-refreshed training corpus or dimension table.
  *
  * Pure DataFrame composition: one left-anti equi-join on the key
  * plus a union. Scale shape: the anti-join shuffles both sides on
  * the key (or broadcasts `updates`' key set when small — AQE decides
  * from runtime stats, the common case for incremental batches); the
  * union is partition-local. No driver involvement, no row
  * comparison beyond the key — last-write-wins per batch.
  *
  * One-row-per-key contract: with `versionCol` set, duplicate keys
  * WITHIN the updates batch are collapsed first — highest version
  * wins, ties broken by the full-row hash so the pick is
  * deterministic (a map-side-combining groupBy, same shape as
  * Dedup.exactByFingerprint). Without it, updates MUST already be
  * key-distinct: duplicate keys pass through verbatim and the merged
  * output holds several rows for that key.
  */
object Upsert {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             versionCol: Option[String] = None): DataFrame = {
    val u = versionCol match {
      case Some(v) =>
        val cols = updates.columns.toSeq
        val row = struct(cols.map(col): _*)
        updates.groupBy(keys.map(col): _*)
          .agg(max_by(row, struct(col(v), xxhash64(cols.map(col): _*))).as("__row"))
          .select(cols.map(c => col("__row").getField(c).as(c)): _*)
      case None => updates
    }
    u.unionByName(base.join(u.select(keys.map(col): _*), keys, "left_anti"))
  }
}
