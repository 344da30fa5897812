package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
  */
object Upsert {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(
      base.join(updates.select(keys.map(col): _*), keys, "left_anti"))
}
