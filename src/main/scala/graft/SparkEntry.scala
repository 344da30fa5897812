package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 gets a named entry in `queries`
  * plus equivalent ANSI SQL in `oracleSql` (DuckDB-runnable against the
  * same parquet tables). Column names AND value representations must
  * match bit-exactly: aggregates are computed in exact decimal/long
  * arithmetic on both sides and only cast to double at the end, so the
  * hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's core pipeline (SURVEY §7.2): load → derive event day →
    * dedup → daily counts → calendar-gap left join → report gap days.
    * Re-keyed to the `events` table; a synthetic gap is injected (drop day
    * 15) so the gap report is non-empty.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_gap_report")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.all ++ ExtensionQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ ExtensionQueries.oracle
}
