package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-gap temporal range join, expressed as an equi-join — the
  * standard interval-bucketing rewrite for the join Spark would
  * otherwise plan as a nested-loop over the range predicate.
  *
  * `temporalPairs(df, key, t, maxGap)` finds ordered pairs of rows
  * sharing `key` whose timestamps differ by at most `maxGap` units
  * (0 < t_b − t_a ≤ maxGap). Rows are assigned to buckets of width
  * `maxGap`; a qualifying pair is then ALWAYS in the same or adjacent
  * bucket, so the left side probes (bucket, bucket+1) — an exploded
  * 2-element array, mirroring LSH multi-probe — and a single
  * shuffle-hash/sort-merge equi-join on (key, bucket) + the exact
  * range filter recovers precisely the qualifying pairs. Work is
  * Σ per-(key,bucket)² instead of Σ per-key² — bounded by temporal
  * density, not history length: a key with events spread over years
  * costs only its per-window pair mass.
  */
object RangeJoin {

  def temporalPairs(df: DataFrame, keyCol: String, tCol: String,
                    maxGap: Long): DataFrame = {
    def bucketOf(c: Column): Column = floor(c.cast("long") / maxGap)
    val a = df.select(col(keyCol).as("k"), col(tCol).as("t_a"))
      // Probe own + next bucket: a pair within maxGap either shares a
      // bucket or b sits in the bucket right after a.
      .withColumn("bucket",
        explode(array(bucketOf(col("t_a")), bucketOf(col("t_a")) + 1)))
    val b = df.select(col(keyCol).as("k"), col(tCol).as("t_b"))
      .withColumn("bucket", bucketOf(col("t_b")))
    a.join(b, Seq("k", "bucket"))
      .where(col("t_b").cast("long") > col("t_a").cast("long") &&
        col("t_b").cast("long") - col("t_a").cast("long") <= maxGap)
      .select(col("k"), col("t_a"), col("t_b"))
    // No dedup needed: bucket(t_b) is single-valued and the two probe
    // buckets are distinct, so each qualifying (a, b) pair matches
    // exactly one probe row — multiplicities equal the plain
    // inequality join's (which is what the oracle computes).
  }
}
