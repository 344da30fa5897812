package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline operators registered as driver queries:
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  * search over embeddings (brute force / LSH / IVF, persisted
  * indexes), text analysis and vocabulary, multimodal plumbing,
  * temporal operators (as-of join, range join, sessionization:
  * native + hand-built + streaming), event analytics (funnel, cohort
  * retention), and skew machinery (salted join, two-phase agg).
  *
  * Oracle rules are the same as ParityQueries. Queries whose raw
  * results depend on engine-internal hashes (xxhash64: MinHash,
  * SimHash, LSH buckets) emit hash-INDEPENDENT invariants of the real
  * pipeline output instead of the raw values — truth counts computed
  * by an independent exact operator and replayed by the oracle SQL
  * (inverted-index Jaccard, brute-force cosine), plus subset/floor/
  * shape bits — so every query is oracle-checkable; raw per-value
  * semantics stay covered by ScalaTest (planted near-dups, recall vs
  * brute force).
  *
  * Since round 8 the registry is SPLIT BY FAMILY for navigation —
  * graft/queries/{Corpus,Vector,Stream,Relational}Queries.scala each
  * carry one family's query functions + oracle SQL — and this object
  * is the merged façade the driver contract (SparkEntry) consumes.
  * The merge asserts key-disjointness: a query name registered in two
  * families is a build-breaking bug, never a silent override.
  */
object ExtensionQueries {

  private val families = Seq(
    CorpusQueries.queries, VectorQueries.queries,
    StreamQueries.queries, RelationalQueries.queries)
  private val familyOracles = Seq(
    CorpusQueries.oracle, VectorQueries.oracle,
    StreamQueries.oracle, RelationalQueries.oracle)

  val all: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = families.reduce(_ ++ _)
    require(merged.size == families.map(_.size).sum,
      "duplicate query keys across family registries: " +
        families.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    merged
  }

  val oracle: Map[String, String] = {
    val merged = familyOracles.reduce(_ ++ _)
    require(merged.size == familyOracles.map(_.size).sum,
      "duplicate oracle keys across family registries: " +
        familyOracles.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    require(merged.keySet.subsetOf(all.keySet),
      "oracle entries without a registered query: " +
        (merged.keySet -- all.keySet).mkString(", "))
    merged
  }
}

/** Shared helpers for the family registries. */
private[graft] object QueryKit {

  /** Multiset-equality bit: 1 iff `a` and `b` hold exactly the same
    * rows with the same multiplicities. One ±1-weighted union +
    * groupBy — a single shuffle, where the exceptAll-both-ways form
    * shuffles both inputs twice. Inputs must share column order. */
  def multisetParityBit(a: DataFrame, b: DataFrame, bitName: String): DataFrame = {
    val keys = a.columns.map(col)
    a.withColumn("_w", lit(1L)).unionAll(b.withColumn("_w", lit(-1L)))
      .groupBy(keys.toIndexedSeq: _*).agg(sum(col("_w")).as("_d"))
      .agg((count(when(col("_d") =!= 0, lit(1))) === 0).cast("long").as(bitName))
  }
}
