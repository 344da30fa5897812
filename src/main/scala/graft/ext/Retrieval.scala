package graft.ext

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Retrieval fusion: combining ranked lists from heterogeneous
  * scorers (sparse BM25, dense ANN) into one ranking.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09,
  * "Reciprocal rank fusion outperforms Condorcet and individual rank
  * learning methods"): fused(d) = Σ_lists 1/(k0 + rank_list(d)), the
  * standard hybrid-retrieval combiner — score SCALES never meet
  * (BM25 is unbounded, cosine is [−1, 1]), ranks always do, and the
  * k0 offset (60 in the paper) damps the head so one list's #1 can't
  * dominate alone.
  *
  * Scale contract: inputs are QUERY RESULTS (top-k lists from
  * [[graft.ext.TextAnalysis.bm25TopK]], [[Similarity.bruteForceTopK]],
  * an IVF/PQ probe, …), k-row frames by construction. The corpus-scale
  * work (scoring, pruning, top-k) happens inside the upstream
  * operators; fusion is deliberately the cheap last step, exactly as
  * deployed hybrid stacks run it (retrieve N per modality, fuse
  * N·modalities rows). Ranks are therefore assigned DRIVER-SIDE over
  * each list's engine-ordered k-row collect (the probe-shortlist class
  * of collect — never corpus data), deliberately NOT via a
  * partition-less Window: this engine bans the empty-partition-spec
  * window shape everywhere (single-task at scale, and a plan audit
  * can't see that an input is k-row), and a rank over an
  * already-limited list is driver arithmetic, not distributed work.
  */
object Retrieval {

  /** Fuse ranked lists by reciprocal rank. Each input must be a 2-col
    * (id, score) frame — the id column's NAME is taken from the first
    * list and every list is realigned to it positionally. Ranks are
    * dense per list: row_number over (score DESC, id ASC) — the
    * deterministic tie-break every ranked operator in this engine
    * uses. A document absent from a list contributes 0 from it
    * (standard RRF). The fused sum is evaluated left-to-right in list
    * order — a FIXED double-addition order, so results replay
    * bit-exact in any engine that mirrors the expression.
    *
    * Output: (id, rrf_score, n_lists) ordered by (rrf_score DESC,
    * id ASC), cut to `topK`. `n_lists` = how many lists carried the
    * doc — the agreement signal hybrid pipelines threshold on.
    */
  def rrfFuse(lists: Seq[DataFrame], k0: Int = 60,
              topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(lists.forall(_.columns.length == 2),
      "each list must be a 2-col (id, score) frame")
    require(k0 > 0, s"k0 must be positive, got $k0")
    val spark = lists.head.sparkSession
    val idField = lists.head.schema.fields(0).copy(nullable = false)
    // Engine-ordered k-row collects: the ENGINE sorts (score DESC,
    // id ASC — its native type orderings); the driver only reads off
    // positions, so rank semantics can never drift from the SQL
    // tie-break.
    val rankedIds: Seq[Seq[Any]] = lists.map { df =>
      val Array(id, score) = df.columns
      df.orderBy(col(score).desc, col(id).asc)
        .select(col(id)).collect().map(_.get(0)).toSeq
    }
    // Accumulate contributions in LIST ORDER per doc — a fixed
    // left-to-right double-addition order, replayable bit-exact.
    val fused = scala.collection.mutable.LinkedHashMap.empty[Any, (Double, Long)]
    rankedIds.foreach { ids =>
      ids.zipWithIndex.foreach { case (id, i) =>
        val c = 1.0 / (k0.toDouble + (i + 1).toDouble)
        val (s, n) = fused.getOrElse(id, (0.0, 0L))
        fused(id) = (s + c, n + 1)
      }
    }
    val rows = fused.toSeq.map { case (id, (s, n)) => Row(id, s, n) }
    val schema = StructType(Seq(idField,
      StructField("rrf_score", DoubleType, nullable = false),
      StructField("n_lists", LongType, nullable = false)))
    // Final ordered cut through the engine (TakeOrderedAndProject over
    // a k·|lists|-row local relation) so rrf ties ALSO break by the
    // engine's id ordering.
    spark.createDataFrame(rows.asJava, schema)
      .orderBy(col("rrf_score").desc, col(idField.name).asc)
      .limit(topK)
  }
}
