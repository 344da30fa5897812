package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the exact conditions the round gates check
  * (t1 smoke on entry, registry/oracle consistency) must never regress.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry (t1 smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("oracle SQL never embeds raw control characters") {
    // The driver parses oracle_sql.json; Verify escapes on write, but
    // keeping the source strings single-line avoids surprises.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c == '\n' || c == '\r' || c == '\t'),
        s"$name contains a control character")
    }
  }

  test("registry audit: every query builds; no cartesian/nested-loop; no empty-partition window") {
    // ONE construction per query (several builders execute real work
    // at construction — streaming runs, driver-scalar collects, eager
    // checkpoints — so each extra all-registry loop re-pays the
    // heaviest queries; sf0.001 keeps the single pass cheap), three
    // audits on the result:
    //  1. plan construction must not throw (analysis errors surface
    //     here, not at driver time) and must carry a schema;
    //  2. no CartesianProduct / BroadcastNestedLoop (100 TB guard) —
    //     deliberate exceptions: 1-row summary aggregates cross-joined
    //     into a single report row, O(1) not O(n²);
    //  3. no empty-partition-spec Window / WindowGroupLimit (the
    //     single-task trap EquiDepth and PrefixSum exist to avoid) —
    //     exceptions: windows over ALREADY-AGGREGATED day-grain series
    //     (calendar-bounded, documented at their use sites).
    // Caveat: queries whose result is driver-assembled (e.g.
    // x_count_min's LocalRelation) expose only their final plan here;
    // the plans of their internal eager stages are audited by their
    // own specs, not this loop.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    val allowCross = Set("x_minhash_neardup", "x_kernel_equiv",
      "x_contamination", "x_embed_neardup", "x_approx_sim_join",
      // The <= k confirmed heavy-hitter counts cross a 1-row total.
      "x_heavy_hitters",
      // Same 1-row report assembly as x_minhash_neardup, plus the
      // equivalence-bit counters (missing/extra anti-join counts).
      "x_incremental_dedup", "x_incremental_dedup_gate",
      // Streaming-purge gate: the same 1-row report assembly (censuses
      // × equality/cleanup bits).
      "x_stream_purge_gate",
      // Streaming-serving gates: 1-row report assembly (query/result
      // counts × the accumulated-equals-one-shot equality bits).
      "x_stream_serve", "x_stream_serve_bm25", "x_stream_serve_ivfpq",
      // Bucket census × its own 1-row totals (Drift.census — the join
      // is bounded by maxBucket+1 rows on one side and 1 on the other;
      // cellDrift is the same shape with <= k cells as buckets).
      "x_drift_census", "x_vec_drift", "x_stream_vec_drift",
      // Rebalance gate: 1-row report assembly (live/census/probe
      // counts × cleanup bits).
      "x_rebalance",
      // Purge-stability bit: the staged probe rows cross ONE 1-row
      // multiset-parity aggregate (r21 — replaced two exceptAll
      // driver actions with the in-plan bit).
      "x_index_delete", "x_bm25_delete",
      // Tombstones-cleared bit: the probe rows cross ONE 1-row count
      // aggregate (r22 — replaced the isEmpty driver action with the
      // in-plan bit, the same pattern).
      "x_lm_delete",
      "x_stream_incremental_dedup", "x_ivf_quantized", "x_embed_dedup",
      "x_stream_embed_ingest", "x_stream_ivfpq", "x_retrieval_eval",
      // Anchor-batch × corpus scoring: the non-equi label filter is a
      // nested loop BOUNDED by the broadcast anchor batch (5 rows) —
      // linear in the corpus by construction (Similarity.hardNegatives).
      "x_hard_negatives",
      // Same anchor-batch × corpus shape (8 broadcast anchors, id
      // inequality), one corpus scan (TierAdvisor.advise /
      // Similarity.truncationRecall / OperatingPoint.nProbeCurve).
      "x_tier_advisor", "x_trunc_recall", "x_nprobe_advisor",
      "x_shortlist_advisor",
      // 1-row scalar crossJoins: corpus token count (PMI), df/avgdl
      // scalars (BM25), and the SemDeDup gate's report assembly.
      "x_pmi_bigrams", "x_bm25_topk", "x_semantic_dedup",
      // The BM25 half carries the same 1-row df/avgdl scalar attach;
      // the fusion itself is k-row equi-joins.
      "x_hybrid_rrf",
      // Same BM25 report assembly (1-row dfs × 1-row stats) off the
      // persisted index instead of the scan.
      "x_bm25_index", "x_stream_bm25", "x_bm25_batch",
      // The global n_leaky_pairs gate (1 row) crossed into the 3-row
      // per-split census.
      "x_cluster_split",
      // Vocab × k-row class table (the bits grid) and the 1-row
      // zero-in-vocab default — both nested loops bounded by #classes
      // (TextAnalysis.nbClassify).
      "x_nb_classify",
      // 1-row gate assembly (masses × chunk census × invariant bits).
      "x_tokenize_pack",
      // 1-row report assembly of the two truth detectors' counts.
      "x_detector_agreement",
      // Labeled gate-scale truth pass: all-pairs hamming over DISTINCT
      // hash values, plus the 1-row report assembly; the prod split
      // keeps the same 1-row report crossJoins (ident census × bits).
      "x_simhash_dedup_prod", "x_simhash_dedup_gate",
      // Top-k shape gate × 1-row recall count (IVFADC report assembly).
      "x_ivfpq_topk")
    val allowDayGrain = Set("x_rolling_stats", "x_gap_fill")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf0001)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
      if (!allowCross(name)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a cartesian product:\n$plan")
        assert(!plan.contains("BroadcastNestedLoop"),
          s"$name plans a nested-loop join:\n$plan")
      }
      if (!allowDayGrain(name)) {
        val bad = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
        }
        assert(bad.isEmpty,
          s"$name plans an empty-partition-spec window (single-task at scale)")
      }
    }
  }

  test("registerAll exposes the full schema to plain spark.sql") {
    Tables.registerAll(spark, TestSpark.sf0001)
    val r = spark.sql("""
      SELECT r_name, COUNT(*) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""").collect()
    assert(r.map(_.getLong(1)).sum == spark.table("customer").count())
    // events view carries the normalized timestamp type.
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType
      == org.apache.spark.sql.types.TimestampType)
  }
}
