package graft

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{BloomPrune, Dedup, DedupIndex, HeavyHitters, IvfIndex, Mixing, Multimodal, Packing, Quantize, Similarity, TextAnalysis}

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
  */
object ExtensionQueries {

  private val stopwords = Seq("the", "a")
  private val langMarkers = Map(
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir).agg(
        count_distinct(col("text")).as("n_distinct"),
        count(lit(1)).as("n"))),
    "x_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),
    "x_token_count" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_ws"),
          TextAnalysis.subwordCount(col("text")).as("n_subword"))
        .orderBy(col("doc_id"))),
    "x_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(Tables.documents(s, dir), "text", stopwords)
        .select(col("doc_id"), col("n_chars_calc"), col("n_tokens"),
          col("n_stopwords"), col("avg_token_len"), col("stopword_ratio"))
        .orderBy(col("doc_id"))),
    "x_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(Tables.documents(s, dir), "text", langMarkers)
        .select(col("doc_id"), col("score_en"), col("score_es"), col("lang_pred"))
        .orderBy(col("doc_id"))),
    "x_jaccard_adjacent" -> ((s, dir) => jaccardAdjacent(s, dir)),
    "x_minhash_neardup" -> ((s, dir) => minhashSummary(s, dir)),
    "x_incremental_dedup" -> ((s, dir) => incrementalDedup(s, dir)),
    "x_simhash" -> ((s, dir) =>
      // SimHash values are engine-internal (xxhash64), but two
      // INVARIANTS of them are not: (a) simhash is a pure function of
      // text, so byte-identical docs — the planted dup groups at
      // sf0.1 — MUST collide (zero purity violations across every
      // text group, evaluated over the real per-doc hashes); (b) the
      // group/doc census matches the corpus. Per-value semantics stay
      // pinned in DedupSpec.
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("text"), Dedup.simhash(col("text")).as("simhash"))
        .groupBy(col("text"))
        .agg(count_distinct(col("simhash")).as("__nh"), count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("n_text_groups"),
          coalesce(sum(col("__c")), lit(0L)).as("n_docs"),
          coalesce(sum(when(col("__nh") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_purity_violations"))),
    "x_cosine_topk" -> ((s, dir) => cosineTopK(s, dir)),
    "x_cosine_adjacent" -> ((s, dir) => cosineAdjacent(s, dir)),
    "x_cosine_pairs_label" -> ((s, dir) =>
      // maxBlockSize mirrored in the oracle SQL (HAVING count <= cap)
      // so the guard is part of the checked semantics, not a test-scale
      // accident — at sf<=0.1 no label block comes near 10000.
      Similarity.cosinePairsWithin(
          Tables.embeddings(s, dir), "vec_id", "embedding", "label", -1.0,
          maxBlockSize = 10000)
        .groupBy(col("blk").as("label"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("cos_sim") >= 0.35).cast("long")).as("n_close"),
          max(col("cos_sim")).as("max_cos"))
        .orderBy(col("label"))),
    "x_ann_lsh_buckets" -> ((s, dir) =>
      // Bucket IDs are hash-derived, but the bucketing's invariants
      // are oracle-checkable over the real per-vector buckets: the
      // per-bucket counts must sum to the corpus (every vector lands
      // in exactly one bucket), every bucket in [0, 2^8), occupied
      // buckets at most 2^8. Per-bucket values stay in SimilaritySpec.
      Tables.embeddings(s, dir)
        .select(Similarity.lshBucketIn(s)(col("embedding"), 8).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("total_vecs"),
          (min(col("bucket")) >= 0 && max(col("bucket")) < 256)
            .cast("long").as("bounds_ok"),
          (count(lit(1)) <= 256).cast("long").as("n_buckets_ok"))),
    "x_ann_topk" -> ((s, dir) => annTopK(s, dir)),
    "x_multimodal_meta" -> ((s, dir) =>
      Multimodal.attachPayload(Tables.documents(s, dir), "text", "text/plain")
        .select(col("doc_id"),
          col("media_meta.n_bytes").as("n_bytes"),
          col("media_meta.format").as("format"))
        .orderBy(col("doc_id"))),
    "x_multimodal_decode" -> ((s, dir) => decodeParity(s, dir)),
    "x_embed_neardup" -> ((s, dir) => embedNearDup(s, dir)),
    "x_stream_sessions" -> ((s, dir) => streamBatchParity(s, dir)),
    "x_ivf_topk" -> ((s, dir) => ivfTopK(s, dir)),
    "x_approx_distinct" -> ((s, dir) =>
      // HLL++ cardinality — the sketch the exact-dedup census upgrades
      // to at 100 TB (no full-key shuffle). The estimate itself is
      // implementation-specific, so the ORACLE-CHECKED columns are the
      // exact distinct count and the 3σ error-bound bit (rsd 0.05 →
      // |approx/exact − 1| < 0.15; the sketch is deterministic per
      // dataset, so the bit is stable). DedupSpec asserts the same
      // bound on fixtures.
      Tables.documents(s, dir).agg(
          approx_count_distinct(col("text"), 0.05).as("ad"),
          count_distinct(col("text")).as("n_distinct"),
          count(lit(1)).as("n"))
        .select(col("n_distinct"), col("n"),
          (abs(col("ad").cast("double") / col("n_distinct").cast("double") - 1.0) < 0.15)
            .cast("long").as("approx_ok"))),
    "x_oov_rate" -> ((s, dir) =>
      // Tokenizer-coverage signal: per-document out-of-vocabulary
      // fraction against the corpus top-10 vocabulary (count DESC,
      // token tie-break — deterministic). The vocab is a DERIVED
      // broadcast dimension: built once from the corpus (two keyed
      // aggs + TakeOrdered over the token census), then broadcast to
      // a per-token hash join — the corpus is scanned, exploded, and
      // flagged without ever shuffling on doc_id until the final
      // per-doc rollup.
      oovRate(s, dir)),
    "x_hll_rollup" -> ((s, dir) =>
      // The pre-aggregation pattern approx_count_distinct can't do:
      // DataSketches HLL sketches as a PERSISTABLE per-(day, type)
      // column, re-aggregated to per-type cardinalities by merging
      // sketches — never rescanning the raw events. At 100 TB the
      // daily sketch table is the only thing the rollup reads (a few
      // KB per key), and it composes across arbitrary regroupings.
      // Estimates are implementation-specific but deterministic per
      // dataset, so the oracle-checked columns are the exact counts,
      // the merge width, and the error-bound bit (lgConfigK=12 →
      // rsd ≈ 1.6%; gate at 15%).
      hllRollup(s, dir)),
    "x_clean_text" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          length(TextAnalysis.cleanText(col("text"))).cast("long").as("n_clean_chars"))
        .orderBy(col("doc_id"))),
    "x_pii_flags" -> ((s, dir) =>
      TextAnalysis.piiFlags(Tables.documents(s, dir), "text")
        .groupBy()
        .agg(sum(col("n_emails")).as("total_emails"),
          sum(col("n_long_digit_runs")).as("total_digit_runs"),
          sum(col("n_phone_like")).as("total_phone_like"),
          count(lit(1)).as("n_docs"))),
    "x_pii_redact" -> ((s, dir) => {
      // Redaction summary: docs changed + net character delta
      // (TextAnalysis.redactPii — the scrub x_pii_flags routes to).
      val red = TextAnalysis.redactPii(col("text"))
      Tables.documents(s, dir)
        .select(col("text"), red.as("red"))
        .agg(count(when(col("text") =!= col("red"), lit(1))).as("n_redacted_docs"),
          sum(length(col("text")) - length(col("red"))).cast("long").as("chars_delta"))
    }),
    "x_split_assign" -> ((s, dir) =>
      TextAnalysis.assignSplit(Tables.documents(s, dir), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"))),
    "x_approx_sim_join" -> ((s, dir) => approxSimJoin(s, dir)),
    "x_kernel_equiv" -> ((s, dir) => kernelEquiv(s, dir)),
    "x_ann_recall" -> ((s, dir) => annRecall(s, dir)),
    "x_ivf_recall" -> ((s, dir) => ivfRecall(s, dir)),
    "x_neardup_dedup" -> ((s, dir) => neardupIdempotent(s, dir)),
    "x_asof_join" -> ((s, dir) => asofJoin(s, dir)),
    "x_asof_forward" -> ((s, dir) => asofForwardJoin(s, dir)),
    "x_range_join" -> ((s, dir) => rangeJoin(s, dir)),
    "x_vocab_top50" -> ((s, dir) => vocabTop(s, dir)),
    "x_heavy_hitters" -> ((s, dir) =>
      // Sketch-then-confirm heavy hitters: the Misra–Gries candidate
      // set (native TypedImperativeAggregate, constant-size partials)
      // is guaranteed to contain every token above the n/(k+1)
      // frequency threshold, and the confirm pass keeps exactly those
      // — so the OUTPUT is deterministic and the oracle replays it as
      // an exact census filter. MisraGriesSpec pins the sketch-side
      // guarantees (membership under adversarial partitioning, error
      // bound, serde roundtrip) in the k < vocab regime.
      HeavyHitters.confirmedHeavy(
        Tables.documents(s, dir).select(explode(split(col("text"), " ")).as("token")),
        "token", 64)),
    "x_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(Tables.documents(s, dir), "text")),
    "x_connected_components" -> ((s, dir) => connectedComponentsCensus(s, dir)),
    "x_chunk_overlap" -> ((s, dir) =>
      Packing.chunkWithOverlap(Tables.documents(s, dir), "doc_id", "text",
        window = 64, stride = 48)),
    "x_zorder" -> ((s, dir) =>
      // Z-curve bucket census over (l_partkey, l_suppkey): the
      // driver-checkable face of ZOrder.clusterByZOrder — bucket
      // membership IS the curve arithmetic (pure bit interleave,
      // replayed bit-for-bit by the oracle), and the per-bucket
      // min/max columns exhibit the bounded bounding boxes that make
      // z-clustered files prunable on BOTH dimensions. Layout-level
      // locality (partition bounding boxes vs a single-column sort)
      // is pinned in ZOrderSpec.
      Tables.lineitem(s, dir)
        .select(
          graft.io.ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey")), 16).as("z"),
          col("l_partkey"), col("l_suppkey"))
        .groupBy(shiftright(col("z"), 16).as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).cast("long").as("min_part"),
          max(col("l_partkey")).cast("long").as("max_part"),
          min(col("l_suppkey")).cast("long").as("min_supp"),
          max(col("l_suppkey")).cast("long").as("max_supp"))
        .orderBy(col("z_bucket"))),
    "x_funnel" -> ((s, dir) => funnel(s, dir)),
    "x_session_window" -> ((s, dir) =>
      // Spark's NATIVE session_window operator over the same events —
      // the third leg of the sessionization triangle (hand-built batch
      // twin in x_batch_sessions, stream parity in x_stream_sessions),
      // each checked against an independent SQL oracle. Note native
      // session windows end at last_event + gap (exclusive end).
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "60 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_millis(col("w.start")).as("start_ms"),
          unix_millis(col("w.end")).as("end_ms"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_ms"))),
    "x_cohort_retention" -> ((s, dir) => cohortRetention(s, dir)),
    "x_salted_join" -> ((s, dir) => saltedJoinRevenue(s, dir)),
    "x_skewed_agg" -> ((s, dir) =>
      // Two-phase skew-safe aggregation (partial on (key, salt), final
      // merge on key) — algebraic, so the result equals a direct
      // groupBy, which is the oracle. count's final phase SUMS the
      // partial counts (see Skew.skewedAgg's contract).
      graft.ext.Skew.skewedAgg(
          Tables.events(s, dir).select(col("event_type")),
          "event_type", salt = 16)(
          count(lit(1)).as("n"), sum(col("n")).as("n"))
        .orderBy(col("event_type"))),
    "x_quantize_dot" -> ((s, dir) => quantizeDot(s, dir)),
    "x_weighted_mix" -> ((s, dir) =>
      // Deterministic weighted source mixing (graft.ext.Mixing): keep
      // 25% of views, 50% of clicks, 10% of errors, everything else
      // whole — the oracle replays the id-hash routing in SQL, so the
      // kept MULTISET (not just counts) is pinned via per-type counts.
      Mixing.sampleByPct(Tables.events(s, dir), "event_id", "event_type",
          Map("view" -> 25, "click" -> 50, "error" -> 10))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))),
    "x_stream_dedup" -> ((s, dir) => streamDedup(s, dir)),
    "x_stream_heavy" -> ((s, dir) => streamHeavyHitters(s, dir)),
    "x_frame_sample" -> ((s, dir) => {
      // Frame sampling over binary payloads (Multimodal.sampleFrames):
      // 32-byte frames, every 2nd kept — real byte slicing on the
      // BINARY column, dumped as text for the oracle (the fixture is
      // ASCII; both sides guard on strlen==length so a future
      // non-ASCII fixture turns the gate red rather than silently
      // comparing bytes to chars). First 50 docs keep the dump small.
      val docs = Tables.documents(s, dir)
        .where(col("doc_id") < 50 && col("text").isNotNull)
        .where(length(col("text")) === octet_length(col("text")))
      Multimodal.sampleFrames(
          Multimodal.attachPayload(docs, "text", "text/plain"),
          "doc_id", "payload", frameBytes = 32, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          col("frame").cast("string").as("frame_str"),
          length(col("frame")).cast("long").as("n_frame_bytes"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
    "x_hash_sample" -> ((s, dir) =>
      // Deterministic exact-100 uniform sample of the corpus
      // (graft.ext.Mixing.exactK) — same rows on every run and engine.
      // The ranking hash is re-derived for the dump (exactK returns
      // the input schema; orderHash is the same single definition).
      Mixing.exactK(Tables.documents(s, dir), "doc_id", 100)
        .select(col("doc_id"), Mixing.orderHash(col("doc_id")).as("h"))
        .orderBy(col("h"), col("doc_id"))),
    "x_stratified_sample" -> ((s, dir) =>
      // Deterministic 3-per-event-type stratified sample
      // (graft.ext.Mixing.stratifiedExactK), summarized per stratum
      // so the driver row is small but every sampled id is pinned.
      Mixing.stratifiedExactK(Tables.events(s, dir), "event_id",
          "event_type", 3)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("event_id")).as("sum_ids"))
        .orderBy(col("event_type"))),
    "x_approx_percentile" -> ((s, dir) => approxPercentileBound(s, dir)),
    "x_quantize_recall" -> ((s, dir) => quantizeRecall(s, dir)),
    "x_pack_chunks" -> ((s, dir) =>
      // Concat-and-chunk sequence packing over the document corpus:
      // 512-token context windows, 8 hash shards (graft.ext.Packing).
      // All-integer output; the oracle replays the cumsum + interval
      // arithmetic in SQL.
      Packing.packSummary(Tables.documents(s, dir), "doc_id",
        TextAnalysis.wsTokenCount(col("text")), capacity = 512L, shards = 8)),
    "x_contamination" -> ((s, dir) => contamination(s, dir)),
    "x_bloom_prune" -> ((s, dir) => bloomPrune(s, dir)),
    "x_stream_interval_join" -> ((s, dir) => streamIntervalParity(s, dir)),
    "x_stream_outer_join" -> ((s, dir) => streamOuterIntervalParity(s, dir)),
    "x_tfidf_top" -> ((s, dir) => {
      // Top TF-IDF term for the first 20 docs, scored against
      // corpus-wide document frequencies (TextAnalysis.topTfIdfTerm;
      // linear idf on the oracle path — see its Scaladoc for why log
      // idf can't be oracle-compared across engines).
      val docs = Tables.documents(s, dir)
      TextAnalysis.topTfIdfTerm(
          docs.where(col("doc_id") < 20), docs, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),
    "x_sliding_window" -> ((s, dir) =>
      // Spark's native SLIDING event-time window (60-minute windows
      // every 15 minutes — each event lands in 4 overlapping windows);
      // the oracle replays the epoch-aligned window-start arithmetic.
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "60 minutes", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_millis(col("w.start")).as("start_ms"), col("n_events"))
        .orderBy(col("start_ms"))),
    "x_length_buckets" -> ((s, dir) =>
      // Length-bucketed batching census over the corpus: 64-token
      // buckets (graft.ext.Packing.lengthBuckets) — all integers.
      Packing.lengthBuckets(Tables.documents(s, dir),
        TextAnalysis.wsTokenCount(col("text")), width = 64L)),
    "x_edit_distance" -> ((s, dir) => editDistance(s, dir)),
    "x_stream_static_join" -> ((s, dir) => streamStaticJoin(s, dir)),
    "x_upsert" -> ((s, dir) => upsertMerge(s, dir)),
    "x_gap_fill" -> ((s, dir) => gapFillDaily(s, dir)),
    "x_corr_regression" -> ((s, dir) => corrRegression(s, dir)),
    "x_rolling_stats" -> ((s, dir) => rollingStats(s, dir)),
    "x_stream_upsert" -> ((s, dir) => streamUpsertSink(s, dir)),
    "x_bigram_next" -> ((s, dir) => bigramNext(s, dir)),
    "x_quality_gate" -> ((s, dir) => qualityGate(s, dir)),
    "x_ntile_buckets" -> ((s, dir) => {
      // Equi-DEPTH histogram via DISTRIBUTED exact NTILE(10) — the
      // quantile-bucket complement of q_histogram_price's equi-width
      // bins. The order key is a UNIQUE composite (price, orderkey,
      // linenumber) so remainder distribution is deterministic on both
      // engines. graft.operators.EquiDepth computes the identical
      // bucket assignment as the window form via range-partition +
      // per-partition offsets — no empty-PARTITION-BY WindowExec
      // funneling every row through one task (EquiDepthSpec pins both
      // the equivalence and the plan shape); the sketch path at 100 TB
      // stays x_approx_percentile.
      graft.operators.EquiDepth.ntileBuckets(
          Tables.lineitem(s, dir)
            .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          Seq("l_extendedprice", "l_orderkey", "l_linenumber"), 10)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).cast("double").as("lo"),
          max(col("l_extendedprice")).cast("double").as("hi"))
        .orderBy(col("bucket"))
    }),
    "x_embed_norms" -> ((s, dir) =>
      // Vector-corpus quality histogram: L2 norms bucketed at 0.25
      // width. The per-vector sum-of-squares is a sequential fold
      // (kernel and DuckDB's list_reduce accumulate left-to-right in
      // double), so buckets match exactly across engines.
      Tables.embeddings(s, dir)
        .select(floor(sqrt(
            Similarity.dotIn(s)(col("embedding"), col("embedding"))) * 4)
          .cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))),
    "x_batch_sessions" -> ((s, dir) =>
      // Full value-checked batch sessionization (the parity bit in
      // x_stream_sessions compares stream vs batch; THIS query checks
      // the batch sessions themselves against an independent SQL
      // twin). One shuffle on the user key.
      graft.streaming.StreamOps.sessionizeBatch(
          Tables.events(s, dir), "user_id", "ts", gapMinutes = 60)
        .select(col("user_id"), col("start_ms"), col("end_ms"),
          col("n_events").cast("long").as("n_events"))
        .orderBy(col("user_id"), col("start_ms"))),
    "x_rollup" -> ((s, dir) =>
      // ROLLUP subtotal lattice over (returnflag, linestatus): detail,
      // per-flag subtotal, grand total in ONE pass — Spark's Expand
      // operator replicates each row per grouping set and partial
      // aggregation collapses all three levels map-side. grouping_id
      // disambiguates rollup nulls from data nulls; keys coalesce to
      // '(all)' so the ordering is engine-portable.
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("gid"), col("rf"), col("ls"))),
    "x_pivot" -> ((s, dir) => {
      // Day × event-type PIVOT with an EXPLICIT value list — never let
      // pivot run its values-discovery distinct job at scale; with the
      // list given it is one groupBy pass, one shuffle. Absent cells
      // coalesce to 0 to match SQL conditional counts.
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", types)
        .count()
        .select(col("day") +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy(col("day"))
    }),
    "x_topk_group" -> ((s, dir) => {
      // Top-3 orders by price per priority. The rank-filter pattern
      // triggers Spark's WindowGroupLimit rule: each map task keeps
      // only its local top-3 per group BEFORE the shuffle, so the
      // exchange carries O(groups·k) rows, not the table (plan pinned
      // in TopKSpec).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rk"))
    }),
    "x_scd2" -> ((s, dir) =>
      // SCD-2 history build (operators/Scd2): each user's event-type
      // change stream collapsed to validity intervals — run heads +
      // lead() sharing one key shuffle. valid_to null = current.
      graft.operators.Scd2.intervals(
          Tables.events(s, dir)
            .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
          "user_id", "ts", "event_type", tieCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"),
          unix_millis(col("valid_from")).as("valid_from_ms"),
          unix_millis(col("valid_to")).as("valid_to_ms"), col("event_type"))
        .orderBy(col("user_id"), col("valid_from_ms"), col("event_id"))),
    "x_table_diff" -> ((s, dir) => {
      // Cutover reconciliation (operators/Reconcile): orders vs a
      // deterministically drifted twin — 1/499 keys dropped
      // (only_left), 1/997 prices bumped (differs), 1/631 re-keyed
      // negative (only_right) — full-outer key join + null-safe
      // column compares, no engine-specific hashing.
      val orders = Tables.orders(s, dir)
      val extra = orders.where(col("o_orderkey") % 631 === 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
      val drifted = orders.where(col("o_orderkey") % 499 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 997 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(extra)
      graft.operators.Reconcile.diffCensus(orders, drifted, Seq("o_orderkey"))
    }),
    "x_k_anonymity" -> ((s, dir) =>
      // Privacy-audit census (quality/Uniqueness.kAnonymityProfile):
      // equivalence-class-size histogram over the quasi-identifiers
      // (nation, market segment) — min k in this profile IS the
      // table's k-anonymity.
      graft.quality.Uniqueness.kAnonymityProfile(
        Tables.customer(s, dir), Seq("c_nationkey", "c_mktsegment"))),
    "x_memorization" -> ((s, dir) =>
      // Per-doc memorized-bigram fraction against the corpus's own
      // bigram census (TextAnalysis.memorizedBigramStats, minCount 4)
      // — the document-level boilerplate/memorization signal.
      TextAnalysis.memorizedBigramStats(
        Tables.documents(s, dir), "doc_id", "text", minCount = 4L)),
    "x_compaction_bins" -> ((s, dir) => {
      // Compaction planning: pseudo-files (one per orderkey, size =
      // its line count) packed into 64-row bins by GLOBAL start
      // offset. The running total is operators/PrefixSum — range
      // partition + per-partition offsets — NOT an empty-PARTITION-BY
      // window (which would funnel every file through one task).
      val files = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("size"))
      graft.operators.PrefixSum.runningTotal(files, Seq("l_orderkey"), "size")
        .withColumn("bin", expr("(cum - size) DIV 64"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("size")).as("rows_in_bin"),
          min(col("l_orderkey")).as("first_key"), max(col("l_orderkey")).as("last_key"))
        .orderBy(col("bin"))
    }),
    "x_count_min" -> ((s, dir) => countMinCensus(s, dir)),
    "x_cdc_apply" -> ((s, dir) => {
      // CDC apply (operators/Cdc): snapshot + ordered I/U/D change
      // feed -> final state in ONE plan (union + WindowGroupLimit
      // latest-per-key; deletes drop the key). Feed is deterministic
      // drift over orders: 1/5 updated (seq 1), 1/7 deleted (seq 2 —
      // delete beats update on keys divisible by 35), 1/11 inserted
      // under a fresh negative key. The dump is the final state's
      // (count, key-sum, exact price-sum) — a full multiset pin in 1
      // row; the oracle replays feed and window.
      val o = Tables.orders(s, dir)
      val upd = o.where(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
        .withColumn("op", lit("U")).withColumn("seq", lit(1L))
      val del = o.where(col("o_orderkey") % 7 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(2L))
      val ins = o.where(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .withColumn("op", lit("I")).withColumn("seq", lit(1L))
      graft.operators.Cdc.applyChanges(
          o, upd.unionByName(del).unionByName(ins), Seq("o_orderkey"), "seq", "op")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_keys"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),
    "x_shipping_priority" -> ((s, dir) =>
      // TPC-H Q3 shape: selective dim filter -> 3-way join -> keyed
      // agg -> top-10 (TakeOrderedAndProject — never a global sort).
      // Catalyst broadcasts the filtered customer side; the
      // lineitem/orders join stays shuffle-keyed. Revenue is the
      // exact-decimal sum of double products (identical order-free
      // arithmetic on both engines).
      Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir)
            .where(col("o_orderdate") < lit("1998-06-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir)
            .where(col("l_shipdate") > lit("1998-06-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),
    "x_entropy" -> ((s, dir) => entropyProfile(s, dir)),
    "x_token_split" -> ((s, dir) => tokenBudgetSplit(s, dir)),
    "x_union_evolve" -> ((s, dir) => {
      // Schema-evolution union: the legacy half of the corpus lacks
      // `lang`; unionByName(allowMissingColumns) null-fills it —
      // positional union would silently misalign. Census by lang
      // pins the fill semantics.
      val d = Tables.documents(s, dir)
      val cur = d.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("lang"))
      val legacy = d.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"))
      cur.unionByName(legacy, allowMissingColumns = true)
        .groupBy(coalesce(col("lang"), lit("(missing)")).as("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))
    })
  )

  /** The naive cosine-threshold self-join, scaled by the opt-in
    * optimizer rewrite (graft.plans.ApproxSimilarityJoin). The flag is
    * scoped to the rewritten computation: set, the rewritten join
    * EXECUTED into an eager checkpoint (a downstream action builds a
    * fresh QueryExecution and would re-optimize without the flag — a
    * lazily returned plan would silently lose the rewrite), then
    * restored. The rewritten pair count is hash-dependent (LSH-bucket
    * recall), so the gate bounds it with hash-independent truth: the
    * SAME query executed WITHOUT the flag (the un-rewritten n² path —
    * gate/bench scale only) must be an upper bound, and the
    * identical-vector pair count a lower bound. Plan-shape semantics
    * stay pinned by ApproxSimilarityJoinSpec.
    */
  private def approxSimJoin(s: SparkSession, dir: String): DataFrame = {
    val flag = "spark.graft.approxSimilarityJoin"
    def pairCount(): DataFrame = {
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
      a.crossJoin(b)
        .where(call_function("graft_cosine_sim", col("v_a"), col("v_b")) >= lit(0.9)
          && col("id_a") < col("id_b"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // executes under the CURRENT flag state; 1 row
    }
    val prev = s.conf.getOption(flag)
    s.conf.set(flag, "true")
    val rewritten =
      try pairCount()
      finally prev match {
        case Some(v) => s.conf.set(flag, v)
        case None => s.conf.unset(flag)
      }
    // Truth via bruteForcePairs, not the un-rewritten cross join: its
    // norms are precomputed per VECTOR (n, not n² — the kernel cosine
    // recomputes both norms per pair), and sqrt(aa)·sqrt(bb) is the
    // identical IEEE product, so the threshold set matches the kernel
    // bit-for-bit (measured: 2× faster truth pass at sf0.1).
    val truth = Similarity.bruteForcePairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", 0.9)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val nIdent = Tables.embeddings(s, dir)
      .groupBy(col("embedding")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(expr("__c * (__c - 1) DIV 2")), lit(0L))
        .as("n_identical_pairs"))
    rewritten.select(col("n").as("__rew"))
      .crossJoin(truth.select(col("n").as("n_true_pairs")))
      .crossJoin(nIdent)
      .select(col("n_true_pairs"), col("n_identical_pairs"),
        (col("__rew") <= col("n_true_pairs")).cast("long").as("le_true_ok"),
        (col("__rew") >= col("n_identical_pairs")).cast("long").as("ge_identical_ok"))
  }

  /** One persisted IVF index per (session, sf dir): Lloyd training and
    * cluster assignment run ONCE (IvfIndex.build), then every consumer
    * — x_ivf_topk, x_ivf_recall, repeated bench reps — probes the saved
    * partition-pruned table. Keyed by session identity, not just the
    * catalog, so a fresh JVM always rebuilds (a catalog table surviving
    * in the warehouse dir must never serve stale data after the source
    * parquet changes). */
  // Weak keys: a GC'd session's entry drops out, and a NEW session is
  // a distinct reference — unlike identityHashCode, which the JVM can
  // hand to a different session after collection (a stale-index
  // hazard). SparkSession uses reference equality, which is exactly
  // the memo's contract: per-session, rebuild in a fresh JVM/session.
  private val ivfMemo =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, Seq[Seq[Float]]]]()
  private def ivfIndexFor(s: SparkSession, dir: String): String = {
    // Collision-resistant table name: MD5 of the full dir path (a
    // 32-bit hashCode could collide across sf dirs and silently serve
    // an index built from the wrong corpus).
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val table = "graft_ivf_" + digest
    ivfMemo.synchronized {
      val perSession = {
        val m = ivfMemo.get(s)
        if (m != null) m
        else { val m2 = new java.util.HashMap[String, Seq[Seq[Float]]](); ivfMemo.put(s, m2); m2 }
      }
      if (!perSession.containsKey(dir))
        perSession.put(dir,
          IvfIndex.build(Tables.embeddings(s, dir).where(col("vec_id") =!= 0),
            "vec_id", "embedding", table, k = 16, iters = 2))
    }
    table
  }

  /** IVF ANN top-10 for the vec_id=0 query (16 Lloyd-trained clusters,
    * probe 4) — the trained-index alternative to the LSH bucket path,
    * emitted through the shape gate; per-value recall vs brute force
    * is measured in SimilaritySpec and gated by x_ivf_recall. Served
    * from the per-session persisted index (partition-pruned probe, no
    * retraining). */
  private def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    topKShape(
      IvfIndex.probeTopK(s, ivfIndexFor(s, dir), "vec_id", "embedding", q, 10, nProbe = 4),
      e.where(col("vec_id") =!= 0), "vec_id")
  }

  /** Embedding-cosine near-dup gate: LSH-bucket blocking (8 hyperplane
    * bits → 256 buckets) keeps the pair join keyed — sum(bucket²),
    * never n² — then exact cosine confirms; a hot bucket is dropped at
    * maxBlockSize rather than going quadratic. The confirmed SET is
    * hash-dependent, so the gate emits its hash-independent bounds
    * over the real output (same construction as minhashSummary):
    * n_true_pairs / n_identical_pairs from Similarity.bruteForcePairs
    * (the oracle replays the identical fold-order cosine in SQL — the
    * truth pass is quadratic BY DESIGN and runs at gate/bench scale,
    * not in production paths), subset_ok because blocking only ever
    * misses pairs, ge_identical_ok because byte-identical vectors
    * share every hyperplane sign and have cosine 1. */
  private def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", Similarity.lshBucketIn(s)(col("embedding"), 8))
    val confirmed = Similarity.cosinePairsWithin(e, "vec_id", "embedding",
        "bucket", 0.9, maxBlockSize = 10000)
      .select(col("id_a"), col("id_b"))
      .pipe(graft.ext.Checkpoints.stage)
    val truth = Similarity.bruteForcePairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", 0.9)
      .select(col("id_a"), col("id_b"))
      .pipe(graft.ext.Checkpoints.stage)
    val nIdent = Tables.embeddings(s, dir)
      .groupBy(col("embedding")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(expr("__c * (__c - 1) DIV 2")), lit(0L))
        .as("n_identical_pairs"))
    val nConf = confirmed.agg(count(lit(1)).as("__conf"))
    val viol = confirmed.join(truth, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("__viol"))
    Tables.embeddings(s, dir).agg(count(lit(1)).as("n_vecs"))
      .crossJoin(truth.agg(count(lit(1)).as("n_true_pairs")))
      .crossJoin(nIdent).crossJoin(nConf).crossJoin(viol)
      .select(col("n_vecs"), col("n_true_pairs"), col("n_identical_pairs"),
        (col("__viol") === 0).cast("long").as("subset_ok"),
        (col("__conf") >= col("n_identical_pairs")).cast("long").as("ge_identical_ok"))
  }

  /** Count of rows where a codegen'd kernel disagrees with its
    * higher-order-function twin — the oracle-checkable form of the
    * kernel-equivalence contract (GraftFunctionsSpec pins it per
    * kernel; this gates it through the driver's DuckDB compare as a
    * hard 0). Covers all five kernels: shingle hashes + minhash bands
    * over documents, dot + cosine + lsh bucket over adjacent embedding
    * pairs. Null-safe (`<=>`) so a null on both paths counts as
    * agreement. Fails loudly if GraftExtensions is not installed —
    * a vacuous pass would be worse than an error. */
  private def kernelEquiv(s: SparkSession, dir: String): DataFrame = {
    def mismatch(a: Column, b: Column): Column = (!(a <=> b)).cast("long")
    val k = Dedup.MinHashParams()
    val docSide = Tables.documents(s, dir).select(
        mismatch(
          call_function("graft_shingle_hashes", col("text"), lit(k.shingleSize)),
          Dedup.shingleHashes(Dedup.shingles(col("text"), k.shingleSize))).as("m_sh"),
        mismatch(
          call_function("graft_minhash_bands",
            call_function("graft_shingle_hashes", col("text"), lit(k.shingleSize)),
            lit(k.bands), lit(k.numHashes / k.bands)),
          Dedup.minhashBandsHof(
            Dedup.shingleHashes(Dedup.shingles(col("text"), k.shingleSize)),
            k.bands, k.numHashes / k.bands)).as("m_mb"))
      .agg(coalesce(sum(col("m_sh") + col("m_mb")), lit(0L)).as("m_doc"))
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select((col("vec_id") - 1).as("id_a"), col("embedding").as("v_b"))
    val vecSide = a.join(b, Seq("id_a"))
      .select(
        mismatch(call_function("graft_dot", col("v_a"), col("v_b")),
          Similarity.dot(col("v_a"), col("v_b"))).as("m_dot"),
        mismatch(call_function("graft_cosine_sim", col("v_a"), col("v_b")),
          Similarity.cosine(col("v_a"), col("v_b"))).as("m_cos"),
        mismatch(call_function("graft_lsh_bucket", col("v_a"), lit(8)),
          Similarity.lshBucket(col("v_a"), 8)).as("m_lsh"))
      .agg(coalesce(sum(col("m_dot") + col("m_cos") + col("m_lsh")), lit(0L)).as("m_vec"))
    docSide.crossJoin(vecSide)
      .select((col("m_doc") + col("m_vec")).as("n_mismatch"))
  }

  /** LSH-ANN recall floor as a driver-checkable bit: 1 when the
    * multi-probe ANN top-10 overlaps the brute-force top-10 in at
    * least `annRecallFloor` ids. Every input to the overlap is
    * deterministic (hash-derived buckets, tie-broken ordering), so the
    * bit is stable; the floor leaves headroom below the measured
    * overlap so parameter-neutral refactors don't flip it.
    *
    * FIXTURE-DEPENDENT FLOOR: 5 is an empirical bound for the driver
    * fixtures (measured overlap 7–10 of 10 at sf0.001–0.1). A new
    * scale factor or regenerated embeddings can flip this bit as a
    * PARAMETER artifact, not a code bug — re-measure overlap vs brute
    * force (SimilaritySpec does) before suspecting the ANN path. */
  private val annRecallFloor = 5
  private def annRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .select(col("vec_id"))
    val ann = Similarity.annTopK(corpus, "vec_id", "embedding", q, 10, bits = 4)
      .select(col("vec_id"))
    exact.join(ann, Seq("vec_id"))
      .agg((count(lit(1)) >= annRecallFloor).cast("long").as("recall_ok"))
  }

  /** IVF-ANN recall floor bit (Lloyd-trained centroids, probe 4 of 16)
    * — deterministic because ivfTrain's means are exact-decimal sums.
    * The IVF side probes the SAME per-session persisted index as
    * x_ivf_topk (identical results to on-the-fly ivfTopK — same
    * centroids, same ranking, same cosine — with zero retraining).
    * Same fixture-dependent-floor caveat as [[annRecallFloor]]. */
  private val ivfRecallFloor = 5
  private def ivfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .select(col("vec_id"))
    val ivf = IvfIndex.probeTopK(s, ivfIndexFor(s, dir), "vec_id", "embedding",
        q, 10, nProbe = 4)
      .select(col("vec_id"))
    exact.join(ivf, Seq("vec_id"))
      .agg((count(lit(1)) >= ivfRecallFloor).cast("long").as("recall_ok"))
  }

  /** x_neardup_dedup: runs the END-TO-END near-dup dedup (candidates →
    * verify → cluster → survivor per cluster, DedupSpec pins the
    * planted-cluster semantics) and gates it with the idempotence bit:
    * a second pass over the survivors confirms ZERO pairs at the
    * threshold — precisely the condition under which
    * dedup(dedup(x)) = dedup(x), since dedup removes a row iff a
    * confirmed pair touches it. The bit is hash-independent even
    * though the survivor SET is not — which is what makes an
    * oracle-checkable constant out of the MinHash pipeline's
    * end-to-end semantics.
    *
    * The corpus is banded ONCE: bands are per-row, so the survivors'
    * band table is a semi-join of the full one — the second pass pays
    * a slim join instead of repeating the shingle+minhash computation
    * (the same amortization the persisted ANN/IVF indexes apply). */
  private def neardupIdempotent(s: SparkSession, dir: String): DataFrame = {
    val params = Dedup.MinHashParams()
    val docs = Tables.documents(s, dir)
    val b = Dedup.bands(docs, "doc_id", "text", params).pipe(graft.ext.Checkpoints.stage)
    val once = Dedup.dedupNearDups(docs, "doc_id", "text", params,
      threshold = 0.5, precomputedBands = Some(b))
    val survivorBands = b.join(once.select(col("doc_id")),
        b("id") === col("doc_id"), "left_semi")
      .pipe(graft.ext.Checkpoints.stage)
    Dedup.nearDupPairs(once, "doc_id", "text", params, threshold = 0.5,
        precomputedBands = Some(survivorBands))
      .agg((count(lit(1)) === 0).cast("long").as("idempotent_ok"))
  }

  /** x_multimodal_decode: count of rows where the expression decode path
    * (decodeFeaturesStub, codegen'd per-row) disagrees with the batched
    * mapPartitions path (decodeBatched, the mapInPandas shape) — the
    * oracle-checkable form of the two-path decode contract
    * (SimilaritySpec pins it row-wise; this gates it as a hard 0).
    * Full-outer join so a row missing from either path counts as a
    * mismatch rather than vanishing; null payloads must decode to null
    * on BOTH paths (`<=>` counts double-null as agreement). */
  private def decodeParity(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Multimodal.attachPayload(Tables.documents(s, dir),
      "text", "text/plain")
    val viaExpr = withPayload.select(col("doc_id"),
      Multimodal.decodeFeaturesStub(col("payload")).as("f_expr"))
    val viaBatch = Multimodal.decodeBatched(withPayload, "doc_id", "payload")
    viaExpr.join(viaBatch, Seq("doc_id"), "full_outer")
      .agg(coalesce(sum((!(col("f_expr") <=> col("features"))).cast("long")),
        lit(0L)).as("n_mismatch"))
  }

  /** Multiset-equality bit: 1 iff `a` and `b` hold exactly the same
    * rows with the same multiplicities. One ±1-weighted union +
    * groupBy — a single shuffle, where the exceptAll-both-ways form
    * shuffles both inputs twice. Inputs must share column order. */
  private def multisetParityBit(a: DataFrame, b: DataFrame, bitName: String): DataFrame = {
    val keys = a.columns.map(col)
    a.withColumn("_w", lit(1L)).unionAll(b.withColumn("_w", lit(-1L)))
      .groupBy(keys: _*).agg(sum(col("_w")).as("_d"))
      .agg((count(when(col("_d") =!= 0, lit(1))) === 0).cast("long").as(bitName))
  }

  /** x_stream_sessions: batch ≡ stream sessionization parity bit — RUNS
    * the bounded AvailableNow flatMapGroupsWithState sessionizer (the
    * streaming machinery is fully exercised), which must emit EXACTLY
    * the sessions the batch lag+cumsum twin predicts
    * (StreamOps.sessionizeBatchEmitted — gap-closed sessions plus
    * watermark-timed-out finals). Compared as multisets of
    * (user_id, start, end, n_events); the bit is 1 iff the symmetric
    * difference is empty. */
  private def streamBatchParity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.StreamOps
    val ev = StreamOps.eventsStream(s, dir)
      .select(col("user_id"), col("ts")).as[StreamOps.SessionEvent]
    val streamed = StreamOps.runAvailableNow(
      StreamOps.sessionize(ev, gapMinutes = 60).toDF(),
      "stream_sessions_parity",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select(col("user_id"), unix_millis(col("start")).as("start_ms"),
        unix_millis(col("end")).as("end_ms"), col("n_events"))
    val batch = StreamOps.sessionizeBatchEmitted(
      Tables.events(s, dir), "user_id", "ts", gapMinutes = 60)
    multisetParityBit(streamed, batch, "stream_parity_ok")
  }

  /** Backward as-of join over events: each click event picks up the
    * most recent error event of the same user at or before its
    * timestamp (graft.operators.AsOfJoin — union + one keyed window,
    * no join node, no row explosion). The right side is pre-aggregated
    * to one row per (user_id, ts) so the tie pick is deterministic on
    * both engines; the oracle is DuckDB's native ASOF LEFT JOIN. */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("err_id"))
    graft.operators.AsOfJoin.asOfBackward(
        clicks, errors, "user_id", "ts", Seq("err_id"), "prev_")
      .select(col("event_id"), col("user_id"), col("prev_err_id"))
      .orderBy(col("event_id"))
  }

  /** Forward twin of [[asofJoin]]: each click's NEXT error at or after
    * it (time-to-next-failure shape) — checked against DuckDB's native
    * forward ASOF (`c.ts <= e.ts`). Right side pre-aggregated per
    * (user, ts) with MIN so the at-ts pick is deterministic. */
  private def asofForwardJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("err_id"))
    graft.operators.AsOfJoin.asOfForward(
        clicks, errors, "user_id", "ts", Seq("err_id"), "next_")
      .select(col("event_id"), col("user_id"), col("next_err_id"))
      .orderBy(col("event_id"))
  }

  /** Bounded-gap range join (graft.operators.RangeJoin): same-customer
    * order pairs at most 7 days apart, summarized per customer. The
    * interval-bucketing rewrite turns the range predicate into an
    * equi-join on (key, week-bucket); the oracle is the naive
    * inequality join in SQL — identical pairs, different plan. */
  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), unix_date(col("o_orderdate").cast("date")).as("d"))
    graft.operators.RangeJoin.temporalPairs(o, "o_custkey", "d", maxGap = 7L)
      .groupBy(col("k").as("o_custkey"))
      .agg(count(lit(1)).as("n_close_pairs"),
        min(col("t_a")).cast("long").as("first_day"),
        max(col("t_b")).cast("long").as("last_day"))
      .orderBy(col("o_custkey"))
  }

  /** Corpus vocabulary: top-50 terms by total occurrences with their
    * document frequencies — the frequency/vocab analysis every
    * training-data pipeline runs before filtering. Whitespace
    * tokenization matches the oracle's string_split; all-integer
    * output, so the compare is exact. One explode + keyed aggregation,
    * TakeOrdered top-k — no driver-side collection. */
  private def vocabTop(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_total"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_total").desc, col("term"))
      .limit(50)

  /** Per-document OOV fraction vs the corpus top-`vocabSize` tokens —
    * see the x_oov_rate registration comment for the plan shape. */
  private def oovRate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.oovStats(Tables.documents(s, dir), "doc_id", "text", vocabSize = 10)

  /** Two-level distinct-user rollup where the second level reads ONLY
    * the first level's sketches: day×type HLL sketches (the shape a
    * 100 TB pipeline materializes once per day), merged per type with
    * `hll_union_agg` — exactness of the final estimate is gated
    * against an independently-computed exact COUNT(DISTINCT). */
  private def hllRollup(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    // Level 1: the persistable daily sketch table. Checkpointed so the
    // rollup provably consumes materialized sketches, not a rewritten
    // scan of the raw events.
    val daily = graft.ext.Checkpoints.stage(
      events
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk")))
    // Level 2: merge-only rollup.
    val rolled = daily
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_day_sketches"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = events
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
    rolled.join(exact, "event_type")
      .select(col("event_type"), col("n_day_sketches"), col("n_exact"),
        (abs(col("est").cast("double") / col("n_exact").cast("double") - 1.0) < 0.15)
          .cast("long").as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Census of the connected components of the star-schema membership
    * graph (customer—nation—region edges, ids offset into disjoint
    * ranges), computed by the generic alternating large-star /
    * small-star operator. Components are exactly the five regions, so
    * every label and size is value-checkable by a recursive-CTE
    * transitive closure in the oracle — the driver-visible gate for an
    * operator whose per-round internals no SQL engine exposes. */
  private def connectedComponentsCensus(s: SparkSession, dir: String): DataFrame = {
    val nationEdges = Tables.nation(s, dir)
      .select((col("n_nationkey") + 100).cast("long").as("src"),
        col("n_regionkey").cast("long").as("dst"))
    val customerEdges = Tables.customer(s, dir)
      .select((col("c_custkey") + 1000).cast("long").as("src"),
        (col("c_nationkey") + 100).cast("long").as("dst"))
    graft.operators.ConnectedComponents
      .run(nationEdges.union(customerEdges), "src", "dst")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_nodes"), max(col("node")).as("max_node"))
      .orderBy(col("component"))
  }

  /** Ordered funnel over the events stream: per user, the FIRST
    * occurrence of each stage (conditional min — one keyed aggregation,
    * no self-joins), then strict-ordering counts view → click →
    * purchase. The single-pass conditional-aggregate shape is the one
    * that survives 100 TB; a per-stage self-join would shuffle the
    * event log once per stage. */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def firstOf(t: String) = min(when(col("event_type") === t, col("ts")))
    ev.groupBy(col("user_id"))
      .agg(firstOf("view").as("t_view"), firstOf("click").as("t_click"),
        firstOf("purchase").as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("t_view").isNotNull.cast("long")).as("n_view"),
        sum((col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_click") > col("t_view")).cast("long")).as("n_view_click"),
        sum((col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_purchase").isNotNull && col("t_click") > col("t_view") &&
          col("t_purchase") > col("t_click")).cast("long")).as("n_full_funnel"))
  }

  /** Daily cohort retention: users grouped by first-seen day, with
    * day-1 and day-7+ return counts — two keyed aggregations and one
    * equi-join on the user key (the distinct (user, day) activity set
    * is the small derived table, never the raw log twice). */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val firstDay = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    active.join(firstDay, Seq("user_id"))
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count_distinct(when(col("offset") === 1, col("user_id"))).as("n_d1"),
        count_distinct(when(col("offset") >= 7, col("user_id"))).as("n_d7plus"))
      .orderBy(col("cohort_day"))
  }

  /** Salted fact-to-dim join (graft.ext.Skew.saltedJoin, salt 8): the
    * hot-key fallback for joins AQE can't split. The salt spreads each
    * key over 8 shuffle partitions and NEVER changes the result, which
    * is exactly what the oracle checks — the plain SQL join aggregated
    * identically. House decimal-sum rules for the measure. */
  private def saltedJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderstatus"))
    graft.ext.Skew.saltedJoin(li, o, "okey", salt = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** Adjacent-pair dot product in int8-quantized space
    * (graft.ext.Quantize) — the oracle-checkable anchor for the
    * quantization arithmetic: scale, round-half-up, and integer dot
    * are replayed exactly by the DuckDB twin. */
  private def quantizeDot(s: SparkSession, dir: String): DataFrame = {
    val e = Quantize.withQuantized(Tables.embeddings(s, dir), "embedding", "qv")
      .select(col("vec_id"), col("qv"))
    val a = e.select(col("vec_id").as("id_a"), col("qv").as("q_a"))
    val b = e.select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
      col("qv").as("q_b"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        Quantize.dotQ(col("q_a"), col("q_b")).as("qdot"))
      .orderBy(col("id_a"))
  }

  /** Int8 ranking quality as a driver-checkable bit: 1 when the
    * quantized-cosine top-10 overlaps the float-cosine top-10 in at
    * least `quantizeRecallFloor` ids. The per-vector scale cancels in
    * cosine, so the two rankings differ only by rounding noise —
    * measured overlap is 9–10 of 10 on the driver fixtures; the floor
    * leaves the same headroom convention as [[annRecallFloor]] (and
    * shares its fixture-dependence caveat). */
  private val quantizeRecallFloor = 5
  private def quantizeRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .select(col("vec_id"))
    // Query vector quantized on the DRIVER (same IEEE arithmetic) and
    // the corpus through the two-projection withQuantized shape — then
    // the ranking runs on the codegen'd cosine kernel over doubles.
    // Long→double is exact here (|q_i| ≤ 127, 128-dim dot ≪ 2^53), so
    // the scores are bit-identical to integer cosineQ.
    val qlit = array(Quantize.quantizeLocal(q).map(lit(_)): _*)
    val quant = Quantize.withQuantized(corpus, "embedding", "qv")
      .select(col("vec_id"), col("qv").cast("array<double>").as("qd"))
      .select(col("vec_id"), Similarity.cosineIn(s)(col("qd"), qlit).as("cos_q"))
      .orderBy(col("cos_q").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"))
    exact.join(quant, Seq("vec_id"))
      .agg((count(lit(1)) >= quantizeRecallFloor).cast("long").as("recall_ok"))
  }

  /** Benchmark decontamination over the corpus: docs with
    * doc_id % 97 == 0 stand in for the eval suite, the rest are the
    * training corpus; report how many training docs share a word
    * 3-gram with it (graft.ext.TextAnalysis.contaminationReport —
    * broadcast semi-join, corpus never shuffled). */
  private def contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextAnalysis.contaminationReport(
      docs.where(col("doc_id") % 97 =!= 0),
      docs.where(col("doc_id") % 97 === 0),
      "doc_id", "text", k = 3)
  }

  /** Bloom-pruned fact-to-dim join (graft.ext.BloomPrune): lineitem is
    * pre-filtered by a Bloom filter over the selective order-key set
    * before the exact join. The oracle is the PLAIN join — pruning is
    * plan-internal, and the equality IS the no-false-negative proof. */
  private def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.orders(s, dir).where(col("o_orderstatus") === "P")
      .select(col("o_orderkey").as("okey"))
    // The dim-side cardinality sizes the sketch — one scalar count on
    // the SMALL side (house pattern), never on the fact side. That is
    // a second dim scan (count + the sketch aggregation); a catalog
    // row-count estimate would fold it away at cluster scale, and
    // overestimating expectedKeys only grows the sketch, never breaks
    // correctness.
    val nKeys = math.max(keys.count(), 1L)
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    BloomPrune.prunedJoin(li, keys, "okey", nKeys, fpp = 0.01)
      .agg(count(lit(1)).as("n_matches"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
  }

  /** x_stream_interval_join: batch ≡ stream parity bit for the
    * stream-stream interval join (StreamOps.intervalJoin). The bounded
    * AvailableNow run joins click events to same-user view events from
    * the preceding 10 minutes; an inner interval join emits every
    * match it ever sees (watermarks only bound STATE), so on a bounded
    * input the emitted set must equal the batch inequality join
    * exactly. Compared as multisets of (click_id, view_id). */
  private def streamIntervalParity(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    def sideS(t: String, idAs: String) =
      StreamOps.eventsStream(s, dir).where(col("event_type") === t)
        .select(col("user_id"), col("ts"), col("event_id").as(idAs))
    val joined = StreamOps.intervalJoin(
      sideS("click", "click_id"), sideS("view", "view_id"),
      "user_id", "ts", windowMinutes = 10, watermark = "60 minutes")
      .select(col("click_id"), col("view_id"))
    val streamed = StreamOps.runAvailableNow(joined, "stream_interval_parity",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val ev = Tables.events(s, dir)
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("uid_r"), col("ts").as("ts_r"),
        col("event_id").as("view_id"))
    val batch = c.join(v,
        col("user_id") === col("uid_r") && col("ts_r") <= col("ts") &&
          col("ts_r") >= col("ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("view_id"))
    multisetParityBit(streamed, batch, "interval_parity_ok")
  }

  /** x_stream_outer_join: batch ≡ stream parity for the LEFT-OUTER
    * stream-stream interval join — the harder emission contract:
    * matched pairs flow like the inner join, but unmatched clicks
    * only emit (with a null view_id) once the GLOBAL watermark —
    * min over both sources' max event time, minus the delay — passes
    * their event time, because until then a matching view could still
    * arrive. StreamOps.intervalJoinLeftOuterEmitted expresses exactly
    * that subset in batch; the bit is 1 iff the multisets agree. */
  private def streamOuterIntervalParity(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    def sideS(t: String, idAs: String) =
      StreamOps.eventsStream(s, dir).where(col("event_type") === t)
        .select(col("user_id"), col("ts"), col("event_id").as(idAs))
    val joined = StreamOps.intervalJoin(
      sideS("click", "click_id"), sideS("view", "view_id"),
      "user_id", "ts", windowMinutes = 10, watermark = "60 minutes",
      joinType = "left_outer")
      .select(col("click_id"), col("view_id"))
    val streamed = StreamOps.runAvailableNow(joined, "stream_outer_interval_parity",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val ev = Tables.events(s, dir)
    def sideB(t: String, idAs: String) =
      ev.where(col("event_type") === t)
        .select(col("user_id"), col("ts"), col("event_id").as(idAs))
    val emitted = StreamOps.intervalJoinLeftOuterEmitted(
      sideB("click", "click_id"), sideB("view", "view_id"),
      "user_id", "ts", windowMinutes = 10, watermarkMinutes = 60)
      .select(col("click_id"), col("view_id"))
    multisetParityBit(streamed, emitted, "outer_parity_ok")
  }

  /** x_stream_dedup: STREAMING exact dedup (StreamOps.dedup over the
    * events file stream) counted after a bounded AvailableNow run —
    * checked against an EXACT oracle (DuckDB's COUNT(DISTINCT
    * event_id)), not just a parity bit: the streaming path must land
    * on the same distinct cardinality as any batch engine. */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    val deduped = StreamOps.dedup(
      StreamOps.eventsStream(s, dir).select(col("event_id"), col("ts")),
      Seq("event_id"))
    StreamOps.runAvailableNow(deduped, "stream_dedup_q",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .agg(count(lit(1)).as("n_unique"))
  }

  /** x_stream_heavy: the Misra–Gries TypedImperativeAggregate running
    * INSIDE Structured Streaming — per-day windowed sketch over the
    * event-type stream; the custom aggregate's buffers serialize into
    * the state store like any builtin, which is the property this
    * query pins (a sketch that can't stream can't run on an unbounded
    * pipeline). With k=8 ≥ the 5-type vocabulary MG never evicts, so
    * the candidate maps ARE the exact per-day type counts and the
    * oracle is a plain GROUP BY replay — the same k≥vocab exactness
    * MisraGriesSpec proves; k < vocab behavior is pinned there too. */
  private def streamHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    val sketched = StreamOps.eventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(call_function("graft_mg_topk", col("event_type"), lit(8)).as("cand"))
      .select(col("w.start").cast("date").as("day"), col("cand"))
    StreamOps.runAvailableNow(sketched, "stream_heavy_q")
      .select(col("day"), explode(col("cand")).as(Seq("event_type", "n")))
      .orderBy(col("day"), col("event_type"))
  }

  /** x_approx_percentile: the sketch path for quantiles (what
    * q_percentiles' exact pass-through becomes at 100 TB — a
    * fixed-size digest instead of a full sort/shuffle), gated by its
    * own guarantee: approx_percentile(accuracy = A) returns a corpus
    * element whose TRUE rank is within n/A of the target rank. The
    * query re-derives the true ranks with one exact counting pass and
    * emits the bound check as a bit; the sketch is deterministic for
    * a given dataset, so the bit is stable. */
  private def approxPercentileBound(s: SparkSession, dir: String): DataFrame = {
    val acc = 1000
    val ps = Seq(0.5, 0.9, 0.99)
    val v = Tables.lineitem(s, dir).select(col("l_extendedprice").cast("double").as("v"))
    // 3 scalars (the sketch output) — house driver-scalar pattern.
    val approx = v.agg(percentile_approx(col("v"),
        array(ps.map(lit): _*), lit(acc)).as("ap"))
      .first().getSeq[Double](0)
    // The guarantee is that SOME rank of the returned element lies
    // within slack of p·n. A duplicated element occupies the rank
    // interval [count(v < a) + 1, count(v <= a)] — so the check is
    // interval INTERSECTION, not a point test on the max rank (which
    // would spuriously fail when the returned value has multiplicity
    // greater than the slack).
    val checks = ps.zip(approx).map { case (p, a) =>
      val rankLo = sum((col("v") < a).cast("long"))
      val rankHi = sum((col("v") <= a).cast("long"))
      val n = count(lit(1))
      val slack = n.cast("double") / acc + 1.0
      (rankHi.cast("double") >= n.cast("double") * p - slack) &&
        (rankLo.cast("double") + 1.0 <= n.cast("double") * p + slack)
    }
    v.agg(checks.reduce(_ && _).cast("long").as("rank_bound_ok"))
  }

  /** Levenshtein distance between adjacent docs' 40-char prefixes —
    * the character-level fuzzy-dedup signal (complements the word-set
    * Jaccard and MinHash paths). Both engines implement the classic
    * DP edit distance over exact integers, so the compare is exact.
    * The O(m·n) DP runs per pair inside codegen; the adjacent-pair
    * self-join is the same id+1 equi-join anchor as x_quantize_dot. */
  private def editDistance(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("t"))
    val a = d.select(col("doc_id").as("id_a"), col("t").as("t_a"))
    val b = d.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"),
      col("t").as("t_b"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("t_a"), col("t_b")).cast("long").as("dist"))
      .orderBy(col("id_a"))
  }

  /** x_stream_static_join: stream-static enrichment — the events file
    * stream joins a broadcast static dimension (customer segment) per
    * microbatch, the standard "enrich a stream with reference data"
    * pattern. Stateless (no watermark/state store needed for
    * stream-static inner joins); the bounded AvailableNow emission
    * must match the plain batch join, which is what the oracle runs. */
  private def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = StreamOps.eventsStream(s, dir)
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
    StreamOps.runAvailableNow(joined, "stream_static_join",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** SCD-1 MERGE over orders (graft.operators.Upsert): a deterministic
    * updates batch (keys ≡ 0 mod 3, doubled price) replaces its base
    * rows (base drops keys ≡ 0 mod 5, so updates both overwrite and
    * insert); the merged state is summarized per status. The oracle
    * replays the merge relationally (updates ∪ base-minus-updated). */
  private def upsertMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Upsert
    val orders = Tables.orders(s, dir)
    val base = orders.where(col("o_orderkey") % 5 =!= 0)
    // ×2 on a double is exponent arithmetic — exact on both engines.
    val updates = orders.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Upsert.upsert(base, updates, Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Calendar gap-fill (graft.quality.Timeliness.gapFill) over a
    * deliberately sparse daily series (events with id ≡ 0 mod 997):
    * counts zero-fill, the max-value gauge carries forward (LOCF). */
  private def gapFillDaily(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Timeliness
    val obs = Tables.events(s, dir)
      .where(col("event_id") % 997 === 0)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
    Timeliness.gapFill(s, obs, "day", countCols = Seq("n"), gaugeCols = Seq("mx"))
  }

  /** Single-pass Pearson correlation + OLS slope between quantity and
    * extended price, built from EXACT decimal sums: the five sums are
    * decimal (order-independent, overflow-checked at this scale), cast
    * to double only once summed, and the r/slope formulas then run in
    * IEEE double with the same operation order as the SQL twin — so
    * the compare is exact, unlike builtin corr()'s order-dependent
    * float accumulation. One aggregate, no shuffle beyond it. */
  private def corrRegression(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("decimal(18,2)").as("x"),
      col("l_extendedprice").cast("decimal(18,2)").as("y"))
    val sums = li.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    val nd = col("n").cast("double")
    val covN = nd * col("sxy") - col("sx") * col("sy")
    val varXN = nd * col("sxx") - col("sx") * col("sx")
    val varYN = nd * col("syy") - col("sy") * col("sy")
    sums.select(col("n"),
      (covN / (sqrt(varXN) * sqrt(varYN))).as("pearson_r"),
      (covN / varXN).as("slope"))
  }

  /** x_stream_upsert: the streaming MERGE sink pattern — update-mode
    * daily counts flow through foreachBatch, and each micro-batch's
    * changed days upsert into a state table (graft.operators.Upsert),
    * exactly how a streaming pipeline maintains a continuously-
    * refreshed aggregate table. The final state must equal the batch
    * daily counts, which is what the oracle runs.
    *
    * The per-batch localCheckpoint keeps the state's lineage from
    * nesting across batches. It stores blocks only in executor
    * storage — fine for this bounded sink demo; a production deploy
    * would MERGE into a transactional table instead (see
    * Dedup.nearDupClusters for the executor-loss caveat). */
  private def streamUpsertSink(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    import graft.operators.Upsert
    val daily = StreamOps.dailyCounts(StreamOps.eventsStream(s, dir))
    var state: DataFrame = null
    val q = StreamOps.foreachBatchSink(daily, "stream_upsert_sink") { (batch, _) =>
      val b = batch.localCheckpoint(true)
      state = if (state == null) b
        else Upsert.upsert(state, b, Seq("day")).localCheckpoint(true)
    }
    q.awaitTermination()
    if (state == null) daily.sparkSession.emptyDataFrame
    else state.orderBy(col("day"))
  }

  /** Corpus bigram statistics: for every frequent leading word, the
    * most likely next word and the bigram count — the n-gram language-
    * model table a classic LM (or a repetition detector) builds over a
    * corpus. Shape: per-doc adjacent-pair explode (codegen, no
    * shuffle) → (w1, w2) count → per-w1 argmax window. The n ≥ 20
    * floor keeps the output the high-signal head, like x_vocab_top50.
    * Everything is integer counts + lexical tiebreaks — exact oracle. */
  private def bigramNext(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Spread the single-file scan before the per-doc pair explode
    // (graft.ext.Spread). Tokenize into an aliased column so the pair
    // lambda reads a bound attribute — an embedded split() would
    // re-run per element (O(len²) per doc).
    val src = graft.ext.Spread.ensure(Tables.documents(s, dir).select(col("text")))
    val t = col("t")
    val pairs = src.select(TextAnalysis.tokens(col("text")).as("t"))
      .select(when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1),
            i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")).as("ps"))
      .select(explode(col("ps")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val counts = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val byLead = Window.partitionBy(col("w1")).orderBy(col("n").desc, col("w2"))
    counts.withColumn("rn", row_number().over(byLead))
      .where(col("rn") === 1 && col("n") >= 20)
      .select(col("w1"), col("w2"), col("n"))
      .orderBy(col("w1"))
  }

  /** Gopher-style document quality GATE: the composite keep/drop
    * decision a pretraining pipeline runs per document — too short,
    * average word length out of band, too few stopwords, or dominated
    * by a single repeated token. Every rule is INTEGER arithmetic
    * (ratio thresholds rewritten as cross-multiplications), so the
    * gate replays exactly in SQL. The repetition rule needs the
    * per-doc token mode: one explode + (doc, term) count + per-doc
    * max — the only shuffles in the query; the other three rules are
    * codegen'd per-row columns. */
  private def qualityGate(s: SparkSession, dir: String): DataFrame = {
    val src = graft.ext.Spread.ensure(Tables.documents(s, dir))
    val t = col("text")
    val base = src.select(col("doc_id"),
      TextAnalysis.wsTokenCount(t).as("n_tok"),
      length(regexp_replace(t, " ", "")).cast("long").as("n_cns"),
      size(filter(TextAnalysis.tokens(t), w => w.isin("the", "a")))
        .cast("long").as("n_stop"))
    val rep = src.select(col("doc_id"), explode(TextAnalysis.tokens(t)).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("max_tok"))
    val fShort = col("n_tok") < 20
    val fAvg = col("n_cns") < lit(3) * col("n_tok") ||
      col("n_cns") > lit(10) * col("n_tok")
    val fStop = col("n_stop") * 50 < col("n_tok")
    val fRep = col("max_tok") * 5 >= col("n_tok")
    base.join(rep, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(fShort.cast("long")).as("n_fail_short"),
        sum(fAvg.cast("long")).as("n_fail_avg_len"),
        sum(fStop.cast("long")).as("n_fail_stop"),
        sum(fRep.cast("long")).as("n_fail_rep"),
        sum((!(fShort || fAvg || fStop || fRep)).cast("long")).as("n_pass"))
  }

  /** Rolling time-series stats over the daily event counts: 7-day
    * trailing sum and day-over-day delta — all integers. Unpartitioned
    * window, but over the AGGREGATED daily series (one row per day):
    * the single-partition sort is calendar-bounded, never row-count
    * bounded — same argument as Timeliness.gapFill. */
  private def rollingStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = graft.quality.Timeliness.dailyCounts(Tables.events(s, dir), col("ts"))
    val byDay = Window.orderBy(col("day"))
    daily
      .withColumn("n_7d", sum(col("n")).over(byDay.rowsBetween(-6, 0)))
      .withColumn("delta", col("n") - lag(col("n"), 1).over(byDay))
      .orderBy(col("day"))
  }

  /** Count–min sketch frequency estimation over event types — the
    * point-frequency member of the sketch family (HLL = distincts,
    * approx_percentile = quantiles, Bloom = membership, Misra–Gries =
    * top-k; CMS = per-item counts). One aggregation builds the
    * constant-size sketch (partial merges are cell-wise adds — one
    * small blob per partition crosses the shuffle, same 100 TB shape
    * as MisraGries); the sketch itself is the only driver value (a
    * 2-cell scalar row, like the IVF centroids). The exact-vs-estimate
    * comparison is DISTRIBUTED: the serialized sketch ships as a
    * binary literal and the codegen'd `graft_cms_estimate` kernel
    * probes it executor-side next to each exact group count — at n
    * distinct keys the comparison stays an n-row distributed frame
    * instead of an n-row driver collect (the generic shape's
    * scale-killer, fixed round 8). Estimates are hash-dependent, so
    * the output carries the CMS GUARANTEE bits instead of raw
    * estimates: est >= exact always, and est <= exact + ⌈eps·N⌉ with
    * confidence 0.99 — deterministic for a fixed seed, so the bits are
    * stable across runs and the oracle replays them as constants over
    * the exact census. */
  private def countMinCensus(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val eps = 0.001
    val agg = events.agg(
      count_min_sketch(col("event_type"), lit(eps), lit(0.99), lit(42)).as("cms"),
      count(col("event_type")).as("total")).head()
    val bound = math.ceil(eps * agg.getLong(1)).toLong
    val est = call_function("graft_cms_estimate",
      col("event_type"), lit(agg.getAs[Array[Byte]](0)))
    events.where(col("event_type").isNotNull)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        (est >= col("n")).cast("long").as("est_ge_exact"),
        (est <= col("n") + lit(bound)).cast("long").as("est_within_eps"))
      .orderBy(col("event_type"))
  }

  /** Token-BUDGET corpus split: docs are assigned to 'train' in
    * doc_id order until the running token total reaches 80% of the
    * corpus, the rest to 'val' — splitting by token mass, not doc
    * count, which is how real pretraining corpora are sliced (doc
    * length varies by orders of magnitude; a doc-count split skews
    * the actual token budget). The running total is the distributed
    * PrefixSum; the 80% cut is one driver scalar from a 1-row agg.
    * Contrast with x_split_assign's hash split: that one is random
    * and per-row; this one is ordered and mass-exact. */
  private def tokenBudgetSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.wsTokenCount(col("text")).as("n_tok"))
    // Prefix-sum FIRST: the corpus total is max(cum) over the staged
    // (checkpointed) frame — one scalar action over cached blocks, no
    // second tokenization pass over the raw text.
    val withCum = graft.operators.PrefixSum.runningTotal(docs, Seq("doc_id"), "n_tok")
    val total = withCum.agg(coalesce(max(col("cum")), lit(0L))).head().getLong(0)
    val cut = (total * 8L) / 10L
    withCum
      .withColumn("split", when(col("cum") <= cut, "train").otherwise("val"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("split"))
  }

  /** Shannon entropy (bits) of the categorical columns — the
    * information-theoretic face of the consistency frequency tables
    * (a collapsed-entropy column signals upstream data loss the raw
    * counts hide). Float determinism: entropy is a SUM of per-category
    * terms, and float addition is order-sensitive, so the per-category
    * counts are collected into a SORTED array and folded sequentially
    * — the same deterministic-fold technique as the embedding kernels;
    * the oracle replays list_sort + list_reduce in the identical
    * order. The collected array is one element per CATEGORY (bounded
    * by the domain, not the data), never per row. */
  private def entropyProfile(s: SparkSession, dir: String): DataFrame = {
    def ent(df: DataFrame, colName: String, label: String): DataFrame =
      df.where(col(colName).isNotNull)
        .groupBy(col(colName)).agg(count(lit(1)).as("n"))
        .agg(sort_array(collect_list(col("n"))).as("ns"),
          sum(col("n")).as("total"), count(lit(1)).as("n_categories"))
        .select(lit(label).as("col_name"), col("n_categories"),
          aggregate(
            transform(col("ns"), n => {
              val p = n.cast("double") / col("total").cast("double")
              -p * log2(p)
            }),
            lit(0.0), (acc, x) => acc + x).as("entropy_bits"))
    ent(Tables.events(s, dir), "event_type", "events.event_type")
      .unionByName(ent(Tables.documents(s, dir), "lang", "documents.lang"))
      .orderBy(col("col_name"))
  }

  /** Exact word-set Jaccard for adjacent doc pairs (id, id+1) — the
    * oracle-checkable anchor for the n-gram-Jaccard machinery. */
  private def jaccardAdjacent(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("t"))
    val a = tok.select(col("doc_id").as("id_a"), col("t").as("t_a"))
    val b = tok.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"), col("t").as("t_b"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("t_a"), col("t_b"))).cast("long").as("inter"),
        size(array_union(col("t_a"), col("t_b"))).cast("long").as("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .orderBy(col("id_a"))
  }

  /** MinHash+LSH near-dup gate (1 row, always non-empty). The
    * candidate/confirmed pair SETS depend on engine-internal xxhash64,
    * but they are bounded both ways by hash-independent truth, and the
    * gate emits exactly those bounds over the REAL pipeline output:
    *
    *   - n_true_pairs / n_exact_pairs: the exact inverted-index
    *     Jaccard operator (Dedup.exactJaccardPairs) at the verify
    *     threshold and at J = 1 — value-checked against the oracle's
    *     SQL replay of the same shingle/Jaccard arithmetic;
    *   - subset_ok: every LSH-confirmed pair is an exact-Jaccard pair
    *     (verification computes the identical integer ratio, so the
    *     anti-join must be empty);
    *   - ge_exact_ok: every identical-shingle-set pair (J = 1) is
    *     confirmed — equal sets give equal signatures, so all 16 bands
    *     collide and verification keeps them. (A J = 1 group larger
    *     than maxBucketSize would be dropped by the hot-bucket cap —
    *     fixture-dependent in the same sense as annRecallFloor.)
    */
  private def minhashSummary(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val params = Dedup.MinHashParams()
    // One candidate computation feeds both counters (the LSH pipeline
    // hashes every doc — never run it twice for one report).
    val pairs = Dedup.candidatePairs(docs, "doc_id", "text", params)
      .pipe(graft.ext.Checkpoints.stage)
    val confirmed = Dedup.verifyPairs(docs, pairs, "doc_id", "text", params, 0.5)
      .select(col("id_a"), col("id_b"))
      .pipe(graft.ext.Checkpoints.stage)
    val truth = Dedup.exactJaccardPairs(docs, "doc_id", "text",
        params.shingleSize, 0.5)
      .pipe(graft.ext.Checkpoints.stage)
    val nTrue = truth.agg(count(lit(1)).as("n_true_pairs"),
      coalesce(sum((col("jaccard") >= 1.0).cast("long")), lit(0L))
        .as("n_exact_pairs"))
    val nConf = confirmed.agg(count(lit(1)).as("__conf"))
    val viol = confirmed
      .join(truth.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("__viol"))
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(nTrue).crossJoin(nConf).crossJoin(viol)
      .select(col("n_docs"), col("n_true_pairs"), col("n_exact_pairs"),
        (col("__viol") === 0).cast("long").as("subset_ok"),
        (col("__conf") >= col("n_exact_pairs")).cast("long").as("ge_exact_ok"))
  }

  /** x_incremental_dedup: the INCREMENTAL dedup entry point
    * (DedupIndex), gated against full recompute. Split: docs with
    * doc_id % 5 == 4 are the "new shard", the rest the already-indexed
    * corpus. The query (a) builds the persisted band index over the
    * old corpus, (b) probes the new shard against it —
    * DedupIndex.probeNewBatch, which never re-shingles the indexed
    * docs — and (c) checks the union-then-dedup equivalence: probe
    * candidates must EQUAL the full-corpus Dedup.candidatePairs
    * restricted to pairs touching a new id (both-direction anti-joins,
    * hard 0). Verified pairs (exact Jaccard >= 0.5 over candidates)
    * are gated against the SQL-replayable exact truth: subset always,
    * and >= the J=1.0 pair count (byte-identical docs share every band
    * hash, so LSH can never miss them). Counts in the output are the
    * DuckDB-replayable exact ones; LSH-dependent sets enter only via
    * the equivalence bits. */
  private def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val params = Dedup.MinHashParams()
    val docs = Tables.documents(s, dir)
    val isNewId = (c: org.apache.spark.sql.Column) => pmod(c, lit(5)) === 4
    val oldDocs = docs.where(!isNewId(col("doc_id")))
    val newDocs = docs.where(isNewId(col("doc_id")))
    val table = "graft_dedup_band_index"
    DedupIndex.build(oldDocs, "doc_id", "text", table, params)
    val inc = DedupIndex.probeNewBatch(s, table, newDocs, "doc_id", "text", params)
      .pipe(graft.ext.Checkpoints.stage)
    // Full-recompute twin over old ∪ new, cut to new-touching pairs
    // (the split is arithmetic on the id, so the cut is a cheap filter).
    val fullNew = Dedup.candidatePairs(docs, "doc_id", "text", params)
      .where(isNewId(col("id_a")) || isNewId(col("id_b")))
      .pipe(graft.ext.Checkpoints.stage)
    val missing = fullNew.join(inc, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("__missing"))
    val extra = inc.join(fullNew, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("__extra"))
    val verified = Dedup.verifyPairs(docs, inc, "doc_id", "text", params, 0.5)
      .pipe(graft.ext.Checkpoints.stage)
    val truth = Dedup.exactJaccardPairs(docs, "doc_id", "text",
        params.shingleSize, 0.5)
      .where(isNewId(col("id_a")) || isNewId(col("id_b")))
      .pipe(graft.ext.Checkpoints.stage)
    val nTruth = truth.agg(count(lit(1)).as("n_true_new_pairs"),
      coalesce(sum((col("jaccard") >= 1.0).cast("long")), lit(0L))
        .as("n_exact_new_pairs"))
    val nConf = verified.agg(count(lit(1)).as("__conf"))
    val viol = verified
      .join(truth.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("__viol"))
    newDocs.agg(count(lit(1)).as("n_new_docs"))
      .crossJoin(nTruth).crossJoin(nConf).crossJoin(viol)
      .crossJoin(missing).crossJoin(extra)
      .select(col("n_new_docs"), col("n_true_new_pairs"), col("n_exact_new_pairs"),
        (col("__missing") === 0 && col("__extra") === 0).cast("long")
          .as("same_as_batch_ok"),
        (col("__viol") === 0).cast("long").as("subset_ok"),
        (col("__conf") >= col("n_exact_new_pairs")).cast("long").as("ge_exact_ok"))
  }

  /** Brute-force top-10 cosine against the vec_id=0 embedding. */
  private def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    Similarity.bruteForceTopK(e.where(col("vec_id") =!= 0), "vec_id", "embedding", q, 10)
  }

  /** Top-k SHAPE gate over a (vec_id, cos_sim) result whose MEMBERSHIP
    * is hash-dependent (ANN probes): exactly k rows, k distinct ids,
    * every id drawn from the corpus, every score a plausible cosine.
    * Evaluated over the real top-k output, so a broken probe (empty
    * bucket, duplicated id, id invented by a bad join) fails the
    * driver compare even though the ID LIST itself has no portable
    * oracle. k rows is fixture-dependent in the same sense as
    * annRecallFloor: the probed set must hold ≥ k vectors (it is
    * 15–30× k on the driver fixtures). Result-quality (not shape) is
    * gated separately by the recall-floor bits. */
  private def topKShape(topk: DataFrame, corpus: DataFrame, idCol: String): DataFrame =
    topk.join(corpus.select(col(idCol).as("vec_id"), lit(1L).as("__in")),
        Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("vec_id")).as("n_distinct_ids"),
        coalesce(sum(col("__in")), lit(0L)).as("n_in_corpus"),
        (coalesce(min(col("cos_sim")), lit(0.0)) >= -1.000001 &&
          coalesce(max(col("cos_sim")), lit(0.0)) <= 1.000001)
          .cast("long").as("cos_bounds_ok"))

  /** LSH-bucketed ANN top-10 for the same query, emitted through the
    * shape gate (per-value recall vs brute force is measured in
    * SimilaritySpec and gated by x_ann_recall). */
  private def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 0)
    // 4 hyperplane bits → 16 buckets: at 500–50k vectors that keeps a
    // bucket big enough for a meaningful top-10 (recall measured in tests).
    topKShape(
      Similarity.annTopK(corpus, "vec_id", "embedding", q, 10, bits = 4),
      corpus, "vec_id")
  }

  /** Cosine of adjacent embedding pairs — deterministic double fold on
    * both sides, the oracle-checkable anchor for vector math. */
  private def cosineAdjacent(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
      col("embedding").as("v_b"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineIn(s)(col("v_a"), col("v_b")).as("cos_sim"))
      .orderBy(col("id_a"))
  }

  // ----------------------------------------------------------------- oracle

  // Shared CTE for the cosine-pair oracles: all pairs (a < b) with the
  // identical fold-order cosine the kernels compute (see x_quantize_dot
  // for the fold-equivalence precedent). Quadratic — gate scale only.
  private val cosPairsCte =
    """e AS (SELECT vec_id, embedding,
      |   sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      | p AS (SELECT
      |   list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm) AS cos_sim
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
      | ident AS (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS n
      |  FROM (SELECT COUNT(*) AS c FROM embeddings GROUP BY embedding) g)""".stripMargin

  val oracle: Map[String, String] = Map(
    // --- invariant oracles over hash-dependent pipelines ---
    // LSH bucketing: every vector lands in exactly one bucket in
    // [0, 2^8); the per-bucket counts must sum back to the corpus.
    "x_ann_lsh_buckets" ->
      """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS total_vecs,
        | CAST(1 AS BIGINT) AS bounds_ok, CAST(1 AS BIGINT) AS n_buckets_ok""".stripMargin.replaceAll("\n", " "),
    // Top-k shape gates (see topKShape): exactly k rows, k distinct
    // corpus ids, cosine-range scores — constants for the fixed k=10.
    "x_ann_topk" ->
      """SELECT CAST(10 AS BIGINT) AS n_rows, CAST(10 AS BIGINT) AS n_distinct_ids,
        | CAST(10 AS BIGINT) AS n_in_corpus, CAST(1 AS BIGINT) AS cos_bounds_ok""".stripMargin.replaceAll("\n", " "),
    "x_ivf_topk" ->
      """SELECT CAST(10 AS BIGINT) AS n_rows, CAST(10 AS BIGINT) AS n_distinct_ids,
        | CAST(10 AS BIGINT) AS n_in_corpus, CAST(1 AS BIGINT) AS cos_bounds_ok""".stripMargin.replaceAll("\n", " "),
    // SimHash: a pure function of text — every group of byte-identical
    // docs must share one hash value (zero purity violations); the
    // group/doc census is value-checked.
    "x_simhash" ->
      """SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_text_groups,
        | CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(0 AS BIGINT) AS n_purity_violations
        | FROM documents WHERE text IS NOT NULL""".stripMargin.replaceAll("\n", " "),
    // MinHash near-dup gate: the truth side (exact inverted-index
    // Jaccard at the verify threshold and at J = 1) is replayed with
    // the same word-3-gram shingles and integer Jaccard ratio; the
    // LSH-confirmed set is bounded by it (subset / ≥-exact bits).
    "x_minhash_neardup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL),
        | sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |     generate_series(1, CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 0 END),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle FROM tok),
        | ns AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
        | pr AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
        |   FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        | j AS (SELECT CAST(inter AS DOUBLE) / (na.nsh + nb.nsh - inter) AS jac
        |   FROM pr JOIN ns na ON na.doc_id = pr.ia JOIN ns nb ON nb.doc_id = pr.ib)
        | SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j WHERE jac >= 0.5) AS n_true_pairs,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j WHERE jac >= 1.0) AS n_exact_pairs,
        |  CAST(1 AS BIGINT) AS subset_ok, CAST(1 AS BIGINT) AS ge_exact_ok""".stripMargin.replaceAll("\n", " "),
    // Incremental twin: same exact-Jaccard truth, restricted to pairs
    // touching the "new shard" (doc_id % 5 = 4). The incremental-vs-
    // batch candidate equality enters via the same_as_batch_ok bit
    // (computed in-engine over the two LSH candidate sets).
    "x_incremental_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL),
        | sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |     generate_series(1, CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 0 END),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle FROM tok),
        | ns AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
        | pr AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
        |   FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        | j AS (SELECT ia, ib, CAST(inter AS DOUBLE) / (na.nsh + nb.nsh - inter) AS jac
        |   FROM pr JOIN ns na ON na.doc_id = pr.ia JOIN ns nb ON nb.doc_id = pr.ib
        |   WHERE ia % 5 = 4 OR ib % 5 = 4)
        | SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 5 = 4) AS n_new_docs,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j WHERE jac >= 0.5) AS n_true_new_pairs,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j WHERE jac >= 1.0) AS n_exact_new_pairs,
        |  CAST(1 AS BIGINT) AS same_as_batch_ok,
        |  CAST(1 AS BIGINT) AS subset_ok, CAST(1 AS BIGINT) AS ge_exact_ok""".stripMargin.replaceAll("\n", " "),
    // Embedding near-dup / approx-sim-join gates: truth is the
    // brute-force cosine pair count at the threshold (identical
    // fold-order arithmetic), identical-vector pairs the floor.
    "x_embed_neardup" ->
      (s"""WITH $cosPairsCte
        | SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vecs,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p WHERE cos_sim >= 0.9) AS n_true_pairs,
        |  (SELECT n FROM ident) AS n_identical_pairs,
        |  CAST(1 AS BIGINT) AS subset_ok, CAST(1 AS BIGINT) AS ge_identical_ok""".stripMargin.replaceAll("\n", " ")),
    "x_approx_sim_join" ->
      (s"""WITH $cosPairsCte
        | SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p WHERE cos_sim >= 0.9) AS n_true_pairs,
        |  (SELECT n FROM ident) AS n_identical_pairs,
        |  CAST(1 AS BIGINT) AS le_true_ok, CAST(1 AS BIGINT) AS ge_identical_ok""".stripMargin.replaceAll("\n", " ")),
    // Kernel ≡ higher-order-function: the Spark side counts
    // disagreements across all five kernels; the contract is exactly
    // zero, so the oracle is the constant 0.
    "x_kernel_equiv" -> "SELECT CAST(0 AS BIGINT) AS n_mismatch",
    // Recall floors: the Spark side emits 1 iff |ANN ∩ brute-force|
    // meets the pinned floor (deterministic — see the query Scaladoc);
    // the oracle is the constant 1.
    "x_ann_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "x_ivf_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    // Constant-bit contracts (see each query's Scaladoc): dedup is
    // idempotent, the two decode paths agree row-for-row, and bounded
    // stream sessionization equals its batch twin. These queries RUN
    // the full pipelines they gate — the bit is derived from the real
    // outputs, so the driver's DuckDB compare now covers what used to
    // be rows-only dumps.
    "x_neardup_dedup" -> "SELECT CAST(1 AS BIGINT) AS idempotent_ok",
    // Exact distinct + row count are value-checked; the HLL estimate
    // itself is implementation-specific and enters only via the bit.
    "x_approx_distinct" ->
      """SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
        | CAST(COUNT(*) AS BIGINT) AS n, CAST(1 AS BIGINT) AS approx_ok
        | FROM documents""".stripMargin.replaceAll("\n", " "),
    "x_multimodal_decode" -> "SELECT CAST(0 AS BIGINT) AS n_mismatch",
    "x_stream_sessions" -> "SELECT CAST(1 AS BIGINT) AS stream_parity_ok",
    "x_quantize_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",
    "x_stream_interval_join" -> "SELECT CAST(1 AS BIGINT) AS interval_parity_ok",
    "x_stream_outer_join" -> "SELECT CAST(1 AS BIGINT) AS outer_parity_ok",
    "x_approx_percentile" -> "SELECT CAST(1 AS BIGINT) AS rank_bound_ok",
    // The STREAMING dedup must land on the exact distinct cardinality.
    "x_stream_dedup" ->
      "SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique FROM events",
    // Exact-k sampling replayed in SQL: same hash, same (h, id) order.
    "x_hash_sample" ->
      """SELECT doc_id, ((((doc_id % 1000003 + 1000003) % 1000003) * 2654435761 + 104729) % 1000003) AS h
        | FROM documents ORDER BY h, doc_id LIMIT 100""".stripMargin.replaceAll("\n", " "),
    "x_stratified_sample" ->
      """WITH r AS (SELECT event_type, event_id,
        |   ROW_NUMBER() OVER (PARTITION BY event_type
        |     ORDER BY ((((event_id % 1000003 + 1000003) % 1000003) * 2654435761 + 104729) % 1000003), event_id) AS rn
        |  FROM events)
        | SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_ids
        | FROM r WHERE rn <= 3 GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    // Deterministic mixing replayed in SQL: same id-hash, same
    // per-type percentage routing.
    "x_weighted_mix" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
        | WHERE (((event_id % 1000003 + 1000003) % 1000003) * 2654435761 + 104729) % 100 <
        |   (CASE event_type WHEN 'view' THEN 25 WHEN 'click' THEN 50
        |     WHEN 'error' THEN 10 ELSE 100 END)
        | GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    // Int8 quantization replayed in SQL: same scale, same
    // floor(x*s + 0.5) rounding, same integer dot — IEEE double ops
    // in the same order on both engines, so the compare is exact.
    "x_quantize_dot" ->
      """WITH m AS (SELECT vec_id, embedding,
        |   list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma FROM embeddings),
        | q AS (SELECT vec_id,
        |   CASE WHEN ma = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |        ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / ma) + 0.5) AS BIGINT)) END AS qv
        |  FROM m)
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   list_reduce(list_transform(generate_series(1, len(a.qv)), i -> a.qv[i] * b.qv[i]), (x, y) -> x + y) AS qdot
        | FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 ORDER BY id_a""".stripMargin.replaceAll("\n", " "),
    // Concat-and-chunk packing replayed in SQL: same shard hash, same
    // per-shard cumsum, same chunk-interval arithmetic (512-token
    // capacity, 8 shards — all integers).
    "x_pack_chunks" ->
      """WITH d AS (SELECT doc_id AS id,
        |   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok,
        |   ((((doc_id % 1000003 + 1000003) % 1000003) * 2654435761 + 104729) % 8) AS shard FROM documents),
        | c AS (SELECT shard, id, n_tok,
        |   SUM(n_tok) OVER (PARTITION BY shard ORDER BY id ROWS UNBOUNDED PRECEDING) AS cum_end FROM d),
        | s AS (SELECT shard, id, cum_end, cum_end - n_tok AS cum_before FROM c WHERE n_tok > 0),
        | e AS (SELECT shard, id, cum_before, cum_end,
        |   unnest(generate_series(CAST(floor(cum_before / 512) AS BIGINT), CAST(floor((cum_end - 1) / 512) AS BIGINT))) AS chunk_id
        |  FROM s)
        | SELECT shard, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |   CAST(SUM(LEAST(cum_end, (chunk_id + 1) * 512) - GREATEST(cum_before, chunk_id * 512)) AS BIGINT) AS n_tokens
        | FROM e GROUP BY shard, chunk_id ORDER BY shard, chunk_id""".stripMargin.replaceAll("\n", " "),
    // Decontamination replayed in SQL: word 3-grams, distinct
    // (doc, shingle) pairs, doc_id % 97 routes bench vs train.
    "x_contamination" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        | sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |     generate_series(1, CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 0 END),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle FROM tok),
        | bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
        | train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        | hits AS (SELECT train.doc_id, train.shingle FROM train JOIN bench USING (shingle))
        | SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 97 <> 0) AS n_train_docs,
        |   (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM hits) AS n_contaminated,
        |   (SELECT CAST(COUNT(DISTINCT shingle) AS BIGINT) FROM hits) AS n_shared_shingles""".stripMargin.replaceAll("\n", " "),
    // TF-IDF replayed in SQL: same tf / corpus-df tables, same
    // linear-idf score (IEEE division — bit-identical both engines),
    // same (score DESC, term) argmax.
    "x_tfidf_top" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |   WHERE doc_id < 20 GROUP BY doc_id, term),
        | dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS term_df FROM tok GROUP BY term),
        | sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.term_df,
        |     CAST(tf.tf AS DOUBLE) / CAST(dfq.term_df AS DOUBLE) AS score,
        |     ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |       ORDER BY CAST(tf.tf AS DOUBLE) / CAST(dfq.term_df AS DOUBLE) DESC, tf.term) AS rn
        |   FROM tf JOIN dfq USING (term))
        | SELECT doc_id, term, tf, term_df, score FROM sc WHERE rn = 1 ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // Sliding windows replayed in SQL: every event belongs to the 4
    // epoch-aligned 60-minute windows whose 15-minute-grid start is in
    // (ts - 60min, ts]; start = floor(ts/slide)*slide - k*slide for
    // k in 0..3 enumerates exactly those.
    "x_sliding_window" ->
      """WITH t AS (SELECT epoch_ms(ts) AS ts_ms FROM events),
        | w AS (SELECT ((ts_ms // 900000) - k.k) * 900000 AS start_ms
        |   FROM t, (SELECT unnest(generate_series(0, 3)) AS k) k)
        | SELECT start_ms, CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM w GROUP BY start_ms ORDER BY start_ms""".stripMargin.replaceAll("\n", " "),
    // Length buckets replayed in SQL: same ws token count, integer
    // floor-divide into 64-token buckets.
    "x_length_buckets" ->
      """WITH d AS (SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok
        |   FROM documents)
        | SELECT n_tok // 64 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |   CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |   MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok
        | FROM d GROUP BY bucket ORDER BY bucket""".stripMargin.replaceAll("\n", " "),
    // NTILE over the same unique total order — bucket assignment and
    // remainder distribution are pinned by the standard.
    "x_ntile_buckets" ->
      """WITH t AS (SELECT l_extendedprice,
        |   NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
        |  FROM lineitem)
        | SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(MIN(l_extendedprice) AS DOUBLE) AS lo, CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
        | FROM t GROUP BY bucket ORDER BY bucket""".stripMargin.replaceAll("\n", " "),
    // Quality gate replayed in SQL: same integer cross-multiplied
    // thresholds, same token-mode subquery.
    "x_quality_gate" ->
      """WITH base AS (SELECT doc_id,
        |   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok,
        |   CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_cns,
        |   CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop
        |  FROM documents),
        | rep AS (SELECT doc_id, MAX(c) AS max_tok FROM (
        |   SELECT doc_id, w, COUNT(*) AS c FROM
        |     (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) tw
        |   GROUP BY doc_id, w) tc GROUP BY doc_id),
        | j AS (SELECT * FROM base JOIN rep USING (doc_id))
        | SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |   CAST(SUM(CAST(n_tok < 20 AS BIGINT)) AS BIGINT) AS n_fail_short,
        |   CAST(SUM(CAST(n_cns < 3 * n_tok OR n_cns > 10 * n_tok AS BIGINT)) AS BIGINT) AS n_fail_avg_len,
        |   CAST(SUM(CAST(n_stop * 50 < n_tok AS BIGINT)) AS BIGINT) AS n_fail_stop,
        |   CAST(SUM(CAST(max_tok * 5 >= n_tok AS BIGINT)) AS BIGINT) AS n_fail_rep,
        |   CAST(SUM(CAST(NOT (n_tok < 20 OR n_cns < 3 * n_tok OR n_cns > 10 * n_tok
        |     OR n_stop * 50 < n_tok OR max_tok * 5 >= n_tok) AS BIGINT)) AS BIGINT) AS n_pass
        | FROM j""".stripMargin.replaceAll("\n", " "),
    // Bigram LM table replayed in SQL: same pair explode, same
    // (count DESC, word) argmax, same n >= 20 floor.
    "x_bigram_next" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
        | p AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM tok,
        |   UNNEST(generate_series(1, len(t) - 1)) AS u(i) WHERE len(t) >= 2),
        | c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        | r AS (SELECT w1, w2, n, ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY n DESC, w2) AS rn FROM c)
        | SELECT w1, w2, n FROM r WHERE rn = 1 AND n >= 20 ORDER BY w1""".stripMargin.replaceAll("\n", " "),
    // The streaming upsert sink's final state must equal the batch
    // daily counts — same oracle as q_daily_counts.
    "x_stream_upsert" ->
      "SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY day",
    // Rolling window + lag replayed in SQL — all integer arithmetic.
    "x_rolling_stats" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |   FROM events GROUP BY 1)
        | SELECT day, n,
        |   CAST(SUM(n) OVER (ORDER BY day ROWS 6 PRECEDING) AS BIGINT) AS n_7d,
        |   n - lag(n) OVER (ORDER BY day) AS delta
        | FROM d ORDER BY day""".stripMargin.replaceAll("\n", " "),
    // Sequential fold on both engines: kernel loop and list_reduce
    // both accumulate left-to-right in double.
    "x_embed_norms" ->
      """WITH b AS (SELECT CAST(floor(sqrt(list_reduce(
        |     list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |     (a, v) -> a + v)) * 4) AS BIGINT) AS bucket FROM embeddings)
        | SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
        | FROM b GROUP BY bucket ORDER BY bucket""".stripMargin.replaceAll("\n", " "),
    // MERGE replayed relationally: updates ∪ (base minus updated keys).
    "x_upsert" ->
      """WITH updates AS (SELECT * REPLACE (o_totalprice * 2 AS o_totalprice)
        |   FROM orders WHERE o_orderkey % 3 = 0),
        | base AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
        | merged AS (SELECT * FROM updates UNION ALL
        |   SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates))
        | SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        | FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replaceAll("\n", " "),
    // Gap-fill replayed in SQL: calendar spine, zero-fill counts,
    // IGNORE NULLS LOCF for the gauge.
    "x_gap_fill" ->
      """WITH obs AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n, MAX(value) AS mx
        |   FROM events WHERE event_id % 997 = 0 GROUP BY 1),
        | cal AS (SELECT CAST(unnest(generate_series(
        |     (SELECT MIN(day) FROM obs), (SELECT MAX(day) FROM obs), INTERVAL 1 DAY)) AS DATE) AS day),
        | j AS (SELECT cal.day AS day, obs.n, obs.mx FROM cal LEFT JOIN obs USING (day))
        | SELECT day, COALESCE(n, 0) AS n,
        |   last_value(mx IGNORE NULLS) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS mx_filled
        | FROM j ORDER BY day""".stripMargin.replaceAll("\n", " "),
    // Pearson/OLS from exact decimal sums: the sums are exact on both
    // engines, the final r/slope arithmetic is IEEE double in the
    // same operation order — bit-identical, unlike builtin corr().
    "x_corr_regression" ->
      """WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem)
        | SELECT n,
        |   (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |     (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS pearson_r,
        |   (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
        | FROM s""".stripMargin.replaceAll("\n", " "),
    // Classic DP edit distance — exact integers on both engines.
    "x_edit_distance" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS t FROM documents)
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
        | FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 ORDER BY id_a""".stripMargin.replaceAll("\n", " "),
    // Stream-static enrichment: the oracle is the plain batch join.
    "x_stream_static_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        | FROM events JOIN customer ON user_id = c_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.replaceAll("\n", " "),
    // Bloom pruning is plan-internal: the oracle is the PLAIN join,
    // and the equality is the no-false-negative proof.
    "x_bloom_prune" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        | FROM lineitem JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P') o
        |   ON l_orderkey = o_orderkey""".stripMargin.replaceAll("\n", " "),
    // As-of join vs DuckDB's NATIVE ASOF LEFT JOIN — an independent
    // implementation of the same temporal-join semantics.
    "x_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        | errors AS (SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS err_id
        |   FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        | SELECT c.event_id, c.user_id, e.err_id AS prev_err_id
        | FROM clicks c ASOF LEFT JOIN errors e
        |   ON c.user_id = e.user_id AND c.ts >= e.ts
        | ORDER BY c.event_id""".stripMargin.replaceAll("\n", " "),
    "x_asof_forward" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        | errors AS (SELECT user_id, ts, CAST(MIN(event_id) AS BIGINT) AS err_id
        |   FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        | SELECT c.event_id, c.user_id, e.err_id AS next_err_id
        | FROM clicks c ASOF LEFT JOIN errors e
        |   ON c.user_id = e.user_id AND c.ts <= e.ts
        | ORDER BY c.event_id""".stripMargin.replaceAll("\n", " "),
    "x_range_join" ->
      """WITH o AS (SELECT o_custkey, (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d FROM orders),
        | p AS (SELECT a.o_custkey AS k, a.d AS t_a, b.d AS t_b
        |   FROM o a JOIN o b ON a.o_custkey = b.o_custkey AND b.d > a.d AND b.d - a.d <= 7)
        | SELECT k AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n_close_pairs,
        |   CAST(MIN(t_a) AS BIGINT) AS first_day, CAST(MAX(t_b) AS BIGINT) AS last_day
        | FROM p GROUP BY k ORDER BY o_custkey""".stripMargin.replaceAll("\n", " "),
    "x_vocab_top50" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        | SELECT term, CAST(COUNT(*) AS BIGINT) AS n_total,
        |   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        | FROM tok GROUP BY term ORDER BY n_total DESC, term LIMIT 50""".stripMargin.replaceAll("\n", " "),
    // The MG sketch is plan-internal (it can only over-generate
    // candidates; the confirm pass filters with exact counts), so the
    // oracle is the exact census filtered at the same integer
    // cross-multiplied n*(k+1) > total threshold.
    "x_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        | t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
        | c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token)
        | SELECT token, n FROM c, t WHERE n * 65 > total ORDER BY token""".stripMargin.replaceAll("\n", " "),
    // OOV replayed in SQL: same top-10 vocab (count DESC, token), same
    // anti-membership count, same double division.
    "x_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        | v AS (SELECT token FROM (SELECT token, COUNT(*) AS c FROM tok GROUP BY token
        |   ORDER BY c DESC, token LIMIT 10) t),
        | f AS (SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |   CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM tok LEFT JOIN v ON tok.token = v.token GROUP BY tok.doc_id)
        | SELECT doc_id, n_tok, n_oov,
        |   CAST(n_oov AS DOUBLE) / CAST(n_tok AS DOUBLE) AS oov_frac
        | FROM f ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // Sketch estimates are implementation-internal; the oracle checks
    // the exact cardinalities, the number of daily sketches each
    // rollup merged, and that the merged estimate hit its error bound.
    "x_hll_rollup" ->
      """WITH d AS (SELECT event_type, CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_day_sketches
        |   FROM events GROUP BY event_type),
        | x AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |   FROM events GROUP BY event_type)
        | SELECT d.event_type, d.n_day_sketches, x.n_exact, CAST(1 AS BIGINT) AS approx_ok
        | FROM d JOIN x USING (event_type) ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    // The Morton interleave replayed bit-for-bit — the SQL is
    // GENERATED from the same (bit, dimension) -> position enumeration
    // as the Column form (ZOrder.zValueSql), so they cannot drift.
    "x_zorder" ->
      s"""WITH z AS (SELECT (${graft.io.ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 16)}) AS z,
        |   l_partkey, l_suppkey FROM lineitem)
        | SELECT z >> 16 AS z_bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(MIN(l_partkey) AS BIGINT) AS min_part, CAST(MAX(l_partkey) AS BIGINT) AS max_part,
        |   CAST(MIN(l_suppkey) AS BIGINT) AS min_supp, CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
        | FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin.replaceAll("\n", " "),
    // Sliding-window chunking replayed in SQL: same integer chunk
    // count, same 1-based inclusive token slices.
    "x_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents WHERE text IS NOT NULL),
        | c AS (SELECT doc_id, tok,
        |   CASE WHEN len(tok) <= 64 THEN 1 ELSE 1 + (len(tok) - 64 + 47) // 48 END AS n_chunks FROM t),
        | x AS (SELECT doc_id, i AS chunk_id, tok[i*48 + 1 : i*48 + 64] AS ct
        |   FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i))
        | SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |   CAST(len(ct) AS BIGINT) AS n_chunk_tok, array_to_string(ct, ' ') AS chunk_text
        | FROM x ORDER BY doc_id, chunk_id""".stripMargin.replaceAll("\n", " "),
    // Component labels are the deterministic min-node-id per
    // component, so the oracle can replay them with a recursive-CTE
    // transitive closure (node count per min-reachable-id).
    "x_connected_components" ->
      """WITH RECURSIVE
        | e0 AS (SELECT CAST(n_nationkey + 100 AS BIGINT) AS a, CAST(n_regionkey AS BIGINT) AS b FROM nation
        |   UNION ALL SELECT CAST(c_custkey + 1000 AS BIGINT), CAST(c_nationkey + 100 AS BIGINT) FROM customer),
        | e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        | r AS (SELECT a AS node, b AS reach FROM e
        |   UNION SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        | lab AS (SELECT node, LEAST(MIN(reach), node) AS component FROM r GROUP BY node)
        | SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes, MAX(node) AS max_node
        | FROM lab GROUP BY component ORDER BY component""".stripMargin.replaceAll("\n", " "),
    // Repetition signals replayed in SQL: same n-gram construction
    // (positional list slices), same counts, same double divisions.
    "x_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents WHERE text IS NOT NULL),
        | base AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tok,
        |   CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct FROM t),
        | bg AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] AS g FROM t,
        |   UNNEST(generate_series(1, len(tok) - 1)) AS u(i) WHERE len(tok) >= 2),
        | bgm AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n FROM
        |   (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2) bc GROUP BY doc_id),
        | tg AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS g FROM t,
        |   UNNEST(generate_series(1, len(tok) - 2)) AS u(i) WHERE len(tok) >= 3),
        | tgm AS (SELECT doc_id, CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_trigram_mass
        |   FROM (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2) tc GROUP BY doc_id)
        | SELECT b.doc_id, b.n_tok, b.n_distinct,
        |   CAST(b.n_tok - b.n_distinct AS DOUBLE) / CAST(b.n_tok AS DOUBLE) AS dup_tok_frac,
        |   COALESCE(bgm.top_bigram_n, 0) AS top_bigram_n,
        |   CASE WHEN b.n_tok > 1 THEN CAST(COALESCE(bgm.top_bigram_n, 0) AS DOUBLE) / CAST(b.n_tok - 1 AS DOUBLE) ELSE 0.0 END AS top_bigram_frac,
        |   COALESCE(tgm.dup_trigram_mass, 0) AS dup_trigram_mass
        | FROM base b LEFT JOIN bgm USING (doc_id) LEFT JOIN tgm USING (doc_id)
        | ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // Salting is plan-internal: the oracle is the PLAIN aggregation.
    "x_skewed_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
        | GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    // Salting is plan-internal: the oracle is the PLAIN join.
    "x_salted_join" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replaceAll("\n", " "),
    "x_funnel" ->
      """WITH f AS (SELECT user_id,
        |   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        | SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
        |    AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
        |    AND t_purchase IS NOT NULL AND t_click > t_view
        |    AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        | FROM f""".stripMargin.replaceAll("\n", " "),
    "x_cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        | fd AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
        | SELECT cohort_day,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(DISTINCT CASE WHEN e.day - f.cohort_day = 1 THEN e.user_id END) AS BIGINT) AS n_d1,
        |  CAST(COUNT(DISTINCT CASE WHEN e.day - f.cohort_day >= 7 THEN e.user_id END) AS BIGINT) AS n_d7plus
        | FROM ev e JOIN fd f USING (user_id)
        | GROUP BY cohort_day ORDER BY cohort_day""".stripMargin.replaceAll("\n", " "),
    // Same lag+cumsum SQL twin as x_batch_sessions, with the native
    // operator's end convention (last event + gap, ms).
    "x_session_window" ->
      """WITH t AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        | s AS (SELECT user_id, ts_ms,
        |   CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
        |     OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) > 3600000
        |   THEN 1 ELSE 0 END AS ns FROM t),
        | g AS (SELECT user_id, ts_ms,
        |   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms ROWS UNBOUNDED PRECEDING) AS sid FROM s)
        | SELECT user_id, MIN(ts_ms) AS start_ms, MAX(ts_ms) + 3600000 AS end_ms,
        |   CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM g GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin.replaceAll("\n", " "),
    "x_batch_sessions" ->
      """WITH t AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        | s AS (SELECT user_id, ts_ms,
        |   CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
        |     OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) > 3600000
        |   THEN 1 ELSE 0 END AS ns FROM t),
        | g AS (SELECT user_id, ts_ms,
        |   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms ROWS UNBOUNDED PRECEDING) AS sid FROM s)
        | SELECT user_id, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
        |   CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM g GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin.replaceAll("\n", " "),
    "x_dedup_exact" ->
      "SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct, CAST(COUNT(*) AS BIGINT) AS n FROM documents",
    "x_fingerprint" ->
      "SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp FROM documents ORDER BY doc_id",
    "x_token_count" ->
      """SELECT doc_id,
        | CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_ws,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subword
        | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "x_text_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS n_chars_calc,
        | CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        | CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS n_stopwords,
        | CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS avg_token_len,
        | CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE) / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS stopword_ratio
        | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "x_lang_id" ->
      """SELECT doc_id, score_en, score_es,
        | CASE WHEN score_es > GREATEST(score_en, 0) THEN 'es'
        |      WHEN score_en > 0 THEN 'en' ELSE 'und' END AS lang_pred
        | FROM (SELECT doc_id,
        |   CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS score_en,
        |   CAST(len(list_filter(string_split(text, ' '), w -> w IN ('el', 'la'))) AS BIGINT) AS score_es
        |  FROM documents) t ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "x_jaccard_adjacent" ->
      """WITH tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents)
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS inter,
        |  CAST(len(list_distinct(list_concat(a.t, b.t))) AS BIGINT) AS uni,
        |  CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE) AS jaccard
        | FROM tok a JOIN tok b ON b.doc_id = a.doc_id + 1 ORDER BY id_a""".stripMargin.replaceAll("\n", " "),
    "x_cosine_adjacent" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings)
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)
        |  / (sqrt(list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y))
        |   * sqrt(list_reduce(list_transform(generate_series(1, len(b.embedding)), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y))) AS cos_sim
        | FROM e a JOIN e b ON b.vec_id = a.vec_id + 1 ORDER BY id_a""".stripMargin.replaceAll("\n", " "),
    "x_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        | scored AS (SELECT e.vec_id,
        |  list_reduce(list_transform(generate_series(1, len(e.embedding)), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y)
        |  / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (x, y) -> x + y))
        |   * sqrt(list_reduce(list_transform(generate_series(1, len(q.qv)), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y))) AS cos_sim
        |  FROM embeddings e, q WHERE e.vec_id <> 0)
        | SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin.replaceAll("\n", " "),
    "x_multimodal_meta" ->
      "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, 'text/plain' AS format FROM documents ORDER BY doc_id",
    "x_clean_text" ->
      """SELECT doc_id, CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(
        | text, '<[^>]*>', ' ', 'g'), '&[a-zA-Z#0-9]+;', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS n_clean_chars
        | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "x_pii_flags" ->
      """SELECT CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))) AS BIGINT) AS total_emails,
        | CAST(SUM(len(regexp_extract_all(text, '[0-9]{9,}'))) AS BIGINT) AS total_digit_runs,
        | CAST(SUM(len(regexp_extract_all(text, '\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}'))) AS BIGINT) AS total_phone_like,
        | CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents""".stripMargin.replaceAll("\n", " "),
    // Same replacement chain, same order, global 'g' flag in DuckDB
    // (Spark's regexp_replace is always global).
    "x_pii_redact" ->
      """WITH r AS (SELECT text, regexp_replace(regexp_replace(regexp_replace(text,
        |   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{9,}', '<NUM>', 'g'),
        |   '\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}', '<PHONE>', 'g') AS red
        |  FROM documents)
        | SELECT CAST(COUNT(CASE WHEN text <> red THEN 1 END) AS BIGINT) AS n_redacted_docs,
        |   CAST(SUM(length(text) - length(red)) AS BIGINT) AS chars_delta FROM r""".stripMargin.replaceAll("\n", " "),
    "x_split_assign" ->
      """SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
        | CAST(COUNT(*) AS BIGINT) AS n
        | FROM (SELECT (((((doc_id % 1000003 + 1000003) % 1000003) * 2654435761 + 104729) % 100) + 100) % 100 AS b FROM documents) t
        | GROUP BY 1 ORDER BY split""".stripMargin.replaceAll("\n", " "),
    "x_cosine_pairs_label" ->
      """WITH e0 AS (SELECT vec_id, label, embedding FROM embeddings),
        | ok AS (SELECT label FROM e0 GROUP BY label HAVING COUNT(*) <= 10000),
        | e AS (SELECT e0.* FROM e0 JOIN ok USING (label)),
        | p AS (SELECT a.label,
        |  list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)
        |  / (sqrt(list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y))
        |   * sqrt(list_reduce(list_transform(generate_series(1, len(b.embedding)), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y))) AS cos_sim
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        | SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN cos_sim >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
        |  MAX(cos_sim) AS max_cos
        | FROM p GROUP BY label ORDER BY label""".stripMargin.replaceAll("\n", " "),
    // GROUPING() bit order (first arg = MSB) matches Spark's
    // grouping_id(); both cast to BIGINT.
    "x_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | COALESCE(l_returnflag, '(all)') AS rf, COALESCE(l_linestatus, '(all)') AS ls,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        | ORDER BY gid, rf, ls""".stripMargin.replaceAll("\n", " "),
    "x_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        | FROM events GROUP BY 1 ORDER BY day""".stripMargin.replaceAll("\n", " "),
    "x_topk_group" ->
      """WITH r AS (SELECT o_orderpriority,
        |   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |   o_orderkey, o_totalprice FROM orders)
        | SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        | FROM r WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin.replaceAll("\n", " "),
    // Run-head detection replayed exactly: first row per key OR
    // attr distinct from previous (null-safe both ways).
    "x_scd2" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |   LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        | c AS (SELECT user_id, ts, event_id, event_type FROM s
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        | SELECT user_id, event_id, epoch_ms(ts) AS valid_from_ms,
        |  epoch_ms(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms,
        |  event_type
        | FROM c ORDER BY user_id, valid_from_ms, event_id""".stripMargin.replaceAll("\n", " "),
    "x_table_diff" ->
      """WITH drift AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |   CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |   o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 499 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 631 = 0),
        | j AS (SELECT CASE WHEN d.o_orderkey IS NULL THEN 'only_left'
        |   WHEN o.o_orderkey IS NULL THEN 'only_right'
        |   WHEN (o.o_custkey IS NOT DISTINCT FROM d.o_custkey)
        |    AND (o.o_orderstatus IS NOT DISTINCT FROM d.o_orderstatus)
        |    AND (o.o_totalprice IS NOT DISTINCT FROM d.o_totalprice)
        |    AND (o.o_orderdate IS NOT DISTINCT FROM d.o_orderdate)
        |    AND (o.o_orderpriority IS NOT DISTINCT FROM d.o_orderpriority) THEN 'equal'
        |   ELSE 'differs' END AS status
        |  FROM orders o FULL OUTER JOIN drift d ON o.o_orderkey = d.o_orderkey)
        | SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM j
        | GROUP BY status ORDER BY status""".stripMargin.replaceAll("\n", " "),
    "x_k_anonymity" ->
      """SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups, CAST(SUM(k) AS BIGINT) AS n_rows
        | FROM (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM customer
        |  GROUP BY c_nationkey, c_mktsegment) g
        | GROUP BY k ORDER BY k""".stripMargin.replaceAll("\n", " "),
    "x_memorization" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents WHERE text IS NOT NULL),
        | bg AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] AS g FROM t,
        |  UNNEST(generate_series(1, len(tok) - 1)) AS u(i) WHERE len(tok) >= 2),
        | corpus AS (SELECT g, COUNT(*) AS c FROM bg GROUP BY g),
        | pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |   CAST(SUM(CASE WHEN c >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_memorized
        |  FROM bg JOIN corpus USING (g) GROUP BY doc_id)
        | SELECT d.doc_id, COALESCE(pd.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(pd.n_memorized, 0) AS n_memorized,
        |  CASE WHEN COALESCE(pd.n_bigrams, 0) > 0
        |   THEN CAST(pd.n_memorized AS DOUBLE) / CAST(pd.n_bigrams AS DOUBLE)
        |   ELSE 0.0 END AS memorized_frac
        | FROM documents d LEFT JOIN pd USING (doc_id)
        | ORDER BY d.doc_id""".stripMargin.replaceAll("\n", " "),
    // The running total replays as a window here (the oracle runs at
    // gate scale; the ENGINE path is the distributed PrefixSum).
    "x_compaction_bins" ->
      """WITH f AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS size FROM lineitem GROUP BY 1),
        | c AS (SELECT l_orderkey, size,
        |   SUM(size) OVER (ORDER BY l_orderkey ROWS UNBOUNDED PRECEDING) AS cum FROM f),
        | b AS (SELECT (cum - size) // 64 AS bin, size, l_orderkey FROM c)
        | SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(size) AS BIGINT) AS rows_in_bin,
        |  MIN(l_orderkey) AS first_key, MAX(l_orderkey) AS last_key
        | FROM b GROUP BY bin ORDER BY bin""".stripMargin.replaceAll("\n", " "),
    // Byte slicing replayed as char substring — sound because both
    // sides keep only ASCII rows (strlen = length guard).
    "x_frame_sample" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id < 50 AND text IS NOT NULL AND strlen(text) = length(text)),
        | f AS (SELECT doc_id, i AS frame_idx,
        |   substring(text, CAST(i*32+1 AS BIGINT), CAST(32 AS BIGINT)) AS frame_str
        |  FROM d, UNNEST(generate_series(0, CAST(ceil(strlen(text)/32.0) AS BIGINT) - 1)) AS u(i)
        |  WHERE i % 2 = 0)
        | SELECT doc_id, frame_idx, frame_str, CAST(strlen(frame_str) AS BIGINT) AS n_frame_bytes
        | FROM f ORDER BY doc_id, frame_idx""".stripMargin.replaceAll("\n", " "),
    // k >= vocabulary makes the MG candidate map the exact census
    // (no evictions), so the streaming sketch replays as GROUP BY.
    // NULL filter matches the engine path: the MG aggregate skips null
    // items, while a bare GROUP BY would emit a NULL group (same
    // defensive filter as x_count_min's oracle).
    "x_stream_heavy" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n
        | FROM events WHERE event_type IS NOT NULL
        | GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin.replaceAll("\n", " "),
    "x_cdc_apply" ->
      """WITH chg AS (
        |  SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice, 'U' AS op, 1 AS seq
        |   FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'D', 2 FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_totalprice, 'I', 1 FROM orders WHERE o_orderkey % 11 = 0),
        | allr AS (SELECT o_orderkey, o_totalprice, 'I' AS op, 0 AS seq FROM orders
        |  UNION ALL SELECT * FROM chg),
        | r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM allr)
        | SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        | FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin.replaceAll("\n", " "),
    "x_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        | FROM customer, orders, lineitem
        | WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        | GROUP BY l_orderkey, o_orderdate, o_orderpriority
        | ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin.replaceAll("\n", " "),
    // Same whitespace token-count identity as x_token_count; the
    // running total replays as a window at gate scale.
    "x_token_split" ->
      """WITH d AS (SELECT doc_id,
        |   CAST(strlen(text) - strlen(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok
        |  FROM documents),
        | t AS (SELECT (CAST(SUM(n_tok) AS BIGINT) * 8) // 10 AS cut FROM d),
        | c AS (SELECT doc_id, n_tok,
        |   SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d),
        | sp AS (SELECT doc_id, n_tok,
        |   CASE WHEN cum <= (SELECT cut FROM t) THEN 'train' ELSE 'val' END AS split FROM c)
        | SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        | FROM sp GROUP BY split ORDER BY split""".stripMargin.replaceAll("\n", " "),
    "x_entropy" ->
      """WITH f1 AS (SELECT event_type AS v, CAST(COUNT(*) AS BIGINT) AS n FROM events
        |   WHERE event_type IS NOT NULL GROUP BY 1),
        | a1 AS (SELECT list_sort(list(n)) AS ns, CAST(SUM(n) AS DOUBLE) AS total,
        |   CAST(COUNT(*) AS BIGINT) AS ncat FROM f1),
        | f2 AS (SELECT lang AS v, CAST(COUNT(*) AS BIGINT) AS n FROM documents
        |   WHERE lang IS NOT NULL GROUP BY 1),
        | a2 AS (SELECT list_sort(list(n)) AS ns, CAST(SUM(n) AS DOUBLE) AS total,
        |   CAST(COUNT(*) AS BIGINT) AS ncat FROM f2),
        | u AS (
        |  SELECT 'events.event_type' AS col_name, ncat AS n_categories,
        |   list_reduce(list_transform(ns, n -> -(CAST(n AS DOUBLE)/total) * log2(CAST(n AS DOUBLE)/total)),
        |    (x, y) -> x + y) AS entropy_bits FROM a1
        |  UNION ALL
        |  SELECT 'documents.lang', ncat,
        |   list_reduce(list_transform(ns, n -> -(CAST(n AS DOUBLE)/total) * log2(CAST(n AS DOUBLE)/total)),
        |    (x, y) -> x + y) FROM a2)
        | SELECT col_name, n_categories, entropy_bits FROM u ORDER BY col_name""".stripMargin.replaceAll("\n", " "),
    // CMS estimates are sketch-internal (hash-dependent); the output
    // is the exact census + the sketch's guarantee bits, which are
    // deterministic for the fixed seed — the oracle replays them as
    // constants (same pattern as the LSH/ANN invariant oracles).
    "x_count_min" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(1 AS BIGINT) AS est_ge_exact, CAST(1 AS BIGINT) AS est_within_eps
        | FROM events WHERE event_type IS NOT NULL
        | GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    "x_union_evolve" ->
      """WITH u AS (
        |  SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, NULL AS lang FROM documents WHERE doc_id % 2 = 1)
        | SELECT COALESCE(lang, '(missing)') AS lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        | FROM u GROUP BY 1 ORDER BY lang""".stripMargin.replaceAll("\n", " ")
  )
}
