package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents and chunk
  * the token stream into fixed-capacity context windows
  * ("concat-and-chunk", the standard pretraining packing scheme —
  * documents may straddle a chunk boundary; every chunk except a
  * shard's last holds exactly `capacity` tokens, so no padding waste).
  *
  * Scale shape: a single global token stream would serialize on one
  * ordered window, so the corpus is first routed into `shards`
  * deterministic hash shards (same multiplicative hash as
  * [[TextAnalysis.splitBucket]] — stable under repartitioning and
  * reruns); the running-token cumsum is a per-shard window (one
  * shuffle on the shard key, shard count scales with the cluster).
  * Chunk assignment is pure integer arithmetic on the cumsum —
  * replayed exactly by the DuckDB oracle (x_pack_chunks).
  */
object Packing {

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * arXiv:2207.14255 — "FIM"): rewrite a hash-chosen `fimPct`% of
    * documents into the PSM order
    * `<PRE>prefix<SUF>suffix<MID>middle`, teaching an autoregressive
    * model to infill. The two split offsets 0 ≤ a ≤ b ≤ len are
    * derived from the SAME canonical id-hash as every Mixing/Packing
    * decision (two draws: hash(id) and hash(id + 7919)), so the
    * transform is deterministic per row, stable under repartitioning
    * and reruns, and an independent engine replays it — offsets,
    * substrings, sentinel concat — value-exact in SQL. Untouched rows
    * pass through with `fim_applied` = 0; every row keeps its
    * character mass (the three pieces partition the text), so
    * downstream token budgets are unchanged. Per-row codegen
    * arithmetic, shuffle-free at any scale.
    *
    * Output = input schema + `fim_applied` (0/1) + `fim_text` (the
    * PSM string, or the original text where not applied / null). */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   fimPct: Int = 50): DataFrame = {
    require(fimPct >= 0 && fimPct <= 100, s"fimPct out of range: $fimPct")
    val len = length(col(textCol))
    // Two independent-ish draws from the canonical hash: offsets are
    // uniform-ish over the valid ranges, and all-integer on both
    // engines. a ∈ [0, len], b ∈ [a, len].
    val h1 = TextAnalysis.idHashBucket(col(idCol), 1000003L)
    val h2 = TextAnalysis.idHashBucket(col(idCol) + lit(7919L), 1000003L)
    val applied = col(textCol).isNotNull &&
      TextAnalysis.splitBucket(col(idCol)) < fimPct
    df.withColumn("__fim_a", pmod(h1, len.cast("long") + 1L))
      .withColumn("__fim_b",
        col("__fim_a") + pmod(h2, len.cast("long") - col("__fim_a") + 1L))
      .withColumn("fim_applied", when(applied, 1L).otherwise(0L))
      .withColumn("fim_text",
        when(applied,
          concat(lit("<PRE>"),
            expr(s"substring($textCol, 1, __fim_a)"),
            lit("<SUF>"),
            expr(s"substring($textCol, __fim_b + 1, length($textCol) - __fim_b)"),
            lit("<MID>"),
            expr(s"substring($textCol, __fim_a + 1, __fim_b - __fim_a)")))
          .otherwise(col(textCol)))
      .drop("__fim_a", "__fim_b")
  }

  /** Deterministic shard in [0, shards) from a numeric id — delegates
    * to the one canonical id-hash (TextAnalysis.idHashBucket; see its
    * Scaladoc for the overflow-safety argument). */
  def shardOf(id: org.apache.spark.sql.Column, shards: Int): org.apache.spark.sql.Column =
    TextAnalysis.idHashBucket(id, shards.toLong)

  /** Per-document chunk spans: each doc (with `nTokens` tokens,
    * ordered by id within its shard) is exploded into the chunks
    * [chunk*capacity, (chunk+1)*capacity) its token range overlaps,
    * with the token count it contributes to each. Output columns:
    * shard, chunk_id, id, n_in_chunk.
    */
  def chunkSpans(docs: DataFrame, idCol: String, nTokens: org.apache.spark.sql.Column,
                 capacity: Long, shards: Int): DataFrame = {
    val byShard = Window.partitionBy(col("shard")).orderBy(col("id"))
    docs
      .select(col(idCol).as("id"), nTokens.as("n_tok"))
      .withColumn("shard", shardOf(col("id"), shards))
      .withColumn("cum_end", sum(col("n_tok")).over(
        byShard.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_before", col("cum_end") - col("n_tok"))
      // Empty docs (0 tokens) occupy no chunk — sequence() would flip
      // to a descending range when end < start, so guard explicitly.
      .where(col("n_tok") > 0)
      .withColumn("chunk_id", explode(sequence(
        floor(col("cum_before") / capacity),
        floor((col("cum_end") - 1) / capacity))))
      .withColumn("n_in_chunk",
        least(col("cum_end"), (col("chunk_id") + 1) * capacity)
          - greatest(col("cum_before"), col("chunk_id") * capacity))
      .select(col("shard"), col("chunk_id"), col("id"), col("n_in_chunk"))
  }

  /** Per-chunk document boundaries — the attention-mask metadata a
    * training loader needs next to the packed tokens: for every doc
    * span inside a chunk, its start/end token offsets WITHIN that
    * chunk ([off_start, off_end), 0-based; a cross-boundary doc
    * yields one row per chunk it straddles). Derived from
    * [[chunkSpans]] with one more per-(shard, chunk) window cumsum —
    * chunks hold ≤ capacity tokens, so the window is bounded, and the
    * (shard, chunk_id) clustering is a refinement of the shard
    * partitioning the spans already carry, so the extra window adds a
    * per-partition sort but no new exchange. Offsets are pure integer
    * arithmetic, replayed exactly by the x_pack_boundaries oracle.
    * Invariants (PackingSpec): spans within a chunk tile it exactly —
    * first starts at 0, consecutive spans abut, last ends at the
    * chunk's fill. */
  def chunkBoundaries(docs: DataFrame, idCol: String, nTokens: org.apache.spark.sql.Column,
                      capacity: Long, shards: Int): DataFrame = {
    val inChunk = Window.partitionBy(col("shard"), col("chunk_id")).orderBy(col("id"))
    chunkSpans(docs, idCol, nTokens, capacity, shards)
      .withColumn("off_end", sum(col("n_in_chunk")).over(
        inChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("shard"), col("chunk_id"), col("id"),
        (col("off_end") - col("n_in_chunk")).as("off_start"), col("off_end"))
  }

  /** Packed-chunk summary: one row per (shard, chunk) with the number
    * of contributing documents and its token fill. Every chunk except
    * a shard's last is exactly full — the invariant PackingSpec pins
    * and the oracle re-derives. */
  def packSummary(docs: DataFrame, idCol: String, nTokens: org.apache.spark.sql.Column,
                  capacity: Long, shards: Int): DataFrame =
    chunkSpans(docs, idCol, nTokens, capacity, shards)
      .groupBy(col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_in_chunk")).as("n_tokens"))
      .orderBy(col("shard"), col("chunk_id"))

  /** Sliding-window chunking with overlap — the RAG/embedding-indexing
    * twin of concat-and-chunk: each document is split independently
    * into windows of `window` tokens advancing by `stride`
    * (stride < window ⇒ adjacent chunks share `window - stride`
    * tokens of context). A document with n tokens yields
    * `1 + ceil((n - window) / stride)` chunks (one if n <= window),
    * so every token lands in at least one chunk and the final chunk
    * is the only short one.
    *
    * Scale shape: chunk spans are built per row inside codegen
    * (sequence → transform → slice on the token array — no window
    * function, no shuffle; documents chunk embarrassingly parallel)
    * and only then exploded. All-integer chunk arithmetic, replayed
    * exactly by the DuckDB oracle (x_chunk_overlap).
    *
    * Output: doc_id, chunk_id, n_chunk_tok, chunk_text — null-text
    * documents yield no chunks (explode of a null span array).
    */
  def chunkWithOverlap(docs: DataFrame, idCol: String, textCol: String,
                       window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val t = split(col(textCol), " ")
    val n = size(t).cast("long")
    // Integer ceil((n - window)/stride) via (n - window + stride - 1) div
    // stride; both engines' integer division truncates toward zero and
    // the CASE guard keeps the argument non-negative.
    val nChunks = when(n <= window, lit(1L))
      .otherwise(lit(1L) + floor((n - window + (stride - 1)).cast("double") / stride).cast("long"))
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), t.as("tok"), nChunks.as("n_chunks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("n_chunks") - 1),
          i => slice(col("tok"), (i * stride + 1).cast("int"), lit(window))))
          .as(Seq("chunk_id", "chunk_tok")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk_tok")).cast("long").as("n_chunk_tok"),
        array_join(col("chunk_tok"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Length-bucketed batching census: route each document into a
    * fixed-width token-count bucket (the alternative to concat-and-
    * chunk for SFT-style training, where sequences are padded — equal-
    * length batches minimize the padding waste). One shuffle-free
    * projection plus one groupBy; all-integer output so the oracle
    * replays it with `//`. Columns: bucket (floor(n_tok/width)),
    * n_docs, n_tokens, min_tok, max_tok. */
  def lengthBuckets(docs: DataFrame, nTokens: org.apache.spark.sql.Column,
                    width: Long): DataFrame =
    docs.select(nTokens.as("n_tok"))
      // Integer floor-divide via subtract-the-remainder: `/` on longs
      // is double division in Spark, and a double round-trip loses
      // exactness past 2^53.
      .withColumn("bucket", (col("n_tok") - pmod(col("n_tok"), lit(width))) / width)
      .select(col("bucket").cast("long"), col("n_tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
      .orderBy(col("bucket"))

  /** Padding-waste census of fixed-size batch assembly — the number
    * [[lengthBuckets]]' doc points at, computed exactly for both
    * dataloader strategies so the win of length bucketing is a
    * queryable fact, not folklore: ARRIVAL takes `batchSize`
    * consecutive docs in id order (the naive dataloader); SORTED takes
    * them in (length, id) order (the standard length-bucketing trick).
    * Every batch is padded to its longest member, so per batch the
    * waste is Σ(max_len − len).
    *
    * Scale shape: the global positions come from
    * [[graft.operators.PrefixSum.runningTotal]]'s range-partition
    * rank — NO single-task global window — then one keyed groupBy per
    * strategy; two corpus-linear passes total. All-integer until the
    * final fraction, so an independent engine replays both strategies
    * with row_number()+`//` exactly (x_length_bucketing).
    *
    * Output, one row per strategy: strategy, n_batches, padded_tokens
    * (Σ batch width × batch rows), total_padding (padded − Σ len),
    * padding_frac (double). */
  def paddingCensus(docs: DataFrame, idCol: String,
                    nTokens: org.apache.spark.sql.Column,
                    batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val base = docs.select(col(idCol).as("__id"), nTokens.as("__len"))
    def strategy(name: String, orderCols: Seq[String]): DataFrame =
      graft.operators.PrefixSum.runningTotal(
          base.withColumn("__one", lit(1L)), orderCols, "__one",
          outCol = "__pos")
        .withColumn("__batch", expr(s"(__pos - 1) DIV $batchSize"))
        .groupBy(col("__batch"))
        .agg(max(col("__len")).as("__w"), count(lit(1)).as("__n"),
          sum(col("__len")).as("__t"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("__w") * col("__n")).as("padded_tokens"),
          (sum(col("__w") * col("__n")) - sum(col("__t"))).as("total_padding"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("padded_tokens"), col("total_padding"),
          (col("total_padding").cast("double") / col("padded_tokens"))
            .as("padding_frac"))
    strategy("arrival", Seq("__id"))
      .unionByName(strategy("sorted", Seq("__len", "__id")))
      .orderBy(col("strategy"))
  }
}
