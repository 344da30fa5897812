package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Scale-evidence harness: runs the dedup / similarity pipelines on
  * self-generated corpora at multiples of the sf0.1 fixture size
  * (5 000 docs / 2 000 embeddings = 1×) and reports wall time plus the
  * counts that PROVE the sub-quadratic claims — candidate pairs,
  * confirmed pairs, and the Σ block·(block−1)/2 "pair mass" that
  * bounds each blocked pipeline's work.
  *
  * What linear-ish scaling looks like here: at 10× / 50× the corpus,
  * an all-pairs design would do 100× / 2500× the work; the LSH-blocked
  * pipelines must instead track the planted-duplicate mass, which
  * grows ∝ n (clusters are a fixed FRACTION of the corpus).
  *
  * Corpus design (all deterministic — xxhash64 of ids, no RNG state):
  *   - documents: 50 tokens from a 40-word vocab keyed on a base id;
  *     the first 10% of ids form clusters of 4 sharing a base text,
  *     variants 1–3 append a variant token (shingle Jaccard ≈ 0.96,
  *     well above the 0.5 verify threshold); the other 90% are unique.
  *     Planted near-dup pairs therefore = n/40 clusters × 6 = 0.15·n.
  *   - embeddings: dim-64 uniform[−1,1] from the base id; the first
  *     10% of ids form pairs whose odd member is the even one plus a
  *     ±0.01 perturbation (cosine ≈ 0.9997, above the 0.9 threshold);
  *     labels are 64 uniform blocks.
  *
  * Usage: runMain graft.ScaleBench [outBase] [scales]
  *   outBase  defaults to /tmp/graft_scale
  *   scales   comma list of multipliers, default "1,10,50"
  * Prints one JSON line per scale point (and a gen line per corpus).
  */
object ScaleBench {

  private val vocab = Seq(
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "cache", "disk", "node", "task", "stage",
    "plan", "code", "byte", "page", "file", "block", "read", "write")

  def genDocuments(spark: SparkSession, n: Long): DataFrame = {
    val vocabCol = array(vocab.map(lit): _*)
    val nClustered = n / 10
    spark.range(0, n, 1, 32).toDF("doc_id")
      .withColumn("clustered", col("doc_id") < lit(nClustered))
      .withColumn("base_id",
        when(col("clustered"), expr("(doc_id DIV 4) * 4")).otherwise(col("doc_id")))
      .withColumn("body", array_join(transform(sequence(lit(0), lit(49)),
        i => element_at(vocabCol,
          pmod(xxhash64(col("base_id"), i), lit(vocab.size.toLong)).cast("int") + 1)), " "))
      .withColumn("variant", col("doc_id") % 4)
      .withColumn("text",
        when(col("clustered") && col("variant") > 0,
          concat(col("body"), lit(" uvar"), col("variant"))).otherwise(col("body")))
      .select(col("doc_id"), col("text"))
  }

  def genEmbeddings(spark: SparkSession, n: Long, nLabels: Int = 64): DataFrame = {
    val nPaired = n / 10
    spark.range(0, n, 1, 32).toDF("vec_id")
      .withColumn("paired", col("vec_id") < lit(nPaired))
      .withColumn("base_id",
        when(col("paired"), expr("(vec_id DIV 2) * 2")).otherwise(col("vec_id")))
      .withColumn("odd", col("paired") && (col("vec_id") % 2 === 1))
      .withColumn("embedding", transform(sequence(lit(1), lit(64)), i =>
        ((pmod(xxhash64(col("base_id"), i), lit(2001L)).cast("double") - 1000.0) / 1000.0
          + when(col("odd"),
              (pmod(xxhash64(col("vec_id"), i + 100), lit(21L)).cast("double") - 10.0) / 1000.0)
            .otherwise(0.0)).cast("float")))
      .withColumn("label",
        pmod(xxhash64(col("vec_id"), lit(999)), lit(nLabels.toLong)).cast("int"))
      .select(col("vec_id"), col("embedding"), col("label"))
  }

  /** CLUSTERED embeddings — the corpus shape IVF exists for (the
    * uniform [[genEmbeddings]] corpus is ~orthogonal in dim 64, so
    * Lloyd assignment degenerates and probed partitions hold trivial
    * data): `centers` deterministic centroids, each vector = its
    * center + small per-vector noise, center picked by id hash so
    * cluster sizes are ~n/centers. The noise carries FULL mantissa
    * entropy (2M granularity): coarse-grained noise left the float
    * column snappy-compressible to ~1/3 of raw — unlike any real
    * embedding corpus — which silently deflated the float-scan
    * baseline the ivf_quantized point measures against. */
  def genClusteredEmbeddings(spark: SparkSession, n: Long,
                             centers: Int = 16,
                             noiseDiv: Double = 2e7): DataFrame =
    spark.range(0, n, 1, 32).toDF("vec_id")
      .withColumn("c", pmod(xxhash64(col("vec_id"), lit(7)), lit(centers.toLong)))
      .withColumn("embedding", transform(sequence(lit(1), lit(64)), i =>
        ((pmod(xxhash64(col("c"), i), lit(2001L)).cast("double") - 1000.0) / 1000.0
          + (pmod(xxhash64(col("vec_id"), i + 500), lit(2000001L)).cast("double") - 1000000.0)
            / noiseDiv)
          .cast("float")))
      .select(col("vec_id"), col("embedding"))

  /** [[genDocuments]] plus one VIRAL near-identical cluster appended
    * at ids [n, n+v): v = max(2000, n/50) docs sharing a single base
    * body with a tiny per-doc variant suffix — every LSH band bucket
    * it touches holds ~v rows, v ≫ maxBucketSize (1000). This is the
    * boilerplate-skew shape (one template page duplicated across a
    * crawl) that the hot-bucket cap exists for: without the cap, that
    * one cluster contributes Σ 16·v²/2 candidate rows and
    * quadratically dominates the banded join. */
  def genViralDocs(spark: SparkSession, n: Long): (DataFrame, Long) = {
    val v = math.max(2000L, n / 50)
    val vocabCol = array(vocab.map(lit): _*)
    val viral = spark.range(n, n + v, 1, 32).toDF("doc_id")
      .withColumn("body", array_join(transform(sequence(lit(0), lit(49)),
        i => element_at(vocabCol,
          pmod(xxhash64(lit(-7L), i), lit(vocab.size.toLong)).cast("int") + 1)), " "))
      .withColumn("text",
        concat(col("body"), lit(" vvar"), pmod(col("doc_id"), lit(5))))
      .select(col("doc_id"), col("text"))
    (genDocuments(spark, n).unionByName(viral), v)
  }

  /** The MinHash-LSH banded join under boilerplate skew — the measured
    * form of the Σ bucket² + maxBucketSize contract written at
    * Dedup.scala's header. One shared band table (banding cost is
    * identical either way; the cap only changes the JOIN), then
    * candidate generation with the cap ON (1000) vs OFF, reporting
    * wall, candidate pairs, shuffle bytes, and the Σ m·(m−1)/2 bucket
    * mass each join must pay. Invariants required before the numbers
    * count: capped ⊆ uncapped, and the two runs agree EXACTLY on
    * pairs among the organic tail (the cap may only drop
    * viral-cluster pairs — organic near-dup recall is untouched).
    */
  def neardupSkewPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import scala.util.chaining._
    val n = 5000L * scale
    val pathStr = s"$dir/neardup_skew_x$scale"
    val (gen, viralSize) = genViralDocs(spark, n)
    gen.write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    val capOn = Dedup.MinHashParams()
    val capOff = capOn.copy(maxBucketSize = Int.MaxValue)
    spark.sqlContext.clearCache()
    val bands = Dedup.bands(docs, "doc_id", "text", capOn)
      .pipe(graft.ext.Checkpoints.stage)
    val buckets = bands.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("m"))
      .pipe(graft.ext.Checkpoints.stage)
    val hotMax = buckets.agg(coalesce(max(col("m")), lit(0L))).first().getLong(0)
    val nCapped = buckets.where(col("m") > capOn.maxBucketSize).count()
    def mass(b: DataFrame) = b
      .agg(coalesce(sum((col("m") * (col("m") - 1) / 2).cast("long")), lit(0L)))
      .first().getLong(0)
    val massOn = mass(buckets.where(col("m") <= capOn.maxBucketSize))
    val massOff = mass(buckets)
    spark.sqlContext.clearCache()
    val (pairsOn, tOn, bytesOn) = withShuffleBytes(spark) {
      Dedup.candidatePairsFromBands(bands, capOn)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nOn = pairsOn.count()
    spark.sqlContext.clearCache()
    val (pairsOff, tOff, bytesOff) = withShuffleBytes(spark) {
      Dedup.candidatePairsFromBands(bands, capOff)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nOff = pairsOff.count()
    // Correctness floor for the comparison: the cap is a pure subset...
    require(pairsOn.join(pairsOff, Seq("id_a", "id_b"), "left_anti").count() == 0,
      "capped candidates must be a subset of uncapped")
    // ...and it only drops VIRAL pairs — organic-tail candidates equal.
    val organic = (p: DataFrame) =>
      p.where(col("id_a") < n && col("id_b") < n).count()
    val (tailOn, tailOff) = (organic(pairsOn), organic(pairsOff))
    require(tailOn == tailOff,
      s"cap changed organic-tail candidates: $tailOn vs $tailOff")
    s"""{"neardup_skew":{"scale":$scale,"n_docs":${n + viralSize},""" +
      s""""viral_cluster":$viralSize,"hot_bucket_max":$hotMax,""" +
      s""""n_buckets_capped":$nCapped,"organic_pairs":$tailOn,""" +
      s""""cap_on":{"t":${fmt(tOn)},"n_pairs":$nOn,"band_mass":$massOn,"shuffle_bytes":$bytesOn},""" +
      s""""cap_off":{"t":${fmt(tOff)},"n_pairs":$nOff,"band_mass":$massOff,"shuffle_bytes":$bytesOff}}}"""
  }

  /** High-entropy corpus for the winnowing skew point: every token is
    * an md5-prefix of (doc_id, position), so organic cross-document
    * k-gram collisions are ~zero and the ONLY shared passages are the
    * planted boilerplate footer on every 5th doc — isolating the
    * posting-cap effect from the 40-word-vocab fixture's ubiquitous
    * collisions. */
  def genHighEntropyDocs(spark: SparkSession, n: Long): DataFrame = {
    val footer = " standard legal disclaimer boilerplate footer attached to every page of this corpus"
    spark.range(0, n, 1, 32).toDF("doc_id")
      .withColumn("body", array_join(transform(sequence(lit(0), lit(39)),
        i => substring(md5(concat_ws("_", col("doc_id"), i)), 1, 8)), " "))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("body"), lit(footer)))
          .otherwise(col("body")))
      .select(col("doc_id"), col("text"))
  }

  /** winnowPairs under boilerplate skew — the Σ df² posting-cap
    * contract measured, the winnowing analogue of [[neardupSkewPoint]].
    * A shared footer on 20% of docs posts its ~30 fingerprints to n/5
    * documents each; uncapped, those postings alone cost
    * ~30·(n/5)²/2 join rows (quadratic in the corpus — at 10× already
    * ~10⁹, which is exactly why the uncapped wall is only RUN at 1×;
    * at larger scales the uncapped cost is reported as the computed
    * posting mass, not executed). The capped join drops the
    * boilerplate fingerprints and pays only the organic mass, which
    * this corpus makes ~zero. Invariant before numbers print: at 1×
    * the capped pair set is empty (high-entropy bodies share nothing
    * once the footer is capped) while the uncapped set pairs every
    * footer-doc combination. */
  def winnowSkewPoint(spark: SparkSession, dir: String, scale: Int): String = {
    val n = 5000L * scale
    val pathStr = s"$dir/winnow_skew_x$scale"
    genHighEntropyDocs(spark, n).write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    spark.sqlContext.clearCache()
    // Posting census once (one winnow pass): Σ df·(df−1)/2 with and
    // without the cap — the join's exact pair budget either way.
    // Packed fingerprints, same as winnowPairs' internal index.
    val census = Dedup.winnowedPacked(docs, "text", "fps")
      .select(explode(col("fps")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    def mass(c: DataFrame) = c
      .agg(coalesce(sum((col("df") * (col("df") - 1) / 2).cast("long")), lit(0L)))
      .first().getLong(0)
    // Cap at 500 postings: the footer's df is n/5 (1000 at 1×), so it
    // is over the cap at every scale while organic fingerprints
    // (df 2–3 from rare md5-prefix collisions) always survive.
    val cap = 500
    val massOn = mass(census.where(col("df") <= cap))
    val massOff = mass(census)
    val hotDf = census.agg(coalesce(max(col("df")), lit(0L))).first().getLong(0)
    spark.sqlContext.clearCache()
    val (nOn, tOn) = timed {
      Dedup.winnowPairs(docs, "doc_id", "text", minShared = 1, maxPostings = cap)
        .count()
    }
    // The uncapped join is quadratic in the footer population — run it
    // only at 1× (30·10⁶ join rows); beyond that the mass IS the cost.
    val offJson =
      if (scale == 1) {
        spark.sqlContext.clearCache()
        val (nOff, tOff) = timed {
          Dedup.winnowPairs(docs, "doc_id", "text", minShared = 1,
            maxPostings = Int.MaxValue).count()
        }
        val footerDocs = (n + 4) / 5
        val footerPairs = footerDocs * (footerDocs - 1) / 2
        // Every footer pair present uncapped, and the cap removes the
        // bulk of the join mass. (The capped run still pairs SOME
        // footer docs: footer-region fingerprints selected only in a
        // minority of footer docs — boundary windows are doc-specific
        // — have df below the cap; their work is bounded by cap·df
        // per fingerprint, which is the cap's actual contract.)
        require(nOff >= footerPairs && massOn * 10 <= massOff,
          s"winnow skew invariant: capped $nOn/$massOn, uncapped $nOff/$massOff")
        s""","cap_off":{"t":${fmt(tOff)},"n_pairs":$nOff}"""
      } else ""
    s"""{"winnow_skew":{"scale":$scale,"n_docs":$n,"hot_posting_df":$hotDf,""" +
      s""""cap_on":{"t":${fmt(tOn)},"n_pairs":$nOn,"mass":$massOn},""" +
      s""""cap_off_mass":$massOff$offJson}}"""
  }

  /** The incremental-dedup entry point (graft.ext.DedupIndex) against
    * the full recompute it replaces — the amortization argument for
    * the round-8 API, measured. A shard of max(100, n/100) new docs
    * (1% of the corpus, the daily-ingest shape) arrives against an
    * n-doc indexed corpus; the probe bands ONLY the shard and
    * semi-joins the persisted band table, while the full recompute
    * re-shingles and re-minhashes all n + shard docs. Equality of the
    * two candidate sets (restricted to shard-touching pairs) is
    * `require`d before the timings print — same discipline as
    * neardupSkewPoint. Build cost is reported separately: it is the
    * one-time cost the probe amortizes across shards.
    */
  def incrementalDedupPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.DedupIndex
    val n = 5000L * scale
    val batchN = math.max(100L, n / 100)
    val pathStr = s"$dir/inc_dedup_x$scale"
    genDocuments(spark, n + batchN).write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    val oldDocs = docs.where(col("doc_id") < n)
    val batch = docs.where(col("doc_id") >= n)
    val params = Dedup.MinHashParams()
    val table = s"graft_scale_inc_idx_x$scale"
    spark.sqlContext.clearCache()
    val (_, tBuild) = timed { DedupIndex.build(oldDocs, "doc_id", "text", table, params) }
    spark.sqlContext.clearCache()
    val (probe, tProbe) = timed {
      import scala.util.chaining._
      DedupIndex.probeNewBatch(spark, table, batch, "doc_id", "text", params)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nProbe = probe.count()
    spark.sqlContext.clearCache()
    val (full, tFull) = timed {
      import scala.util.chaining._
      Dedup.candidatePairs(docs, "doc_id", "text", params)
        .where(col("id_a") >= n || col("id_b") >= n)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nFull = full.count()
    require(nProbe == nFull &&
      probe.join(full, Seq("id_a", "id_b"), "left_anti").count() == 0,
      s"incremental probe diverged from full recompute: $nProbe vs $nFull")
    s"""{"inc_dedup":{"scale":$scale,"n_indexed":$n,"n_batch":$batchN,""" +
      s""""n_new_pairs":$nProbe,"build":{"t":${fmt(tBuild)}},""" +
      s""""probe":{"t":${fmt(tProbe)}},"full_recompute":{"t":${fmt(tFull)}}}}"""
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Run `f` and report (result, wall seconds, shuffle-WRITE bytes of
    * every task that ran during it). The listener bus is async, so
    * after the action we wait for the byte counter to go quiet — fine
    * for a bench harness where points are run serially. */
  private def withShuffleBytes[T](spark: SparkSession)(f: => T): (T, Double, Long) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach(m => acc.addAndGet(m.shuffleWriteMetrics.bytesWritten))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (r, t) = timed(f)
      var last = -1L
      var stable = 0
      var waited = 0
      // Bounded quiesce: the harness runs points serially, but a
      // concurrent shuffle-writing job must not spin this loop forever
      // — after 30 s of non-quiet counter, take the value as-is.
      while (stable < 3 && waited < 150) {
        Thread.sleep(200)
        waited += 1
        val cur = acc.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      (r, t, acc.get())
    } finally spark.sparkContext.removeSparkListener(listener)
    // finally: a throwing measurement must never leave the counting
    // listener attached — it would double-count every later point.
  }

  /** [[withShuffleBytes]]'s INPUT twin: wall seconds + bytes READ
    * (taskMetrics.inputMetrics) of every task during `f` — the scan
    * cost a storage-bound probe pays. Same bounded quiesce. */
  private def withInputBytes[T](spark: SparkSession)(f: => T): (T, Double, Long) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach(m => acc.addAndGet(m.inputMetrics.bytesRead))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (r, t) = timed(f)
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 150) {
        Thread.sleep(200)
        waited += 1
        val cur = acc.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      (r, t, acc.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** WinnowIndex probe vs one-shot winnowPairs — the amortization
    * argument for the incremental shared-passage API, measured (the
    * winnowing twin of [[incrementalDedupPoint]]). An n-doc
    * high-entropy corpus (boilerplate footer on every 5th doc, cap
    * 500 — the footer stays capped at every scale) is indexed once; a
    * shard of max(100, n/100) docs arrives, HALF of them quoting one
    * indexed doc's 360-char body verbatim (the contamination shape —
    * each quoting doc must pair with exactly its source), half novel.
    * Probe = fingerprint the shard + semi-join the persisted posting
    * table (O(shard) + touched postings); one-shot = winnowPairs over
    * old ∪ new cut to shard-touching pairs (re-fingerprints the whole
    * corpus). Pair sets INCLUDING n_shared values are `require`d
    * equal before timings print. */
  def winnowIncPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import scala.util.chaining._
    import graft.ext.WinnowIndex
    val n = 5000L * scale
    val batchN = math.max(100L, n / 100)
    val cap = 500
    val pathStr = s"$dir/winnow_inc_x$scale"
    def bodyOf(key: Column) = array_join(transform(sequence(lit(0), lit(39)),
      i => substring(md5(concat_ws("_", key, i)), 1, 8)), " ")
    val batchGen = spark.range(n, n + batchN, 1, 32).toDF("doc_id")
      .withColumn("text",
        when(pmod(col("doc_id"), lit(2)) === 0,
          // Quote the body of old doc (doc_id − n), plus a unique tail.
          concat(bodyOf(col("doc_id") - n), lit(" uquote"), col("doc_id")))
          .otherwise(bodyOf(col("doc_id") + lit(10000000L))))
      .select(col("doc_id"), col("text"))
    genHighEntropyDocs(spark, n).unionByName(batchGen)
      .write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    val oldDocs = docs.where(col("doc_id") < n)
    val batch = docs.where(col("doc_id") >= n)
    val table = s"graft_scale_winnow_idx_x$scale"
    spark.sqlContext.clearCache()
    val (_, tBuild) = timed {
      WinnowIndex.build(oldDocs, "doc_id", "text", table)
    }
    spark.sqlContext.clearCache()
    val (probe, tProbe) = timed {
      WinnowIndex.probeNewBatch(spark, table, batch, "doc_id", "text",
          minShared = 1, maxPostings = cap)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nProbe = probe.count()
    spark.sqlContext.clearCache()
    val (oneShot, tFull) = timed {
      Dedup.winnowPairs(docs, "doc_id", "text", minShared = 1, maxPostings = cap)
        .where(col("id_a") >= n || col("id_b") >= n)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nFull = oneShot.count()
    require(nProbe == nFull && probe
        .join(oneShot, Seq("id_a", "id_b", "n_shared"), "left_anti").count() == 0,
      s"winnow probe diverged from one-shot: $nProbe vs $nFull")
    // Every quoting doc found its source (the contamination floor).
    val quoted = probe.where(col("id_b") === col("id_a") + n).count()
    require(quoted >= batchN / 2,
      s"quoted-passage pairs missing: $quoted < ${batchN / 2}")
    s"""{"winnow_inc":{"scale":$scale,"n_indexed":$n,"n_batch":$batchN,""" +
      s""""n_new_pairs":$nProbe,"n_quoted_found":$quoted,""" +
      s""""build":{"t":${fmt(tBuild)}},"probe":{"t":${fmt(tProbe)}},""" +
      s""""one_shot":{"t":${fmt(tFull)}}}}"""
  }

  /** Index-compaction recovery: the streaming band index after 50
    * per-shard appends holds 50 batch partitions × up to 16 bucket
    * files (~800 parquet footers), and every probe pays a footer read
    * per file before a single row — the same small-files failure the
    * IVF layout fix measured. DedupIndex.compact merges the history
    * into ONE partition at one file per bucket; this point times the
    * SAME probe (same batch, same plan) against both layouts and
    * `require`s the pair sets identical, so the published delta is
    * pure layout — file count and probe wall, nothing semantic. */
  def compactionPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import scala.util.chaining._
    import graft.ext.DedupIndex
    import graft.streaming.StreamOps
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val n = 5000L * scale
    val batchN = math.max(100L, n / 100)
    val shards = 50
    val pathStr = s"$dir/compaction_x$scale"
    genDocuments(spark, n + batchN).write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    val params = Dedup.MinHashParams()
    val table = s"graft_scale_compact_idx_x$scale"
    graft.io.Writer.emptyPartitionedBucketedTable(spark, table,
      StructType(Seq(
        StructField("id", docs.schema("doc_id").dataType),
        StructField("band_id", IntegerType),
        StructField("band_hash", LongType),
        StructField(StreamOps.BatchTag, LongType))),
      StreamOps.BatchTag, "band_hash", 16)
    // Band once, append in 50 id-keyed slices — the post-ingest state
    // a 50-shard stream leaves behind, without paying 50 probes here.
    val bands = Dedup.bands(docs.where(col("doc_id") < n), "doc_id", "text", params)
      .localCheckpoint(true)
    val (_, tAppend) = timed {
      (0 until shards).foreach { i =>
        StreamOps.writeBatchToSink(spark, table,
          bands.where(pmod(col("id"), lit(shards)) === i), i.toLong)
      }
    }
    spark.catalog.refreshTable(table)
    def indexFiles(): Int = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      val it = fs.listFiles(loc, true)
      var k = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) k += 1 }
      k
    }
    val newBands = Dedup.bands(docs.where(col("doc_id") >= n), "doc_id", "text", params)
      .localCheckpoint(true)
    spark.sqlContext.clearCache()
    val (probeFrag, tFrag) = timed {
      DedupIndex.probeNewBatchFromBands(spark, table, newBands, params)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nFrag = probeFrag.count()
    val filesFrag = indexFiles()
    val (_, tCompact) = timed { DedupIndex.compact(spark, table) }
    val filesCompact = indexFiles()
    spark.sqlContext.clearCache()
    val (probeCompact, tComp) = timed {
      DedupIndex.probeNewBatchFromBands(spark, table, newBands, params)
        .pipe(graft.ext.Checkpoints.stage)
    }
    val nComp = probeCompact.count()
    require(nFrag == nComp &&
      probeFrag.join(probeCompact, Seq("id_a", "id_b"), "left_anti").count() == 0,
      s"probe diverged across compaction: $nFrag vs $nComp")
    require(filesCompact <= 16 && filesCompact < filesFrag,
      s"compaction did not shrink the layout: $filesFrag -> $filesCompact")
    s"""{"compaction":{"scale":$scale,"n_indexed":$n,"shards":$shards,""" +
      s""""n_new_pairs":$nFrag,"files_before":$filesFrag,"files_after":$filesCompact,""" +
      s""""append_50":{"t":${fmt(tAppend)}},"compact":{"t":${fmt(tCompact)}},""" +
      s""""probe_fragmented":{"t":${fmt(tFrag)}},"probe_compacted":{"t":${fmt(tComp)}}}}"""
  }

  /** The streaming ingest path at REAL shard counts: the sf0.1 gates
    * run 3 micro-batches; this point drives DedupIndex.streamIngest
    * through 50 one-file batches (Structured Streaming, AvailableNow,
    * maxFilesPerTrigger=1) over a 10×-scale corpus and publishes the
    * per-batch wall curve — the marginal cost of shard k as the index
    * behind it grows, which must stay ~flat for the unbounded-ingest
    * story to hold (the index append is one partition regardless of
    * history; the probe is cut to touched buckets; the footer tax of
    * accumulated small partitions is the term that would bend it, and
    * compact() is the documented reclaim).
    *
    * Equivalence is asserted AT CHECKPOINTS, not just at the end: the
    * sink and index are batch-id partitioned, so `pairs where tag ≤ k`
    * against a one-shot candidatePairs over exactly the docs indexed
    * in batches ≤ k replays the accumulated state after batch k —
    * three prefix `require`s (k = 9, 24, 49) plus the full-run one. */
  def streamIngestPoint(spark: SparkSession, dir: String, scale: Int,
                        shards: Int = 50): String = {
    import scala.util.chaining._
    import graft.ext.{Checkpoints, Dedup, DedupIndex}
    import graft.streaming.StreamOps
    val n = 5000L * scale
    val pathStr = s"$dir/stream_ingest_x$scale"
    genDocuments(spark, n).write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    // Stage one parquet file per shard — the file-per-trigger source.
    val inDir = {
      import java.nio.file.{Files, Paths}
      val base = Files.createTempDirectory(s"graft_scale_stream_x$scale").toString
      val in = s"$base/in"
      Files.createDirectories(Paths.get(in))
      (0 until shards).foreach { i =>
        val w = s"$base/w$i"
        docs.where(pmod(col("doc_id"), lit(shards)) === i)
          .coalesce(1).write.mode("overwrite").parquet(w)
        val part = new java.io.File(w).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"no part file under $w"))
        Files.move(part.toPath, Paths.get(in, f"shard_$i%03d.parquet"))
      }
      in
    }
    val params = Dedup.MinHashParams()
    val table = s"graft_scale_stream_idx_x$scale"
    val batchWalls = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0)
          Option(e.progress.durationMs.get("triggerExecution"))
            .foreach(ms => batchWalls.add(ms.toDouble / 1e3))
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val (accT, tIngest) = try timed {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      DedupIndex.streamIngest(spark, table, stream, "doc_id", "text", params,
        queryName = s"graft_scale_stream_x$scale")
    } finally {
      // The listener bus is async; give it a beat before detaching.
      Thread.sleep(500)
      spark.streams.removeListener(listener)
    }
    val (acc, nBatches) = accT
    require(nBatches == shards, s"expected $shards micro-batches, got $nBatches")
    val accPairs = acc.pipe(Checkpoints.stage)
    // Prefix equivalence at checkpoints: accumulated(≤k) ≡ one-shot
    // over exactly the docs the index holds for batches ≤ k.
    val checkpoints = Seq(shards / 5 - 1, shards / 2 - 1, shards - 1)
    checkpoints.foreach { k =>
      val prefixIds = spark.table(table)
        .where(col(StreamOps.BatchTag) <= k)
        .select(col("id").as("doc_id")).distinct()
      val prefixDocs = docs.join(prefixIds, Seq("doc_id"), "left_semi")
      val oneShot = Dedup.candidatePairs(prefixDocs, "doc_id", "text", params)
        .pipe(Checkpoints.stage)
      val accK = spark.table(table + "_pairs")
        .where(col(StreamOps.BatchTag) <= k)
        .select(col("id_a"), col("id_b")).pipe(Checkpoints.stage)
      val nOne = oneShot.count()
      val nAcc = accK.count()
      require(nAcc == nOne &&
        oneShot.join(accK, Seq("id_a", "id_b"), "left_anti").count() == 0,
        s"prefix ≤$k diverged from one-shot: $nAcc vs $nOne")
    }
    val walls = {
      import scala.jdk.CollectionConverters._
      batchWalls.asScala.toVector
    }
    require(walls.size >= shards, s"listener captured ${walls.size} < $shards batches")
    def avg(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    val sorted = walls.sorted
    val firstTen = avg(walls.take(10))
    val lastTen = avg(walls.takeRight(10))
    s"""{"stream_ingest":{"scale":$scale,"n_docs":$n,"batches":$nBatches,""" +
      s""""n_pairs":${accPairs.count()},"ingest_wall":{"t":${fmt(tIngest)}},""" +
      s""""batch_wall":{"median":${fmt(sorted(sorted.size / 2))},""" +
      s""""p90":${fmt(sorted((sorted.size * 9) / 10))},"max":${fmt(sorted.last)},""" +
      s""""first10_avg":${fmt(firstTen)},"last10_avg":${fmt(lastTen)},""" +
      s""""slope_last_over_first":${fmt(lastTen / math.max(firstTen, 1e-9))}}}}"""
  }

  /** Compressed parquet column-chunk bytes of `cols` across the given
    * cluster partitions of a saved IVF index — EXACTLY the bytes a
    * column-pruned, partition-pruned probe scan must fetch (the
    * range-GETs an object store serves). Read from file footers:
    * deterministic, unlike task input metrics, which on a local
    * filesystem track only metadata reads (measured: two scans of
    * DIFFERENT columns reported byte-identical "input"). */
  private def probedChunkBytes(spark: SparkSession, table: String,
                               clusters: Seq[Int], cols: Set[String]): Long = {
    import scala.jdk.CollectionConverters._
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val conf = spark.sessionState.newHadoopConf()
    val fs = loc.getFileSystem(conf)
    clusters.flatMap { c =>
      val d = new org.apache.hadoop.fs.Path(loc, s"cluster_id=$c")
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
    }.map { st =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
      try r.getFooter.getBlocks.asScala.map(_.getColumns.asScala
          .filter(cc => cols.contains(cc.getPath.toDotString.split("\\.")(0)))
          .map(_.getTotalSize).sum).sum
      finally r.close()
    }.sum
  }

  /** The int8 IVF probe vs the float probe — the scan-bytes cut
    * measured on a CLUSTERED corpus ([[genClusteredEmbeddings]], so
    * probed partitions carry ~nProbe/k of the data and the float
    * column has realistic (incompressible) entropy. Byte numbers are
    * compressed column-chunk sizes over the probed partitions
    * ([[probedChunkBytes]]):
    *   - float_scan: (id, embedding) chunks — what probeTopK's
    *     ranking scan fetches;
    *   - int8_scan: (id, qv) chunks — what the quantized pre-rank
    *     fetches instead; the cut is bounded below 4× by parquet's
    *     INT32 physical type for tinyint (encoding+snappy recover
    *     most of it);
    *   - the re-rank's shortlist point-reads are bounded by
    *     shortlist × row-group bytes — constant in corpus size.
    * The invariant gate before numbers print: quantized top-10
    * overlaps the float top-10 in ≥ 8 ids (the x_ivf_quantized
    * floor) — the byte cut must not cost recall. */
  def ivfQuantizedPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{IvfIndex, Similarity}
    val n = 2000L * scale
    val pathStr = s"$dir/ivf_quant_x$scale"
    genClusteredEmbeddings(spark, n + 1).write.mode("overwrite").parquet(pathStr)
    val emb = spark.read.parquet(pathStr)
    val corpus = emb.where(col("vec_id") =!= 0)
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    val table = s"graft_scale_ivfq_x$scale"
    val (_, tBuild) = timed {
      IvfIndex.build(corpus, "vec_id", "embedding", table, k = 16, iters = 2)
    }
    val probed = Similarity.probeClusters(IvfIndex.centroids(spark, table), q, 4)
    val bytesFloat = probedChunkBytes(spark, table, probed, Set("vec_id", "embedding"))
    val bytesInt8 = probedChunkBytes(spark, table, probed, Set("vec_id", "qv"))
    spark.sqlContext.clearCache()
    val (fRows, tF) = timed {
      IvfIndex.probeTopK(spark, table, "vec_id", "embedding", q, 10, nProbe = 4)
        .collect()
    }
    spark.sqlContext.clearCache()
    val (qRows, tQ) = timed {
      IvfIndex.probeTopKQuantized(spark, table, "vec_id", "embedding", q, 10,
        nProbe = 4).collect()
    }
    val overlap = fRows.map(_.getLong(0)).toSet
      .intersect(qRows.map(_.getLong(0)).toSet).size
    require(overlap >= 8, s"quantized probe overlap $overlap < 8 of 10")
    val nProbed = spark.table(table)
      .where(col("cluster_id").isin(probed: _*)).count()
    s"""{"ivf_quantized":{"scale":$scale,"n_vecs":$n,"n_probed":$nProbed,""" +
      s""""topk_overlap":$overlap,"build":{"t":${fmt(tBuild)}},""" +
      s""""float_scan":{"t":${fmt(tF)},"chunk_bytes":$bytesFloat},""" +
      s""""int8_scan":{"t":${fmt(tQ)},"chunk_bytes":$bytesInt8}}}"""
  }

  /** PrefixSum vs the single-task window at volume — the same
    * crossover evidence as EquiDepth's (BENCH_NOTES): the window form
    * funnels every row through ONE task; the distributed form scales
    * out. Both checksummed equal before timings count. */
  def prefixSumPoint(spark: SparkSession, n: Long): String = {
    val df = spark.range(0, n, 1, 32)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
    val (sumPs, tPs) = timed {
      graft.operators.PrefixSum.runningTotal(df, Seq("k"), "v")
        .agg(sum(col("cum"))).head().getLong(0)
    }
    spark.sqlContext.clearCache()
    val (sumW, tW) = timed {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("cum", sum(col("v")).over(
          Window.orderBy(col("k"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .agg(sum(col("cum"))).head().getLong(0)
    }
    require(sumPs == sumW, s"prefix-sum checksum mismatch: $sumPs vs $sumW")
    s"""{"prefix_sum":{"n_rows":$n,"checksum":$sumPs,""" +
      s""""distributed":{"t":${fmt(tPs)}},"single_task_window":{"t":${fmt(tW)}}}}"""
  }

  /** Heavy hitters at adversarial scale: n items whose tail is ~all
    * DISTINCT (vocab ≈ 0.7·n ≫ k), so the exact census must shuffle
    * one row per distinct item while the Misra–Gries path shuffles one
    * constant-size blob per partition + the 3-token confirm counts.
    * The shuffle-bytes ratio is the 100 TB argument in one number.
    */
  def heavyHittersPoint(spark: SparkSession, n: Long): String = {
    val k = 64
    // 30% of the mass on 3 heavy tokens; every tail token unique.
    val items = spark.range(0, n, 1, 32)
      .select(when(col("id") % 10 < 3, concat(lit("heavy_"), col("id") % 3))
        .otherwise(concat(lit("tail_"), col("id"))).as("token"))
    val (mgRows, tMg, mgBytes) = withShuffleBytes(spark) {
      graft.ext.HeavyHitters.confirmedHeavy(items, "token", k).collect()
    }
    spark.sqlContext.clearCache()
    // The exact-census alternative a user would otherwise run: full
    // groupBy census, filtered at the same n*(k+1) > total threshold.
    val (censusRows, tCensus, censusBytes) = withShuffleBytes(spark) {
      val census = items.groupBy(col("token")).agg(count(lit(1)).as("n"))
      census.where(col("n") * (k + 1) > lit(n))
        .orderBy(col("token")).collect()
    }
    require(mgRows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      censusRows.map(r => (r.getString(0), r.getLong(1))).toSeq,
      "sketch-then-confirm output must equal the exact census filter")
    s"""{"heavy_hitters":{"n_items":$n,"k":$k,"n_heavy":${mgRows.length},""" +
      s""""mg":{"t":${fmt(tMg)},"shuffle_bytes":$mgBytes},""" +
      s""""exact_census":{"t":${fmt(tCensus)},"shuffle_bytes":$censusBytes}}}"""
  }

  /** Event-time family at scale — the §2.14 paths the r11 verdict
    * flagged as unmeasured beyond sf0.1: hand-built lag+cumsum
    * sessionization, the native session_window merge, the native
    * sliding window (Expand ×4 — every event lands in 4 overlapping
    * windows), the SCD-2 interval build, and the streaming
    * flatMapGroupsWithState sessionizer (the state-store path) driven
    * through real micro-batches.
    *
    * The generator is CLOSED-FORM (no window/cumsum to build the
    * corpus, so generation cost can't contaminate the point): user u's
    * k-th event fires at base + 7k + 100·(k div 8) minutes (+ sub-
    * minute jitter that can't reorder events or flip a gap across the
    * 60-minute threshold), so events inside a block of 8 are ~7
    * minutes apart and block boundaries gap ~107 > 60 minutes — every
    * user has EXACTLY ceil(perUser/8) sessions, giving each leg an
    * exact expected-output oracle at every scale. Scale 1 ≈ the sf0.1
    * events table (100 k rows, 2 k users × 50 events). */
  def eventTimePoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.streaming.StreamOps
    val n = 100000L * scale
    val perUser = 50L
    val nUsers = n / perUser
    val gapMin = 60
    val baseMs = 1704067200000L // 2024-01-01T00:00:00Z
    val path = s"$dir/events_scale_$scale.parquet"
    val types = array(lit("click"), lit("view"), lit("cart"), lit("purchase"))
    def slice(lo: Long, hi: Long, parts: Int) = spark.range(lo, hi, 1, parts)
      .select(col("id").as("event_id"),
        (col("id") % nUsers).as("user_id"),
        expr(s"id DIV $nUsers").as("k"))
      .withColumn("ts", timestamp_millis(lit(baseMs) +
        (col("k") * 7 + expr("k DIV 8") * 100) * 60000L +
        pmod(xxhash64(col("event_id")), lit(60000L))))
      .withColumn("event_type",
        element_at(types, (pmod(xxhash64(col("event_id") + 7), lit(4)) + 1).cast("int")))
      .drop("k")
    // The streaming leg replays these files as micro-batches, and the
    // file source orders them by MODIFICATION TIME — a single parallel
    // write would hand the stream its shards in arbitrary k-order,
    // racing the watermark ahead of most of the data (late shards
    // dropped wholesale, sessions fragmented). Write 8 event-time-
    // contiguous shards SEQUENTIALLY (one file each, ascending mtime),
    // the arrival contract a real ingest stream satisfies; id slices
    // are k-contiguous because id = k·nUsers + u.
    (0 until 8).foreach { i =>
      slice(i * n / 8, (i + 1) * n / 8, 32).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(path)
    }
    val ev = spark.read.parquet(path)
    val expectedSessions = nUsers * ((perUser + 7) / 8)
    spark.sqlContext.clearCache()
    val (nSess, tSess) = timed {
      StreamOps.sessionizeBatch(ev, "user_id", "ts", gapMin).count()
    }
    require(nSess == expectedSessions,
      s"batch sessionization: expected $expectedSessions sessions, got $nSess")
    spark.sqlContext.clearCache()
    val (nSw, tSw) = timed {
      ev.groupBy(col("user_id"), session_window(col("ts"), s"$gapMin minutes"))
        .agg(count(lit(1)).as("n")).count()
    }
    require(nSw == expectedSessions,
      s"native session_window: expected $expectedSessions sessions, got $nSw")
    spark.sqlContext.clearCache()
    val (nSlide, tSlide) = timed {
      ev.groupBy(window(col("ts"), "60 minutes", "15 minutes"))
        .agg(count(lit(1)).as("n")).count()
    }
    spark.sqlContext.clearCache()
    val (nScd, tScd) = timed {
      graft.operators.Scd2.intervals(
        ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        "user_id", "ts", "event_type", tieCols = Seq("event_id")).count()
    }
    // Streaming leg: the 8 sequentially-written event-time-contiguous
    // shards (one file each, above) re-read at maxFilesPerTrigger=1
    // drive the flatMapGroupsWithState state store through 8 real
    // one-file micro-batches — per-user session state lives across
    // batch boundaries, the path with no >sf0.1 measurement before
    // this point. Emission count must equal the batch twin's
    // Append-mode expression exactly.
    spark.sqlContext.clearCache()
    val expectedEmitted =
      StreamOps.sessionizeBatchEmitted(ev, "user_id", "ts", gapMin).count()
    val (nStream, tStream) = timed {
      import spark.implicits._
      val s = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(path)
        .select(col("user_id"), col("ts")).as[StreamOps.SessionEvent]
      StreamOps.runAvailableNow(
        StreamOps.sessionize(s, gapMin).toDF(),
        s"scale_stream_sessions_$scale",
        org.apache.spark.sql.streaming.OutputMode.Append()).count()
    }
    require(nStream == expectedEmitted,
      s"streaming sessionize emitted $nStream sessions, batch twin says $expectedEmitted")
    s"""{"scale":$scale,"n_events":$n,"n_users":$nUsers,""" +
      s""""batch_sessions":{"t":${fmt(tSess)},"n_sessions":$nSess},""" +
      s""""session_window":{"t":${fmt(tSw)},"n_sessions":$nSw},""" +
      s""""sliding_window":{"t":${fmt(tSlide)},"n_windows":$nSlide,"expand_rows":${4 * n}},""" +
      s""""scd2":{"t":${fmt(tScd)},"n_intervals":$nScd},""" +
      s""""stream_sessions":{"t":${fmt(tStream)},"n_emitted":$nStream}}"""
  }

  /** The round-12 corpus operators at scale: bigram-surprisal LM
    * scoring (two keyed censuses + two keyed joins), the memorization
    * twin it shares its shuffle shape with, √-temperature mixture
    * rebalancing (k-row census broadcast), and packed-chunk boundary
    * emission (per-shard windows). All four must grow ≤ linearly in
    * documents — none has a pair-mass term. Corpus via
    * [[genDocuments]] (50-token docs), generation excluded from every
    * timing by an untimed localCheckpoint. */
  def corpusOpsPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{Mixing, TextAnalysis}
    val n = 5000L * scale
    val docs = genDocuments(spark, n).localCheckpoint(true)
    spark.sqlContext.clearCache()
    val (nSur, tSur) = timed {
      TextAnalysis.surprisalStats(docs, "doc_id", "text").count()
    }
    require(nSur == n, s"surprisal must keep every doc: $nSur != $n")
    spark.sqlContext.clearCache()
    val (nMem, tMem) = timed {
      TextAnalysis.memorizedBigramStats(docs, "doc_id", "text", minCount = 4L).count()
    }
    spark.sqlContext.clearCache()
    // Exponentially skewed sources (group k holds ids
    // [500·2^k, 500·2^{k+1}), counts doubling from a 500-doc smallest
    // group — the web-dump shape √-temperature exists for, with c_min
    // representative so integer-pct quantization doesn't zero the
    // head; see the operator's quantization caveat): total kept must
    // compress well under n, not pass through.
    val withSrc = docs.withColumn("source",
      concat(lit("s"), floor(log2(expr("doc_id DIV 500") + 1))))
    val (nMix, tMix) = timed {
      Mixing.sqrtTemperatureMix(withSrc, "doc_id", "source").count()
    }
    // Strictly compressive at every scale; the ratio tightens as more
    // doubling groups exist (few groups at the 1× warmup).
    require(nMix < (n * 3) / 4,
      s"skewed sources must downsample: kept $nMix of $n")
    spark.sqlContext.clearCache()
    val (nSpan, tSpan) = timed {
      graft.ext.Packing.chunkBoundaries(docs, "doc_id",
        TextAnalysis.wsTokenCount(col("text")), capacity = 512L, shards = 32).count()
    }
    s"""{"scale":$scale,"n_docs":$n,""" +
      s""""surprisal":{"t":${fmt(tSur)},"n_rows":$nSur},""" +
      s""""memorization":{"t":${fmt(tMem)},"n_rows":$nMem},""" +
      s""""sqrt_mix":{"t":${fmt(tMix)},"n_kept":$nMix},""" +
      s""""pack_boundaries":{"t":${fmt(tSpan)},"n_spans":$nSpan}}"""
  }

  /** The round-13 curation quartet at scale — each leg carries a
    * require()d closed-form oracle so the timing can never go green on
    * wrong answers:
    *
    *   - winsorize: EquiDepth.percentileValues bounds + clip census on
    *     ~unique 64-bit values, so n_low/n_high equal loRank−1 /
    *     n−hiRank EXACTLY (rank is the order statistic's definition);
    *   - group_budget: tokenBudgetPerGroup on a corpus where ONE group
    *     holds 99% of rows (tok 1 each, budget n/10) — kept =
    *     Σ min(c_g, B) exactly; the Window.partitionBy twin runs the
    *     same cut so the point PUBLISHES the single-task gap the keyed
    *     prefix sum removes;
    *   - hard_negatives: the chunked path (4 slices) over the scaled
    *     corpus — 64 labels guarantee ≥ k different-label rows per
    *     anchor, so rows = anchors·k exactly;
    *   - containment_pairs: containmentOn over the MinHash candidate
    *     set (∝ n by the banded-join cap); every base→variant cluster
    *     pair must score contain_a_in_b = 1.0 exactly (the variant doc
    *     IS the base body plus one token — subset by construction).
    *
    * All four must grow ≤ linearly in their input — none has a
    * pair-mass term beyond the capped candidate join. */
  def curationOpsPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{Mixing, TextAnalysis}
    import org.apache.spark.sql.expressions.Window
    // Winsorize: clip census at exact [p1, p99] rank bounds.
    val nVals = 50000L * scale
    val vals = spark.range(0, nVals, 1, 32)
      .select(col("id"), xxhash64(col("id")).as("value"))
      .localCheckpoint(true)
    spark.sqlContext.clearCache()
    val ((nLow, nHigh), tWz) = timed {
      val loRank = math.max(1L, nVals / 100)
      val hiRank = nVals - loRank + 1
      val bounds = graft.operators.EquiDepth.percentileValues(
          vals, Seq("value", "id"), Seq(loRank, hiRank))
        .select(col("rank"), col("value")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (vLo, vHi) = (bounds(loRank), bounds(hiRank))
      val r = vals.agg(
        sum((col("value") < vLo).cast("long")).as("n_low"),
        sum((col("value") > vHi).cast("long")).as("n_high")).first()
      (r.getLong(0), r.getLong(1))
    }
    val loRank = math.max(1L, nVals / 100)
    require(nLow == loRank - 1 && nHigh == nVals - (nVals - loRank + 1),
      s"winsorize census off: n_low=$nLow n_high=$nHigh n=$nVals loRank=$loRank")
    // Group budget: one dominant group (99%), the shape the window
    // form serializes into a single task.
    val nRows = 50000L * scale
    val budget = nRows / 10
    val grouped = spark.range(0, nRows, 1, 32)
      .select(col("id"),
        when(pmod(col("id"), lit(100L)) < 99, lit("head"))
          .otherwise(concat(lit("t"), pmod(col("id"), lit(7L)))).as("source"),
        lit(1L).as("tok"))
      .localCheckpoint(true)
    val expectKept = grouped.groupBy(col("source")).agg(count(lit(1)).as("c"))
      .collect().map(r => math.min(r.getLong(1), budget)).sum
    spark.sqlContext.clearCache()
    val (nKept, tGb) = timed {
      Mixing.tokenBudgetPerGroup(grouped, "id", "source", col("tok"), budget).count()
    }
    require(nKept == expectKept,
      s"group budget kept $nKept, closed form says $expectKept")
    spark.sqlContext.clearCache()
    val (nKeptW, tGbWindow) = timed {
      val w = Window.partitionBy(col("source"))
        .orderBy(Mixing.orderHash(col("id")), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grouped.withColumn("__cum", sum(col("tok")).over(w))
        .where(col("__cum") <= budget).count()
    }
    require(nKeptW == expectKept, s"window twin kept $nKeptW != $expectKept")
    // Hard negatives, chunked: 200 anchors through 4 slices.
    val nVecs = 2000L * scale
    val emb = genEmbeddings(spark, nVecs).localCheckpoint(true)
    val anchors = emb.where(col("vec_id") < 200)
    spark.sqlContext.clearCache()
    val (nNeg, tHn) = timed {
      Similarity.hardNegativesChunked(emb, "vec_id", "embedding", "label",
        anchors, k = 5, sliceSize = 50).count()
    }
    require(nNeg == 200L * 5,
      s"hard negatives must emit anchors*k rows, got $nNeg")
    // Containment on detected pairs: candidate set ∝ n, base→variant
    // pairs are exact subsets.
    val nDocs = 5000L * scale
    val docs = genDocuments(spark, nDocs).localCheckpoint(true)
    val params = Dedup.MinHashParams()
    spark.sqlContext.clearCache()
    val ((nPairs, nBad, nBaseVar), tCp) = timed {
      val pairs = graft.ext.Checkpoints.stage(
        Dedup.candidatePairs(docs, "doc_id", "text", params))
      val scored = graft.ext.Checkpoints.stage(
        Dedup.containmentOn(docs, pairs, "doc_id", "text"))
      val nClustered = nDocs / 10
      val baseVar = scored.where(col("id_a") < nClustered &&
        expr("id_a DIV 4") === expr("id_b DIV 4") && col("id_a") % 4 === 0)
      (scored.count(),
        baseVar.where(col("contain_a_in_b") =!= 1.0).count(),
        baseVar.count())
    }
    require(nBad == 0 && nBaseVar > 0,
      s"base->variant containment must be exactly 1.0: $nBad bad of $nBaseVar")
    s"""{"scale":$scale,"n_vals":$nVals,"n_rows":$nRows,"n_vecs":$nVecs,"n_docs":$nDocs,""" +
      s""""winsorize":{"t":${fmt(tWz)},"n_low":$nLow,"n_high":$nHigh},""" +
      s""""group_budget":{"t":${fmt(tGb)},"t_single_task_window":${fmt(tGbWindow)},"n_kept":$nKept},""" +
      s""""hard_negatives":{"t":${fmt(tHn)},"n_rows":$nNeg},""" +
      s""""containment_pairs":{"t":${fmt(tCp)},"n_pairs":$nPairs,"n_base_var":$nBaseVar}}"""
  }

  /** Round-13 retrieval/tokenizer/split additions at scale, each leg
    * with a closed-form (or value-equality) require so a timing can
    * never go green on wrong answers:
    *   - BM25 index probe vs corpus scan — same top-10, probe reads
    *     only the 2 query terms' postings (build cost reported
    *     separately: the one-time pass the probe amortizes);
    *   - BPE train (census-sized driver loop) + encode (shuffle-free
    *     codegen kernel), reconstruction invariant over every doc;
    *   - cluster-aware split over the PRODUCTION near-dup detector
    *     (LSH candidates → exact verify → CC → split): planted
    *     4-doc clusters must label to their base id, zero pairs may
    *     straddle splits, split counts cover the corpus. */
  def retrievalOpsPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{Mixing, PostingsIndex}
    val nDocs = 5000L * scale
    val docs = genDocuments(spark, nDocs).localCheckpoint(true)
    // One guaranteed-common vocab token + the rare variant marker —
    // the discriminative/common mix BM25's idf weighting exists for.
    val terms = Seq(vocab.head, "uvar1")
    val table = "graft_bm25_scale"
    spark.sqlContext.clearCache()
    val (_, tBuild) = timed {
      PostingsIndex.build(spark, docs, "doc_id", "text", table)
    }
    spark.sqlContext.clearCache()
    val (probeRows, tProbe) = timed {
      PostingsIndex.probe(spark, table, terms, 10).collect()
    }
    spark.sqlContext.clearCache()
    val (scanRows, tScan) = timed {
      graft.ext.TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, 10).collect()
    }
    require(probeRows.map(_.toSeq).toSeq == scanRows.map(_.toSeq).toSeq,
      "BM25 index probe must equal the corpus scan bit-for-bit")
    spark.sqlContext.clearCache()
    val (merges, tTrain) = timed {
      graft.ext.TextAnalysis.bpeTrain(docs, "text", nMerges = 30)
    }
    require(merges.size == 30, s"expected 30 merges, got ${merges.size}")
    spark.sqlContext.clearCache()
    val ((nTok, nChars, nBadRec), tEnc) = timed {
      val r = graft.ext.TextAnalysis.bpeEncode(docs, "text", merges, "toks")
        .agg(
          sum(size(col("toks")).cast("long")).as("n_tok"),
          sum(length(regexp_replace(col("text"), " ", "")).cast("long")).as("n_chars"),
          sum((concat_ws("", col("toks")) =!=
            regexp_replace(col("text"), " ", "")).cast("long")).as("n_bad"))
        .first()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    require(nBadRec == 0, s"BPE reconstruction failed on $nBadRec docs")
    require(nTok < nChars,
      s"trained merges must compress: $nTok tokens vs $nChars chars")
    val params = Dedup.MinHashParams()
    spark.sqlContext.clearCache()
    val ((nLeaky, nBadLabel, nSplitDocs), tCs) = timed {
      val pairs = graft.ext.Checkpoints.stage(
        Dedup.nearDupPairs(docs, "doc_id", "text", params, threshold = 0.5)
          .select(col("id_a"), col("id_b")))
      val assigned = graft.ext.Checkpoints.stage(
        Mixing.clusterSplit(docs, "doc_id", pairs))
      val leaky = pairs
        .join(assigned.select(col("doc_id").as("id_a"), col("split").as("sa")),
          Seq("id_a"))
        .join(assigned.select(col("doc_id").as("id_b"), col("split").as("sb")),
          Seq("id_b"))
        .where(col("sa") =!= col("sb")).count()
      val badLabel = assigned.where(col("doc_id") < nDocs / 10)
        .where(col("cluster_id") =!= expr("(doc_id DIV 4) * 4")).count()
      (leaky, badLabel, assigned.count())
    }
    require(nLeaky == 0, s"cluster split leaked $nLeaky pairs across splits")
    require(nBadLabel == 0,
      s"$nBadLabel planted-cluster docs carry the wrong component label")
    require(nSplitDocs == nDocs, "split assignment must cover the corpus")
    // Boilerplate removal: every planted 4-doc cluster shares its
    // 50-token body, so its five 10-word body blocks have df ≥ 4 and
    // must drop from every member; unique docs keep all blocks.
    spark.sqlContext.clearCache()
    val ((nDropped, nBadUnique), tBp) = timed {
      val out = graft.ext.TextAnalysis.dropRepeatedBlocks(
          docs, "doc_id", "text", blockTokens = 10, minDf = 2L)
        .localCheckpoint(true)
      val r = out.agg(
        coalesce(sum(col("n_dropped")), lit(0L)).as("nd"),
        coalesce(sum(when(col("doc_id") >= nDocs / 10,
          (col("n_dropped") > 0).cast("long"))), lit(0L)).as("bad"))
        .first()
      (r.getLong(0), r.getLong(1))
    }
    require(nDropped >= (nDocs / 10) * 5,
      s"planted clusters must shed their shared body blocks: $nDropped")
    require(nBadUnique == 0,
      s"$nBadUnique unique docs lost blocks — boilerplate census over-fired")
    // FIM: per-row rewrite, mass preserved on every transformed doc.
    spark.sqlContext.clearCache()
    val ((nFim, nBadMass), tFim) = timed {
      val out = graft.ext.Packing.fimTransform(docs, "doc_id", "text")
      val r = out.agg(
        coalesce(sum(col("fim_applied")), lit(0L)).as("nf"),
        coalesce(sum(when(col("fim_applied") === 1L,
          (length(col("fim_text")) =!= length(col("text")) + 15).cast("long"))),
          lit(0L)).as("bad"))
        .first()
      (r.getLong(0), r.getLong(1))
    }
    require(nFim > nDocs / 3 && nFim < 2 * nDocs / 3,
      s"hash gate far from 50%: $nFim/$nDocs")
    require(nBadMass == 0,
      s"$nBadMass FIM rewrites changed the character mass")
    s"""{"scale":$scale,"n_docs":$nDocs,""" +
      s""""bm25":{"t_build":${fmt(tBuild)},"t_probe":${fmt(tProbe)},"t_scan":${fmt(tScan)}},""" +
      s""""bpe":{"t_train":${fmt(tTrain)},"t_encode":${fmt(tEnc)},"n_tok":$nTok,"n_chars":$nChars},""" +
      s""""cluster_split":{"t":${fmt(tCs)},"n_leaky":$nLeaky},""" +
      s""""boilerplate":{"t":${fmt(tBp)},"n_dropped":$nDropped},""" +
      s""""fim":{"t":${fmt(tFim)},"n_rewritten":$nFim}}"""
  }

  /** Column-chunk bytes for `cols` over every parquet file under a
    * raw directory — [[probedChunkBytes]] for non-catalog paths. */
  private def dirChunkBytes(spark: SparkSession, pathStr: String,
                            cols: Set[String]): Long = {
    import scala.jdk.CollectionConverters._
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val conf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
        try r.getFooter.getBlocks.asScala.map(_.getColumns.asScala
            .filter(cc => cols.contains(cc.getPath.toDotString.split("\\.")(0)))
            .map(_.getTotalSize).sum).sum
        finally r.close()
      }.sum
  }

  /** Product quantization at scale — the BYTES story next to the int8
    * point: the corpus written twice, once as float vectors and once
    * as the packed 8-byte PQ codes, compressed column-chunk sizes
    * compared; then the two-tier probe (ADC scan over the code
    * column, shortlist-50 float re-rank). Corpus = the UNIFORM
    * generator with its planted near-twin pairs: the closed-form gate
    * is that vec 0's twin (vec 1, cosine ≈ 0.999 vs < 0.5 noise
    * neighbors — a margin far above code resolution) survives the ADC
    * shortlist and ranks FIRST after re-rank at every scale. Recall@10
    * vs brute force is reported as data, not gated: beyond the twin,
    * a uniform corpus's top-10 are ~0.3-cosine noise neighbors —
    * legitimately hard for 8-byte codes (the clustered corpus is
    * outright pathological: thousands of same-cluster vectors differ
    * below code resolution; production pairs PQ with an IVF coarse
    * stage for that shape, as the IVF curve table documents). */
  def pqPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{Pq, Similarity}
    val n = 2000L * scale
    val basePath = s"$dir/pq_x$scale"
    genEmbeddings(spark, n).write.mode("overwrite")
      .parquet(s"$basePath/float")
    val emb = spark.read.parquet(s"$basePath/float")
    val corpus = emb.where(col("vec_id") =!= 0)
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    spark.sqlContext.clearCache()
    val (books, tTrain) = timed {
      Pq.trainCodebooks(corpus, "vec_id", "embedding", m = 8, k = 128, iters = 3)
    }
    val (_, tEnc) = timed {
      Pq.encodePacked(corpus, "vec_id", "embedding", books)
        .write.mode("overwrite").parquet(s"$basePath/codes")
    }
    val bytesFloat = dirChunkBytes(spark, s"$basePath/float",
      Set("vec_id", "embedding"))
    val bytesCodes = dirChunkBytes(spark, s"$basePath/codes",
      Set("vec_id", "pq_code"))
    val enc = spark.read.parquet(s"$basePath/codes")
    spark.sqlContext.clearCache()
    val (adcIds, tAdc) = timed {
      Pq.probeTopK(enc, "vec_id", q, books, 50)
        .select(col("vec_id")).collect().map(_.getLong(0))
    }
    spark.sqlContext.clearCache()
    val (rrIds, tRr) = timed {
      Pq.probeTopKReranked(enc, corpus, "vec_id", "embedding", q, books,
        topK = 10, shortlist = 50).select(col("vec_id")).collect()
        .map(_.getLong(0))
    }
    spark.sqlContext.clearCache()
    val (exactIds, tBrute) = timed {
      Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .select(col("vec_id")).collect().map(_.getLong(0))
    }
    val recall = exactIds.toSet.intersect(rrIds.toSet).size
    require(adcIds.contains(1L),
      "planted near-twin fell out of the ADC shortlist")
    require(rrIds.headOption.contains(1L),
      s"planted near-twin must re-rank FIRST, got ${rrIds.take(3).toSeq}")
    require(exactIds.headOption.contains(1L),
      "generator invariant broken: twin not the exact top-1")
    require(adcIds.length == 50, s"ADC shortlist must hold 50 ids")
    s"""{"pq":{"scale":$scale,"n_vecs":$n,"rerank_recall":$recall,""" +
      s""""train":{"t":${fmt(tTrain)}},"encode":{"t":${fmt(tEnc)}},""" +
      s""""float_bytes":$bytesFloat,"code_bytes":$bytesCodes,""" +
      s""""adc_probe":{"t":${fmt(tAdc)}},"rerank":{"t":${fmt(tRr)}},""" +
      s""""brute_force":{"t":${fmt(tBrute)}}}}"""
  }

  /** IVFADC (graft.ext.IvfPq) vs its two parents at the same probe
    * width — the composed probe's bytes-touched must sit BELOW the
    * int8 IVF probe's (same cell fraction, 8-byte code vs d-byte qv)
    * and far below the flat-PQ scan (which reads every code). Bytes
    * are compressed column-chunk sizes over each index's own probed
    * partitions ([[probedChunkBytes]] — both indexes train their own
    * Lloyd cells, so each probe prunes with its own centroids).
    *
    * THE REGIME BOUNDARY this gate encodes (measured, not assumed):
    * 64-bit residual PQ on 64-dim unit vectors resolves cosine to
    * σ ≈ 4e-3 — with a heavy tail: on a 20 k-candidate probe, ~10 %
    * of crowd codes INFLATE past their true cosine by ≥ 7e-3 (ADC
    * scores > 1.0 were observed). A corpus whose near-neighbor
    * margins sit BELOW that resolution (the raw generator's crowd
    * piles 6 k cosines within ±4e-4 of one plateau) defeats ANY
    * shortlist — the planted twins ranked ~2,300 of 21 k by ADC and
    * no k-proportional re-rank can hold that. That is not an IVFADC
    * defect; it is the boundary of the tool: PQ serves corpora whose
    * NN margins exceed code resolution, and sub-resolution margins
    * need the int8/float tiers (which this engine also ships —
    * [[graft.ext.IvfIndex.probeTopKQuantized]]). The gate corpus
    * therefore uses 10× crowd noise (cos deficits ≥ 0.095, ≈ 7σ of
    * ADC resolution — enough to clear the twin's own error draw AND
    * the crowd's inflation tail) so recall grades the REAL miss
    * channels — cell pruning and shortlist retention — not
    * sub-resolution tie-breaking.
    *
    * Gates before numbers print (clustered corpus + TEN planted
    * graded twins of the query at ids 1..10, coord noise ±i·2e-3
    * against the ±5e-1 crowd spread, so the exact top-10 is
    * SEPARABLE truth with margin above code resolution):
    *   - the exact brute-force top-10 IS the twin set (generator
    *     truth) with twin 1 first;
    *   - the IVFADC probe returns twin 1 FIRST with the exact cosine
    *     bit-equal to brute force — the twins' cell was probed, ADC
    *     kept them in the shortlist, re-rank restored order;
    *   - IVFADC top-10 holds ≥ 8 of the ten twins — the byte cut
    *     must not collapse recall.
    */
  def ivfPqPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{IvfIndex, IvfPq, Similarity}
    val n = 2000L * scale
    val pathStr = s"$dir/ivfpq_x$scale"
    // noiseDiv 2e6 = ±0.5/coord crowd noise (10× the shared default):
    // min crowd cosine deficit ≈ 0.095 ≈ 7σ of ADC resolution — the
    // margin must clear BOTH the twin's own quantization-error draw
    // (~2σ, measured −0.024 on one corpus) and the crowd's inflation
    // tail (~4σ over 25 k candidates); ±0.2/coord (margin ≈ 1.3σ) left
    // the twins at the 37th ADC percentile. Clusters stay separated
    // (radius ≈ 2.3 vs inter-center ≈ 6.5).
    genClusteredEmbeddings(spark, n + 1, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(pathStr)
    val emb = spark.read.parquet(pathStr)
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    // Plant vecs 1..10 as graded near-twins (replacing their clustered
    // rows): twin i = q + hash noise ±i·2e-3 per coord — two orders
    // tighter than the ±2e-1 crowd spread, so exact top-10 = twins
    // 1..10 in grade order, with margin ≈ 3σ of ADC resolution.
    val twins = spark.range(1, 11).toDF("vec_id")
      .withColumn("embedding", array(q.zipWithIndex.map { case (v, i) =>
        lit(v) + col("vec_id").cast("float") *
          lit((((i * 2654435761L) % 21) - 10) / 5000.0f)
      }: _*).cast("array<float>"))
    val corpus = emb.where(col("vec_id") > 10).unionByName(twins)
      .localCheckpoint(true)
    val tableQ = s"graft_scale_ivfadc_int8_x$scale"
    val tablePq = s"graft_scale_ivfadc_pq_x$scale"
    // Deployment policy: the cell COUNT grows with the corpus so
    // per-cell population stays bounded (~1250 vectors here) — the
    // probed candidate set, and with it the shortlist's retention
    // burden, then scales with nProbe · cell size instead of the
    // corpus. Probe fraction (1/4) and bits/vector stay constant, so
    // bytes/probe stays the cell fraction × 8 B at every scale.
    val kCells = math.max(16, (n / 1250L).toInt)
    val nProbe = kCells / 4
    val (_, tBuildQ) = timed {
      IvfIndex.build(corpus, "vec_id", "embedding", tableQ,
        k = kCells, iters = 2)
    }
    val (_, tBuildPq) = timed {
      IvfPq.build(corpus, "vec_id", "embedding", tablePq,
        kCells = kCells, ivfIters = 2, m = 8, kPq = 128, pqIters = 3)
    }
    val probedQ =
      Similarity.probeClusters(IvfIndex.centroids(spark, tableQ), q, nProbe)
    val probedPq =
      Similarity.probeClusters(IvfIndex.centroids(spark, tablePq), q, nProbe)
    val bytesInt8 = probedChunkBytes(spark, tableQ, probedQ, Set("vec_id", "qv"))
    val bytesCode = probedChunkBytes(spark, tablePq, probedPq, Set("vec_id", "pq_code"))
    val bytesFloat = probedChunkBytes(spark, tablePq, probedPq, Set("vec_id", "embedding"))
    spark.sqlContext.clearCache()
    val (qRows, tQ) = timed {
      IvfIndex.probeTopKQuantized(spark, tableQ, "vec_id", "embedding", q, 10,
        nProbe = nProbe).collect()
    }
    spark.sqlContext.clearCache()
    val (pqRows, tPq) = timed {
      IvfPq.probeTopK(spark, tablePq, "vec_id", "embedding", q, 10,
        nProbe = nProbe).collect()
    }
    spark.sqlContext.clearCache()
    val (bRows, tBrute) = timed {
      Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10).collect()
    }
    require(bRows.map(_.getLong(0)).toSet == (1L to 10L).toSet &&
        bRows.head.getLong(0) == 1L,
      s"generator invariant broken: exact top-10 must be the twin set, " +
        s"got ${bRows.map(_.getLong(0)).toSeq}")
    require(pqRows.headOption.exists(_.getLong(0) == 1L),
      s"IVFADC must return the planted twin first, got " +
        pqRows.take(3).map(_.getLong(0)).toSeq)
    require(pqRows.head.getDouble(1) == bRows.head.getDouble(1),
      "re-ranked twin score must be the exact cosine, bit-equal to brute force")
    val recall = bRows.map(_.getLong(0)).toSet
      .intersect(pqRows.map(_.getLong(0)).toSet).size
    require(recall >= 8, s"IVFADC recall collapsed: $recall of 10")
    val int8Overlap = bRows.map(_.getLong(0)).toSet
      .intersect(qRows.map(_.getLong(0)).toSet).size
    s"""{"ivfpq":{"scale":$scale,"n_vecs":$n,"recall":$recall,""" +
      s""""int8_recall":$int8Overlap,"k_cells":$kCells,"n_probe":$nProbe,""" +
      s""""build_int8":{"t":${fmt(tBuildQ)}},"build_ivfpq":{"t":${fmt(tBuildPq)}},""" +
      s""""probe_float_chunk_bytes":$bytesFloat,""" +
      s""""probe_int8":{"t":${fmt(tQ)},"chunk_bytes":$bytesInt8},""" +
      s""""probe_ivfpq":{"t":${fmt(tPq)},"chunk_bytes":$bytesCode},""" +
      s""""brute_force":{"t":${fmt(tBrute)}}}}"""
  }

  /** Incremental LM scoring at scale (the LmIndex family's evidence
    * leg — the incrementalDedupPoint shape applied to the bigram LM):
    * an n-doc corpus's LM is INDEXED ONCE, then each arriving 2 %
    * shard is scored by ONE [[graft.ext.LmIndex.probe]] (contact = the
    * shard's touched-w1 postings) vs the status quo of re-running the
    * full-corpus [[graft.ext.TextAnalysis.surprisalStats]] census per
    * shard. Gates before numbers print, both value-exact:
    *   - probe(corpus sample) ≡ surprisalStats(corpus) rows
    *     BIT-FOR-BIT (the index holds exactly the corpus census);
    *   - the shard probe's gram mass is complete (every shard bigram
    *     lands in n_bigrams).
    * The published ratio is build-amortization: per-shard scoring cost
    * vs per-shard full recompute, the same argument the dedup/winnow
    * incremental indexes won on. */
  /** The r22 SCALING-EVIDENCE point (VERDICT r21 #6): at sf0.1 the
    * bench is fixed-overhead bound (the driver's 8-core leg beat 32
    * cores family-wide), so the size-derived layout paths —
    * Writer.scaledBuckets for batch index builds,
    * StreamOps.scaledSinkBuckets for micro-batch sink tables,
    * StreamOps.scaledStatePartitions for stateful streams — had only
    * ever been observed at their clamps' floor (1 bucket / 1 state
    * partition). This point builds the LM index and runs a stateful
    * dedup stream over growing synthetic corpora and publishes the
    * DERIVED counts next to the walls: the evidence is counts growing
    * past 1 with sub-linear walls, i.e. the derivations actually
    * scale instead of merely not hurting at fixture size. */
  def bucketScalingPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.LmIndex
    import graft.streaming.StreamOps
    import graft.io.Writer
    val n = 20000L * scale
    val pathStr = s"$dir/bucket_scaling_x$scale"
    genDocuments(spark, n).write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
    val planBuckets = Writer.scaledBuckets(docs)
    val table = s"graft_scale_buckets_x$scale"
    val (_, tBuild) = timed {
      LmIndex.build(spark, docs, "doc_id", "text", table)
    }
    // What the build actually wrote (the catalog spec probes reuse).
    val catalogBuckets = Writer.bucketsOf(spark, table).getOrElse(-1)
    val stream = spark.readStream.schema(docs.schema).parquet(pathStr)
    val sinkBuckets = StreamOps.scaledSinkBuckets(stream)
    val stateParts = StreamOps.scaledStatePartitions(spark, bytes)
    val nRows = new java.util.concurrent.atomic.AtomicLong(0)
    val (_, tStream) = timed {
      StreamOps.withScaledStatePartitions(spark, bytes) {
        val q = StreamOps.foreachBatchSink(
          StreamOps.dedup(stream.select(col("doc_id")), Seq("doc_id")),
          s"bucket_scaling_stream_x$scale") { (b, _) =>
          nRows.addAndGet(b.count())
        }
        q.awaitTermination()
      }
    }
    require(nRows.get() == n,
      s"stateful dedup must emit every unique id: ${nRows.get()} vs $n")
    s"""{"bucket_scaling":{"scale":$scale,"n_docs":$n,"input_bytes":$bytes,""" +
      s""""plan_buckets":$planBuckets,"catalog_buckets":$catalogBuckets,""" +
      s""""sink_buckets":$sinkBuckets,"state_partitions":$stateParts,""" +
      s""""t_build":${fmt(tBuild)},"t_stream":${fmt(tStream)}}}"""
  }

  def lmIncPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{LmIndex, TextAnalysis}
    val n = 5000L * scale
    val pathStr = s"$dir/lm_inc_x$scale"
    genDocuments(spark, n + n / 50)
      .write.mode("overwrite").parquet(pathStr)
    val all = spark.read.parquet(pathStr)
    val corpus = all.where(col("doc_id") < n)
    val shard = all.where(col("doc_id") >= n).localCheckpoint(true)
    val nShard = shard.count()
    val table = s"graft_scale_lm_x$scale"
    val (_, tBuild) = timed {
      LmIndex.build(spark, corpus, "doc_id", "text", table)
    }
    // Bit-exactness gate at scale: a corpus sample probed against the
    // index must equal the scan-time operator row-for-row.
    val sample = corpus.where(pmod(col("doc_id"), lit(997L)) === 0)
      .localCheckpoint(true)
    val got = LmIndex.probe(spark, table, sample, "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"), col("bits_sum"), col("mean_bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = TextAnalysis.surprisalStats(corpus, "doc_id", "text")
      .join(sample.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    require(got.toSeq == want.toSeq,
      s"index probe diverged from surprisalStats on ${got.length} sampled docs")
    spark.sqlContext.clearCache()
    val (probeRows, tProbe) = timed {
      LmIndex.probe(spark, table, shard, "doc_id", "text")
        .agg(count(lit(1)), sum(col("n_bigrams"))).head()
    }
    spark.sqlContext.clearCache()
    val (_, tRecompute) = timed {
      TextAnalysis.surprisalStats(corpus.unionByName(shard), "doc_id", "text")
        .join(shard.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .agg(count(lit(1)), sum(col("n_bigrams"))).head()
    }
    require(probeRows.getLong(0) == nShard,
      s"shard probe must score every doc: ${probeRows.getLong(0)} vs $nShard")
    s"""{"lm_inc":{"scale":$scale,"n_docs":$n,"n_shard":$nShard,""" +
      s""""build":{"t":${fmt(tBuild)}},"probe_shard":{"t":${fmt(tProbe)}},""" +
      s""""full_recompute":{"t":${fmt(tRecompute)}},""" +
      s""""speedup":${fmt(tRecompute / math.max(tProbe, 1e-9))}}}"""
  }

  /** Batched vs per-query IVFADC serving at scale (the r16 probeBatch
    * evidence leg): 32 held-out queries answered by ONE probeBatch
    * (two corpus contacts total — union-cell code scan + shared float
    * re-rank) vs the 32-iteration probeTopK loop (2 contacts EACH).
    * Gate: per query, the batch rows equal the loop's rows exactly
    * (ids and exact cosines) — a fast wrong batch never prints. The
    * published ratio is the serving win: scan setup, stats reads, and
    * driver round-trips amortize across the batch while the per-row
    * ADC work is the same total. */
  def ivfPqBatchPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.IvfPq
    val n = 2000L * scale
    val nQ = 32
    val pathStr = s"$dir/ivfpq_batch_x$scale"
    genClusteredEmbeddings(spark, n + nQ, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(pathStr)
    val emb = spark.read.parquet(pathStr)
    val queries = emb.where(col("vec_id") < nQ)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq.sortBy(_._1)
    val corpus = emb.where(col("vec_id") >= nQ)
    val table = s"graft_scale_ivfpq_batch_x$scale"
    val kCells = math.max(16, (n / 1250L).toInt)
    val nProbe = kCells / 4
    val (_, tBuild) = timed {
      IvfPq.build(corpus, "vec_id", "embedding", table,
        kCells = kCells, ivfIters = 2, m = 8, kPq = 128, pqIters = 2)
    }
    spark.sqlContext.clearCache()
    val (batchRows, tBatch) = timed {
      IvfPq.probeBatch(spark, table, "vec_id", "embedding", queries,
        k = 10, nProbe = nProbe).collect()
    }
    spark.sqlContext.clearCache()
    val (loopRows, tLoop) = timed {
      queries.map { case (qid, q) =>
        qid -> IvfPq.probeTopK(spark, table, "vec_id", "embedding", q,
          k = 10, nProbe = nProbe).collect()
      }
    }
    val batchByQ = batchRows.groupBy(_.getLong(0))
    val loopByQ = loopRows.toMap
    queries.foreach { case (qid, _) =>
      val b = batchByQ.getOrElse(qid, Array.empty)
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      val l = loopByQ(qid)
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      require(b == l, s"batch != per-query for query $qid:\n$b\nvs\n$l")
    }
    s"""{"ivfpq_batch":{"scale":$scale,"n_vecs":$n,"n_queries":$nQ,""" +
      s""""k_cells":$kCells,"n_probe":$nProbe,"build":{"t":${fmt(tBuild)}},""" +
      s""""batch":{"t":${fmt(tBatch)}},"per_query_loop":{"t":${fmt(tLoop)}},""" +
      s""""speedup":${fmt(tLoop / math.max(tBatch, 1e-9))}}}"""
  }

  /** Incremental DSIR at scale (the r17 LmIndex.dsirProbe evidence
    * leg — the lmIncPoint amortization applied to the importance
    * contrast): a FIXED target LM + a growing raw LM are indexed once;
    * each arriving 2 % shard then pays ONE raw-LM append (its own
    * census) + ONE two-index dsirProbe (touched-w1 postings of each),
    * vs the status quo of re-running dsirContrastBits' TWO full-corpus
    * censuses per shard. Gate before numbers print: the shard's
    * (n_bigrams, n_oov_target, w_bits) rows from the probe equal the
    * scan-time operator's BIT-FOR-BIT (target pred pinned to the fixed
    * target slice). */
  def dsirIncPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{LmIndex, TextAnalysis}
    val n = 5000L * scale
    val pathStr = s"$dir/dsir_inc_x$scale"
    genDocuments(spark, n + n / 50)
      .write.mode("overwrite").parquet(pathStr)
    val all = spark.read.parquet(pathStr)
    val corpus = all.where(col("doc_id") < n)
    val shard = all.where(col("doc_id") >= n).localCheckpoint(true)
    val nShard = shard.count()
    val raw = s"graft_scale_dsir_raw_x$scale"
    val tgt = s"graft_scale_dsir_tgt_x$scale"
    val (_, tBuild) = timed {
      LmIndex.build(spark, corpus, "doc_id", "text", raw)
      LmIndex.build(spark, corpus.where(pmod(col("doc_id"), lit(7L)) === 1),
        "doc_id", "text", tgt)
    }
    spark.sqlContext.clearCache()
    // The raw-LM append is INGEST cost (one shard census, amortized
    // across every consumer of the growing LM — the family's own
    // lm_inc point prices it); timed apart so the published ratio is
    // the per-consumer serving cost the two-index split actually
    // changes: weight the shard via two pruned probes vs re-census
    // both corpora.
    val (_, tAppend) = timed {
      LmIndex.append(spark, raw, shard, "doc_id", "text")
    }
    spark.sqlContext.clearCache()
    val (probed, tProbe) = timed {
      LmIndex.dsirProbe(spark, raw, tgt, shard, "doc_id", "text")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    spark.sqlContext.clearCache()
    val (want, tRecompute) = timed {
      // The status quo: both censuses from scratch over the grown
      // corpus (target pred pinned to the FIXED target slice — the
      // production shape the two-index split encodes).
      TextAnalysis.dsirContrastBits(corpus.unionByName(shard), "doc_id",
          "text", pmod(col("doc_id"), lit(7L)) === 1 && col("doc_id") < n)
        .join(shard.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .orderBy(col("doc_id"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    require(probed == want,
      s"incremental DSIR diverged from the scan-time contrast on $nShard shard docs")
    require(probed.size == nShard,
      s"shard probe must weight every doc: ${probed.size} vs $nShard")
    s"""{"dsir_inc":{"scale":$scale,"n_docs":$n,"n_shard":$nShard,""" +
      s""""build":{"t":${fmt(tBuild)}},"append_shard":{"t":${fmt(tAppend)}},""" +
      s""""probe_shard":{"t":${fmt(tProbe)}},""" +
      s""""full_recompute":{"t":${fmt(tRecompute)}},""" +
      s""""speedup":${fmt(tRecompute / math.max(tProbe, 1e-9))}}}"""
  }

  /** Batched vs per-query serving for the IVF float AND int8 tiers at
    * scale (the r17 IvfIndex.probeBatch evidence leg — the float tier
    * is the serving regime where IVFADC code resolution fails): 32
    * held-out queries answered by ONE float-tier probeBatch (a single
    * union-cell scan — its scores ARE the exact cosines) vs the
    * 32-iteration probeTopK loop (one scan EACH), and by one int8-tier
    * probeBatchQuantized (one qv pre-rank scan + one shared float
    * re-rank) vs the probeTopKQuantized loop (two contacts each).
    * Gate: per query, batch rows equal the loop's rows exactly (ids
    * and exact cosines) — a fast wrong batch never prints. */
  def ivfBatchPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.IvfIndex
    val n = 2000L * scale
    val nQ = 32
    val pathStr = s"$dir/ivf_batch_x$scale"
    genClusteredEmbeddings(spark, n + nQ, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(pathStr)
    val emb = spark.read.parquet(pathStr)
    val queries = emb.where(col("vec_id") < nQ)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq.sortBy(_._1)
    val corpus = emb.where(col("vec_id") >= nQ)
    val table = s"graft_scale_ivf_batch_x$scale"
    val kCells = math.max(16, (n / 1250L).toInt)
    val nProbe = kCells / 4
    val (_, tBuild) = timed {
      IvfIndex.build(corpus, "vec_id", "embedding", table,
        k = kCells, iters = 2)
    }
    def checkEqual(tier: String, batchRows: Array[org.apache.spark.sql.Row],
                   loopRows: Seq[(Long, Array[org.apache.spark.sql.Row])]): Unit = {
      val batchByQ = batchRows.groupBy(_.getLong(0))
      val loopByQ = loopRows.toMap
      queries.foreach { case (qid, _) =>
        val b = batchByQ.getOrElse(qid, Array.empty)
          .map(r => (r.getLong(1), r.getDouble(2))).toSeq
        val l = loopByQ(qid)
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
        require(b == l, s"$tier batch != per-query for query $qid:\n$b\nvs\n$l")
      }
    }
    spark.sqlContext.clearCache()
    val (batchF, tBatchF) = timed {
      IvfIndex.probeBatch(spark, table, "vec_id", "embedding", queries,
        k = 10, nProbe = nProbe).collect()
    }
    spark.sqlContext.clearCache()
    val (loopF, tLoopF) = timed {
      queries.map { case (qid, q) =>
        qid -> IvfIndex.probeTopK(spark, table, "vec_id", "embedding", q,
          k = 10, nProbe = nProbe).collect()
      }
    }
    checkEqual("float", batchF, loopF)
    spark.sqlContext.clearCache()
    val (batchQ, tBatchQ) = timed {
      IvfIndex.probeBatchQuantized(spark, table, "vec_id", "embedding",
        queries, k = 10, nProbe = nProbe).collect()
    }
    spark.sqlContext.clearCache()
    val (loopQ, tLoopQ) = timed {
      queries.map { case (qid, q) =>
        qid -> IvfIndex.probeTopKQuantized(spark, table, "vec_id",
          "embedding", q, k = 10, nProbe = nProbe).collect()
      }
    }
    checkEqual("int8", batchQ, loopQ)
    s"""{"ivf_batch":{"scale":$scale,"n_vecs":$n,"n_queries":$nQ,""" +
      s""""k_cells":$kCells,"n_probe":$nProbe,"build":{"t":${fmt(tBuild)}},""" +
      s""""float":{"batch_t":${fmt(tBatchF)},"loop_t":${fmt(tLoopF)},""" +
      s""""speedup":${fmt(tLoopF / math.max(tBatchF, 1e-9))}},""" +
      s""""int8":{"batch_t":${fmt(tBatchQ)},"loop_t":${fmt(tLoopQ)},""" +
      s""""speedup":${fmt(tLoopQ / math.max(tBatchQ, 1e-9))}}}}"""
  }

  /** Streaming serving loop at scale (the r18 StreamOps.streamServe
    * evidence leg): 64 held-out queries arrive as FOUR micro-batched
    * file shards against a persisted IVF index and are scored through
    * chunked probeBatch (chunkCap 16 — each 16-query batch is one
    * probeBatch call, so the stream's cost decomposes as nBatches ×
    * (probe + sink write) + stream machinery). Published against the
    * ONE-SHOT batch probe of all 64: the stream pays its per-batch
    * accumulation (an idempotent partition write each batch) and the
    * micro-batch scheduler, in exchange for serving queries AS THEY
    * ARRIVE — the ratio is the cost of latency, and the gate is that
    * results are FREE of it: accumulated rows ≡ the one-shot probe
    * exactly. */
  def servePoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.IvfIndex
    import graft.streaming.StreamOps
    val n = 2000L * scale
    val nQ = 64
    val pathStr = s"$dir/serve_x$scale"
    genClusteredEmbeddings(spark, n + nQ, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(s"$pathStr/emb")
    val emb = spark.read.parquet(s"$pathStr/emb")
    val queriesDf = emb.where(col("vec_id") < nQ)
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.where(col("vec_id") >= nQ)
    val table = s"graft_scale_serve_x$scale"
    val kCells = math.max(16, (n / 1250L).toInt)
    val nProbe = kCells / 4
    val (_, tBuild) = timed {
      IvfIndex.build(corpus, "vec_id", "embedding", table,
        k = kCells, iters = 2)
    }
    val queries = queriesDf.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq.sortBy(_._1)
    spark.sqlContext.clearCache()
    val oneShotDf = IvfIndex.probeBatch(spark, table, "vec_id", "embedding",
      queries, k = 10, nProbe = nProbe)
    val (oneShot, tOneShot) = timed { oneShotDf.collect() }
    // Stage 4 one-file shards (16 queries each, vec_id % 4).
    val inDir = s"$pathStr/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    (0 until 4).foreach { i =>
      val w = s"$pathStr/w$i"
      queriesDf.where(pmod(col("vec_id"), lit(4)) === i)
        .coalesce(1).write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $w"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"shard_$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val stream = spark.readStream.schema(queriesDf.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val sink = s"graft_scale_serve_sink_x$scale"
    spark.sqlContext.clearCache()
    val (nBatches, tStream) = timed {
      StreamOps.streamServe(spark, stream, sink, chunkCap = 16,
        oneShotDf.schema, "query_id",
        StreamOps.vectorQueryCollector("vec_id", "embedding"),
        (chunk: Seq[(Long, Seq[Float])]) =>
          IvfIndex.probeBatch(spark, table, "vec_id", "embedding",
            chunk, k = 10, nProbe = nProbe),
        s"scale_serve_x$scale")
    }
    require(nBatches == 4, s"expected 4 micro-batches, got $nBatches")
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val got = spark.table(sink).drop(StreamOps.BatchTag).collect()
    require(keyed(got) == keyed(oneShot),
      "accumulated streaming results diverge from the one-shot batch probe")
    s"""{"serve":{"scale":$scale,"n_vecs":$n,"n_queries":$nQ,""" +
      s""""k_cells":$kCells,"n_probe":$nProbe,"build_t":${fmt(tBuild)},""" +
      s""""oneshot_t":${fmt(tOneShot)},"stream_t":${fmt(tStream)},""" +
      s""""n_batches":$nBatches,"per_batch_t":${fmt(tStream / nBatches)},""" +
      s""""stream_overhead":${fmt(tStream / math.max(tOneShot, 1e-9))}}}"""
  }

  /** Rebalance-under-drift evidence leg (the r18 IvfIndex.rebalance
    * point): a corpus drifts — 25 % new mass arrives as ONE tight
    * blob (near-twins of a single vector), piling into one cell of an
    * index trained before the drift. The census must trip
    * rebalance_due; probes whose queries land IN the hot cell scan
    * the whole pile. Rebalance retrains on the live corpus: the blob
    * gets cells of its own, the hot-cell probe's scanned rows drop
    * toward corpus/k, and answers stay exact (the probe's top-10 ids
    * are the planted twins before AND after — truth by construction).
    * Published per scale: skew milli-ratio before/after, the hot
    * probe's scanned-row count before/after, rebalance wall. */
  def rebalancePoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.IvfIndex
    val n = 2000L * scale
    val nBlob = n / 4
    val basePath = s"$dir/rebalance_x$scale"
    genClusteredEmbeddings(spark, n, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(s"$basePath/base")
    val base = spark.read.parquet(s"$basePath/base")
    // The drift blob: a NEW REGION the pre-drift partition cannot
    // resolve — near-twins of a synthetic direction (hash seed 888)
    // unrelated to the 16 base centers, at ids n..n+nBlob-1. Under the
    // FROZEN pre-drift centroids every blob vector maps to whichever
    // old cell happens to be least-unlike the new direction, piling
    // new mass onto that cell's unrelated base members.
    spark.range(0, nBlob, 1, 32).toDF("i")
      .select((col("i") + n).as("vec_id"),
        transform(sequence(lit(1), lit(64)), j =>
          (((pmod(xxhash64(lit(888L), j), lit(2001L)).cast("double")
              - 1000.0) / 1000.0)
            + (pmod(xxhash64(col("i"), j + 700), lit(21L)).cast("double")
                - 10.0) / 2000.0).cast("float")).as("embedding"))
      .write.mode("overwrite").parquet(s"$basePath/blob")
    val blob = spark.read.parquet(s"$basePath/blob")
    val t = s"graft_scale_rebalance_x$scale"
    val tFresh = s"graft_scale_rebalance_fresh_x$scale"
    val kCells = math.max(16, (n / 1250L).toInt)
    // Train BEFORE the drift (the production sequence), then append
    // the blob through the frozen assignment.
    IvfIndex.build(base, "vec_id", "embedding", t, k = kCells, iters = 2)
    val cents0 = IvfIndex.centroids(spark, t)
    graft.ext.Quantize.withQuantized(
        graft.ext.Similarity.ivfAssign(blob, "vec_id", "embedding", cents0),
        "embedding", "qv")
      .withColumn("qv", col("qv").cast("array<tinyint>"))
      .select(col("vec_id"), col("embedding"), col("qv"), col("cluster_id"))
      .write.insertInto(t)
    spark.catalog.refreshTable(t)
    def skewMilli() = IvfIndex.cellSkew(spark, t, "vec_id")
      .collect().head.getLong(3)
    def hotProbeRows(q: Seq[Float]): Long = {
      val cents = IvfIndex.centroids(spark, t)
      val probe = graft.ext.Similarity.probeClusters(cents, q, kCells / 4)
      spark.table(t).where(col("cluster_id").isin(probe: _*)).count()
    }
    // The drift-region query: blob twin 0's own vector.
    val q = blob.where(col("vec_id") === n)
      .select(col("embedding")).first().getSeq[Float](0).toSeq
    val skewBefore = skewMilli()
    val scanBefore = hotProbeRows(q)
    require(IvfIndex.cellSkew(spark, t, "vec_id", dueMilli = 2000L)
      .collect().head.getLong(4) == 1L,
      "planted drift must trip rebalance_due at the 2x-mean threshold")
    spark.sqlContext.clearCache()
    val (_, tReb) = timed {
      IvfIndex.rebalance(spark, t, "vec_id", "embedding",
        k = kCells, iters = 2)
    }
    val skewAfter = skewMilli()
    val scanAfter = hotProbeRows(q)
    // Post-rebalance the drift query's top-10 must be blob twins —
    // the new layout serves the new region.
    val ids = IvfIndex.probeTopK(spark, t, "vec_id", "embedding", q,
      k = 10, nProbe = kCells / 4).collect().map(_.getLong(0)).toSeq
    require(ids.forall(_ >= n),
      s"post-rebalance top-10 must be the drift twins: $ids")
    // THE gate: rebalance ≡ an independent fresh build on the same
    // corpus — layout-exact (same per-cell counts), Lloyd determinism.
    IvfIndex.build(spark.table(t).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", tFresh, k = kCells, iters = 2)
    val cells = IvfIndex.cellCensus(spark, t, "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val cellsFresh = IvfIndex.cellCensus(spark, tFresh, "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    require(cells == cellsFresh,
      s"rebalanced layout must equal a fresh build's:\n$cells\nvs\n$cellsFresh")
    Seq(tFresh, IvfIndex.centroidsTable(tFresh))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS `$x`"))
    s"""{"rebalance":{"scale":$scale,"n_base":$n,"n_blob":$nBlob,""" +
      s""""k_cells":$kCells,"skew_milli_before":$skewBefore,""" +
      s""""skew_milli_after":$skewAfter,"hot_probe_rows_before":$scanBefore,""" +
      s""""hot_probe_rows_after":$scanAfter,""" +
      s""""layout_equals_fresh_build":true,"rebalance_t":${fmt(tReb)}}}"""
  }

  /** Tier-advisor evidence leg (the r18 TierAdvisor point): the
    * advisor must tell the regimes apart ON CORPORA CONSTRUCTED TO SIT
    * IN THEM — the ivfPqPoint doctrine made adversarial:
    *
    *   - SEPARABLE: clustered corpus, each anchor planted a
    *     hash-perturbed near-twin (±5e-3/coord — the vectorEval twin
    *     recipe) against a ±0.5-noise crowd, so every anchor's top-2
    *     margin is macroscopic. Gate: tier == "ivfadc".
    *   - PLATEAU: every vector is one center + ±5e-4/coord noise —
    *     near-neighbor margins BELOW the measured 4e-3 PQ code
    *     resolution by construction (the corpus shape that defeated
    *     standalone PQ at the ivfPqPoint). Gates: tier != "ivfadc"
    *     AND min_margin < 2 × pq_res AND the separable corpus's
    *     margin exceeds the plateau's.
    *
    * The advise() wall is published per scale — one broadcast-anchor
    * corpus scan, so it must stay ~linear. */
  def advisorPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.TierAdvisor
    val n = 2000L * scale
    val nA = 8
    val sep0 = genClusteredEmbeddings(spark, n, noiseDiv = 2e6)
    // Twins of anchors 0..7 at ids n..n+7: anchor coord + (hash mod
    // 21 − 10)/2000 — double add then the column's float cast.
    val twins = sep0.where(col("vec_id") < nA)
      .select((col("vec_id") + n).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x.cast("double") +
            (pmod(xxhash64(col("vec_id"), i), lit(21L)).cast("double") - 10.0)
              / 2000.0).cast("float")).as("embedding"))
    val sepPath = s"$dir/advisor_sep_x$scale"
    sep0.unionByName(twins).write.mode("overwrite").parquet(sepPath)
    val sep = spark.read.parquet(sepPath)
    val plateauPath = s"$dir/advisor_plateau_x$scale"
    spark.range(0, n, 1, 32).toDF("vec_id")
      .withColumn("embedding", transform(sequence(lit(1), lit(64)), i =>
        (((pmod(xxhash64(lit(99L), i), lit(2001L)).cast("double") - 1000.0)
            / 1000.0)
          + (pmod(xxhash64(col("vec_id"), i + 900), lit(2000001L))
              .cast("double") - 1000000.0) / 2e9).cast("float")))
      .write.mode("overwrite").parquet(plateauPath)
    val plateau = spark.read.parquet(plateauPath)
    def run(c: org.apache.spark.sql.DataFrame) = {
      spark.sqlContext.clearCache()
      timed {
        TierAdvisor.advise(c, "vec_id", "embedding",
          c.where(col("vec_id") < nA)).collect().head
      }
    }
    val (rSep, tSep) = run(sep)
    val (rPl, tPl) = run(plateau)
    require(rSep.getString(5) == "ivfadc",
      s"separable corpus must recommend ivfadc: $rSep")
    require(rPl.getString(5) != "ivfadc",
      s"plateau corpus must NOT recommend ivfadc: $rPl")
    require(rPl.getLong(1) < 2L * rPl.getLong(3),
      s"plateau margin must sit below 2x pq_res: $rPl")
    require(rSep.getLong(1) > rPl.getLong(1),
      s"separable margin must exceed plateau margin: $rSep vs $rPl")
    s"""{"advisor":{"scale":$scale,"n_vecs":$n,"n_anchors":$nA,""" +
      s""""separable":{"t":${fmt(tSep)},"min_margin_micro":${rSep.getLong(1)},""" +
      s""""int8_err_micro":${rSep.getLong(2)},"tier":"${rSep.getString(5)}"},""" +
      s""""plateau":{"t":${fmt(tPl)},"min_margin_micro":${rPl.getLong(1)},""" +
      s""""int8_err_micro":${rPl.getLong(2)},"tier":"${rPl.getString(5)}"}}}"""
  }

  /** Operating-point advisor evidence leg (the r19 OperatingPoint):
    * the recall-vs-nProbe curve measured with LLOYD-TRAINED centroids
    * (the production input) on a clustered corpus at growing scale.
    * Gates at every scale: the overlap is MONOTONE in nProbe, the
    * full-width point (nProbe = kCells) is the exact truth (recall
    * 1000 milli — probing every cell IS the unrestricted top-k), and
    * the recommendation is the smallest sampled point clearing the
    * target. The published wall is the whole curve: ONE corpus scan
    * (broadcast anchors × broadcast anchor-cell rank frame, per-cell
    * WindowGroupLimit to k rows pre-shuffle) + bounded arithmetic over
    * the staged anchors·cells·k frame — it must stay ~linear in n
    * even as the SAMPLED POINTS multiply, because the points never
    * re-touch the corpus. */
  def opointPoint(spark: SparkSession, dir: String, scale: Int): String = {
    val n = 2000L * scale
    val nA = 8
    val basePath = s"$dir/opoint_x$scale"
    genClusteredEmbeddings(spark, n, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(basePath)
    val corpus = spark.read.parquet(basePath)
    val kCells = math.max(16, (n / 1250L).toInt)
    val cents = Similarity.ivfTrain(corpus, "vec_id", "embedding",
      kCells, iters = 2)
    val nProbes = Seq(1, 2, math.max(4, kCells / 4), kCells).distinct.sorted
    spark.sqlContext.clearCache()
    val (rows, tCurve) = timed {
      graft.ext.OperatingPoint.nProbeCurve(corpus, "vec_id", "embedding",
          corpus.where(col("vec_id") < nA), cents, nProbes, k = 10,
          targetRecallMilli = 950L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
          if (r.isNullAt(7)) -1L else r.getLong(7)))
        .toSeq
    }
    require(rows.map(_._2) == rows.map(_._2).sorted,
      s"overlap must be monotone in nProbe: $rows")
    require(rows.last._3 == 1000L && rows.last._2 == nA * 10L,
      s"full-width probe must be the truth: $rows")
    val expectRec = rows.find(_._3 >= 950L).map(_._1).getOrElse(-1L)
    require(rows.forall(_._4 == expectRec),
      s"recommendation must be the smallest clearing point: $rows")
    val curveJson = rows.map { case (np, ov, rm, _) =>
      s"""{"n_probe":$np,"overlap":$ov,"recall_milli":$rm}"""
    }.mkString("[", ",", "]")
    // The width half of the same question (r19 shortlistCurve): at the
    // production probe width, how wide must the int8 shortlist be?
    // Gate: overlap monotone in width (a wider shortlist can only add
    // candidates); recall at the widest sample published honestly —
    // the int8 ordering's quality on this corpus's geometry, not a
    // constant anyone promised.
    spark.sqlContext.clearCache()
    val (slRows, tSl) = timed {
      graft.ext.OperatingPoint.shortlistCurve(corpus, "vec_id",
          "embedding", corpus.where(col("vec_id") < nA), cents,
          nProbe = math.max(4, kCells / 4),
          shortlists = Seq(10, 40, 160), k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSeq
    }
    require(slRows.map(_._2) == slRows.map(_._2).sorted,
      s"overlap must be monotone in shortlist width: $slRows")
    val slJson = slRows.map { case (sl, ov, rm) =>
      s"""{"shortlist":$sl,"overlap":$ov,"recall_milli":$rm}"""
    }.mkString("[", ",", "]")
    s"""{"opoint":{"scale":$scale,"n_vecs":$n,"k_cells":$kCells,""" +
      s""""n_anchors":$nA,"curve":$curveJson,""" +
      s""""recommended_n_probe":$expectRec,"curve_t":${fmt(tCurve)},""" +
      s""""shortlist_curve":$slJson,"shortlist_t":${fmt(tSl)}}}"""
  }

  /** Vector-drift census evidence leg (the r19 IvfIndex.cellDrift):
    * the rebalancePoint corpus recipe — train BEFORE the drift,
    * persist the reference cell census, append a new-region blob
    * through the frozen assignment — but asking the MONITORING
    * question: does the census contrast localize the blob at CENSUS
    * cost (one id-column scan of the index, ≤ k rows out, k-row
    * arithmetic after), before any rebalance runs? Gates: the blob's
    * landing cell carries a POSITIVE drift_score and the MAX
    * drift_score of any cell; the contrast conserves mass
    * (Σn_new − Σn_old = blob size). The census wall is published per
    * scale — the monitoring tick a 100 TB operator pays repeatedly,
    * which must stay the cost of one column scan. */
  /** Ops-loop evidence leg (the r19 IndexOps additions): the
    * takedown AUDIT, the FRESHNESS census, and the state JANITOR
    * measured against index state that grows 1× → 10× → 50× while
    * the audited id set stays FIXED (1000 ids) — the walls must
    * track the corpus-sized scans each op honestly declares (audit /
    * freshness: one id-column scan per family) or stay flat where
    * the op is metadata-priced (orphan census: file STATUSES, never
    * contents — file count tracks the bucket layout, not rows).
    * Index state is built via buildFromBands with synthetic band
    * rows (the documented precomputed-bands path): the ops under
    * test only ever touch the id column, and paying minhash here
    * would time the dedup family's business, not this one's. Every
    * count gate is exact at every scale — two families over
    * OVERLAPPING id ranges, takedown registered on one, so the audit
    * must expose the missed family's overlap hits precisely. */
  def opsPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{IndexOps, PurgeSwap}
    val n = 200000L * scale
    val tA = s"graft_scale_ops_a_x$scale"
    val tB = s"graft_scale_ops_b_x$scale"
    // Drop-at-entry (ADVICE r19): a run killed between the orphan
    // plant below and the vacuum leaves the staging behind, and the
    // end-of-run cleanup never happens — the NEXT run's saveAsTable
    // would fail TableAlreadyExists. Slate-drop every table this
    // point writes (dropTableAndLocation, the gate-fixture rule: a
    // bare DROP TABLE can leave the warehouse directory behind).
    Seq(tA, tB).flatMap(t => Seq(t, PurgeSwap.stagingOf(t),
        graft.ext.IndexLifecycle.tombstonesOf(t)))
      .foreach(graft.io.Writer.dropTableAndLocation(spark, _))
    def bands(from: Long, until: Long) =
      spark.range(from, until, 1, 32).toDF("id")
        .select(col("id"), explode(sequence(lit(0), lit(3))).as("band_id"))
        .select(col("id"), col("band_id").cast("int").as("band_id"),
          xxhash64(col("id"), col("band_id")).as("band_hash"))
    graft.ext.DedupIndex.buildFromBands(bands(0L, n), tA)
    graft.ext.DedupIndex.buildFromBands(bands(n / 2, n + n / 2), tB)
    val entries = Seq(
      IndexOps.Entry("a", tA),
      IndexOps.Entry("b", tB))
    val step = n / 1000L
    val ids = spark.range(0, 1000, 1, 8)
      .select((col("id") * step + 7L).as("id"))
    val expB = (0L until 1000L).count(i => i * step + 7L >= n / 2)
    graft.ext.DedupIndex.delete(spark, tA, ids)
    spark.sqlContext.clearCache()

    val (audit, tAudit) = timed {
      IndexOps.takedownAudit(spark, entries, ids).collect()
        .map(r => r.getString(0) -> r).toMap
    }
    def ga(f: String, c: String) = audit(f).getAs[Long](c)
    require(ga("a", "tombstoned") == 1000L && ga("a", "present_ids") == 1000L &&
      ga("a", "visible_ids") == 0L, audit("a").toString)
    require(ga("b", "tombstoned") == 0L && ga("b", "present_ids") == expB &&
      ga("b", "visible_ids") == expB, audit("b").toString)

    val corpus = spark.range(0, n, 1, 32).toDF("id")
    val (fresh, tFresh) = timed {
      IndexOps.freshness(spark, entries, corpus).collect()
        .map(r => r.getString(0) -> r).toMap
    }
    def gf(f: String, c: String) = fresh(f).getAs[Long](c)
    require(gf("a", "n_missing") == 0L && gf("a", "stale") == 0L,
      fresh("a").toString)
    require(gf("b", "n_indexed") == n / 2 && gf("b", "n_missing") == n / 2 &&
      gf("b", "stale") == 1L, fresh("b").toString)

    // Plant a crashed-STAGE orphan: a full copy of A's index — at
    // 100 TB this IS a 100 TB copy, which is the point.
    spark.table(tA).write.format("parquet")
      .saveAsTable(PurgeSwap.stagingOf(tA))
    val (cen, tCensus) = timed {
      IndexOps.orphanCensus(spark, entries).collect()
        .map(r => r.getString(0) -> r).toMap
    }
    val orphanBytes = cen("a").getAs[Long]("orphan_bytes")
    require(cen("a").getAs[Long]("n_orphans") == 1L && orphanBytes > 0L,
      cen("a").toString)
    require(cen("b").getAs[Long]("n_orphans") == 0L, cen("b").toString)
    val (vac, tVacuum) = timed {
      IndexOps.vacuum(spark, entries).collect()
        .map(r => r.getString(0) -> r).toMap
    }
    require(vac("a").getAs[Long]("dropped") == 1L &&
      vac("a").getAs[Long]("bytes_reclaimed") == orphanBytes &&
      vac("a").getAs[Long]("residual") == 0L, vac("a").toString)

    Seq(tA, tB).flatMap(t => Seq(t, PurgeSwap.stagingOf(t),
        graft.ext.IndexLifecycle.tombstonesOf(t)))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS `$x`"))
    s"""{"ops":{"scale":$scale,"n_ids":$n,"n_audited":1000,""" +
      s""""overlap_hits":$expB,"audit_t":${fmt(tAudit)},""" +
      s""""fresh_t":${fmt(tFresh)},"orphan_census_t":${fmt(tCensus)},""" +
      s""""orphan_bytes":$orphanBytes,"vacuum_t":${fmt(tVacuum)}}}"""
  }

  /** `curation-stream-only`: the streaming curation pipeline
    * (Curation.streamCurate) at corpus scale — the composition's
    * claim is "per-batch contact = the batch's own per-row work plus
    * one fingerprint-column anti-join against the accumulated index",
    * so the wall must track the corpus while every count stays EXACT.
    * Synthetic corpus: n = 20000·m docs, every 4th an exact dup of an
    * earlier text (ids ≡ 3 mod 4 repeat id−3's text), all texts
    * gate-passing by construction (24 tokens, one stopword, distinct
    * words, avg length in band — the CurationSpec recipe), five
    * id-keyed shard files → five micro-batches. Gates: 5 batches,
    * survivors = distinct texts = 3n/4 (exact — survivor IDENTITY
    * depends on arrival order, the COUNT does not), fingerprint index
    * = one row per distinct text, token mass = 24·survivors. */
  def curationStreamPoint(spark: SparkSession, dir: String,
                          scale: Int): String = {
    import java.nio.file.{Files, Paths}
    val n = 20000L * scale
    val sink = s"graft_scale_curation_x$scale"
    Seq(sink, graft.ext.Curation.fingerprintIndexOf(sink))
      .foreach(graft.io.Writer.dropTableAndLocation(spark, _))
    // ADVICE r20: the synthesized word grew with the id's digit count,
    // so past scale 50 (ids ≥ 10⁷) n_cns crossed the quality gate's
    // 10·n_tok band and the point's own require(survivors == expected)
    // threw — a SILENT cliff just past the documented maximum. Fixed
    // two ways: the id is lpad'd to 6 digits (doc length is now
    // scale-INVARIANT through the full documented range — n_cns = 224,
    // inside [3·24, 10·24] = [72, 240]; a wider pad cannot fit the
    // 10-chars-per-token band at 24 tokens), and scales past the 6
    // digits' 10⁶-id capacity are REFUSED loudly here instead of
    // failing downstream in the gate band.
    require(scale <= 50,
      s"curationStreamPoint supports scale <= 50 (ids must fit 6 digits " +
        s"for scale-invariant doc length inside the quality gate band); got $scale")
    val base = when(pmod(col("id"), lit(4)) === 3, col("id") - 3)
      .otherwise(col("id"))
    val docs = spark.range(0, n, 1, 32).toDF("id")
      .select(col("id").as("doc_id"),
        concat(lit("the "),
          array_join(transform(sequence(lit(1), lit(23)), j =>
            concat(lit("w"), lpad(base.cast("string"), 6, "0"), lit("x"),
              j.cast("string"))), " ")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val ioBase = Files.createTempDirectory("graft_scale_curation_").toString
    val inDir = s"$ioBase/in"
    Files.createDirectories(Paths.get(inDir))
    (0 until 5).foreach { k =>
      val w = s"$ioBase/w$k"
      docs.where(pmod(col("doc_id"), lit(5)) === k)
        .coalesce(1).write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part under $w"))
      Files.move(part.toPath, Paths.get(inDir, s"shard_$k.parquet"))
    }
    spark.sqlContext.clearCache()
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val ((acc, nBatches), wall) = timed {
      graft.ext.Curation.streamCurate(spark, sink, stream,
        "doc_id", "text", queryName = s"scale_curation_x$scale")
    }
    require(nBatches == 5, s"expected 5 micro-batches, got $nBatches")
    val expected = n - n / 4
    val got = acc.agg(count(lit(1)), coalesce(sum(col("n_tok")), lit(0L)))
      .first()
    require(got.getLong(0) == expected,
      s"survivors ${got.getLong(0)} != $expected")
    require(got.getLong(1) == 24L * expected,
      s"token mass ${got.getLong(1)} != ${24L * expected}")
    val fpRows = spark.table(graft.ext.Curation.fingerprintIndexOf(sink))
      .count()
    require(fpRows == expected, s"fp index $fpRows != $expected")
    Seq(sink, graft.ext.Curation.fingerprintIndexOf(sink))
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS `$x`"))
    s"""{"curation_stream":{"scale":$scale,"n_docs":$n,"batches":5,""" +
      s""""survivors":$expected,"wall_s":${fmt(wall)}}}"""
  }

  def vecDriftPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.IvfIndex
    val n = 2000L * scale
    val nBlob = n / 4
    val basePath = s"$dir/vecdrift_x$scale"
    genClusteredEmbeddings(spark, n, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(s"$basePath/base")
    val base = spark.read.parquet(s"$basePath/base")
    spark.range(0, nBlob, 1, 32).toDF("i")
      .select((col("i") + n).as("vec_id"),
        transform(sequence(lit(1), lit(64)), j =>
          (((pmod(xxhash64(lit(888L), j), lit(2001L)).cast("double")
              - 1000.0) / 1000.0)
            + (pmod(xxhash64(col("i"), j + 700), lit(21L)).cast("double")
                - 10.0) / 2000.0).cast("float")).as("embedding"))
      .write.mode("overwrite").parquet(s"$basePath/blob")
    val blob = spark.read.parquet(s"$basePath/blob")
    val t = s"graft_scale_vecdrift_x$scale"
    val kCells = math.max(16, (n / 1250L).toInt)
    IvfIndex.build(base, "vec_id", "embedding", t, k = kCells, iters = 2)
    // Snapshot time: the reference census, persisted (staged here).
    val reference = graft.ext.Checkpoints.stage(
      IvfIndex.cellCensus(spark, t, "vec_id"))
    val cents0 = IvfIndex.centroids(spark, t)
    graft.ext.Quantize.withQuantized(
        graft.ext.Similarity.ivfAssign(blob, "vec_id", "embedding", cents0),
        "embedding", "qv")
      .withColumn("qv", col("qv").cast("array<tinyint>"))
      .select(col("vec_id"), col("embedding"), col("qv"), col("cluster_id"))
      .write.insertInto(t)
    spark.catalog.refreshTable(t)
    spark.sqlContext.clearCache()
    val (drift, tDrift) = timed {
      IvfIndex.cellDrift(spark, t, "vec_id", reference).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
        .toSeq
    }
    val blobCell = spark.table(t).where(col("vec_id") === n)
      .select(col("cluster_id")).first().getInt(0).toLong
    val blobRow = drift.find(_._1 == blobCell).get
    require(blobRow._4 > 0L,
      s"blob cell $blobCell must carry positive drift_score: $drift")
    require(blobRow._4 == drift.map(_._4).max,
      s"blob cell $blobCell must carry the max drift_score: $drift")
    val gained = drift.map(r => r._3 - r._2).sum
    require(gained == nBlob,
      s"contrast must conserve the blob mass: gained $gained != $nBlob")
    Seq(t, IvfIndex.centroidsTable(t), t + "_tombstones")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS `$x`"))
    s"""{"vec_drift":{"scale":$scale,"n_base":$n,"n_blob":$nBlob,""" +
      s""""k_cells":$kCells,"blob_cell":$blobCell,""" +
      s""""blob_drift_score":${blobRow._4},"census_t":${fmt(tDrift)}}}"""
  }

  /** Multi-metric drift evidence leg (the r19 Drift.censusMulti):
    * three metric grids censused in ONE pass per snapshot vs three
    * single-metric Drift.census calls, on a synthetic numeric corpus
    * (hash-derived metric columns, even/odd id halves as the two
    * snapshots). Gates at every scale: the multi output's per-metric
    * slice EQUALS the single-metric census row-for-row — the operator
    * is a scan-sharing rewrite, never a semantic change. Both walls
    * are published: the single-pass wall must track ONE corpus scan
    * as metrics are added, not one per metric (the 3× the operator
    * exists to avoid). */
  def multiDriftPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.Drift
    val n = 500000L * scale
    val basePath = s"$dir/multidrift_x$scale"
    spark.range(0, n, 1, 32).toDF("id")
      .select(col("id"),
        pmod(xxhash64(col("id"), lit(1)), lit(1009L)).cast("double").as("m1"),
        pmod(xxhash64(col("id"), lit(2)), lit(5003L)).cast("double").as("m2"),
        pmod(xxhash64(col("id"), lit(3)), lit(101L)).cast("double").as("m3"))
      .write.mode("overwrite").parquet(basePath)
    val rows = spark.read.parquet(basePath)
    val old = rows.where(pmod(col("id"), lit(2L)) === 0)
    val nw = rows.where(pmod(col("id"), lit(2L)) === 1)
    val metrics = Seq(
      Drift.Metric("m1", col("m1"), 64.0, 16),
      Drift.Metric("m2", col("m2"), 320.0, 16),
      Drift.Metric("m3", col("m3"), 8.0, 16))
    spark.sqlContext.clearCache()
    val (multi, tMulti) = timed {
      Drift.censusMulti(old, nw, metrics).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    }
    spark.sqlContext.clearCache()
    val (singles, tSingles) = timed {
      metrics.map { m =>
        Drift.census(old, nw, m.value, m.bucketWidth, m.maxBucket).collect()
          .map(r => (m.name, r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      }
    }
    metrics.zip(singles).foreach { case (m, single) =>
      require(multi.filter(_._1 == m.name) == single,
        s"metric ${m.name}: multi slice diverges from the single census")
    }
    s"""{"multi_drift":{"scale":$scale,"n_rows":$n,"n_metrics":3,""" +
      s""""multi_t":${fmt(tMulti)},"three_singles_t":${fmt(tSingles)}}}"""
  }

  /** Physical-purge cost at scale (VERDICT r14/r15 #1's evidence leg):
    * the stage-and-swap / dynamic-partition-overwrite purge must write
    * bytes PROPORTIONAL TO THE TOUCHED CELLS, never the corpus. Two
    * takedown waves against one cell-partitioned IVF index:
    *
    *   - wave 1: 25 ids out of ONE cell — the routine takedown shape.
    *     Gate: the file listings of every untouched cell directory are
    *     byte-identical before/after (names, mtimes, lengths — nothing
    *     was rewritten), and the rewritten bytes stay within 3× of the
    *     one-cell share (totalBytes/kCells).
    *   - wave 2: one id in EVERY cell — the worst case, where touched
    *     ≡ corpus and the rewrite is legitimately full-size.
    *
    * Both waves gate answer-stability (the probe's top-10 after delete
    * equals the top-10 after purge, bit-for-bit ids). The r14 purge
    * paid wave-2 cost (full corpus-sized snapshot + rewrite) on EVERY
    * wave; the ratio wave1_bytes/wave2_bytes ≈ 1/kCells is the point. */
  def purgePoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.IvfIndex
    import spark.implicits._
    val n = 2000L * scale
    val pathStr = s"$dir/purge_x$scale"
    genClusteredEmbeddings(spark, n, noiseDiv = 2e6)
      .write.mode("overwrite").parquet(pathStr)
    val emb = spark.read.parquet(pathStr)
    val table = s"graft_scale_purge_x$scale"
    val kCells = math.max(16, (n / 1250L).toInt)
    val (_, tBuild) = timed {
      IvfIndex.build(emb, "vec_id", "embedding", table, k = kCells, iters = 1)
    }
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(): Map[String, Set[(String, Long, Long)]] =
      fs.listStatus(loc).filter(_.isDirectory).map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath)
          .filter(s => !s.getPath.getName.startsWith("_"))
          .map(s => (s.getPath.getName, s.getModificationTime, s.getLen))
          .toSet
      }.toMap
    def changedBytes(before: Map[String, Set[(String, Long, Long)]],
                     after: Map[String, Set[(String, Long, Long)]])
        : (Set[String], Long) = {
      val changed = (before.keySet ++ after.keySet)
        .filter(d => before.get(d) != after.get(d))
      (changed, changed.toSeq.map(d =>
        after.get(d).map(_.toSeq.map(_._3).sum).getOrElse(0L)).sum)
    }
    val totalBytes = listing().values.flatten.map(_._3).sum
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    def top(): Seq[Long] =
      IvfIndex.probeTopK(spark, table, "vec_id", "embedding", q, 10,
        nProbe = kCells).collect().map(_.getLong(0)).toSeq
    // Wave 1: routine takedown, 25 ids confined to one cell.
    val victimCell = spark.table(table)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc).first().getInt(0)
    IvfIndex.delete(spark, table,
      spark.table(table).where(col("cluster_id") === victimCell)
        .select(col("vec_id").as("id")).orderBy(col("id")).limit(25))
    val expected1 = top()
    val before1 = listing()
    val (removed1, t1) = timed {
      IvfIndex.purgeTombstones(spark, table, "vec_id")
    }
    val (changed1, bytes1) = changedBytes(before1, listing())
    require(removed1 == 25L, s"wave 1 must remove 25 rows, got $removed1")
    require(changed1 == Set(s"cluster_id=$victimCell"),
      s"wave 1 touched one cell but rewrote $changed1")
    // Proportionality gate: the rewrite is bounded by the touched
    // cell's OWN pre-purge size (cells are uneven — 80 Lloyd cells
    // over 16 natural clusters — so total/kCells is the wrong yard-
    // stick), and is clearly sub-corpus.
    val victimBytes = before1(s"cluster_id=$victimCell").toSeq.map(_._3).sum
    require(bytes1 <= victimBytes * 3 / 2 + 1024,
      s"wave-1 purge wrote $bytes1 B — more than the touched cell's " +
        s"own $victimBytes B")
    require(bytes1 * 4 <= totalBytes,
      s"wave-1 purge wrote $bytes1 B of $totalBytes B — not a " +
        "touched-cells write")
    require(top() == expected1, "wave-1 purge changed probe answers")
    // Wave 2: one id tombstoned in EVERY cell — touched ≡ corpus.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col("vec_id"))
    IvfIndex.delete(spark, table,
      spark.table(table)
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("vec_id").as("id")))
    val expected2 = top()
    val before2 = listing()
    val (removed2, t2) = timed {
      IvfIndex.purgeTombstones(spark, table, "vec_id")
    }
    val (changed2, bytes2) = changedBytes(before2, listing())
    require(removed2 == kCells.toLong,
      s"wave 2 must remove one row per cell, got $removed2")
    require(top() == expected2, "wave-2 purge changed probe answers")
    s"""{"purge":{"scale":$scale,"n_vecs":$n,"k_cells":$kCells,""" +
      s""""table_bytes":$totalBytes,"build":{"t":${fmt(tBuild)}},""" +
      s""""wave1_one_cell":{"removed":$removed1,"touched_cells":${changed1.size},""" +
      s""""bytes_written":$bytes1,"t":${fmt(t1)}},""" +
      s""""wave2_all_cells":{"removed":$removed2,"touched_cells":${changed2.size},""" +
      s""""bytes_written":$bytes2,"t":${fmt(t2)}},""" +
      s""""wave1_byte_fraction":${fmt(bytes1.toDouble / totalBytes)}}}"""
  }

  /** AQE-native skew-join vs the manual salted join, head to head
    * (VERDICT r14 #8): one viral-key fact table (50 % of rows on one
    * key — the duplicated-template/viral-doc shape) equi-joined to a
    * 10 k-key dim, three ways, broadcast DISABLED both planner- and
    * AQE-side (at 100 TB the dim side often can't broadcast — with a
    * broadcast the skew question vanishes, which is always the first
    * answer when it fits):
    *
    *   - `plain`: shuffle join with AQE skew handling OFF — the
    *     degenerate baseline where one reducer owns half the fact
    *     table;
    *   - `aqe`: AQE skew-join ON, detector thresholds rescaled to
    *     bench bytes (2 MB threshold / 1 MB advisory stand in for the
    *     256 MB / 64 MB production defaults — same factor-of-bytes
    *     semantics at 1/128 the data);
    *   - `salted`: [[graft.ext.Skew.saltedJoin]] at salt 32 — the
    *     explicit rewrite that also covers what AQE cannot reach
    *     (skewed AGGREGATION keys, and layouts that must keep a
    *     deterministic clustering).
    *
    * All three legs gate on identical (row count, checksum) — a fast
    * wrong join never prints. The per-leg walls plus whether AQE's
    * runtime plan actually engaged its skew reader are the published
    * point; the BENCH_NOTES paragraph reads the trade. */
  /** The relational shuffle-heavy point (VERDICT r17 #5): the TPC-H
    * Q3 shape x_shipping_priority runs at sf0.1 — selective dim filter
    * → 3-way join → keyed agg → top-10 — measured here at 1×/10×/50×
    * on deterministic TPC-H-shaped tables (hash-keyed, ~4 lineitems
    * per order, 5 market segments, 730-day calendar; every column a
    * pure function of the row id, so the truth is fixed per scale).
    *
    * Two legs answer the two scale questions:
    *   - DEFAULT (AQE + broadcast): the plan the engine actually runs —
    *     the filtered customer side must broadcast (no shuffle of the
    *     fact side by the dim key) and the top-10 must be
    *     TakeOrderedAndProject, never a global sort. Plan markers are
    *     REQUIRED, not just reported.
    *   - SMJ (broadcast disabled): the all-shuffle fallback a 100 TB
    *     dim side would force; its result must equal the broadcast
    *     leg's EXACTLY (same decimal-exact revenue doubles from a
    *     different physical plan — the cross-plan determinism gate,
    *     a stronger check than a checksum).
    *
    * Published per scale: both walls, both shuffle-byte counts (the
    * broadcast win made measurable), the 10-row gate, and the
    * cross-plan equality bit. */
  def relationalPoint(spark: SparkSession, dir: String, scale: Int): String = {
    val nCust = 5000L * scale
    val nOrd = 50000L * scale
    val nLine = 200000L * scale
    val base = s"$dir/relational_x$scale"
    spark.range(0, nCust, 1, 32)
      .select(col("id").as("c_custkey"),
        concat(lit("S"), pmod(xxhash64(col("id"), lit(10)), lit(5)))
          .as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$base/customer")
    spark.range(0, nOrd, 1, 32)
      .select(col("id").as("o_orderkey"),
        pmod(xxhash64(col("id"), lit(11)), lit(nCust)).as("o_custkey"),
        pmod(xxhash64(col("id"), lit(12)), lit(730)).cast("int")
          .as("o_orderdate"),
        concat(lit("P"), pmod(xxhash64(col("id"), lit(13)), lit(5)))
          .as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$base/orders")
    spark.range(0, nLine, 1, 32)
      .select(col("id").as("l_linekey"),
        pmod(xxhash64(col("id"), lit(14)), lit(nOrd)).as("l_orderkey"),
        pmod(xxhash64(col("id"), lit(15)), lit(730)).cast("int")
          .as("l_shipdate"),
        (pmod(xxhash64(col("id"), lit(16)), lit(90000L)) / lit(100.0) +
          lit(100.0)).as("l_extendedprice"),
        (pmod(xxhash64(col("id"), lit(17)), lit(10L)) / lit(100.0))
          .as("l_discount"))
      .write.mode("overwrite").parquet(s"$base/lineitem")
    def q3(): DataFrame = spark.read.parquet(s"$base/customer")
      .where(col("c_mktsegment") === "S0")
      .join(spark.read.parquet(s"$base/orders")
          .where(col("o_orderdate") < 365),
        col("c_custkey") === col("o_custkey"))
      .join(spark.read.parquet(s"$base/lineitem")
          .where(col("l_shipdate") >= 365),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
    spark.sqlContext.clearCache()
    val dfA = q3()
    val (rowsA, tA, bytesA) = withShuffleBytes(spark) { dfA.collect() }
    val planA = dfA.queryExecution.executedPlan.toString
    require(planA.contains("BroadcastHashJoin"),
      s"default leg must broadcast the filtered dim side:\n$planA")
    require(planA.contains("TakeOrderedAndProject"),
      s"top-10 must be TakeOrderedAndProject, not a global sort:\n$planA")
    spark.sqlContext.clearCache()
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    val (rowsB, tB, bytesB, planB) =
      try {
        spark.conf.set(key, "-1")
        val dfB = q3()
        val (r, t, b) = withShuffleBytes(spark) { dfB.collect() }
        (r, t, b, dfB.queryExecution.executedPlan.toString)
      } finally spark.conf.set(key, saved)
    require(!planB.contains("BroadcastHashJoin") &&
      planB.contains("SortMergeJoin"),
      s"SMJ leg must run broadcast-free:\n$planB")
    require(rowsA.length == 10, s"expected 10 rows, got ${rowsA.length}")
    require(rowsA.toSeq == rowsB.toSeq,
      "cross-plan determinism gate: broadcast and SMJ legs disagree:\n" +
        s"${rowsA.mkString("\n")}\nvs\n${rowsB.mkString("\n")}")
    s"""{"scale":$scale,"n_customer":$nCust,"n_orders":$nOrd,""" +
      s""""n_lineitem":$nLine,"broadcast":{"t":${fmt(tA)},""" +
      s""""shuffle_bytes":$bytesA},"smj":{"t":${fmt(tB)},""" +
      s""""shuffle_bytes":$bytesB},"n_rows":${rowsA.length},""" +
      s""""cross_plan_equal":true}"""
  }

  def skewJoinPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import spark.implicits._
    val n = 1000000L * scale
    val nKeys = 10000L
    val pathL = s"$dir/skewjoin_left_x$scale"
    val pathR = s"$dir/skewjoin_right_x$scale"
    spark.range(0, n, 1, 32).toDF("row_id")
      .withColumn("key", when(pmod(col("row_id"), lit(2L)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("row_id")), lit(nKeys))))
      .withColumn("payload", xxhash64(col("row_id"), lit(1)))
      .write.mode("overwrite").parquet(pathL)
    spark.range(0, nKeys, 1, 4).toDF("key")
      .withColumn("dim_payload", xxhash64(col("key")))
      .write.mode("overwrite").parquet(pathR)
    val left = spark.read.parquet(pathL)
    val right = spark.read.parquet(pathR)
    def withConfs[T](confs: Map[String, String])(f: => T): T = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // EVERY leg shares the no-broadcast confs AND the rescaled
    // advisory/threshold — the ONLY knob that differs between the
    // plain and aqe legs is skewJoin.enabled, so the measured gap is
    // the skew split and nothing else (a first cut of this point left
    // the plain leg on the default 64 MB advisory, which coalesced the
    // whole tail into one task and mismeasured coalescing as skew).
    val shared = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m")
    // One leg: MATERIALIZE the bare join (toRdd.count — the same
    // QueryExecution, so the final adaptive plan is inspectable; a
    // downstream agg in the stage suppresses the skew split in 4.1,
    // measured — see BENCH_NOTES), plus an untimed checksum.
    def leg(confs: Map[String, String], joined: => DataFrame)
        : (Long, Long, Double, Boolean) =
      withConfs(shared ++ confs) {
        val df = joined
        val (rows, t) = timed(df.queryExecution.toRdd.count())
        val engaged =
          df.queryExecution.executedPlan.toString.contains("skew=true")
        val chk = df.agg(
          sum(col("payload").bitwiseXOR(col("dim_payload")))).head().getLong(0)
        (chk, rows, t, engaged)
      }
    val (chkP, nP, tPlain, _) = leg(
      Map("spark.sql.adaptive.skewJoin.enabled" -> "false"),
      left.join(right, Seq("key")))
    val (chkA, nA, tAqe, aqeEngaged) = leg(
      Map("spark.sql.adaptive.skewJoin.enabled" -> "true"),
      left.join(right, Seq("key")))
    val (chkS, nS, tSalted, _) = leg(
      Map("spark.sql.adaptive.skewJoin.enabled" -> "false"),
      graft.ext.Skew.saltedJoin(left, right, "key", 32))
    require(nP == n && nA == n && nS == n,
      s"all legs must join every fact row: $nP / $nA / $nS vs $n")
    require(chkP == chkA && chkA == chkS,
      s"leg checksums diverge: $chkP / $chkA / $chkS")
    require(aqeEngaged, "the AQE leg must actually engage the skew split")
    s"""{"skew_join":{"scale":$scale,"n_rows":$n,"hot_key_frac":0.5,""" +
      s""""plain_no_skew_handling":{"t":${fmt(tPlain)}},""" +
      s""""aqe_skew_join":{"t":${fmt(tAqe)},"engaged":$aqeEngaged},""" +
      s""""salted_join":{"t":${fmt(tSalted)},"salt":32}}}"""
  }

  /** The round-13 second-half additions at scale (NB classifier,
    * Gopher rules, streaming decontamination, tokenize→pack), each
    * leg with a require()d oracle so a timing can never go green on
    * wrong answers:
    *
    *   - nb_classify: planted 3×-repeated class-marker tokens give a
    *     ~40-bit per-doc margin vs the ±1-bit shared-vocab noise
    *     (random-walk σ ≈ √50), so holdout accuracy must be ≥ 0.99
    *     and the holdout row count equals the canonical-bucket census
    *     exactly;
    *   - gopher_rules: full-corpus census; pass_all must equal the
    *     conjunction of its five flags on EVERY row (0 violations);
    *   - stream_decontaminate: every planted quote (train doc
    *     embedding a full eval doc) must flag, and the accumulated
    *     stream flags must EQUAL the one-shot eval-capped pair set
    *     (the batch-independence contract), both-direction anti-joins
    *     hard 0;
    *   - tokenize_pack: all four packing invariants (conservation /
    *     fullness / tiling / count bound) hold over the real packed
    *     output at every scale.
    *
    * All legs are token-mass-linear: censuses are vocabulary-sized,
    * the NB grid is vocab × 2, decontamination contacts only postings
    * the batch touches. */
  def classifierOpsPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.{TextAnalysis, WinnowIndex}
    val n = 5000L * scale
    // NB classifier: separable planted markers on the shared-vocab corpus.
    val labeled = genDocuments(spark, n)
      .withColumn("label",
        when(pmod(col("doc_id"), lit(2L)) === 0, "A").otherwise("B"))
      .withColumn("text", concat(col("text"),
        when(col("label") === "A", lit(" zqa zqa zqa"))
          .otherwise(lit(" wvu wvu wvu"))))
      .localCheckpoint(true)
    val nHoldExpect = labeled
      .where(TextAnalysis.splitBucket(col("doc_id")) >= 80).count()
    spark.sqlContext.clearCache()
    val ((nHold, nCorrect), tNb) = timed {
      val r = TextAnalysis.nbClassify(labeled, "doc_id", "text", "label")
        .agg(count(lit(1)).as("n"), sum(col("correct")).as("c")).first()
      (r.getLong(0), r.getLong(1))
    }
    require(nHold == nHoldExpect, s"holdout $nHold != census $nHoldExpect")
    require(nCorrect * 100L >= nHold * 99L,
      s"planted-marker accuracy below 99%: $nCorrect/$nHold")
    // Gopher rules: census + flag-consistency invariant.
    spark.sqlContext.clearCache()
    val ((nRules, nInconsistent), tGr) = timed {
      val out = TextAnalysis.gopherRules(labeled, "doc_id", "text")
      val r = out.agg(count(lit(1)).as("n"),
        sum((col("pass_all") =!=
          (col("ok_nwords") * col("ok_mean_len") * col("ok_alpha") *
            col("ok_symbol") * col("ok_stops"))).cast("long")).as("bad"))
        .first()
      (r.getLong(0), r.getLong(1))
    }
    require(nRules == n && nInconsistent == 0,
      s"gopher census off: n=$nRules bad=$nInconsistent")
    // Streaming decontamination: 500 eval docs (disjoint generator
    // ids), planted quotes every 100th train doc, 8 micro-batches.
    val evalDocs = genDocuments(spark, n + 500).where(col("doc_id") >= n)
      .localCheckpoint(true)
    val rawTrain = genDocuments(spark, n)
    val planted = rawTrain.where(pmod(col("doc_id"), lit(100L)) === 0)
      .withColumn("eid", lit(n) + pmod(expr("doc_id DIV 100"), lit(500L)))
      .join(evalDocs.select(col("doc_id").as("eid"), col("text").as("etext")), Seq("eid"))
      .select(col("doc_id"), concat(col("text"), lit(" "), col("etext")).as("text"))
    val train = rawTrain.where(pmod(col("doc_id"), lit(100L)) =!= 0)
      .unionByName(planted).localCheckpoint(true)
    val inDir = {
      import java.nio.file.{Files, Paths}
      val base = Files.createTempDirectory(s"graft_scale_decon_x$scale").toString
      val in = s"$base/in"
      Files.createDirectories(Paths.get(in))
      (0 until 8).foreach { i =>
        val w = s"$base/w$i"
        train.where(pmod(col("doc_id"), lit(8L)) === i)
          .coalesce(1).write.mode("overwrite").parquet(w)
        val part = new java.io.File(w).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"no part file under $w"))
        Files.move(part.toPath, Paths.get(in, f"shard_$i%03d.parquet"))
      }
      in
    }
    val idx = s"graft_scale_decon_eval_x$scale"
    WinnowIndex.build(evalDocs, "doc_id", "text", idx, k = 20, w = 8)
    spark.sqlContext.clearCache()
    val ((nFlags, nBatches), tSd) = timed {
      val stream = spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val (acc, nb) = WinnowIndex.streamDecontaminate(spark, idx, stream,
        "doc_id", "text", queryName = s"scale_decon_x$scale")
      (acc.count(), nb)
    }
    require(nBatches == 8, s"expected 8 micro-batches, got $nBatches")
    val accTbl = spark.table(idx + "_flags")
      .select(col("train_id"), col("eval_id"), col("n_shared"))
    val nPlantedMissed = planted
      .select(col("doc_id").as("train_id"))
      .withColumn("eval_id", lit(n) + pmod(expr("train_id DIV 100"), lit(500L)))
      .join(accTbl, Seq("train_id", "eval_id"), "left_anti").count()
    require(nPlantedMissed == 0,
      s"$nPlantedMissed planted quotes missed by the stream probe")
    // Batch-independence contract: stream flags == one-shot with the
    // same eval-side cap, both directions, n_shared included.
    val evPost = spark.table(idx)
    val evCapped = evPost.join(
      evPost.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
        .where(col("__df") <= 1000).select(col("fp")), Seq("fp"))
      .select(col("fp"), col("id").as("eval_id"))
    val oneShot = WinnowIndex.postings(train, "doc_id", "text", 20, 8)
      .join(evCapped, Seq("fp"))
      .groupBy(col("id").as("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
    require(accTbl.join(oneShot, Seq("train_id", "eval_id", "n_shared"), "left_anti")
      .count() == 0, "stream flags not in the one-shot set")
    require(oneShot.join(accTbl, Seq("train_id", "eval_id", "n_shared"), "left_anti")
      .count() == 0, "one-shot flags missing from the stream")
    // Surgical excision on the same planted-quote corpus: every
    // planted doc must flag AND shed at least its quote's mass (the
    // quote's k-grams all appear in the matched eval doc, so its
    // chars are fully covered; organic cuts only shrink further).
    spark.sqlContext.clearCache()
    val ((nExcised, nBadPlant), tEx) = timed {
      val out = graft.ext.Dedup.excisePassages(train, evalDocs,
          "doc_id", "text", k = 20, w = 8, minShared = 2)
        .localCheckpoint(true)
      val expect = planted
        .select(col("doc_id"),
          (lit(n) + pmod(expr("doc_id DIV 100"), lit(500L))).as("eid"))
        .join(evalDocs.select(col("doc_id").as("eid"),
          length(col("text")).as("__elen")), Seq("eid"))
      val bad = expect.join(out, Seq("doc_id"), "left")
        .where(col("clean_len").isNull ||
          col("clean_len") > col("orig_len") - col("__elen"))
        .count()
      (out.count(), bad)
    }
    require(nBadPlant == 0,
      s"$nBadPlant planted quotes not fully excised")
    require(nExcised >= n / 100,
      s"every planted doc must flag: $nExcised < ${n / 100}")
    // Tokenize→pack: the composition's four invariants at scale.
    spark.sqlContext.clearCache()
    val ((nDocsTp, bitsOk), tTp) = timed {
      val norm = TextAnalysis.nfcNormalize(
        rawTrain.localCheckpoint(true), "text", "__norm")
      val merges = TextAnalysis.bpeTrain(norm, "__norm", nMerges = 30)
      val enc = graft.ext.Checkpoints.stage(
        TextAnalysis.bpeEncode(norm, "__norm", merges, "__toks")
          .select(col("doc_id"), size(col("__toks")).cast("long").as("n_bpe")))
      val chunks = graft.ext.Checkpoints.stage(
        graft.ext.Packing.packSummary(enc, "doc_id", col("n_bpe"),
          capacity = 512L, shards = 32))
      val totBpe = enc.agg(sum(col("n_bpe"))).first().getLong(0)
      val fill = chunks.agg(sum(col("n_tokens"))).first().getLong(0)
      val lastPerShard = chunks.groupBy(col("shard"))
        .agg(max(col("chunk_id")).as("__last"))
      val notFull = chunks.join(lastPerShard, "shard")
        .where(col("chunk_id") < col("__last") && col("n_tokens") =!= 512L)
        .count()
      (enc.count(), fill == totBpe && notFull == 0L)
    }
    require(bitsOk, "tokenize->pack invariants violated at scale")
    require(nDocsTp == n, s"composition must keep every doc: $nDocsTp")
    s"""{"scale":$scale,"n_docs":$n,""" +
      s""""nb_classify":{"t":${fmt(tNb)},"n_holdout":$nHold,"n_correct":$nCorrect},""" +
      s""""gopher_rules":{"t":${fmt(tGr)},"n_rows":$nRules},""" +
      s""""stream_decontaminate":{"t":${fmt(tSd)},"n_flags":$nFlags,"n_batches":$nBatches},""" +
      s""""excise":{"t":${fmt(tEx)},"n_excised":$nExcised},""" +
      s""""tokenize_pack":{"t":${fmt(tTp)},"n_docs":$nDocsTp}}"""
  }

  /** The dedup ENDER at web-dedup duplicate mass — the leg VERDICT
    * r13 #1 asked for: HALF the corpus is a near-copy (one leading
    * token changed), so the loser set the survivor anti-join carries
    * is 50 % of the corpus — the 20–60 % dup fraction of a real crawl,
    * and exactly the frame the old `broadcast(losers)` hint would have
    * forced through the driver (10¹⁰–10¹¹ ids at 100 B docs; the hint
    * is gone, PlanAuditSpec pins no corpus-derived broadcast in any
    * ender, AQE still picks broadcast when genuinely small). The point
    * runs [[Dedup.dedupNearDups]] END TO END and requires the full
    * truth: every base survives, every copy loses — detection
    * (Jaccard ≈ 0.88 vs 16-band LSH), clustering, and the anti-join
    * all have to be exact at every scale for the wall to count. */
  def dedupEnderPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.Dedup
    val half = 2500L * scale
    val base = genDocuments(spark, half)
    // Copy i = base i with its first token replaced — Jaccard ≈ 0.88
    // to its base (one token of 50), ~0 to everything else.
    val copies = base.select((col("doc_id") + half).as("doc_id"),
      concat_ws(" ",
        array(lit("zqx")) +: Seq(slice(split(col("text"), " "), 2, 10000)): _*)
        .as("text"))
    val pathStr = s"$dir/dedup_ender_x$scale"
    base.unionByName(copies).write.mode("overwrite").parquet(pathStr)
    val docs = spark.read.parquet(pathStr)
    spark.sqlContext.clearCache()
    val (survivors, t) = timed {
      Dedup.dedupNearDups(docs, "doc_id", "text", threshold = 0.5)
        .select(col("doc_id")).localCheckpoint(true)
    }
    val nSurv = survivors.count()
    val nCopySurv = survivors.where(col("doc_id") >= half).count()
    // Closed-form truth: genDocuments plants clusters of 4 over the
    // first 10 % of bases (doc_id DIV 4), so base components =
    // (half - nc) singletons + ceil(nc/4) planted clusters; every
    // detected copy joins its base's component and never wins (min-id
    // survivor). LSH recall at J ≈ 0.88 with 16 bands is ~1 - 4e-5, so
    // a handful of singleton copies may escape detection at scale —
    // each such miss surfaces as BOTH one extra survivor and one
    // surviving copy (a base can never be lost: worst case it is a
    // component of its own). The gate pins that equality (misses are
    // only ever escaped copies, never dropped bases) and caps the miss
    // rate at the LSH model's tail; the miss count is reported, never
    // silent.
    val nc = half / 10
    val expected = (half - nc) + (nc + 3) / 4
    val misses = nSurv - expected
    require(misses == nCopySurv && misses >= 0 &&
        misses <= math.max(2L, 2 * half / 10000),
      s"ender truth broken: $nSurv survivors ($nCopySurv copies) vs " +
        s"expected $expected components over $half bases")
    val losers = 2 * half - nSurv
    s"""{"dedup_ender":{"scale":$scale,"n_docs":${2 * half},""" +
      s""""n_losers":$losers,"loser_fraction":${fmt(losers.toDouble / (2 * half))},""" +
      s""""lsh_misses":$misses,"t":${fmt(t)}}}"""
  }

  /** Padding-waste census at scale: arrival vs length-sorted batch
    * assembly over hash-varied sequence lengths (16..500 tokens,
    * batch 16) — the dataloader-prep pass whose global positions ride
    * PrefixSum's range-partition rank, so the leg is also the rank
    * path's volume test (two full ranks per call). The closed
    * invariants must hold at every scale: equal batch counts, equal
    * data token mass, sorted padding strictly below arrival padding
    * on varied lengths. */
  def paddingPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.Packing
    val n = 100000L * scale
    val rows = spark.range(0, n, 1, 32).toDF("id")
      .withColumn("len", pmod(xxhash64(col("id")), lit(485L)) + 16L)
      .localCheckpoint(true)
    spark.sqlContext.clearCache()
    val (got, t) = timed {
      Packing.paddingCensus(rows, "id", col("len"), batchSize = 16)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    }
    val (na, pa, wa, fa) = got("arrival")
    val (ns, ps, ws, fs) = got("sorted")
    require(na == ns && na == (n + 15) / 16,
      s"batch counts broken: arrival $na, sorted $ns, expected ${(n + 15) / 16}")
    require(pa - wa == ps - ws, "data token mass must be strategy-invariant")
    require(ws < wa,
      s"sorted padding $ws must beat arrival $wa on varied lengths")
    s"""{"padding":{"scale":$scale,"n_docs":$n,"t":${fmt(t)},""" +
      s""""arrival_frac":${fmt(fa)},"sorted_frac":${fmt(fs)},""" +
      s""""padding_saved":${wa - ws}}}"""
  }

  /** Band-space saturation head-to-head on NEAR-UNIFORM hashes — the
    * r13 verdict's widening criterion, measured directly: every doc
    * gets 50 tokens unique to it (no cross-doc sharing at all), so
    * simhash values are near-uniform 64-bit draws, and the same hash
    * column is banded BOTH ways — the shipped four 16-bit bands and
    * the old four 8-bit bands (the low 32 bits, mirroring the 32-bit
    * hash they came from). With 65 536 values/band the expected
    * bucket is n/65 536 (≈ 4 docs at 250 k) and over-cap count must
    * be exactly zero; with 256 values/band the expected bucket is
    * n/256 (≈ 977 at 250 k — AT the default 1000 cap), so the old
    * width saturates and the capped detector silently drops most of
    * the corpus — the vacuous-guarantee failure the widening fixed. */
  def simhashSaturationPoint(spark: SparkSession, dir: String,
                             scale: Int): String = {
    import graft.ext.Dedup
    val n = 5000L * scale
    val docs = spark.range(0, n, 1, 32).toDF("doc_id")
      .withColumn("text", array_join(transform(sequence(lit(0), lit(49)),
        i => concat(lit("t"), (col("doc_id") * 50 + i).cast("string"))), " "))
    val hashes = docs.select(Dedup.simhash(col("text")).as("sh"))
      .localCheckpoint(true)
    def overCap(bits: Int): Long = {
      val mask = (1L << bits) - 1
      hashes
        .select(posexplode(array((0 until 4).map(j =>
          shiftright(col("sh"), bits * j).bitwiseAND(lit(mask))): _*)))
        .toDF("band_id", "band_val")
        .groupBy(col("band_id"), col("band_val"))
        .agg(count(lit(1)).as("__n"))
        .where(col("__n") > 1000).count()
    }
    val (over16, over8) = (overCap(16), overCap(8))
    require(over16 == 0,
      s"16-bit bands must not saturate on uniform hashes at n=$n: $over16")
    s"""{"simhash_saturation":{"scale":$scale,"n_docs":$n,""" +
      s""""over_cap_16bit":$over16,"over_cap_8bit":$over8,""" +
      s""""expected_bucket_16bit":${fmt(n / 65536.0)},""" +
      s""""expected_bucket_8bit":${fmt(n / 256.0)}}}"""
  }

  /** The banded-SimHash detector at scale, next to the MinHash skew
    * point: wall + verified-pair mass + the Σ bucket² join budget, on
    * the planted-cluster corpus. The 40-word synthetic vocabulary is
    * ADVERSARIALLY low-entropy for simhash (correlated bit votes →
    * few distinct band values → hot buckets even at 1×) — exactly the
    * degenerate shape the hot-bucket cap exists for, so the point
    * measures the CAPPED join and requires the operator's actual
    * guarantee: every same-hash pair with ≥ 1 UNCAPPED band (linear
    * to compute: per-hash, check its 4 buckets against the census)
    * must appear in the banded verified set at distance 0. Real-
    * corpus hashes are near-uniform; this corpus bounds the worst
    * case. */
  def simhashPoint(spark: SparkSession, dir: String, scale: Int): String = {
    import graft.ext.Dedup
    val n = 5000L * scale
    val docs = genDocuments(spark, n).localCheckpoint(true)
    val hashes = docs.where(col("text").isNotNull)
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .localCheckpoint(true)
    val bandRows = hashes
      .select(col("sh"), posexplode(array((0 until 4).map(j =>
        shiftright(col("sh"), 16 * j).bitwiseAND(lit(65535L))): _*)))
      .toDF("sh", "band_id", "band_val")
      .localCheckpoint(true)
    val census = bandRows.groupBy(col("band_id"), col("band_val"))
      .agg(count(lit(1)).as("__n")).localCheckpoint(true)
    val nOverCap = census.where(col("__n") > 1000).count()
    val bucketMass = census
      .agg(coalesce(sum(expr("__n * (__n - 1) DIV 2")), lit(0L)))
      .first().getLong(0)
    // Same-hash pairs whose hash keeps >= 1 uncapped band — the
    // subset the cap provably preserves (they agree on EVERY band).
    val eligible = bandRows.join(census, Seq("band_id", "band_val"))
      .groupBy(col("sh"))
      .agg(max((col("__n") <= 1000).cast("int")).as("__ok"))
      .where(col("__ok") === 1)
      .join(hashes, Seq("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) DIV 2")), lit(0L)))
      .first().getLong(0)
    spark.sqlContext.clearCache()
    val ((nPairs, nHam0), tSim) = timed {
      val p = Dedup.simhashPairs(docs, "doc_id", "text")
        .localCheckpoint(true)
      (p.count(), p.where(col("hamming") === 0).count())
    }
    require(nHam0 >= eligible,
      s"banded set must hold every uncapped same-hash pair: $nHam0 < $eligible")
    s"""{"simhash":{"scale":$scale,"n_docs":$n,"t":${fmt(tSim)},""" +
      s""""n_pairs":$nPairs,"n_hamming0":$nHam0,"eligible_same_hash":$eligible,""" +
      s""""n_over_cap_buckets":$nOverCap,"bucket_pair_mass_uncapped":$bucketMass}}"""
  }

  /** Recall-vs-nProbe operating curve for the IVF index — the table a
    * 100 TB operator consults before picking a probe width, measured
    * on BOTH corpus shapes because they bound the real world:
    * `clustered` (genClusteredEmbeddings — tight centers, the shape
    * IVF exists for) and `uniform` (genEmbeddings — near-isotropic in
    * dim 64, Lloyd's worst case, where probed cells can only hold
    * ~nProbe/k of the mass). 20 held-out queries (ids beyond the
    * corpus, same generator), recall@10 vs the brute-force truth,
    * probe wall timed per setting over all 20 queries. */
  def ivfRecallCurvePoint(spark: SparkSession): String = {
    import graft.ext.IvfIndex
    val n = 50000L
    val nq = 20
    def curve(tag: String, gen: Long => DataFrame): String = {
      val all = gen(n + nq).localCheckpoint(true)
      val corpus = all.where(col("vec_id") < n)
      val queries = all.where(col("vec_id") >= n)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toSeq)
      val table = s"graft_ivf_curve_$tag"
      IvfIndex.build(corpus, "vec_id", "embedding", table, k = 16, iters = 2)
      val truths = queries.map { qv =>
        Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qv, 10)
          .collect().map(_.getLong(0)).toSet
      }
      val pts = Seq(1, 2, 4, 8).map { np =>
        val (recalls, t) = timed {
          queries.zip(truths).map { case (qv, truth) =>
            val got = IvfIndex.probeTopK(
                spark, table, "vec_id", "embedding", qv, 10, np)
              .collect().map(_.getLong(0)).toSet
            got.intersect(truth).size.toDouble / truth.size
          }
        }
        val mean = recalls.sum / recalls.length
        s"""{"nProbe":$np,"recall":${fmt(mean)},"t":${fmt(t)}}"""
      }
      s""""$tag":{"n":$n,"cells":16,"k":10,"points":[${pts.mkString(",")}]}"""
    }
    s"""{"ivf_recall_curve":{${curve("clustered", m => genClusteredEmbeddings(spark, m))},""" +
      s"""${curve("uniform", m => genEmbeddings(spark, m))}}}"""
  }

  /** Σ n·(n−1)/2 over the blocks of `blockCol` — the pair mass that
    * bounds a blocked pipeline's join work. */
  private def pairMass(df: DataFrame, blockCol: String): Long =
    df.groupBy(col(blockCol)).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum((col("n") * (col("n") - 1) / 2).cast("long")), lit(0L)).as("mass"))
      .first().getLong(0)

  private def fmt(v: Double) = f"$v%.2f"

  private def runPoint(spark: SparkSession, dir: String, scale: Int): String = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val params = Dedup.MinHashParams()
    spark.sqlContext.clearCache()
    // Σ m·(m−1)/2 over LSH band buckets = the equi-join's exact pair
    // budget — candidates can never exceed it, and it is the quantity
    // that must stay ∝ n for the pipeline to scale.
    val bandMass = pairMass(
      Dedup.bands(docs, "doc_id", "text", params)
        .withColumn("__bb", concat_ws("|", col("band_id"), col("band_hash"))),
      "__bb")
    spark.sqlContext.clearCache()
    val (nCand, tCand) = timed {
      Dedup.candidatePairs(docs, "doc_id", "text", params).count()
    }
    spark.sqlContext.clearCache()
    val (nConf, tConf) = timed {
      Dedup.nearDupPairs(docs, "doc_id", "text", params, threshold = 0.5).count()
    }
    spark.sqlContext.clearCache()
    val (nSurv, tDedup) = timed {
      Dedup.dedupNearDups(docs, "doc_id", "text", params, threshold = 0.5).count()
    }
    spark.sqlContext.clearCache()
    val withBucket = emb.withColumn("bucket",
      Similarity.lshBucketIn(spark)(col("embedding"), 8))
    val bucketMass = pairMass(withBucket, "bucket")
    val (nEmb, tEmb) = timed {
      Similarity.cosinePairsWithin(withBucket, "vec_id", "embedding", "bucket",
        threshold = 0.9, maxBlockSize = 10000).count()
    }
    spark.sqlContext.clearCache()
    val labelMass = pairMass(emb, "label")
    val (nLbl, tLbl) = timed {
      Similarity.cosinePairsWithin(emb, "vec_id", "embedding", "label",
        threshold = 0.35, maxBlockSize = 10000).count()
    }
    // Exact equi-depth at scale: the distributed EquiDepth operator
    // against the empty-PARTITION-BY window form it replaced. Both
    // produce identical buckets (EquiDepthSpec); the window form
    // funnels every row through ONE task, so its wall is the
    // single-core sort — the gap widens linearly with the corpus.
    spark.sqlContext.clearCache()
    val nt = docs.select(col("doc_id"),
      pmod(xxhash64(col("doc_id")), lit(1000003L)).as("v"))
    val (ntBuckets, tNt) = timed {
      graft.operators.EquiDepth.ntileBuckets(nt, Seq("v", "doc_id"), 100)
        .groupBy(col("bucket")).count().count()
    }
    spark.sqlContext.clearCache()
    val (_, tWin) = timed {
      import org.apache.spark.sql.expressions.Window
      nt.withColumn("bucket",
          ntile(100).over(Window.orderBy(col("v"), col("doc_id"))))
        .groupBy(col("bucket")).count().count()
    }
    // Connected components on the WORST-case shape: one path per 1000
    // nodes (diameter 999 — min-label propagation would need ~999
    // rounds per component; the alternating star algorithm must stay
    // logarithmic for the operator to be usable at all). Component
    // count = the exact truth at every scale; rounds is the shuffle
    // count, i.e. the cost that must grow ~log(n), not n.
    spark.sqlContext.clearCache()
    val nNodes = 5000L * scale
    val pathEdges = spark.range(0, nNodes - 1, 1, 32)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .where((col("id") + 1) % 1000 =!= 0) // cut into 1000-node paths
    val ((nComp, ccRounds), tCc) = timed {
      val (labels, rounds) =
        graft.operators.ConnectedComponents.runCounted(pathEdges, "src", "dst")
      (labels.select(col("component")).distinct().count(), rounds)
    }
    // The SKEW shape at the same edge count: one hub adjacent to up to
    // 10^5 spokes (every round's groupBy(a).agg(min) sees that key
    // whole), remaining edges as 1000-node paths. Star-contraction
    // LIKES hubs (a star finishes in O(1) rounds); the risk is the
    // hot-key aggregation stalling a round — partial (map-side)
    // aggregation caps it at one row per partition per key, which this
    // point evidences: wall must stay within ~2x of the uniform graph.
    spark.sqlContext.clearCache()
    val e = 5000L * scale
    val hubSpokes = math.min(100000L, e)
    val hubEdges = spark.range(1, hubSpokes + 1, 1, 32)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val restEdges = spark.range(hubSpokes + 1, e + 1, 1, 32)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .where((col("id") + 1) % 1000 =!= 0)
    val skewEdges = hubEdges.union(restEdges)
    // Actual count, not the nominal e: the path-cutting filter drops
    // ~(e - hubSpokes)/1000 edges, and the published JSON must match
    // the graph that ran.
    val nSkewEdges = skewEdges.count()
    val ((nCompSkew, ccRoundsSkew), tCcSkew) = timed {
      val (labels, rounds) =
        graft.operators.ConnectedComponents.runCounted(skewEdges, "src", "dst")
      (labels.select(col("component")).distinct().count(), rounds)
    }
    val nDocs = docs.count()
    val nVecs = emb.count()
    s"""{"scale":$scale,"n_docs":$nDocs,"n_vecs":$nVecs,""" +
      s""""minhash_candidates":{"t":${fmt(tCand)},"n_pairs":$nCand,"band_mass":$bandMass},""" +
      s""""minhash_confirmed":{"t":${fmt(tConf)},"n_pairs":$nConf},""" +
      s""""neardup_dedup":{"t":${fmt(tDedup)},"n_survivors":$nSurv},""" +
      s""""embed_neardup":{"t":${fmt(tEmb)},"n_pairs":$nEmb,"bucket_mass":$bucketMass},""" +
      s""""label_pairs":{"t":${fmt(tLbl)},"n_pairs":$nLbl,"label_mass":$labelMass},""" +
      s""""equidepth":{"t":${fmt(tNt)},"t_single_task_window":${fmt(tWin)},"n_buckets":$ntBuckets},""" +
      s""""connected_components":{"t":${fmt(tCc)},"rounds":$ccRounds,"n_components":$nComp},""" +
      s""""cc_skew":{"t":${fmt(tCcSkew)},"rounds":$ccRoundsSkew,"n_components":$nCompSkew,""" +
      s""""hub_degree":$hubSpokes,"n_edges":$nSkewEdges}}"""
  }

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_ == "points-only")
    val outBase = positional.headOption.getOrElse("/tmp/graft_scale")
    val scales = positional.drop(1).headOption.getOrElse("1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // `serve-only`: the streaming serving loop vs one-shot batch probe.
    if (args.contains("serve-only")) {
      servePoint(spark, outBase, 1)
      scales.foreach(m => println(servePoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `bucket-scaling-only`: the size-derived layout paths observed
    // GROWING (buckets / sink buckets / state partitions > 1) with
    // sub-linear walls — the evidence leg sf0.1 cannot provide.
    if (args.contains("bucket-scaling-only")) {
      bucketScalingPoint(spark, outBase, 1)
      scales.foreach(m => println(bucketScalingPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `rebalance-only`: rebalance under planted distribution drift.
    if (args.contains("rebalance-only")) {
      rebalancePoint(spark, outBase, 1)
      scales.foreach(m => println(rebalancePoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `advisor-only`: the tier advisor on regime-constructed corpora.
    if (args.contains("advisor-only")) {
      advisorPoint(spark, outBase, 1)
      scales.foreach(m => println(advisorPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `opoint-only`: the recall-vs-nProbe operating-point curve.
    if (args.contains("opoint-only")) {
      opointPoint(spark, outBase, 1)
      scales.foreach(m => println(opointPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `ops-only`: audit/freshness/janitor walls vs growing index state.
    if (args.contains("ops-only")) {
      opsPoint(spark, outBase, 1)
      scales.foreach(m => println(opsPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `curation-stream-only`: the streaming curation pipeline's wall
    // vs corpus scale, counts exact at every m.
    if (args.contains("curation-stream-only")) {
      curationStreamPoint(spark, outBase, 1)
      scales.foreach(m => println(curationStreamPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `vecdrift-only`: the cell-mass drift census vs a reference.
    if (args.contains("vecdrift-only")) {
      vecDriftPoint(spark, outBase, 1)
      scales.foreach(m => println(vecDriftPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `multidrift-only`: the one-pass multi-metric census vs singles.
    if (args.contains("multidrift-only")) {
      multiDriftPoint(spark, outBase, 1)
      scales.foreach(m => println(multiDriftPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `relational-only`: the TPC-H Q3-shape shuffle point (broadcast
    // vs SMJ legs, cross-plan determinism gate), 1× warmup untimed.
    if (args.contains("relational-only")) {
      relationalPoint(spark, outBase, 1)
      scales.foreach(m => println(relationalPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `neardup-skew-only` (any arg position): just the boilerplate-skew
    // dedup point at each scale, 1× warmup untimed first.
    if (args.contains("neardup-skew-only")) {
      neardupSkewPoint(spark, outBase, 1)
      scales.foreach(m => println(neardupSkewPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `inc-dedup-only`: just the incremental-probe-vs-full-recompute
    // point at each scale, 1× warmup untimed first.
    if (args.contains("inc-dedup-only")) {
      incrementalDedupPoint(spark, outBase, 1)
      scales.foreach(m => println(incrementalDedupPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `winnow-skew-only`: just the winnowing posting-cap point.
    if (args.contains("winnow-skew-only")) {
      winnowSkewPoint(spark, outBase, 1)
      scales.foreach(m => println(winnowSkewPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `ivf-quantized-only`: just the int8-probe scan-bytes point.
    if (args.contains("ivf-quantized-only")) {
      ivfQuantizedPoint(spark, outBase, 1)
      scales.foreach(m => println(ivfQuantizedPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `winnow-inc-only`: just the incremental-winnow probe point.
    if (args.contains("winnow-inc-only")) {
      winnowIncPoint(spark, outBase, 1)
      scales.foreach(m => println(winnowIncPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `corpus-ops-only`: the round-12 corpus operators at scale.
    if (args.contains("corpus-ops-only")) {
      corpusOpsPoint(spark, outBase, 1)
      scales.foreach(m => println(corpusOpsPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `curation-ops-only`: the round-13 curation quartet at scale.
    if (args.contains("curation-ops-only")) {
      curationOpsPoint(spark, outBase, 1)
      scales.foreach(m => println(curationOpsPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `retrieval-ops-only`: the round-13 retrieval/tokenizer/split
    // additions at scale (BM25 index, BPE, cluster split).
    if (args.contains("retrieval-ops-only")) {
      retrievalOpsPoint(spark, outBase, 1)
      scales.foreach(m => println(retrievalOpsPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `dedup-ender-only`: the survivor anti-join at 50% duplicate mass.
    if (args.contains("dedup-ender-only")) {
      dedupEnderPoint(spark, outBase, 1)
      scales.foreach(m => println(dedupEnderPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `simhash-only`: banded-SimHash detector point.
    if (args.contains("simhash-only")) {
      simhashPoint(spark, outBase, 1)
      scales.foreach(m => println(simhashPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `simhash-saturation-only`: 16-bit vs 8-bit band saturation on
    // near-uniform hashes.
    if (args.contains("simhash-saturation-only")) {
      scales.foreach(m => println(simhashSaturationPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `padding-only`: batch-assembly padding census at scale.
    if (args.contains("padding-only")) {
      paddingPoint(spark, outBase, 1)
      scales.foreach(m => println(paddingPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `pq-only`: product-quantization bytes/probe point.
    if (args.contains("pq-only")) {
      pqPoint(spark, outBase, 1)
      scales.foreach(m => println(pqPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `ivfpq-only`: IVFADC bytes/probe vs the int8 IVF probe.
    if (args.contains("ivfpq-only")) {
      ivfPqPoint(spark, outBase, 1)
      scales.foreach(m => println(ivfPqPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `purge-only`: purge bytes-written ∝ touched partitions.
    if (args.contains("purge-only")) {
      purgePoint(spark, outBase, 1)
      scales.foreach(m => println(purgePoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `skew-join-only`: AQE skew-join vs salted join head to head.
    if (args.contains("skew-join-only")) {
      skewJoinPoint(spark, outBase, 1)
      scales.foreach(m => println(skewJoinPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `ivfpq-batch-only`: batched vs per-query IVFADC serving.
    if (args.contains("ivfpq-batch-only")) {
      ivfPqBatchPoint(spark, outBase, 1)
      scales.foreach(m => println(ivfPqBatchPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `ivf-batch-only`: batched vs per-query float/int8 IVF serving.
    if (args.contains("ivf-batch-only")) {
      ivfBatchPoint(spark, outBase, 1)
      scales.foreach(m => println(ivfBatchPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `dsir-inc-only`: two-index incremental DSIR vs full recompute.
    if (args.contains("dsir-inc-only")) {
      dsirIncPoint(spark, outBase, 1)
      scales.foreach(m => println(dsirIncPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `lm-inc-only`: incremental LM scoring vs full recompute.
    if (args.contains("lm-inc-only")) {
      lmIncPoint(spark, outBase, 1)
      scales.foreach(m => println(lmIncPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `classifier-ops-only`: the round-13 second-half additions
    // (NB classifier, Gopher rules, streaming decontamination,
    // tokenize→pack) at scale.
    if (args.contains("classifier-ops-only")) {
      classifierOpsPoint(spark, outBase, 1)
      scales.foreach(m => println(classifierOpsPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `ivf-curve-only`: the recall-vs-nProbe operating curve (fixed
    // size — the probe width is the axis, not the corpus).
    if (args.contains("ivf-curve-only")) {
      println(ivfRecallCurvePoint(spark))
      spark.stop()
      return
    }
    // `event-time-only`: sessionization / windows / SCD-2 at scale.
    if (args.contains("event-time-only")) {
      eventTimePoint(spark, outBase, 1)
      scales.foreach(m => println(eventTimePoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `compaction-only`: just the index-compaction recovery point.
    if (args.contains("compaction-only")) {
      compactionPoint(spark, outBase, 1)
      scales.foreach(m => println(compactionPoint(spark, outBase, m)))
      spark.stop()
      return
    }
    // `stream-ingest-only`: just the 50-micro-batch ingest point
    // (fixed 10× scale — the batch COUNT is the axis, not the corpus).
    if (args.contains("stream-ingest-only")) {
      streamIngestPoint(spark, outBase, 1, shards = 10) // warmup, untimed
      println(streamIngestPoint(spark, outBase, 10))
      spark.stop()
      return
    }
    // `points-only` (any arg position) skips the corpus scales and
    // runs just the fixed-size points — quick re-measurement.
    val pointsOnly = args.contains("points-only")
    if (!pointsOnly) {
      scales.foreach { m =>
        val dir = s"$outBase/x$m"
        val (_, tGen) = timed {
          genDocuments(spark, 5000L * m)
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
          genEmbeddings(spark, 2000L * m)
            .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        }
        println(s"""{"gen":"x$m","t":${fmt(tGen)}}""")
      }
      // Untimed warmup at the smallest point: janino codegen + JIT land
      // here so the 1× numbers measure the plans, not JVM cold start
      // (same policy as Bench).
      runPoint(spark, s"$outBase/x${scales.min}", scales.min)
      scales.foreach { m => println(runPoint(spark, s"$outBase/x$m", m)) }
      scales.foreach { m => println(neardupSkewPoint(spark, outBase, m)) }
      scales.foreach { m => println(incrementalDedupPoint(spark, outBase, m)) }
      scales.foreach { m => println(winnowSkewPoint(spark, outBase, m)) }
      scales.foreach { m => println(ivfQuantizedPoint(spark, outBase, m)) }
      scales.foreach { m => println(winnowIncPoint(spark, outBase, m)) }
      scales.foreach { m => println(compactionPoint(spark, outBase, m)) }
    }
    // Fixed-size points (not per-scale): heavy hitters at 10M items,
    // ~7M distinct — the regime where the census's shuffle is the
    // product the sketch exists to avoid — and the prefix-sum
    // crossover at 20M rows. Warm the SAME plan shapes untimed first
    // (in points-only mode nothing else has warmed the JVM, and the
    // first measured path would otherwise absorb all janino+JIT cost,
    // biasing the comparison the points exist to publish).
    heavyHittersPoint(spark, 100000L)
    prefixSumPoint(spark, 100000L)
    println(heavyHittersPoint(spark, 10000000L))
    println(prefixSumPoint(spark, 20000000L))
    println(streamIngestPoint(spark, outBase, 10))
    spark.stop()
  }
}
