package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared skip-report contract (SkipReport + the per-family
  * `*Oversized` companions): every capped detector's keep-filter and
  * skip report partition ONE census, so a dropped block is always a
  * queryable fact — and the report provably names exactly the blocks
  * whose pairs the operator did not generate.
  */
class SkipReportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 40 distinct docs + one 25-copy hot cluster (a viral doc): at a
    * cap below 25 every detector must drop the cluster's blocks and
    * report them. */
  private lazy val corpus = {
    val rng = new scala.util.Random(11)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "fox", "golf", "hotel", "india", "julia", "kilo", "lima")
    val distinct = (0 until 40).map { i =>
      (i.toLong, Seq.fill(40)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val viral = "the viral chain letter body repeated verbatim " * 8
    val hot = (100 until 125).map(i => (i.toLong, viral))
    (distinct ++ hot).toDF("doc_id", "text")
  }

  private val params =
    Dedup.MinHashParams(numHashes = 64, bands = 16, shingleSize = 3,
      maxBucketSize = 10)

  test("within/skipped partition the census exactly (disjoint, exhaustive)") {
    val bands = Dedup.bands(corpus, "doc_id", "text", params)
    val census = SkipReport.census(bands,
      Seq(col("band_id"), col("band_hash")))
    val total = census.count()
    val kept = SkipReport.within(census, params.maxBucketSize)
    val dropped = SkipReport.skipped(census, params.maxBucketSize)
    assert(kept.count() + dropped.count() == total,
      "keep + skip must partition the census")
    assert(kept.join(dropped, Seq("band_id", "band_hash")).count() == 0,
      "keep and skip must be disjoint")
  }

  test("minhashOversized names exactly the blocks whose pairs were not generated") {
    val bands = Dedup.bands(corpus, "doc_id", "text", params)
      .localCheckpoint(true)
    val report = Dedup.minhashOversized(bands, params)
    val flagged = report.collect()
    // The 25 identical docs collide in all 16 bands — all flagged at
    // cap 10, each with the full cluster mass.
    assert(flagged.length >= 16,
      s"viral cluster's bands must be flagged, got ${flagged.length}")
    assert(flagged.forall(_.getAs[Long]("block_n") >= 25),
      "flagged blocks must carry the cluster's size")
    // Coverage-hole proof: no candidate pair among the viral ids
    // (their only shared buckets are the flagged ones) ...
    val pairs = Dedup.candidatePairs(corpus, "doc_id", "text", params)
      .where(col("id_a") >= 100 && col("id_b") >= 100)
    assert(pairs.count() == 0,
      "capped buckets must generate no pairs — else the report lies")
    // ... and with the cap lifted the same bands yield the full
    // cluster's pairs while the report goes empty: report ≡ what was
    // dropped, in both directions.
    val open = params.copy(maxBucketSize = 1000)
    assert(Dedup.minhashOversized(bands, open).count() == 0)
    val openPairs = Dedup.candidatePairsFromBands(bands, open)
      .where(col("id_a") >= 100 && col("id_b") >= 100)
    assert(openPairs.count() == 25L * 24 / 2,
      "uncapped: all viral pairs must appear")
  }

  test("winnowOversized: flagged fps are the operator's dropped postings") {
    val report = Dedup.winnowOversized(corpus, "doc_id", "text",
      k = 8, w = 4, maxPostings = 10)
    val flagged = report.collect()
    assert(flagged.nonEmpty, "viral text's fingerprints must be flagged")
    // Every flagged posting is over the cap; the viral cluster's own
    // fps carry at least its 25-doc mass (the random small-vocab texts
    // also collide above the cap — by design, they stress the report).
    assert(flagged.forall(_.getAs[Long]("block_n") > 10),
      "a flagged posting must exceed the cap")
    assert(flagged.exists(_.getAs[Long]("block_n") >= 25),
      "the viral cluster's fingerprints must be flagged cluster-sized")
    // Operator-report consistency: pairs at the tight cap never share
    // ONLY flagged fingerprints — the viral docs' pairs vanish.
    val pairs = Dedup.winnowPairs(corpus, "doc_id", "text",
        k = 8, w = 4, minShared = 1, maxPostings = 10)
      .where(col("id_a") >= 100 && col("id_b") >= 100)
    assert(pairs.count() == 0,
      "postings over the cap must not feed pair generation")
  }

  test("crossCorpusOversized: union census, decontamination twin") {
    val train = corpus.where(col("doc_id") < 113)
    val eval = corpus.where(col("doc_id") >= 113)
    val report = Dedup.crossCorpusOversized(train, eval, "doc_id", "text",
      k = 8, w = 4, maxPostings = 10)
    assert(report.count() > 0, "shared viral fps must be flagged")
    // The union census is the SAME decision winnowOversized makes on
    // the union corpus — value-identical rows.
    val union = Dedup.winnowOversized(corpus, "doc_id", "text",
      k = 8, w = 4, maxPostings = 10)
    assert(report.except(union).count() == 0 &&
        union.except(report).count() == 0,
      "cross-corpus report must equal the union-corpus report")
    // And the flagged fps generate no cross pairs.
    val pairs = Dedup.crossCorpusPairs(train, eval, "doc_id", "text",
        k = 8, w = 4, minShared = 1, maxPostings = 10)
      .where(col("train_id") >= 100)
    assert(pairs.count() == 0,
      "capped postings must not feed cross-corpus pair generation")
  }

  test("simhashOversized and oversizedBlocks carry the uniform shape") {
    val sim = Dedup.simhashOversized(corpus, "doc_id", "text",
      maxBucketSize = 10)
    assert(sim.columns.toSeq == Seq("band_id", "band_val", "block_n"))
    assert(sim.count() >= 4,
      "25 identical docs: all four simhash bands must be flagged")
    val emb = corpus.select(col("doc_id"),
      (col("doc_id") >= 100).cast("int").as("blk"))
    val blocks = Similarity.oversizedBlocks(emb, "blk", maxBlockSize = 10)
    assert(blocks.columns.toSeq == Seq("blk", "block_n"))
    // Both blocks exceed cap 10: the 40 distinct docs and the 25-copy
    // viral cluster — the report carries each with its exact mass.
    val byBlk = blocks.collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("block_n")).toMap
    assert(byBlk == Map(0 -> 40L, 1 -> 25L))
  }
}
