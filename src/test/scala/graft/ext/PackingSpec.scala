package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Concat-and-chunk packing invariants: token conservation, exact fill
  * of every non-final chunk, straddling-doc membership, and the
  * 0-token guard (sequence() must never flip descending).
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // One shard (shards = 1) makes the goldens hand-checkable: docs in
  // id order, capacity 10.
  private lazy val docs = Seq(
    (1L, 4L), (2L, 3L), (3L, 7L), (4L, 10L), (5L, 0L), (6L, 2L)
  ).toDF("id", "n")

  test("chunkSpans: conservation, capacity fill, straddle membership, 0-token guard") {
    val spans = Packing.chunkSpans(docs, "id", col("n"), capacity = 10L, shards = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // Cumsum: doc1 [0,4) doc2 [4,7) doc3 [7,14) doc4 [14,24) doc6 [24,26).
    assert(spans == Set(
      (0L, 1L, 4L), (0L, 2L, 3L), (0L, 3L, 3L),   // chunk 0: 4+3+3 = 10
      (1L, 3L, 4L), (1L, 4L, 6L),                 // doc3 straddles 0→1
      (2L, 4L, 4L), (2L, 6L, 2L)),                // doc5 (0 tokens) absent
      s"unexpected spans: $spans")
  }

  test("packSummary: every chunk but the shard's last is exactly full") {
    val sum = Packing.packSummary(docs, "id", col("n"), capacity = 10L, shards = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sum.toSeq == Seq((0L, 3L, 10L), (1L, 2L, 10L), (2L, 2L, 6L)))
  }

  test("chunkBoundaries: spans tile each chunk — start 0, abutting, end = fill") {
    val b = Packing.chunkBoundaries(docs, "id", col("n"), capacity = 10L, shards = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // Same spans as chunkSpans, with within-chunk offsets.
    assert(b.toSet == Set(
      (0L, 1L, 0L, 4L), (0L, 2L, 4L, 7L), (0L, 3L, 7L, 10L),
      (1L, 3L, 0L, 4L), (1L, 4L, 4L, 10L),
      (2L, 4L, 0L, 4L), (2L, 6L, 4L, 6L)),
      s"unexpected boundaries: $b")
    // Tiling invariant on a larger random corpus, every shard.
    val many = (1L to 500L).map(i => (i, i % 37)).toDF("id", "n")
    val rows = Packing.chunkBoundaries(many, "id", col("n"), capacity = 64L, shards = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    rows.foreach { case ((shard, chunk), spans) =>
      assert(spans.head._2 == 0L, s"first span of ($shard,$chunk) must start at 0")
      spans.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0)._3 == w(1)._2, s"spans of ($shard,$chunk) must abut: $spans")
      }
      assert(spans.last._3 <= 64L, s"($shard,$chunk) overfilled: $spans")
    }
  }

  test("multi-shard packing conserves tokens and respects capacity") {
    val many = (1L to 500L).map(i => (i, 1L + i % 37)).toDF("id", "n")
    val total = 500L + (1L to 500L).map(_ % 37).sum
    val sum = Packing.packSummary(many, "id", col("n"), capacity = 64L, shards = 8)
    assert(sum.agg(org.apache.spark.sql.functions.sum(col("n_tokens")))
      .first().getLong(0) == total, "token count must be conserved")
    assert(sum.where(col("n_tokens") > 64).count() == 0,
      "no chunk may exceed capacity")
    // Per shard: at most one (the last) under-full chunk.
    val underfull = sum.where(col("n_tokens") < 64)
      .groupBy(col("shard")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).count()
    assert(underfull == 0, "only a shard's final chunk may be under-full")
  }

  test("lengthBuckets matches the groupBy model on random token counts") {
    val rnd = new scala.util.Random(7)
    val ns = Seq.fill(200)(rnd.nextInt(500).toLong)
    val model = ns.groupBy(_ / 64).toSeq.sortBy(_._1)
      .map { case (b, vs) => (b, vs.size.toLong, vs.sum, vs.min, vs.max) }
    val got = Packing.lengthBuckets(ns.toDF("n"), col("n"), width = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == model)
  }

  test("lengthBuckets: floor-divide routing, per-bucket stats") {
    val d = Seq(0L, 5L, 63L, 64L, 65L, 128L, 200L).toDF("n")
    val got = Packing.lengthBuckets(d, col("n"), width = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 3L, 68L, 0L, 63L),    // 0, 5, 63
      (1L, 2L, 129L, 64L, 65L),  // 64, 65
      (2L, 1L, 128L, 128L, 128L),
      (3L, 1L, 200L, 200L, 200L)))
  }

  test("paddingCensus matches the sort-and-group model; sorted never pads more than arrival") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L).map(id => (id, rnd.nextInt(500).toLong + 1L))
    def model(ordered: Seq[Long], b: Int): (Long, Long, Long) = {
      val batches = ordered.grouped(b).toSeq
      val padded = batches.map(g => g.max * g.size).sum
      (batches.size.toLong, padded, padded - ordered.sum)
    }
    val df = rows.toDF("id", "len")
    val got = Packing.paddingCensus(df, "id", col("len"), batchSize = 8)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (na, pa, wa) = model(rows.sortBy(_._1).map(_._2), 8)
    val (ns, ps, ws) = model(rows.sortBy(t => (t._2, t._1)).map(_._2), 8)
    assert(got("arrival") == ((na, pa, wa, wa.toDouble / pa)))
    assert(got("sorted") == ((ns, ps, ws, ws.toDouble / ps)))
    // The whole point of length bucketing, as an invariant: sorting by
    // length can never increase total padding at the same batch size.
    assert(ws <= wa, s"sorted padding $ws exceeded arrival padding $wa")
    assert(ws < wa, "random lengths should show a strict win")
  }

  test("paddingCensus: exact partial-batch arithmetic on a tiny fixture") {
    // arrival batches of 3: (4,1,9) w=9, (2,2) w=2 → padded 27+4=31,
    // data 18, padding 13; sorted (1,2,2),(4,9) → 6+18=24, padding 6.
    val d = Seq((0L, 4L), (1L, 1L), (2L, 9L), (3L, 2L), (4L, 2L)).toDF("id", "len")
    val got = Packing.paddingCensus(d, "id", col("len"), batchSize = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("arrival", 2L, 31L, 13L),
      ("sorted", 2L, 24L, 6L)))
  }

  test("chunkWithOverlap: coverage, overlap width, short-final-chunk, edge counts") {
    def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")
    val rows = Packing.chunkWithOverlap(Seq(
      (1L, doc(10)),  // n <= window -> 1 whole-doc chunk
      (2L, doc(64)),  // exactly window -> 1 chunk
      (3L, doc(65)),  // one token past -> 2 chunks, second is short
      (4L, doc(160))  // 1 + ceil(96/48) = 3 chunks, last exactly full
    ).toDF("doc_id", "text"), "doc_id", "text", window = 64, stride = 48)
      .collect()
      .groupBy(_.getLong(0))

    assert(rows(1L).map(_.getAs[Long]("n_chunk_tok")).toSeq == Seq(10L))
    assert(rows(1L).head.getAs[String]("chunk_text") == doc(10))
    assert(rows(2L).map(_.getAs[Long]("n_chunk_tok")).toSeq == Seq(64L))
    assert(rows(3L).map(_.getAs[Long]("n_chunk_tok")).toSeq == Seq(64L, 17L))
    assert(rows(4L).map(_.getAs[Long]("n_chunk_tok")).toSeq == Seq(64L, 64L, 64L))

    // Overlap: chunk i and i+1 share window - stride = 16 tokens.
    val c3 = rows(3L).map(_.getAs[String]("chunk_text").split(" ").toSeq)
    assert(c3(0).takeRight(16) == c3(1).take(16))
    // Coverage: every token appears in some chunk, in order.
    assert((c3(0) ++ c3(1).drop(16)) == doc(65).split(" ").toSeq)
  }

  test("fimTransform: deterministic PSM split, mass preserved, reassembly exact") {
    val docs = (1L to 400L).map(i => (i, s"doc $i " + ("abcdefgh" * (i % 5 + 1).toInt)))
      .toDF("doc_id", "text")
    val out = Packing.fimTransform(docs, "doc_id", "text", fimPct = 50)
      .select(col("doc_id"), col("text"), col("fim_applied"), col("fim_text"))
      .collect()
    assert(out.length == 400)
    val applied = out.filter(_.getLong(2) == 1L)
    // ~50% hash-gated; deterministic, so the exact count is stable.
    assert(applied.length > 120 && applied.length < 280,
      s"hash gate far from 50%: ${applied.length}/400")
    applied.foreach { r =>
      val (text, fim) = (r.getString(1), r.getString(3))
      // Sentinels present, in PSM order.
      val pre = fim.indexOf("<PRE>"); val suf = fim.indexOf("<SUF>")
      val mid = fim.indexOf("<MID>")
      assert(pre == 0 && suf > 0 && mid > suf, s"bad PSM shape: $fim")
      // The three pieces partition the text: reassemble P+M+S.
      val p = fim.substring(5, suf)
      val sfx = fim.substring(suf + 5, mid)
      val m = fim.substring(mid + 5)
      assert(p + m + sfx == text, s"FIM pieces must reassemble the doc")
    }
    // Untouched rows pass through verbatim.
    out.filter(_.getLong(2) == 0L).foreach { r =>
      assert(r.getString(3) == r.getString(1))
    }
    // Deterministic under repartitioning.
    val again = Packing.fimTransform(docs.repartition(7), "doc_id", "text", fimPct = 50)
      .select(col("doc_id"), col("fim_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall(r => again(r.getLong(0)) == r.getString(3)))
  }

  test("tokenize->pack composition gate: every invariant bit holds on driver testdata") {
    val row = graft.SparkEntry.queries("x_tokenize_pack")(spark, graft.TestSpark.sf0001)
      .collect().head
    Seq("conservation_ok", "full_ok", "tile_ok", "count_ok").foreach(b =>
      assert(row.getAs[Long](b) == 1L, s"$b violated"))
    assert(row.getAs[Long]("n_docs") > 0)
    val fert = graft.SparkEntry.queries("x_fertility")(spark, graft.TestSpark.sf0001)
      .collect()
    assert(fert.nonEmpty)
    fert.foreach { r =>
      assert(r.getAs[Long]("bpe_bounds_ok") == 1L, r.getString(0))
      assert(r.getAs[Long]("bpe_merged_ok") == 1L, r.getString(0))
      // Subword fertility is >= 1 token per word by construction.
      assert(r.getAs[Long]("fertility_milli") >= 1000L, r.getString(0))
    }
  }
}
