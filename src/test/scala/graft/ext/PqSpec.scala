package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Product-quantization semantics on hand-built goldens (hand-packed
  * codes, ADC scores, scale invariance, Lloyd fixpoints) plus the
  * recall floor on the driver embeddings table.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // m=2 subspaces of dim 2; axis-aligned codebooks.
  private val books: Seq[Seq[Seq[Float]]] =
    Seq(Seq(Seq(1f, 0f), Seq(0f, 1f)), Seq(Seq(1f, 0f), Seq(0f, 1f)))

  test("encodePacked: hand-derived codes and packing layout") {
    val docs = Seq(
      (1L, Seq(1f, 0f, 1f, 0f)),   // codes (0,0) -> packed 0
      (2L, Seq(0f, 1f, 0f, 1f)),   // codes (1,1) -> packed 1 + 256
      (3L, Seq(1f, 0f, 0f, 1f)))   // codes (0,1) -> packed 256
      .toDF("vec_id", "embedding")
    val got = Pq.encodePacked(docs, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 257L, 3L -> 256L))
  }

  test("codes are scale-invariant (normalization before encoding)") {
    val docs = Seq(
      (1L, Seq(1f, 0f, 0f, 1f)),
      (2L, Seq(5f, 0f, 0f, 5f)),
      (3L, Seq(0.01f, 0f, 0f, 0.01f))).toDF("vec_id", "embedding")
    val got = Pq.encodePacked(docs, "vec_id", "embedding", books)
      .collect().map(_.getLong(1)).toSet
    assert(got.size == 1, s"scaled copies must share one code: $got")
  }

  test("probeTopK: ADC scores are the hand-computed LUT sums; ties break by id") {
    val docs = Seq(
      (1L, Seq(1f, 0f, 1f, 0f)),
      (2L, Seq(0f, 1f, 0f, 1f)),
      (3L, Seq(1f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val enc = Pq.encodePacked(docs, "vec_id", "embedding", books)
    val got = Pq.probeTopK(enc, "vec_id", Seq(1f, 0f, 1f, 0f), books, 3)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("pq_score")))
    val s = math.sqrt(0.5)
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L))
    assert(math.abs(got(0)._2 - 2 * s) < 1e-12)   // 0.707 + 0.707
    assert(math.abs(got(1)._2 - s) < 1e-12)       // 0.707 + 0
    assert(math.abs(got(2)._2 - 0.0) < 1e-12)
  }

  test("trainCodebooks: a two-pattern corpus is a Lloyd fixpoint; encode separates it") {
    val docs = (0L until 20L).map { id =>
      if (id % 2 == 0) (id, Seq(1f, 0f, 0f, 1f)) else (id, Seq(0f, 1f, 1f, 0f))
    }.toDF("vec_id", "embedding")
    val trained = Pq.trainCodebooks(docs, "vec_id", "embedding", m = 2, k = 2, iters = 2)
    assert(trained.size == 2 && trained.forall(_.size == 2))
    val s = (1.0 / math.sqrt(2)).toFloat
    // Seeds are ids 0 and 1's (normalized) subvectors; each pattern's
    // assigned mean IS its seed, so Lloyd is at a fixpoint.
    assert(trained(0)(0).zip(Seq(s, 0f)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(trained(0)(1).zip(Seq(0f, s)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    val enc = Pq.encodePacked(docs, "vec_id", "embedding", trained)
    val byParity = enc.collect().groupBy(_.getLong(0) % 2).map {
      case (p, rows) => p -> rows.map(_.getLong(1)).toSet
    }
    assert(byParity(0L).size == 1 && byParity(1L).size == 1)
    assert(byParity(0L) != byParity(1L), "patterns must encode apart")
    // Probe with one pattern retrieves exactly that parity class first.
    val top = Pq.probeTopK(enc, "vec_id", Seq(1f, 0f, 0f, 1f), trained, 10)
      .collect().map(_.getLong(0))
    assert(top.toSeq == (0L until 20L by 2).toSeq,
      s"even ids (id-tiebreak order) expected, got ${top.toSeq}")
  }

  test("probeBatch: one scan answers N queries identically to N single probes") {
    val docs = (0L until 30L).map { id =>
      val a = ((id % 7) + 1).toFloat; val b = ((id % 5) + 1).toFloat
      (id, Seq(a, b, b, a))
    }.toDF("vec_id", "embedding")
    val trained = Pq.trainCodebooks(docs, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    val enc = Pq.encodePacked(docs, "vec_id", "embedding", trained)
    val qs = Seq(100L -> Seq(1f, 0f, 0f, 1f), 200L -> Seq(0f, 1f, 1f, 0f),
      300L -> Seq(1f, 1f, 1f, 1f))
    val batch = Pq.probeBatch(enc, "vec_id", qs, trained, topK = 5)
      .collect().map(_.toSeq)
    assert(batch.length == 15)
    val singles = qs.flatMap { case (qid, q) =>
      Pq.probeTopK(enc, "vec_id", q, trained, 5)
        .collect().map(r => Seq(qid, r.getLong(0), r.getAs[Double]("pq_score")))
    }
    assert(batch.toSet == singles.toSet,
      s"batch != singles: extra=${batch.toSet -- singles.toSet} missing=${singles.toSet -- batch.toSet}")
    // Batch output is grouped by query, score-desc with id tiebreak.
    assert(batch.map(_.head.asInstanceOf[Long]).toSeq == batch.map(_.head.asInstanceOf[Long]).sortBy(identity).toSeq)
  }

  test("recall on driver embeddings: ADC floor holds; shortlist-50 re-rank recovers the exact set") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 0).localCheckpoint(true)
    // The x_pq_recall operating point (measured: ADC-only 5/10,
    // reranked 10/10 on this near-isotropic fixture — PQ's hard case).
    val books = Pq.trainCodebooks(corpus, "vec_id", "embedding", m = 8, k = 128, iters = 3)
    val enc = Pq.encodePacked(corpus, "vec_id", "embedding", books)
      .localCheckpoint(true)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .select(col("vec_id")).localCheckpoint(true)
    val adc = Pq.probeTopK(enc, "vec_id", q, books, 10).select(col("vec_id"))
    val adcHits = exact.join(adc, Seq("vec_id")).count()
    info(s"ADC-only recall@10 = $adcHits/10")
    assert(adcHits >= 3, s"ADC recall collapsed: $adcHits/10")
    val rr = Pq.probeTopKReranked(enc, corpus, "vec_id", "embedding", q, books,
      topK = 10, shortlist = 50).select(col("vec_id"))
    val rrHits = exact.join(rr, Seq("vec_id")).count()
    info(s"reranked recall@10 = $rrHits/10")
    assert(rrHits >= 9, s"reranked recall collapsed: $rrHits/10")
    // Re-ranked scores are the exact cosine — on the members of the
    // exact top-10 that the shortlist caught, order must agree.
    val exactOrder = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val rrOrder = Pq.probeTopKReranked(enc, corpus, "vec_id", "embedding", q, books,
      topK = 10, shortlist = 50).collect().map(_.getLong(0)).toSeq
    assert(rrOrder.filter(exactOrder.contains) ==
      exactOrder.filter(rrOrder.contains),
      "re-ranked order must equal exact order on the intersection")
  }
}
