package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The operating-point advisor (OperatingPoint.nProbeCurve): probing
  * every cell is the truth (recall 1000, always recommended at or
  * below the widest point), the curve is monotone in nProbe, and the
  * probed top-k at each point matches an independently computed
  * probeClusters + per-cell recompute on a hand fixture. */
class OperatingPointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("full-width probe is the truth; curve monotone; recommendation is the smallest clearing point") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val corpus = e.where(col("vec_id") < 200)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    val rows = OperatingPoint.nProbeCurve(corpus, "vec_id", "embedding",
        corpus.where(col("vec_id") < 6), cents,
        nProbes = Seq(1, 2, 4, 8), k = 5, targetRecallMilli = 950L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L), rows.mkString(","))
    rows.foreach { case (_, na, k, _, _, _, _) =>
      assert(na == 6L && k == 5L, rows.mkString(","))
    }
    // nProbe = kCells probes every cell: the probed top-k IS the truth.
    val full = rows.last
    assert(full._5 == 1000L && full._4 == 6L * 5L,
      s"full-width probe must be the truth: $full")
    // Monotone: more probed cells can only grow the overlap.
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted,
      s"overlap must be monotone in nProbe: ${rows.mkString(",")}")
    // The recommendation is the smallest sampled point clearing 950.
    val expect = rows.find(_._5 >= 950L).map(_._1).getOrElse(-1L)
    rows.foreach { case (_, _, _, _, _, _, rec) =>
      assert(rec == expect, s"recommended $rec != smallest clearing $expect")
    }
  }

  test("both candidate frames' rank filters compile to WindowGroupLimit (partial top-k pre-shuffle)") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val corpus = e.where(col("vec_id") < 150)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 4)
    val anchors = corpus.where(col("vec_id") < 4)
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      // Execute THIS QueryExecution so AQE finalizes it, then read it
      // (a fresh action would build a new one — the playbook rule).
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.toString
    }
    val (a, aCells) = OperatingPoint.anchorFrames(
      "vec_id", "embedding", anchors, cents)
    val pn = finalPlan(OperatingPoint.nProbeCand(
      corpus, "vec_id", "embedding", a, aCells, cents, 5))
    assert(pn.contains("WindowGroupLimit"),
      s"nProbeCand's per-(anchor,cell) top-k must group-limit:\n$pn")
    val aq = graft.ext.Quantize.withQuantized(
        anchors.select(col("vec_id"), col("embedding")), "embedding", "__aqv")
      .select(col("vec_id").as("anchor_id"),
        col("embedding").as("__avec"), col("__aqv"))
    val probed = aCells.where(col("cell_rank") <= 2)
      .select(col("anchor_id"), col("cluster_id"))
    val ps = finalPlan(OperatingPoint.shortlistCand(
      corpus, "vec_id", "embedding", broadcast(aq), probed, cents, 5, 20))
    assert(ps.contains("WindowGroupLimit"),
      s"shortlistCand's rank branches must group-limit:\n$ps")
  }

  test("shortlistCurve: a corpus-wide width is the truth; curve monotone; recommendation is the smallest clearing width") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val corpus = e.where(col("vec_id") < 150)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 4)
    val rows = OperatingPoint.shortlistCurve(corpus, "vec_id", "embedding",
        corpus.where(col("vec_id") < 5), cents,
        nProbe = 4, shortlists = Seq(5, 10, 200), k = 5,
        targetRecallMilli = 950L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(7),
        if (r.isNullAt(8)) -1L else r.getLong(8)))
    assert(rows.map(_._1).toSeq == Seq(5L, 10L, 200L), rows.mkString(","))
    rows.foreach { case (_, na, k, np, _, _, _, _) =>
      assert(na == 5L && k == 5L && np == 4L, rows.mkString(","))
    }
    // nProbe = 4 of 4 cells probes everything; shortlist 200 > corpus,
    // so the quantized shortlist contains every row: recall 1000.
    assert(rows.last._6 == 1000L && rows.last._5 == 5L * 5L,
      s"corpus-wide shortlist must be the truth: ${rows.mkString(",")}")
    assert(rows.map(_._5).toSeq == rows.map(_._5).toSeq.sorted,
      s"overlap must be monotone in shortlist: ${rows.mkString(",")}")
    val expect = rows.find(_._6 >= 950L).map(_._1).getOrElse(-1L)
    rows.foreach { case (_, _, _, _, _, _, _, rec) =>
      assert(rec == expect, s"recommended $rec != smallest clearing $expect")
    }
  }

  test("shortlistCurve overlap matches an independent local quantize + dual-order recompute") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val corpus = e.where(col("vec_id") < 120)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 4)
    val anchors = corpus.where(col("vec_id") < 4)
    val k = 5
    val nProbe = 2
    val got = OperatingPoint.shortlistCurve(corpus, "vec_id", "embedding",
        anchors, cents, nProbe, shortlists = Seq(5, 15), k = k)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("embedding"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq,
        r.getInt(2))).toSeq
    val avecs = anchors.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    def cosF(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (s0, (x, y)) =>
        s0 + x.toDouble * y.toDouble }
      def n(v: Seq[Float]) = math.sqrt(v.foldLeft(0.0)((s0, x) =>
        s0 + x.toDouble * x.toDouble))
      dot / (n(a) * n(b))
    }
    def cosQ(a: Seq[Float], b: Seq[Float]): Option[Double] = {
      val qa = Quantize.quantizeLocal(a)
      val qb = Quantize.quantizeLocal(b)
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      val den = math.sqrt(qa.map(x => x * x).sum) *
        math.sqrt(qb.map(x => x * x).sum)
      if (den == 0.0) None else Some(dot / den)
    }
    for (sl <- Seq(5, 15)) {
      val overlap = avecs.map { case (aid, av) =>
        val cells = Similarity.probeClusters(cents, av, nProbe).toSet
        val probed = assigned.filter(r => r._1 != aid && cells(r._3))
        val topF = probed.map { case (id, v, _) => (id, cosF(v, av)) }
          .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
        val topQ = probed.map { case (id, v, _) => (id, cosQ(v, av)) }
          .sortBy { case (id, c) => (c.map(-_).getOrElse(Double.MaxValue), id) }
          .take(sl).map(_._1).toSet
        (topF intersect topQ).size.toLong
      }.sum
      assert(got(sl.toLong) == overlap,
        s"shortlist=$sl: curve ${got(sl.toLong)} != independent $overlap")
    }
  }

  test("per-point recall matches an independent probeClusters + restricted brute force") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val corpus = e.where(col("vec_id") < 150)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 4)
    val anchors = corpus.where(col("vec_id") < 4)
    val k = 5
    val got = OperatingPoint.nProbeCurve(corpus, "vec_id", "embedding",
        anchors, cents, nProbes = Seq(1, 2), k = k)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // Independent recompute: per anchor, the probed cell set comes from
    // probeClusters (the serving path's ranking), membership from
    // ivfAssign, top-k from a plain sort — no OperatingPoint code.
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("embedding"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq,
        r.getInt(2))).toSeq
    val avecs = anchors.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (s0, (x, y)) =>
        s0 + x.toDouble * y.toDouble }
      def n(v: Seq[Float]) = math.sqrt(v.foldLeft(0.0)((s0, x) =>
        s0 + x.toDouble * x.toDouble))
      dot / (n(a) * n(b))
    }
    for (np <- Seq(1, 2)) {
      val overlap = avecs.map { case (aid, av) =>
        val cells = Similarity.probeClusters(cents, av, np).toSet
        def topK(rows: Seq[(Long, Seq[Float], Int)]) =
          rows.filter(_._1 != aid)
            .map { case (id, v, _) => (id, cos(v, av)) }
            .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
        val truth = topK(assigned)
        val probed = topK(assigned.filter(r => cells(r._3)))
        (probed intersect truth).size.toLong
      }.sum
      assert(got(np.toLong) == overlap,
        s"nProbe=$np: curve ${got(np.toLong)} != independent $overlap")
    }
  }
}
