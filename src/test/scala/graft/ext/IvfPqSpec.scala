package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** IVFADC (IvfPq): the composed serving index — IVF partition pruning
  * × residual-PQ byte economy × exact float re-rank. The probe must
  * (a) prune its ADC scan to the probed cells reading ONLY the packed
  * code, (b) score each code as dot(q̂, ref_cell) + residual-ADC (the
  * exact decomposition — verified here against a driver-side replay
  * off the saved side tables), (c) return EXACT cosine scores for
  * every surviving id, and (d) degrade to brute force when both
  * prunes are opened wide.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val table = "ivfpq_spec"

  private def dropAll(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${IvfIndex.centroidsTable(t)}")
    spark.sql(s"DROP TABLE IF EXISTS ${IvfPq.codebooksTable(t)}")
  }

  test("build + probe: cell-pruned 8-byte ADC scan, residual decomposition exact, exact re-rank scores, wide-open equals brute force") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val corpus = e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val q = e.where(col("vec_id") === 0).select("embedding").first().getSeq[Float](0)
    val n = corpus.count().toInt
    val (cents, books) = IvfPq.build(corpus, "vec_id", "embedding", table,
      kCells = 8, ivfIters = 2, m = 8, kPq = 16, pqIters = 2)
    try {
      // Side tables round-trip exactly (floats are lossless in parquet).
      assert(IvfIndex.centroids(spark, table) == cents)
      assert(IvfPq.codebooks(spark, table) == books)

      // Plan pin: the ADC stage partition-prunes on cluster_id and its
      // ReadSchema carries the 8-byte pq_code, never the float column.
      val adc = IvfPq.adcShortlist(spark, table, "vec_id", q, nProbe = 2,
        shortlist = 40)
      val plan = adc.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
        s"ADC scan must partition-prune on cluster_id:\n$plan")
      val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
      assert(readSchema.contains("pq_code"),
        s"ADC scan must read the packed code:\n$readSchema")
      assert(!readSchema.contains("embedding"),
        s"ADC scan must NOT read the float column — that is the byte " +
          s"economy the code column exists for:\n$readSchema")

      // Residual decomposition replayed driver-side off the saved side
      // tables: score(row) = dot(q̂, ref_cell) + Σ_j lut_j(code_j),
      // with q̂, the LUT folds, and the sum order matching the Column
      // expression term for term — bit-equal on every scored row.
      val qn = {
        val nn = math.sqrt(q.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
        if (nn == 0.0) q.map(_ => 0.0) else q.map(_.toDouble / nn)
      }
      val sub = books.head.head.size
      val luts = books.zipWithIndex.map { case (cents_, j) =>
        cents_.map(cv => cv.indices.foldLeft(0.0)((a, d) =>
          a + qn(j * sub + d) * cv(d).toDouble))
      }
      val cellDots = cents.map { c =>
        val r = IvfPq.unitRef(c)
        r.indices.foldLeft(0.0)((a, d) => a + qn(d) * r(d))
      }
      val scored = IvfPq.adcShortlist(spark, table, "vec_id", q, nProbe = 8,
        shortlist = n)
      val rows = spark.table(table)
        .join(scored, Seq("vec_id"))
        .select(col("vec_id"), col("cluster_id"), col("pq_code"),
          col("pq_score"))
        .collect()
      assert(rows.length == n)
      rows.foreach { r =>
        val code = r.getLong(2)
        val resAdc = (0 until books.size)
          .map(j => luts(j)((code >>> (8 * j)).toInt & 0xff))
          .reduceLeft(_ + _)
        val expect = cellDots(r.getInt(1)) + resAdc
        assert(r.getDouble(3) == expect,
          s"IVFADC score for ${r.getLong(0)} diverges from the " +
            s"driver-side residual decomposition replay")
      }

      // Probe scores are EXACT cosines: every returned id matches the
      // brute-force score bit-for-bit.
      val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, n)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val probed = IvfPq.probeTopK(spark, table, "vec_id", "embedding", q,
        k = 10, nProbe = 2).collect()
      assert(probed.length == 10)
      probed.foreach { r =>
        assert(brute(r.getLong(0)) == r.getDouble(1),
          s"re-ranked score for ${r.getLong(0)} is not the exact cosine")
      }

      // Both prunes opened wide (all cells, corpus-sized shortlist):
      // the probe IS brute force, row for row.
      val wide = IvfPq.probeTopK(spark, table, "vec_id", "embedding", q,
        k = 10, nProbe = 8, shortlist = n)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val bruteTop = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(wide == bruteTop,
        s"wide-open IVFADC must equal brute force:\n$wide\nvs\n$bruteTop")

      // Operating point: the production prune (nProbe 2 of 8, 4k
      // shortlist) keeps the recall floor the two-tier probes hold.
      val hits = probed.map(_.getLong(0)).toSet
        .intersect(bruteTop.map(_._1).toSet).size
      assert(hits >= 5, s"IVFADC recall collapsed: $hits of 10")
    } finally dropAll(table)
  }

  test("lifecycle: frozen-quantizer append serves immediately; append → delete → purge is probe-bit-identical") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val q = e.where(col("vec_id") === 0).select("embedding").first().getSeq[Float](0)
    val seed = e.where(col("vec_id") =!= 0 && col("vec_id") % 5 =!= 0)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val batch = e.where(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val t = "ivfpq_spec_lifecycle"
    IvfPq.build(seed, "vec_id", "embedding", t,
      kCells = 8, ivfIters = 2, m = 8, kPq = 16, pqIters = 2)
    try {
      val before = IvfPq.probeTopK(spark, t, "vec_id", "embedding", q,
        k = 10, nProbe = 8).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // Append under the FROZEN quantizers; the appended rows must be
      // servable at once, and their codes must be exactly what a build
      // with the same quantizers would store (encode is a pure
      // function — pinned by re-encoding the batch and comparing the
      // stored rows bit-for-bit).
      IvfPq.append(spark, t, batch, "vec_id", "embedding")
      val stored = spark.table(t)
        .join(batch.select(col("vec_id")), Seq("vec_id"), "left_semi")
      val cents = IvfIndex.centroids(spark, t)
      val books = IvfPq.codebooks(spark, t)
      val refs = cents.map(IvfPq.unitRef)
      val reEnc = Pq.packCodesOn(
          Pq.withUnit(Similarity.ivfAssign(batch, "vec_id", "embedding", cents),
            "embedding", "__u")
            .withColumn("__r",
              zip_with(col("__u"),
                element_at(
                  array(refs.map(r => array(r.map(lit): _*)): _*),
                  col("cluster_id").cast("int") + 1),
                (a, b) => a - b)),
          "__r", "pq_code", books)
        .select(col("vec_id"), col("pq_code"), col("cluster_id"))
      val storedCodes = stored.select(col("vec_id"), col("pq_code"), col("cluster_id"))
      assert(storedCodes.exceptAll(reEnc).count() == 0 &&
          reEnc.exceptAll(storedCodes).count() == 0,
        "appended codes must equal a fresh encode under the frozen quantizers")
      // The appended mass is probe-visible: wide-open probe now equals
      // brute force over seed ∪ batch.
      val union = seed.unionByName(batch).localCheckpoint(true)
      val afterAppend = IvfPq.probeTopK(spark, t, "vec_id", "embedding", q,
        k = 10, nProbe = 8, shortlist = union.count().toInt)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val bruteUnion = Similarity.bruteForceTopK(union, "vec_id", "embedding", q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(afterAppend == bruteUnion,
        "wide-open probe after append must equal brute force on the union")
      // Takedown: tombstoned ids vanish from probes BEFORE any purge.
      IvfPq.delete(spark, t, batch.select(col("vec_id").as("id")))
      val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
      val hidden = IvfPq.probeTopK(spark, t, "vec_id", "embedding", q,
        k = 10, nProbe = 8).collect().map(_.getLong(0))
      assert(hidden.forall(!batchIds.contains(_)),
        "tombstoned ids must not surface in probes")
      // Physical purge: removed count is the batch, and the probe is
      // BIT-IDENTICAL to the pre-append index — the full round trip.
      val removed = IvfPq.purgeTombstones(spark, t, "vec_id")
      assert(removed == batch.count(),
        s"purge must remove exactly the batch, got $removed")
      val after = IvfPq.probeTopK(spark, t, "vec_id", "embedding", q,
        k = 10, nProbe = 8).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(after == before,
        "append → delete → purge must return probe results bit-identical " +
          "to the pre-append index")
      // Purge is idempotent (no tombstones left).
      assert(IvfPq.purgeTombstones(spark, t, "vec_id") == 0L)
    } finally {
      dropAll("ivfpq_spec_lifecycle")
      spark.sql("DROP TABLE IF EXISTS ivfpq_spec_lifecycle_tombstones")
    }
  }

  test("probeBatch: N queries, two corpus contacts, bit-identical to per-query probeTopK; tombstones honored") {
    import spark.implicits._
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val qs = e.where(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq.sortBy(_._1)
    val corpus = e.where(col("vec_id") >= 3)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val t = "ivfpq_batch_spec"
    dropAll(t)
    spark.sql(s"DROP TABLE IF EXISTS ${t}_tombstones")
    IvfPq.build(corpus, "vec_id", "embedding", t,
      kCells = 8, ivfIters = 1, m = 8, kPq = 16, pqIters = 1)
    def singlesOf(k: Int, nProbe: Int) = qs.map { case (qid, q) =>
      IvfPq.probeTopK(spark, t, "vec_id", "embedding", q, k, nProbe)
        .select(lit(qid).as("query_id"), col("vec_id"), col("cos_sim"))
    }.reduce(_ unionAll _).localCheckpoint(true)
    def batchOf(k: Int, nProbe: Int) =
      IvfPq.probeBatch(spark, t, "vec_id", "embedding", qs, k, nProbe)
        .localCheckpoint(true)
    // Exact-cosine rows per query equal the single probe's, both
    // directions, at a narrow AND a wide probe width.
    Seq((10, 2), (10, 8)).foreach { case (k, np) =>
      val b = batchOf(k, np)
      val s1 = singlesOf(k, np)
      assert(b.exceptAll(s1).count() == 0 && s1.exceptAll(b).count() == 0,
        s"batch != per-query at k=$k nProbe=$np")
      assert(b.where(col("query_id") === qs.head._1).count() == k)
    }
    // Plan pin on the batched ADC stage: the one scan is
    // partition-pruned to the probed-cell union and reads ONLY the
    // packed code — never the float column (adcShortlist's contract
    // applied to the batch path).
    locally {
      val cents = IvfIndex.centroids(spark, t)
      val books = IvfPq.codebooks(spark, t)
      val probed = qs.map { case (qid, q) =>
        qid -> Similarity.probeClusters(cents, q, 2)
      }.toMap
      val stage = IvfPq.adcBatchShortlist(spark, t, "vec_id", qs,
        probed, probed.values.flatten.toSeq.distinct, cents, books, 40)
      val plan = stage.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
        s"batched ADC scan must partition-prune on cluster_id:\n$plan")
      val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
      assert(read.contains("pq_code") && !read.contains("embedding"),
        s"batched ADC scan must read the packed code only: $read")
      // Kernel ≡ flat bit-identity: the batched stage (graft_ivfadc
      // kernel in this session) must score every (query, row) pair
      // EXACTLY like the single probe's flat ivfadcScore expression
      // (adcShortlist) — same cells, wide-open shortlist, doubles
      // compared bit-for-bit via the set equality.
      val wide = IvfPq.adcBatchShortlist(spark, t, "vec_id", qs,
          probed, probed.values.flatten.toSeq.distinct, cents, books, 1000000)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet).toMap
      qs.foreach { case (qid, q) =>
        val single = IvfPq.adcShortlist(spark, t, "vec_id", q, 2, 1000000)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
        assert(wide.getOrElse(qid, Set.empty) == single,
          s"kernel batch scores != single-probe ADC scores for query $qid")
      }
    }
    // Tombstoned ids vanish from the batch exactly as from singles.
    val victim = batchOf(10, 8).where(col("query_id") === qs.head._1)
      .select(col("vec_id")).first().getLong(0)
    IvfPq.delete(spark, t, Seq(victim).toDF("id"))
    val b2 = batchOf(10, 8)
    val s2 = singlesOf(10, 8)
    assert(b2.where(col("vec_id") === victim).count() == 0,
      "tombstoned id must vanish from the batch probe")
    assert(b2.exceptAll(s2).count() == 0 && s2.exceptAll(b2).count() == 0)
    spark.sql(s"DROP TABLE ${t}_tombstones")
    // Degenerate fan-out: nProbe = 0 gives every query an EMPTY
    // probed-cell list — the typed-empty-array guard must degrade to
    // an empty result (same as the single probe), not an analysis
    // error from an array<null> literal inside the kernel struct.
    val none = IvfPq.probeBatch(spark, t, "vec_id", "embedding", qs,
      k = 10, nProbe = 0)
    assert(none.count() == 0, "nProbe=0 batch must return empty, not throw")
    assert(none.columns.toSeq == Seq("query_id", "vec_id", "cos_sim"))
    dropAll(t)
  }

  test("streamIngest: frozen-quantizer shards rebuild the one-shot index bit-for-bit; probes serve both layouts; purge refuses the streaming layout") {
    import java.nio.file.{Files, Paths}
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val q = e.where(col("vec_id") === 0).select("embedding").first().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val tRef = "ivfpq_spec_stream_ref"
    val tS = "ivfpq_spec_stream"
    val (cents, books) = IvfPq.build(corpus, "vec_id", "embedding", tRef,
      kCells = 8, ivfIters = 2, m = 8, kPq = 16, pqIters = 2)
    // Two single-file shards by parity — arrival order is the reverse
    // of id order, so row-bit-equality proves order independence.
    val base = Files.createTempDirectory("graft_ivfpq_stream_spec_").toString
    val inDir = s"$base/in"
    Files.createDirectories(Paths.get(inDir))
    Seq(corpus.where(pmod(col("vec_id"), lit(2)) === 1),
        corpus.where(pmod(col("vec_id"), lit(2)) === 0))
      .zipWithIndex.foreach { case (df, i) =>
        val w = s"$base/w$i"
        df.coalesce(1).write.mode("overwrite").parquet(w)
        val part = new java.io.File(w).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .get
        Files.move(part.toPath, Paths.get(inDir, s"shard_$i.parquet"))
      }
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val (_, nBatches) = IvfPq.streamIngest(spark, tS, stream,
      "vec_id", "embedding", cents, books, queryName = "ivfpq_stream_spec")
    try {
      assert(nBatches == 2, s"expected 2 micro-batches, got $nBatches")
      // Frozen-quantizer encode is pure: the streamed rows equal the
      // one-shot build's rows exactly (id, code, cell).
      def rows(t: String) = spark.table(t)
        .select(col("vec_id"), col("pq_code"), col("cluster_id"))
      assert(rows(tS).exceptAll(rows(tRef)).count() == 0 &&
          rows(tRef).exceptAll(rows(tS)).count() == 0,
        "streamed rows must be bit-identical to the one-shot build's")
      // The streaming layout serves probes identically (bucket pruning
      // stands in for partition pruning until compact).
      def probe(t: String) = IvfPq.probeTopK(spark, t, "vec_id",
          "embedding", q, k = 10, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val refProbe = probe(tRef)
      assert(probe(tS) == refProbe,
        "streamed-index probe diverges from the build-layout probe")
      // Physical purge would clobber the batch-tag layout — refused.
      IvfPq.delete(spark, tS,
        corpus.limit(1).select(col("vec_id").as("id")))
      val ex = intercept[IllegalArgumentException](
        IvfPq.purgeTombstones(spark, tS, "vec_id"))
      assert(ex.getMessage.contains("streaming"),
        s"refusal must point at the layout: ${ex.getMessage}")
      spark.sql(s"DROP TABLE IF EXISTS ${tS}_tombstones")
      // Compact collapses the per-batch partitions; probes unchanged.
      val merged = IvfPq.compact(spark, tS)
      assert(merged == 2, s"expected 2 partitions merged, got $merged")
      assert(probe(tS) == refProbe,
        "compact must preserve probe results bit-for-bit")
    } finally {
      dropAll(tRef)
      dropAll(tS)
      spark.sql(s"DROP TABLE IF EXISTS ${tS}_tombstones")
    }
  }
}
