package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** One self-triaged regression flag: this run's min, its re-measure,
    * the floor, the previous run's time if known, the adjudicated
    * verdict. */
  private[graft] case class Flag(name: String, run: Double, recheck: Double,
      floor: Double, prev: Option[Double], verdict: String)

  private[graft] def fmtSec(v: Double): String =
    if (v < 0) "-1" else f"$v%.4f"

  private[graft] def flagJson(f: Flag): String = {
    val prevField = f.prev.map(p => ",\"prev\":" + fmtSec(p)).getOrElse("")
    "\"" + f.name + "\":{\"run\":" + fmtSec(f.run) +
      ",\"recheck\":" + fmtSec(f.recheck) +
      ",\"floor\":" + fmtSec(f.floor) + prevField +
      ",\"verdict\":\"" + f.verdict + "\"}"
  }

  /** Cap for every unbounded map in the printed closing line. */
  private[graft] val SummaryTopN = 5

  /** The compact closing line printed to stdout. The driver keeps only
    * the LAST ~2000 chars of output and parses the final JSON line in
    * that window; round 20's line overflowed it (a large `regressed`
    * map) and never parsed — BENCH_r20.json `parsed: null`, and PERF
    * round-over-round went dark for two rounds (VERDICT r21 #2). So
    * every unbounded collection is CAPPED here: `regressed` keeps the
    * [[SummaryTopN]] worst flags ("confirmed" verdicts first, then
    * largest run/floor ratio) with `n_regressed` carrying the true
    * count; `slowest` and `failed` keep [[SummaryTopN]] entries
    * (`n_failed` the true count); env-provided paths are tail-
    * truncated. BenchLineSpec proves the worst case (longest registry
    * names, every field populated, every cap hit) stays under 1900
    * bytes. The COMPLETE maps are in BENCH_FULL.json either way. */
  private[graft] def renderSummary(total: Double, reps: Int, nQueries: Int,
      famJson: String, streamingFixed: String, machineryJson: String,
      floorTotal: Double, flags: Seq[Flag], confirmedCount: Int,
      driftJson: String, slowest: Seq[(String, Double)],
      failed: Seq[String], outPath: String, sfDir: String): String = {
    def cap(s: String, n: Int) =
      if (s.length <= n) s else "..." + s.takeRight(n - 3)
    val topFlags = flags.sortBy(f =>
      (f.verdict != "confirmed", -(f.run / math.max(f.floor, 1e-9))))
      .take(SummaryTopN)
    val regressedJson = topFlags.map(flagJson).mkString("{", ",", "}")
    val slowJson = slowest.take(SummaryTopN)
      .map { case (k, v) => "\"" + k + "\":" + fmtSec(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.take(SummaryTopN)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":${fmtSec(total)},"unit":"sec","reps":$reps,"n_queries":$nQueries,"families":$famJson,"streaming_fixed_s":$streamingFixed,$machineryJson,"floor_total":${fmtSec(floorTotal)},"regressed":$regressedJson,"n_regressed":${flags.size},"confirmed_regressions":$confirmedCount,$driftJson,"slowest":$slowJson,"failed":$failedJson,"n_failed":${failed.size},"queries_file":"${cap(outPath, 80)}","sf":"${cap(sfDir, 80)}"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // House overwrite discipline: every partitioned overwrite-insert
      // is a dynamic per-partition replace (Writer
      // .ensureDynamicOverwrite doc) — set once at startup so the
      // library's latch never has to mutate conf mid-run.
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT, janino codegen-compile and parquet-footer
    // costs land here, not in the first timed query — timings then
    // measure the plans, not JVM cold start. The heavy pipelines are
    // warmed at sf0.001: identical plan shapes (janino caches the
    // generated classes; the JIT warms the interpreter paths) on
    // ~1/100th of the data.
    val warmDir = "/root/testdata/sf0.001"
    Seq("q_count_events", "x_minhash_neardup", "x_neardup_dedup",
        "q_stream_daily_counts", "pipeline_gap_report",
        "x_cosine_pairs_label").foreach { q =>
      try SparkEntry.queries(q)(spark,
        if (new java.io.File(warmDir).isDirectory) warmDir else sfDir).count()
      catch { case _: Throwable => () }
    }
    // Failures are recorded per query (value -1), never silently timed:
    // a broken query must not masquerade as a fast one.
    //
    // NOISE IMMUNITY: each query is timed `reps` times and the headline
    // per-query number is the MINIMUM — plans are deterministic, so the
    // min is the contention-free estimate; a single timed run records
    // whatever GC / page-cache / co-tenant pressure happened to coincide
    // (round-4's driver artifact recorded 5–20× inflation on queries
    // whose code had not changed). All raw runs are kept in "runs" so a
    // reader can see the spread.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Optional regex filter (local profiling only — the driver runs the
    // full surface): time only matching query names.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)

    def timeQueries(names: Set[String]): Seq[(String, Seq[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => names.contains(name) }
        .map { case (name, fn) =>
          val times = (0 until reps).map { _ =>
            // Operators persist multi-consumer intermediates (bands, pair
            // sets, daily aggregates) for the duration of their query; clear
            // them between measurements so storage doesn't accumulate across
            // 50 queries, no query reuses another's cache, and every rep
            // pays the full pipeline (not a cached tail).
            spark.sqlContext.clearCache()
            // clearCache only empties the SQL CacheManager — localCheckpoint
            // barriers (Checkpoints.stage) are plain persisted RDDs freed by
            // the ASYNC ContextCleaner on GC. Checkpoint-heavy queries' dead
            // blocks otherwise pile up across reps (r13 rep arrays grew
            // monotonically: x_cluster_split 5.5 → 11.9 → 30.3 s). Every rep
            // rebuilds from scratch, so a blocking sweep is always safe and
            // makes reps i.i.d.
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              -1.0
            }
          }
          (name, times)
        }

    val selected = SparkEntry.queries.keySet
      .filter(name => filter.forall(_.findFirstIn(name).isDefined))
    val results = timeQueries(selected)
    def fmt(v: Double) = if (v < 0) "-1" else f"$v%.4f"
    val best = results.map { case (k, ts) =>
      (k, if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = best.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = best.map(_._2).filter(_ >= 0).sum
    // PER-QUERY FLOOR DIFF — the noise-proof regression signal. The
    // committed BENCH_FLOOR.json holds the best-known min per query
    // (updated ONLY downward, so co-tenant-inflated runs can never
    // poison it) AND the sf dir that set it — floors from a different
    // sf are meaningless, so a mismatched file is neither compared
    // against nor overwritten. Likewise an EXISTING file that fails to
    // read/parse is left alone (rewriting it from an empty floor would
    // destroy the committed ratchet history); only a genuinely absent
    // file starts fresh.
    val floorPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FLOOR", "BENCH_FLOOR.json")
    val floorText: Option[String] =
      if (!new java.io.File(floorPath).exists()) None
      else try {
        val src = scala.io.Source.fromFile(floorPath, "UTF-8")
        Some(try src.mkString finally src.close())
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not read $floorPath: ${e.getMessage}")
        Some("")
      }
    // Fixed-cost clamp applied at READ time: the flag line for the
    // stateful stream joins compares against their fixed cost, not a
    // lucky-window min (see BenchFloor.FixedCostMinSec).
    val parsed =
      BenchFloor.clamped(floorText.map(BenchFloor.parse).getOrElse(Map.empty))
    val fileSf = floorText.flatMap(BenchFloor.parseSf)
    val sfMatches = fileSf.forall(_ == sfDir)
    // Core-count gate (r22, VERDICT r21 #3): at sf0.1 the bench is
    // fixed-per-partition-overhead bound, so floors set at a different
    // core count are not comparable IN EITHER DIRECTION (the driver's
    // r21 8-core leg ratcheted 43 committed 32-core floors below any
    // 32-core-reachable value). Mismatch = ignore + never write, same
    // as an sf mismatch; stampless legacy files match and get stamped
    // on the next write.
    val fileCpus = floorText.flatMap(BenchFloor.parseCpus)
    val cpusMatches = fileCpus.forall(_ == cpus)
    // "Readable" ≠ "has entries": an empty-but-valid floor file ({} or
    // sf-stamp-only) must stay writable or the ratchet wedges forever
    // (BenchFloor.readable; the IO-failure path reaches here as "").
    val readOk = floorText.forall(BenchFloor.readable)
    if (!sfMatches)
      System.err.println(s"[bench] $floorPath is for sf ${fileSf.get}, this run " +
        s"is $sfDir — floors ignored and file left untouched")
    if (!cpusMatches)
      System.err.println(s"[bench] $floorPath is for cpus ${fileCpus.get}, " +
        s"this run is cpus $cpus — floors ignored and file left untouched")
    if (!readOk)
      System.err.println(s"[bench] existing $floorPath unreadable — " +
        "floors ignored and file left untouched (NOT rewritten from empty)")
    val writeAllowed = sfMatches && cpusMatches && readOk
    val floorRaw: Map[String, Double] =
      if (writeAllowed) parsed else Map.empty
    // Zombie floors (renamed/deleted queries): warn always; on a FULL
    // run — where registry membership is authoritative — drop them so
    // they can't linger forever (merge keeps run-absent keys by design,
    // for filtered runs).
    val zombies = BenchFloor.zombies(floorRaw, SparkEntry.queries.keySet)
    if (zombies.nonEmpty)
      System.err.println(s"[bench] floor keys not in the query registry: " +
        zombies.mkString(", ") +
        (if (filter.isEmpty) " — dropped (full run)" else " — kept (filtered run)"))
    val floor = if (filter.isEmpty) floorRaw -- zombies else floorRaw
    val bestMap = best.toMap
    // EMPTY-DIFF AWARENESS (VERDICT r15 #5): the previous run's
    // artifact carries a fingerprint of the engine source; when this
    // run's source is byte-identical (and same sf), a recheck-surviving
    // flag adjudicates "environment", never "confirmed" — identical
    // code cannot regress. The previous per-query times ride along so
    // every flag entry shows "prev", and the uniform-drift signature
    // (median this-run/prev-run ratio) is published either way.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    val srcFp = {
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(files)
        else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
      // Detect the repo root by walking up from the cwd to the first
      // directory holding src/main/scala, so a bench JVM launched from
      // a subdirectory still fingerprints the same bytes (paths are
      // hashed RELATIVE to that root — launch-dir-independent, and
      // byte-identical to the old cwd-relative strings when launched
      // from the root, preserving fingerprint continuity).
      val repoRoot: Option[java.io.File] = {
        var d: java.io.File =
          new java.io.File(".").getCanonicalFile
        var found: Option[java.io.File] = None
        var hops = 0
        while (found.isEmpty && d != null && hops < 8) {
          if (new java.io.File(d, "src/main/scala").isDirectory)
            found = Some(d)
          d = d.getParentFile
          hops += 1
        }
        found
      }
      repoRoot match {
        case None =>
          System.err.println("[bench] no src/main/scala above the cwd — " +
            "src fingerprint empty; identical-code adjudication disabled")
          ""
        case Some(rootDir) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          files(new java.io.File(rootDir, "src/main/scala")).foreach { f =>
            md.update(rootDir.toPath.relativize(f.toPath).toString
              .getBytes("UTF-8"))
            // COMMENT-INSENSITIVE (VERDICT r19 #1): hash the
            // comment-stripped, whitespace-collapsed source
            // (BenchFloor.normalizeSource, string-literal-aware), so a
            // scaladoc-only commit between two benches cannot flip
            // code_changed=true and turn co-tenant load flags into
            // "confirmed" — only bytes that can change the measured
            // engine participate in the identical-code adjudication.
            md.update(BenchFloor.normalizeSource(new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
              .getBytes("UTF-8"))
          }
          // The "identical code" adjudication must see EVERYTHING that
          // changes the measured engine, not just .scala sources: a
          // javaOptions edit in build.sbt or a Spark jar upgrade is a
          // real, reproducible perf change that would otherwise
          // auto-label "environment" and vanish from
          // confirmed_regressions. Resolved against the detected root
          // (round-17 advice #3: the cwd-relative path silently lost
          // this signal from any other launch dir) and loudly absent.
          val sbt = new java.io.File(rootDir, "build.sbt")
          if (sbt.isFile)
            md.update(java.nio.file.Files.readAllBytes(sbt.toPath))
          else
            System.err.println(s"[bench] build.sbt missing at $rootDir — " +
              "fingerprint excludes build config")
          md.update(org.apache.spark.SPARK_VERSION.getBytes("UTF-8"))
          md.digest().map("%02x".format(_)).mkString
      }
    }
    val prevText: String =
      try {
        val f = new java.io.File(outPath)
        if (!f.exists()) "" else {
          val src = scala.io.Source.fromFile(f, "UTF-8")
          try src.mkString finally src.close()
        }
      } catch { case _: Throwable => "" }
    val prevComparable =
      BenchFloor.parseStringField(prevText, "sf").contains(sfDir)
    val prevQueries: Map[String, Double] =
      if (prevComparable) BenchFloor.parseQueriesMap(prevText) else Map.empty
    val identicalCode = prevComparable && srcFp.nonEmpty &&
      BenchFloor.parseStringField(prevText, "src_fingerprint").contains(srcFp)
    val medianVsPrev = BenchFloor.medianVsPrev(bestMap, prevQueries)
    val regressed = BenchFloor.regressed(floor, best)
    // SELF-TRIAGE (VERDICT r9 #1): a non-empty regressed list is
    // re-timed immediately — same process, same reps, just the flagged
    // queries — and each flag ships with its verdict: "transient"
    // (re-measure back under the thresholds: co-tenant noise, the only
    // kind any closing artifact has ever carried) or "confirmed" (still
    // over: a real regression). The adjudication that used to live in
    // the judge's session is now in the artifact itself.
    val recheck: Map[String, Double] =
      if (regressed.isEmpty) Map.empty
      else timeQueries(regressed.toSet).map { case (k, ts) =>
        k -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
      }.toMap
    val flags = regressed.map { k =>
      val rc = recheck.getOrElse(k, -1.0)
      Flag(k, bestMap(k), rc, floor(k), prevQueries.get(k),
        BenchFloor.adjudicate(floor(k), rc, identicalCode))
    }
    // COMPLETE flag map — goes to the BENCH_FULL.json file; the printed
    // line carries the capped selection (renderSummary doc).
    val regressedJson = flags.map(flagJson).mkString("{", ",", "}")
    val confirmedCount = flags.count(_.verdict == "confirmed")
    // Ratio guarded on floor > 0: a zero/corrupt floor entry must not
    // emit Infinity/NaN (invalid JSON) into the artifact.
    val vsFloorJson = best.collect {
      case (k, v) if v >= 0 && floor.get(k).exists(_ > 0) =>
        "\"" + k + "\":" + f"${v / floor(k)}%.2f"
    }.mkString("{", ",", "}")
    val floorTotal = best.collect {
      case (k, v) if v >= 0 && floor.contains(k) => floor(k)
    }.sum
    // Ratchet the floor file: min(known floor, this run AND the triage
    // re-measures — a recheck min is as real as a first-pass min), new
    // queries enter at this run's min. Never raised; zombies dropped on
    // full runs above; sf-mismatched or unreadable files never written.
    if (writeAllowed) try {
      // Clamped on the write side too, so a lucky-window run can't
      // re-poison the file below the fixed cost.
      val merged = BenchFloor.clamped(
        BenchFloor.merge(BenchFloor.merge(floor, bestMap).toMap, recheck)
          .toMap).toSeq.sortBy(_._1)
      val w = new java.io.PrintWriter(floorPath, "UTF-8")
      try w.print(BenchFloor.render(merged, Some(sfDir), Some(cpus)))
      finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $floorPath: ${e.getMessage}")
    }
    // Per-family subtotals: streaming queries pay a FIXED state-store /
    // watermark-flush cost per query (measured flat from sf0.001 to
    // sf0.1), so the batch signal reads cleanly only with the families
    // split out. "parity" = the reference-surface q_* family; "gate" =
    // the equivalence harnesses that deliberately run multiple
    // pipelines per execution (their cost is correctness machinery,
    // not a production path — profile them apart): every *_gate name
    // plus the streaming ingest harnesses, which run a full one-shot
    // recompute alongside the streamed path for their oracle bits; the
    // rest of x_* is the extension surface.
    def family(name: String): String =
      if (name.endsWith("_gate") ||
          name == "x_stream_incremental_dedup" || name == "x_stream_winnow" ||
          name == "x_stream_embed_ingest") "gate"
      else if (name.contains("stream")) "streaming"
      else if (name.startsWith("q_") || name == "pipeline_gap_report") "parity"
      else "extension"
    val fams = best.filter(_._2 >= 0).groupBy(t => family(t._1))
      .view.mapValues(_.map(_._2).sum).toMap
    val famJson = Seq("parity", "extension", "streaming", "gate")
      .map(f => "\"" + f + "\":" + fmt(fams.getOrElse(f, 0.0)))
      .mkString("{", ",", "}")
    val streamingFixed = fmt(fams.getOrElse("streaming", 0.0))
    // The per-query micro-batch machinery unit, measured in isolation
    // by x_stream_machinery (a 3-batch loop doing no operator work):
    // streaming-family wall ≈ n_streaming_queries × unit +
    // per-operator cost, so readers can subtract the fixed component
    // instead of re-deriving it from 30+ queries (VERDICT r19 #6).
    val machineryUnit = bestMap.get("x_stream_machinery")
      .filter(_ >= 0).map(fmt).getOrElse("null")
    val machineryJson = s""""streaming_machinery_unit_s":$machineryUnit"""
    val driftJson = "\"code_changed\":" + (!identicalCode) +
      ",\"median_vs_prev\":" +
      medianVsPrev.map(m => f"$m%.3f").getOrElse("null")
    val fullJson = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"families":$famJson,"streaming_fixed_s":$streamingFixed,$machineryJson,"floor_total":${fmt(floorTotal)},"vs_floor":$vsFloorJson,"regressed":$regressedJson,"confirmed_regressions":$confirmedCount,$driftJson,"src_fingerprint":"$srcFp","queries":$qs,"runs":$runs,"failed":$failed,"sf":"$sfDir"}"""
    // The driver artifact keeps only the LAST ~2000 chars of stdout and
    // parses the final JSON line it finds there — a 136-query map with
    // per-rep runs is ~4000 chars and can never survive whole (round 7's
    // artifact carried a 47-query tail fragment, "parsed": null). So:
    // the COMPLETE per-query map + raw runs goes to a committed file,
    // and the printed line is a compact summary (total, families,
    // failures, the slowest queries) that always fits the tail window.
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      try w.println(fullJson) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // Gate harnesses sit in their own family subtotal; the headline
    // slowest list profiles production paths only (gates are visible
    // in the full map and the "gate" family number).
    val slowest = best.filter(t => t._2 >= 0 && family(t._1) != "gate")
      .sortBy(-_._2)
    // Compact floor summary for the tail-limited driver artifact
    // (renderSummary doc: every unbounded map capped so the line ALWAYS
    // parses). An empty regressed list = a clean run; "transient" =
    // adjudicated noise; "confirmed" = a real regression that survived
    // its re-measure.
    println(renderSummary(total, reps, best.size, famJson, streamingFixed,
      machineryJson, floorTotal, flags, confirmedCount, driftJson,
      slowest, best.filter(_._2 < 0).map(_._1), outPath, sfDir))
    spark.stop()
  }
}
