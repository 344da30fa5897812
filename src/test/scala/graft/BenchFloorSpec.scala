package graft

import org.scalatest.funsuite.AnyFunSuite

/** The floor file is the round-over-round regression baseline — a bug
  * here silently corrupts every future noise triage, so the pure
  * logic is pinned: parse/render round-trip (sf stamp included),
  * downward-only ratchet, the regression thresholds' edge cases, the
  * self-triage verdict, and zombie-floor detection.
  */
class BenchFloorSpec extends AnyFunSuite {

  test("parse/render round-trip, including the committed file") {
    val entries = Seq("a_query" -> 1.2345, "b" -> 0.0001, "z" -> 99.9999)
    assert(BenchFloor.parse(BenchFloor.render(entries)) == entries.toMap)
    // The committed artifact itself must parse (driver + Bench both
    // read it).
    val src = scala.io.Source.fromFile("BENCH_FLOOR.json", "UTF-8")
    val txt = try src.mkString finally src.close()
    val committed = BenchFloor.parse(txt)
    assert(committed.nonEmpty, "committed BENCH_FLOOR.json parsed empty")
    assert(committed.values.forall(v => v > 0 && v < 1000),
      "committed floors out of sane range")
    // The committed file carries the sf stamp of the driver's bench dir.
    assert(BenchFloor.parseSf(txt).contains("/root/testdata/sf0.1"))
  }

  test("sf stamp round-trips and stays invisible to the numeric parse") {
    val entries = Seq("q1" -> 0.5)
    val text = BenchFloor.render(entries, Some("/data/sf0.01"))
    assert(BenchFloor.parseSf(text).contains("/data/sf0.01"))
    assert(BenchFloor.parse(text) == entries.toMap,
      "the sf marker must never parse as a query floor")
    // Legacy files without a stamp: None (Bench treats as matching).
    assert(BenchFloor.parseSf(BenchFloor.render(entries)).isEmpty)
  }

  test("cpus stamp: round-trips, invisible to parse, mismatch semantics like sf") {
    // VERDICT r21 #3: the driver's 8-core scaling leg ratcheted the
    // 32-core floor file (8 cores is FASTER at sf0.1 — the bench is
    // fixed-overhead bound), so floors are stamped with the cpu count
    // that set them and a mismatch is ignored-never-written.
    val entries = Seq("q1" -> 0.5)
    val text = BenchFloor.render(entries, Some("/data/sf0.1"), Some("32"))
    assert(BenchFloor.parseCpus(text).contains("32"))
    assert(BenchFloor.parseSf(text).contains("/data/sf0.1"))
    assert(BenchFloor.parse(text) == entries.toMap,
      "the cpus marker must never parse as a query floor")
    // Legacy files without a stamp: None (Bench treats as matching and
    // stamps on the next write).
    assert(BenchFloor.parseCpus(BenchFloor.render(entries, Some("/d"))).isEmpty)
    // The stamp is not a zombie (it must survive full-run zombie drops)
    // and a stamped file is readable at zero entries.
    assert(BenchFloor.zombies(
      Map(BenchFloor.SfKey -> 0.0, BenchFloor.CpusKey -> 0.0, "gone" -> 1.0),
      Set("alive")) == Seq("gone"))
    assert(BenchFloor.readable(BenchFloor.render(Nil, Some("/d"), Some("8"))))
    // The committed floor file carries the 32-core stamp (the shape the
    // driver's main bench runs at).
    val src = scala.io.Source.fromFile("BENCH_FLOOR.json", "UTF-8")
    val committed = try src.mkString finally src.close()
    assert(BenchFloor.parseCpus(committed).contains("32"))
  }

  test("merge ratchets downward only; absent queries keep their floor; failures never enter") {
    val floor = Map("q1" -> 2.0, "q2" -> 1.0, "q3" -> 5.0)
    val run = Map("q1" -> 1.5, "q2" -> 9.0, "q4" -> 0.7, "q5" -> -1.0)
    val merged = BenchFloor.merge(floor, run).toMap
    assert(merged("q1") == 1.5, "faster run must lower the floor")
    assert(merged("q2") == 1.0, "slower run must NOT raise the floor")
    assert(merged("q3") == 5.0, "query absent from the run keeps its floor")
    assert(merged("q4") == 0.7, "new query enters at its run min")
    assert(!merged.contains("q5"), "a failed (-1) query must not set a floor")
    // Idempotent: merging the merged floor with the same run changes nothing.
    assert(BenchFloor.merge(merged, run).toMap == merged)
  }

  test("regression flag needs BOTH the ratio and the absolute threshold") {
    val floor = Map("fast" -> 0.1, "slow" -> 2.0, "mid" -> 1.0)
    // fast: 0.25 is 2.5x its floor but only +0.15s — sub-second jitter,
    // not flagged. slow: 3.5 is +1.5s over floor but only 1.75x... over
    // 1.5x ratio AND over 0.3s -> flagged. mid: 1.35 is +0.35s but only
    // 1.35x -> not flagged.
    val best = Seq("fast" -> 0.25, "slow" -> 3.5, "mid" -> 1.35,
      "nofloor" -> 60.0, "failed" -> -1.0)
    assert(BenchFloor.regressed(floor, best) == Seq("slow"))
  }

  test("triage: noise clears on re-measure, a real pessimization does not") {
    // Transient: the re-measure lands back at/near floor (either flag
    // threshold no longer met).
    assert(BenchFloor.triage(floor = 2.0, recheck = 2.1) == "transient")
    assert(BenchFloor.triage(floor = 0.1, recheck = 0.35) == "transient") // +0.25s < abs
    assert(BenchFloor.triage(floor = 1.0, recheck = 1.4) == "transient") // 1.4x < ratio
    // Confirmed: a DELIBERATE plan pessimization (say a query that now
    // re-runs its pipeline twice) re-measures at the same inflated
    // wall — still over both thresholds.
    assert(BenchFloor.triage(floor = 2.0, recheck = 4.0) == "confirmed")
    // A crashed re-measure must never clear a flag.
    assert(BenchFloor.triage(floor = 2.0, recheck = -1.0) == "confirmed")
  }

  test("render is strict JSON at every arity, including sf-stamp-only") {
    // The ADVICE edge: a filtered run whose regex matches nothing (and
    // no pre-existing floor) renders ZERO entries with an sf stamp —
    // the old per-entries comma logic left '"__sf__": "...",\n}'.
    def strictParse(s: String): Unit = {
      // Minimal strict-JSON object check without a JSON lib: balanced
      // braces, no comma immediately before the closing brace, every
      // line between braces is a "key": value pair.
      val t = s.trim
      assert(t.startsWith("{") && t.endsWith("}"), s"not an object: $s")
      assert(!t.dropRight(1).trim.endsWith(","), s"trailing comma: $s")
      val inner = t.drop(1).dropRight(1).trim
      if (inner.nonEmpty)
        inner.split(",\n").foreach(l =>
          assert(l.trim.matches("\"[^\"]+\"\\s*:\\s*(\"[^\"]*\"|[0-9.eE+-]+)"),
            s"bad line '$l' in $s"))
    }
    strictParse(BenchFloor.render(Nil, Some("/data/sf0.1")))
    strictParse(BenchFloor.render(Nil, None))
    strictParse(BenchFloor.render(Seq("q" -> 1.0), Some("/data/sf0.1")))
    strictParse(BenchFloor.render(Seq("a" -> 1.0, "b" -> 2.0), None))
    // Round-trip still holds on the empty-with-stamp file.
    val stampOnly = BenchFloor.render(Nil, Some("/d"))
    assert(BenchFloor.parse(stampOnly).isEmpty)
    assert(BenchFloor.parseSf(stampOnly).contains("/d"))
  }

  test("readable: empty-but-valid floor files must not wedge the ratchet") {
    // Valid floor files at every arity read fine...
    assert(BenchFloor.readable(BenchFloor.render(Seq("q" -> 1.0))))
    assert(BenchFloor.readable(BenchFloor.render(Nil, Some("/d"))))
    assert(BenchFloor.readable("{}"))
    assert(BenchFloor.readable("  {\n}\n"))
    // ...while IO failures (Bench maps them to "") and junk do not.
    assert(!BenchFloor.readable(""))
    assert(!BenchFloor.readable("not a floor file"))
    // A tail-truncated write (crash mid-write after the opening brace)
    // has no parseable entries, no sf stamp, and no closing brace —
    // it must read as UNREADABLE so Bench refuses to rewrite the floor
    // from empty and the ratchet history survives.
    assert(!BenchFloor.readable("{"))
    assert(!BenchFloor.readable("{\n  \"graft_f"))
    // ...but a truncated file that still retains parseable entries is
    // salvageable and stays readable (parse wins over the brace check).
    assert(BenchFloor.readable("{\n  \"q\": 1.2345,\n  \"r\""))
  }

  test("fixed-cost clamp: lucky-window floors re-based, data-scaled floors untouched") {
    val floor = Map(
      "x_stream_interval_join" -> 2.1, // lucky-window min
      "x_stream_outer_join" -> 7.2, // already above the clamp
      "q_agg_pricing" -> 0.2) // data-scaled: pure ratchet
    val c = BenchFloor.clamped(floor)
    assert(c("x_stream_interval_join") == 3.0,
      "below-clamp floor must re-base to the fixed cost")
    assert(c("x_stream_outer_join") == 7.2,
      "above-clamp floor keeps its own (tighter-flag) value")
    assert(c("q_agg_pricing") == 0.2, "non-fixed-cost keys untouched")
    // The loaded-box steady state (~4.2 s at the r21 scaled state
    // partitions) must NOT flag against the clamped floor, while a
    // real regression still does.
    assert(BenchFloor.regressed(c, Seq("x_stream_interval_join" -> 4.2)).isEmpty)
    assert(BenchFloor.regressed(c, Seq("x_stream_interval_join" -> 4.8))
      == Seq("x_stream_interval_join"))
  }

  test("zombies: floor keys outside the registry, sf stamp never counted") {
    val floor = Map("alive" -> 1.0, "renamed_old" -> 2.0, "deleted_q" -> 3.0,
      BenchFloor.SfKey -> 0.0)
    val z = BenchFloor.zombies(floor, Set("alive", "other"))
    assert(z == Seq("deleted_q", "renamed_old"))
    assert(BenchFloor.zombies(Map("a" -> 1.0), Set("a")).isEmpty)
  }

  test("adjudicate: identical code turns a surviving flag into 'environment', never clears a crash") {
    // Recheck still over both thresholds: code regression vs env drift
    // is decided by the fingerprint match.
    assert(BenchFloor.adjudicate(1.0, 1.7, identicalCode = false) == "confirmed")
    assert(BenchFloor.adjudicate(1.0, 1.7, identicalCode = true) == "environment")
    // Recheck back under a threshold: transient either way.
    assert(BenchFloor.adjudicate(1.0, 1.2, identicalCode = true) == "transient")
    assert(BenchFloor.adjudicate(1.0, 1.2, identicalCode = false) == "transient")
    // A crashed re-measure is NEVER excused by identical code.
    assert(BenchFloor.adjudicate(1.0, -1.0, identicalCode = true) == "confirmed")
  }

  test("normalizeSource: comment/whitespace-only diffs hash identically => environment") {
    // The r19 incident in miniature: the SAME code with an edited
    // scaladoc, an added line comment, and a re-indent must normalize
    // to identical bytes — so the fingerprints match, identicalCode
    // holds, and a recheck-surviving flag adjudicates "environment".
    val v1 =
      """package p
        |/** Old scaladoc. */
        |object A {
        |  // a note
        |  def f(x: Int): Int = x + 1 /* inline */ + 2
        |}
        |""".stripMargin
    val v2 =
      """package p
        |/** NEW scaladoc, reworded at length.
        |  * Extra line too. */
        |object A {
        |    // a DIFFERENT note, plus indent change below
        |      def f(x: Int): Int = x + 1 + 2
        |}
        |""".stripMargin
    assert(BenchFloor.normalizeSource(v1) == BenchFloor.normalizeSource(v2),
      "comment/whitespace-only diff must not change the fingerprint input")
    // ...and the adjudication that falls out of it:
    assert(BenchFloor.adjudicate(1.0, 1.7, identicalCode = true) == "environment")
    // A REAL code change (the constant) must still change the bytes.
    val v3 = v1.replace("x + 1", "x + 9")
    assert(BenchFloor.normalizeSource(v1) != BenchFloor.normalizeSource(v3))
  }

  test("normalizeSource: newline-vs-space edits change the fingerprint (semicolon inference)") {
    // ADVICE r20: `return\nexpr` and `return expr` are DIFFERENT
    // programs; a collapse that maps both to one byte stream would
    // auto-adjudicate a real change as "environment".
    assert(BenchFloor.normalizeSource("def f: Int = { return\n1 }") !=
      BenchFloor.normalizeSource("def f: Int = { return 1 }"))
    assert(BenchFloor.normalizeSource("foo\nbar()") !=
      BenchFloor.normalizeSource("foo bar()"))
    // ...while pure re-indents and trailing spaces stay invisible:
    assert(BenchFloor.normalizeSource("a\n  b") ==
      BenchFloor.normalizeSource("a   \n b"))
    // A block comment spanning lines keeps its line-end role.
    assert(BenchFloor.normalizeSource("a /* x\ny */ b") ==
      BenchFloor.normalizeSource("a\nb"))
    assert(BenchFloor.normalizeSource("a /* x */ b") ==
      BenchFloor.normalizeSource("a b"))
  }

  test("normalizeSource is string-literal aware: '//' in literals is code, not comment") {
    // A '//' inside a plain string must survive, and editing the bytes
    // AFTER it must change the normalization (else a real change would
    // auto-adjudicate "environment" — the dangerous direction).
    val url1 = """val u = "http://example/a""""
    val url2 = """val u = "http://example/b""""
    assert(BenchFloor.normalizeSource(url1).contains("http://example/a"))
    assert(BenchFloor.normalizeSource(url1) != BenchFloor.normalizeSource(url2))
    // Nested quotes inside an interpolation hole: the classic
    // mis-alignment case for naive strippers.
    val s1 = """val m = s"a ${f("b//c")} d""""
    val s2 = """val m = s"a ${f("b//X")} d""""
    assert(BenchFloor.normalizeSource(s1).contains("b//c"))
    assert(BenchFloor.normalizeSource(s1) != BenchFloor.normalizeSource(s2))
    // Triple-quoted strings keep comment-looking lines verbatim
    // (oracle SQL carries '--' and '//'-ish text in this repo).
    val t1 = "val q = \"\"\"SELECT 1 // not a comment\n* nor this\"\"\""
    val t2 = "val q = \"\"\"SELECT 2 // not a comment\n* nor this\"\"\""
    assert(BenchFloor.normalizeSource(t1).contains("// not a comment"))
    assert(BenchFloor.normalizeSource(t1) != BenchFloor.normalizeSource(t2))
    // Whitespace INSIDE a literal is behavior — never collapsed.
    val w1 = """val s = "a  b""""
    val w2 = """val s = "a b""""
    assert(BenchFloor.normalizeSource(w1) != BenchFloor.normalizeSource(w2))
    // Comments separate tokens: `a/*x*/b` must not fuse to `ab`.
    assert(BenchFloor.normalizeSource("a/*x*/b") ==
      BenchFloor.normalizeSource("a b"))
    // Char literals (incl. escaped quote/backslash) pass through whole.
    val c = """val q = '\''; val b = '\\'; val a = 'z' // tail"""
    val norm = BenchFloor.normalizeSource(c)
    assert(norm.contains("'\\''") && norm.contains("'\\\\'") &&
      norm.contains("'z'") && !norm.contains("tail"))
    // Nested block comments (Scala nests them) strip fully.
    assert(BenchFloor.normalizeSource("a /* x /* y */ z */ b") ==
      BenchFloor.normalizeSource("a b"))
    // Escaped quotes inside interpolated strings don't derail the scan.
    val e1 = "val x = s\"quote \\\" ${v} end\"; val tail1 = 1"
    assert(BenchFloor.normalizeSource(e1).contains("tail1"))
  }

  test("normalizeSource round-trips the real engine source without losing code bytes") {
    // Run the normalizer over every committed main-source file: it must
    // never throw, never return empty for a non-trivial file, and
    // stripping must be idempotent (normalize ∘ normalize = normalize —
    // what it keeps is code, and code re-normalizes to itself).
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val srcs = walk(new java.io.File("src/main/scala"))
    assert(srcs.size > 50, s"expected the engine source tree, got ${srcs.size}")
    srcs.foreach { f =>
      val text = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val n1 = BenchFloor.normalizeSource(text)
      assert(n1.nonEmpty, s"normalize emptied $f")
      val n2 = BenchFloor.normalizeSource(n1)
      assert(n1 == n2, s"normalize not idempotent on $f")
    }
  }

  test("previous-artifact parsing: queries map, string fields, median drift signature") {
    val prev = """{"metric":"total","value":10.0,"regressed":{"x":{"run":2.0}},""" +
      """"code_changed":false,"src_fingerprint":"abc123",""" +
      """"queries":{"q_a":1.0,"q_b":2.0,"q_c":4.0},""" +
      """"runs":{"q_a":[1.0,1.1]},"failed":[],"sf":"/root/testdata/sf0.1"}"""
    assert(BenchFloor.parseQueriesMap(prev) ==
      Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 4.0))
    assert(BenchFloor.parseStringField(prev, "src_fingerprint") == Some("abc123"))
    assert(BenchFloor.parseStringField(prev, "sf") == Some("/root/testdata/sf0.1"))
    assert(BenchFloor.parseStringField(prev, "absent").isEmpty)
    assert(BenchFloor.parseQueriesMap("junk").isEmpty)
    // Median ratio: the r15 signature (uniform drift) in miniature.
    val cur = Map("q_a" -> 1.1, "q_b" -> 2.3, "q_c" -> 4.6, "q_new" -> 9.9)
    val m = BenchFloor.medianVsPrev(cur, BenchFloor.parseQueriesMap(prev))
    assert(m.exists(v => math.abs(v - 1.15) < 1e-9),
      s"median of (1.1, 1.15, 1.15) must be 1.15, got $m")
    // Fewer than 3 comparable queries: no signature.
    assert(BenchFloor.medianVsPrev(Map("q_a" -> 1.0),
      Map("q_a" -> 1.0)).isEmpty)
    // Failed queries (negative) never enter the ratio set.
    assert(BenchFloor.medianVsPrev(
      Map("q_a" -> -1.0, "q_b" -> 1.0, "q_c" -> 1.0),
      Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)).isEmpty)
  }
}
