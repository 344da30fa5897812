package graft

import org.scalatest.funsuite.AnyFunSuite

/** The closing one-line JSON Bench prints is the driver's ONLY
  * round-over-round signal, and the driver parses it out of a
  * 2000-char stdout tail: a line that outgrows the window never parses
  * (round 20's did exactly that — `BENCH_r20.json parsed: null` — and
  * PERF per-query went dark for two rounds). These tests pin the cap
  * contract of Bench.renderSummary: the worst POSSIBLE line fits the
  * window with margin, the caps keep the worst flags (not an arbitrary
  * subset), and the true counts survive the capping.
  */
class BenchLineSpec extends AnyFunSuite {

  // Worst-case building blocks: the longest name in the actual query
  // registry (the registry is authoritative — a future longer name
  // re-proves the bound on the next test run), every numeric field at
  // its widest rendering, every optional field populated.
  private val longestName = SparkEntry.queries.keySet.maxBy(_.length)
  private val wideFam =
    "{\"parity\":99999.9999,\"extension\":99999.9999," +
      "\"streaming\":99999.9999,\"gate\":99999.9999}"
  private val wideMachinery = "\"streaming_machinery_unit_s\":99999.9999"
  private val wideDrift = "\"code_changed\":false,\"median_vs_prev\":999.999"

  private def worstLine(nFlags: Int, nSlow: Int, nFailed: Int): String = {
    val flags = (0 until nFlags).map(_ =>
      Bench.Flag(longestName, 99999.9999, 99999.9999, 99999.9999,
        Some(99999.9999), "environment"))
    val slowest = (0 until nSlow).map(_ => longestName -> 99999.9999)
    val failed = Seq.fill(nFailed)(longestName)
    Bench.renderSummary(999999.9999, 33, 99999, wideFam, "99999.9999",
      wideMachinery, 999999.9999, flags, 99999, wideDrift, slowest, failed,
      "/an/arbitrarily/long/env/provided/path/" + ("x" * 300) +
        "/BENCH_FULL.json",
      "/another/arbitrarily/long/env/provided/path/" + ("y" * 300) + "/sf9.9")
  }

  test("worst-case closing line fits the driver's 2000-char tail, with margin") {
    val line = worstLine(nFlags = 300, nSlow = 300, nFailed = 300)
    assert(!line.contains("\n"), "must be ONE line")
    assert(line.length < 1900, s"worst-case line is ${line.length} chars")
    // The empty-everything line obviously fits too (and stays valid).
    assert(worstLine(0, 0, 0).length < 1900)
  }

  test("required driver fields survive the capping") {
    val line = worstLine(300, 300, 300)
    for (key <- Seq("\"metric\":", "\"value\":", "\"unit\":", "\"reps\":",
        "\"n_queries\":", "\"families\":", "\"floor_total\":",
        "\"regressed\":", "\"n_regressed\":300", "\"confirmed_regressions\":",
        "\"code_changed\":", "\"slowest\":", "\"failed\":",
        "\"n_failed\":300", "\"queries_file\":", "\"sf\":"))
      assert(line.contains(key), s"missing $key")
  }

  test("caps keep the WORST flags: confirmed first, then run/floor ratio") {
    def flag(n: String, run: Double, floor: Double, v: String) =
      Bench.Flag(n, run, -1.0, floor, None, v)
    val flags = Seq(
      flag("t_small", 1.0, 0.9, "transient"),
      flag("c_one", 2.0, 1.0, "confirmed"),
      flag("t_big", 50.0, 1.0, "transient"),
      flag("e_env", 9.0, 1.0, "environment"),
      flag("c_two", 3.0, 2.9, "confirmed"),
      flag("t_mid", 4.0, 1.0, "transient"),
      flag("t_tiny", 1.1, 1.05, "transient"))
    val line = Bench.renderSummary(1.0, 3, 7, wideFam, "1.0", wideMachinery,
      1.0, flags, 2, wideDrift, Nil, Nil, "BENCH_FULL.json", "/d")
    // Both confirmed entries present regardless of ratio; then the
    // largest-ratio others; the two smallest-ratio transients dropped.
    for (kept <- Seq("c_one", "c_two", "t_big", "e_env", "t_mid"))
      assert(line.contains("\"" + kept + "\":{"), s"$kept must survive the cap")
    for (dropped <- Seq("t_small", "t_tiny"))
      assert(!line.contains("\"" + dropped + "\":{"), s"$dropped must be capped away")
    assert(line.contains("\"n_regressed\":7"))
  }

  test("flag entries render exactly like the full artifact's (prev optional)") {
    val withPrev = Bench.flagJson(
      Bench.Flag("q", 1.5, 1.2, 1.0, Some(1.1), "transient"))
    assert(withPrev ==
      "\"q\":{\"run\":1.5000,\"recheck\":1.2000,\"floor\":1.0000," +
        "\"prev\":1.1000,\"verdict\":\"transient\"}")
    val noPrev = Bench.flagJson(Bench.Flag("q", 1.5, -1.0, 1.0, None, "confirmed"))
    assert(noPrev ==
      "\"q\":{\"run\":1.5000,\"recheck\":-1,\"floor\":1.0000," +
        "\"verdict\":\"confirmed\"}")
  }
}
