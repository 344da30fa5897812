package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end golden test of the reference pipeline on the committed
  * miniature fixture (FIXTURES.md §1a): every recorded reference golden
  * shape — all-null column drop, exact-dup census, dedup, compound-key
  * dups, the validity report (incl. 3VL nulls), and the calendar gap.
  */
class FlightPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val report = FlightPipeline.run(spark,
    getClass.getResource("/flights_mini.csv").getPath, asOfYear = 2009)

  test("TailNum (alphanumeric under int schema, PERMISSIVE) parses all-null and is dropped") {
    assert(report.droppedColumns == Seq("TailNum"))
    assert(!report.cleaned.columns.contains("TailNum"))
  }

  test("exact-duplicate census finds the planted pair; dedup removes one row") {
    assert(report.totalRows == 15)
    assert(report.exactDupGroups == 1)
    assert(report.rowsAfterDedup == 14)
  }

  test("compound-key census finds the same-(origin,carrier,flight,ts) pair") {
    assert(report.compoundDupGroups == 1)
  }

  test("validity: CRSDepTime=0 and DepTime=2430 fail; nulls are neither pass nor failure (3VL)") {
    assert(report.validity("crsdeptime_range") == 1)
    assert(report.validity("deptime_range") == 1)
    // The two cancelled rows have null DepTime — 3VL must keep them out
    // of every count; all other rules are clean.
    (report.validity - "crsdeptime_range" - "deptime_range").foreach {
      case (rule, n) => assert(n == 0, s"rule $rule expected 0 failures")
    }
  }

  test("calendar-gap join reports exactly the missing day") {
    assert(report.gapDays.map(_.toString) == Seq("2008-01-04"))
  }

  test("run survives a slice whose derivation columns are all null (dropped)") {
    // A file of only cancelled flights: DepTime/ArrTime all null →
    // dropped by the census; the pipeline must not crash and the
    // DepTime rules must silently not apply.
    val header = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(getClass.getResource("/flights_mini.csv").getPath)).get(0)
    val cancelled = Seq(
      "2008,2,1,5,,1200,,1300,WN,503,N1,,,,,,HOU,DAL,239,,,1,A,0,,,,,",
      "2008,2,2,6,,900,,1015,AA,104,N2,,,,,,JFK,ORD,740,,,1,B,0,,,,,")
    val dir = java.nio.file.Files.createTempDirectory("graft_cancelled")
    java.nio.file.Files.writeString(dir.resolve("cancelled.csv"),
      (header +: cancelled).mkString("\n"))
    val rep = FlightPipeline.run(spark, dir.toString, asOfYear = 2009)
    assert(rep.totalRows == 2)
    assert(rep.droppedColumns.contains("DepTime"))
    assert(!rep.validity.contains("deptime_range"))
    assert(rep.validity("crsdeptime_range") == 0)
    assert(rep.gapDays.isEmpty) // no timestamps → no calendar to gap-check
  }

  test("a day with only cancelled flights counts as present, not as a gap (A9 parity)") {
    // Reference DepTime_Date derives from Year/Month/DayofMonth alone
    // (notebook.py:365-377): null DepTime must not erase the day.
    val header = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(getClass.getResource("/flights_mini.csv").getPath)).get(0)
    val rows = Seq(
      "2008,3,1,6,700,700,830,835,DL,1,N1,90,95,80,-5,0,ATL,BNA,214,5,5,0,,0,,,,,",
      "2008,3,2,7,,900,,1015,AA,2,N2,,,,,,JFK,ORD,740,,,1,B,0,,,,,", // cancelled only
      "2008,3,3,1,700,700,830,835,DL,3,N3,90,95,80,-5,0,ATL,BNA,214,5,5,0,,0,,,,,")
    val dir = java.nio.file.Files.createTempDirectory("graft_cancelday")
    java.nio.file.Files.writeString(dir.resolve("slice.csv"),
      (header +: rows).mkString("\n"))
    val rep = FlightPipeline.run(spark, dir.toString, asOfYear = 2009)
    assert(rep.gapDays.isEmpty,
      s"cancelled-only day must not be a gap, got ${rep.gapDays}")
  }

  test("full Report golden on a generated 2008-slice-shaped fixture") {
    // Deterministic generator mirroring the recorded 2008 slice's SHAPE
    // (.dbc pos=13.0/19.0/21.0/23.0): 29 columns, alphanumeric TailNum
    // (all-null under the int schema), 121 contiguous days (Jan 1 –
    // Apr 30 2008, leap year), 4 exact-duplicate groups, 12
    // compound-key duplicate groups, exactly one CRSDepTime=0 row as
    // the sole validity failure. The recorded ABSOLUTE counts (2.39M
    // rows, 12,245 compound dups) scale with the slice; the structural
    // goldens asserted here are scale-free, and every one of the
    // Report's seven fields is pinned in this single test.
    val daysInMonth = Map(1 -> 31, 2 -> 29, 3 -> 31, 4 -> 30)
    val carriers = Seq("AA", "WN", "DL", "UA", "9E")
    val origins = Seq("ATL", "ORD", "DFW", "DEN", "PHX")
    val dests = Seq("LAX", "SFO", "JFK", "SEA", "MCO")
    val base = scala.collection.mutable.ArrayBuffer[Array[String]]()
    var n = 0
    for (m <- 1 to 4; d <- 1 to daysInMonth(m); i <- 0 until 6) {
      n += 1
      val dep = 100 * ((n % 23) + 1) + (n % 60) // HHmm in [100, 2359]
      val crsDep = if (m == 1 && d == 15 && i == 0) 0 else dep
      val arr = 100 * (((n + 7) % 23) + 1) + ((n + 13) % 60)
      base += Array(
        "2008", m.toString, d.toString, ((n % 7) + 1).toString,
        dep.toString, crsDep.toString, arr.toString,
        (100 * (((n + 11) % 23) + 1) + ((n + 29) % 60)).toString,
        carriers(i % 5), (100 + (n % 900)).toString, s"N${n % 997}AB",
        (60 + n % 300).toString, (60 + (n + 5) % 300).toString,
        (50 + n % 250).toString, ((n % 40) - 10).toString,
        ((n % 35) - 5).toString, origins((i + d) % 5), dests((i + m) % 5),
        (100 + n % 2000).toString, (n % 30).toString, (n % 25).toString,
        if (n % 181 == 0) "1" else "0", if (n % 181 == 0) "A" else "",
        "0", "0", "0", "0", "0", "0")
    }
    val exactDupCopies = base.take(4).map(_.clone())
    val compoundExtras = (1 to 12).map { j =>
      val src = base(50 * j + 45) // n = 50j+46: never row 1–4 or the CRS row (n=85)
      val e = src.clone()
      e(6) = "777"; e(14) = "99"; e(17) = "XXX" // same compound key, different row
      e
    }
    val all = base ++ exactDupCopies ++ compoundExtras
    val header = FlightSchema.schema.fields.map(_.name).mkString(",")
    val path = java.nio.file.Files.createTempFile("flights_2008_shape_", ".csv")
    java.nio.file.Files.writeString(path,
      (header +: all.map(_.mkString(","))).mkString("\n"))
    try {
      val r = FlightPipeline.run(spark, path.toString, asOfYear = 2009)
      assert(r.droppedColumns == Seq("TailNum"))        // .dbc pos=13.0
      assert(r.totalRows == 726L + 4 + 12)              // 121 days × 6 + planted
      assert(r.exactDupGroups == 4L)                    // .dbc pos=19.0 (recorded: 4)
      assert(r.rowsAfterDedup == r.totalRows - 4)
      assert(r.compoundDupGroups == 12L)                // shape of recorded 12,245
      assert(r.validity("crsdeptime_range") == 1L)      // .dbc pos=21.0: sole failure
      (r.validity - "crsdeptime_range").foreach { case (rule, failed) =>
        assert(failed == 0L, s"rule $rule expected clean, got $failed")
      }
      assert(r.gapDays.isEmpty)                         // 121 contiguous days
      // The daily series spans exactly the recorded 121 days (.dbc pos=23.0).
      assert(graft.quality.Timeliness.dailyCounts(r.cleaned,
        org.apache.spark.sql.functions.col("DepTime_Date")).count() == 121L)
    } finally java.nio.file.Files.deleteIfExists(path)
  }

  test("cleaned output survives a parquet round-trip bit-identically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val n = graft.io.Writer.sizedParquet(report.cleaned, tmp)
    assert(n == 1) // 14 rows ≪ 200 MB target
    val back = spark.read.parquet(tmp)
    assert(back.schema == report.cleaned.schema)
    assert(back.exceptAll(report.cleaned).count() == 0)
    assert(report.cleaned.exceptAll(back).count() == 0)
  }
}
