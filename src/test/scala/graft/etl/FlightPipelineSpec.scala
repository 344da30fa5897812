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
