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
