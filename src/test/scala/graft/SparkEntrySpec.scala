package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the exact conditions the round gates check
  * (t1 smoke on entry, registry/oracle consistency) must never regress.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry (t1 smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("oracle SQL never embeds raw control characters") {
    // The driver parses oracle_sql.json; Verify escapes on write, but
    // keeping the source strings single-line avoids surprises.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c == '\n' || c == '\r' || c == '\t'),
        s"$name contains a control character")
    }
  }

  test("query registry is stable: every query builds a plan without executing") {
    // Plan construction must not throw (analysis errors surface here,
    // not at driver time). Queries that eagerly collect driver scalars
    // execute a small job; running at sf0.001 keeps that cheap.
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf0001)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
    }
  }
}
