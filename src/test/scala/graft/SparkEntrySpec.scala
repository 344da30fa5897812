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

  test("no registered query plans a cartesian or nested-loop join (100 TB guard)") {
    // Deliberate exceptions: 1-row summary aggregates cross-joined into
    // a single report row — O(1), not O(n^2). (The brute-force TRUTH
    // passes inside the near-dup/approx-join gates execute eagerly
    // into localCheckpoints at construction; only the 1-row assembly
    // joins remain in the returned plan.)
    val allowCross = Set("x_minhash_neardup", "x_kernel_equiv",
      "x_contamination", "x_embed_neardup", "x_approx_sim_join",
      // The <= k confirmed heavy-hitter counts cross a 1-row total.
      "x_heavy_hitters")
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
      if (!allowCross(name)) {
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a cartesian product:\n$plan")
        assert(!plan.contains("BroadcastNestedLoop"),
          s"$name plans a nested-loop join:\n$plan")
      }
    }
  }

  test("no registered query plans an empty-partition window (single-task trap)") {
    // NTILE/SUM OVER (ORDER BY …) with no PARTITION BY routes every
    // row through ONE task — the trap EquiDepth and PrefixSum exist to
    // avoid. Deliberate exceptions: windows over ALREADY-AGGREGATED
    // day-grain series (one row per calendar day — bounded by the
    // calendar, never by data volume; documented at their use sites).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    val allowDayGrain = Set("x_rolling_stats", "x_gap_fill")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!allowDayGrain(name)) {
        val plan = fn(spark, TestSpark.sf0001).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
        }
        assert(bad.isEmpty,
          s"$name plans an empty-partition-spec window (single-task at scale):\n$plan")
      }
    }
  }

  test("registerAll exposes the full schema to plain spark.sql") {
    Tables.registerAll(spark, TestSpark.sf0001)
    val r = spark.sql("""
      SELECT r_name, COUNT(*) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""").collect()
    assert(r.map(_.getLong(1)).sum == spark.table("customer").count())
    // events view carries the normalized timestamp type.
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType
      == org.apache.spark.sql.types.TimestampType)
  }
}
