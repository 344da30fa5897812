package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the join-heavy registry queries — the shape
  * that must survive at 100 TB, asserted at fixture scale (plans are
  * size-independent here: the broadcast side is bounded by its FILTER,
  * not the scale factor).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("x_shipping_priority: broadcast dim, pushed date filters, pruned lineitem scan") {
    val plan = SparkEntry.queries("x_shipping_priority")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"filtered customer side must broadcast:\n$plan")
    assert(plan.contains("LessThan(o_orderdate"),
      s"order-date filter must reach the orders scan:\n$plan")
    assert(plan.contains("GreaterThan(l_shipdate"),
      s"ship-date filter must reach the lineitem scan:\n$plan")
    // Column pruning: the query touches 4 of lineitem's 11 columns;
    // untouched ones must not appear anywhere in the physical plan.
    Seq("l_tax", "l_quantity", "l_returnflag").foreach { c =>
      assert(!plan.contains(c), s"lineitem scan must prune $c:\n$plan")
    }
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must fuse into TakeOrderedAndProject, not a global sort:\n$plan")
  }

  test("x_table_diff: full-outer reconciliation is a sort-merge join, keys pushed non-null-free") {
    val plan = SparkEntry.queries("x_table_diff")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"symmetric diff of two big sides must sort-merge full-outer:\n$plan")
  }

  test("x_asof_join and x_range_join stay free of cartesian/nested-loop shapes") {
    Seq("x_asof_join", "x_range_join").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, TestSpark.sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$q plans a quadratic join:\n$plan")
    }
  }
}
