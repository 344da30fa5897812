package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the scale property behind x_topk_group: a row_number()-filter
  * over a keyed window triggers Spark's WindowGroupLimit rule, which
  * keeps each map task's local top-k per group BEFORE the shuffle —
  * the exchange carries O(groups·k) rows instead of the whole table.
  * Without that rule the pattern would still be correct, just heavier;
  * this spec fails if a Spark upgrade or a query rewrite loses it.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topK(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    graft.Tables.orders(spark, TestSpark.sf0001)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }

  test("rank-filter plans a WindowGroupLimit (partial top-k before the shuffle)") {
    val plan = topK(3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k filter must trigger WindowGroupLimit:\n$plan")
    assert(plan.contains("Partial"),
      s"the group limit must run map-side (Partial) before the exchange:\n$plan")
  }

  test("top-3 per priority: 3 rows per group, descending, deterministic ties") {
    val rows = topK(3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Int, Long, Double)].collect()
      .groupBy(_._1)
    assert(rows.size == 5)
    rows.values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == Seq(1, 2, 3))
      val prices = g.sortBy(_._2).map(_._4).toSeq
      assert(prices == prices.sorted.reverse, "rank must follow price desc")
    }
    // Cross-check against a driver-side sort of the full table.
    val full = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)].collect()
    full.groupBy(_._1).foreach { case (prio, g) =>
      val expect = g.sortBy(r => (-r._3, r._2)).take(3).map(_._2).toSeq
      val got = rows(prio).sortBy(_._2).map(_._3).toSeq
      assert(got == expect, s"priority $prio")
    }
  }
}
