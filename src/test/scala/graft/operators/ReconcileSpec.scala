package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ReconcileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff labels every row: only_left / only_right / differs / equal") {
    val left = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "s", "v")
    val right = Seq(
      (2L, "b", 20.0),          // equal
      (3L, "c", 31.0),          // differs (v)
      (4L, null.asInstanceOf[String], 40.0), // differs (s null vs 'd')
      (5L, "e", 50.0)           // only_right
    ).toDF("k", "s", "v")
    val got = Reconcile.diff(left, right, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "only_left", 2L -> "equal", 3L -> "differs",
      4L -> "differs", 5L -> "only_right"))
  }

  test("null-safe equality: null == null is equal, not differs") {
    val left = Seq((1L, Option.empty[String])).toDF("k", "s")
    val right = Seq((1L, Option.empty[String])).toDF("k", "s")
    val got = Reconcile.diffCensus(left, right, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("equal" -> 1L))
  }

  test("identical tables census to all-equal; schema mismatch rejected") {
    val orders = graft.Tables.orders(spark, graft.TestSpark.sf0001)
    val census = Reconcile.diffCensus(orders, orders, Seq("o_orderkey"))
      .as[(String, Long)].collect().toMap
    assert(census == Map("equal" -> orders.count()))
    assertThrows[IllegalArgumentException] {
      Reconcile.diff(orders, orders.drop("o_totalprice"), Seq("o_orderkey"))
    }
  }

  test("compound keys join on every key column") {
    val left = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("a", "b", "s")
    val right = Seq((1L, 1L, "x"), (2L, 2L, "y")).toDF("a", "b", "s")
    val got = Reconcile.diff(left, right, Seq("a", "b"))
      .select(col("a"), col("b"), col("status"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 1L, "equal"), (1L, 2L, "only_left"), (2L, 2L, "only_right")))
  }
}
