package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyChanges: last op per key wins, deletes remove, inserts add") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", "U", 1L),  // update
      (2L, "b", "D", 1L),   // delete
      (3L, "c2", "U", 1L),  // update...
      (3L, "c", "D", 2L),   // ...then delete: delete wins (higher seq)
      (4L, "d", "I", 1L),   // insert new key
      (5L, "e", "I", 1L),   // insert...
      (5L, "e2", "U", 2L)   // ...then update in the same feed
    ).toDF("k", "v", "op", "seq")
    val got = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a2", 4L -> "d", 5L -> "e2"))
  }

  test("empty feed is the identity; delete-only feed empties the key set") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val none = Seq.empty[(Long, String, String, Long)].toDF("k", "v", "op", "seq")
    assert(Cdc.applyChanges(base, none, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap == Map(1L -> "a", 2L -> "b"))
    val delAll = Seq((1L, "a", "D", 1L), (2L, "b", "D", 1L)).toDF("k", "v", "op", "seq")
    assert(Cdc.applyChanges(base, delAll, Seq("k"), "seq", "op").count() == 0)
  }

  test("plan keeps the WindowGroupLimit partial top-1 (feed-length-proof shuffle)") {
    val base = spark.range(0, 1000).select(col("id").as("k"), lit("x").as("v"))
    val changes = spark.range(0, 5000)
      .select((col("id") % 1000).as("k"), lit("y").as("v"),
        lit("U").as("op"), (col("id") / 1000 + 1).cast("long").as("seq"))
    val plan = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"latest-per-key must keep only local top-1 before the shuffle:\n$plan")
  }
}
