package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD-1 upsert semantics: update rows overwrite base rows on key
  * match, unmatched updates insert, untouched base rows survive, and
  * the operation is idempotent.
  */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "tag", "v")
  private lazy val updates = Seq(
    (2L, "b2", 99.0),  // overwrites base k=2
    (9L, "new", 1.0)   // inserts
  ).toDF("k", "tag", "v")

  test("upsert: overwrite on match, insert on miss, keep the rest") {
    val got = Upsert.upsert(base, updates, Seq("k"))
      .orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (9L, "new", 1.0)))
  }

  test("upsert is idempotent: reapplying the same batch changes nothing") {
    val once = Upsert.upsert(base, updates, Seq("k"))
    val twice = Upsert.upsert(once, updates, Seq("k"))
    assert(twice.exceptAll(once).count() == 0 && once.exceptAll(twice).count() == 0)
  }

  test("upsert matches the last-write-wins map model on random batches") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val base = Seq.fill(30)((rnd.nextInt(20).toLong, rnd.nextInt(100)))
        .distinctBy(_._1)
      val ups = Seq.fill(15)((rnd.nextInt(30).toLong, rnd.nextInt(100)))
        .distinctBy(_._1)
      val model = (base.toMap ++ ups.toMap).toSeq.sorted
      val got = Upsert.upsert(base.toDF("k", "v"), ups.toDF("k", "v"), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      assert(got == model, s"round $round diverged from the map model")
    }
  }

  test("versionCol collapses duplicate keys in the batch: highest version wins") {
    val dupUpdates = Seq(
      (2L, "old", 1L), (2L, "newer", 3L), (2L, "mid", 2L), // dup key 2, v=3 wins
      (9L, "ins", 1L)
    ).toDF("k", "tag", "ver")
    val versionedBase = base.withColumn("ver", lit(0L))
      .select(col("k"), col("tag"), col("ver"))
    val got = Upsert.upsert(versionedBase, dupUpdates, Seq("k"), Some("ver"))
      .orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "a", 0L), (2L, "newer", 3L), (3L, "c", 0L), (9L, "ins", 1L)))
    // Exactly one row per key even though the batch had three for k=2.
    val merged = Upsert.upsert(versionedBase, dupUpdates, Seq("k"), Some("ver"))
    assert(merged.groupBy(col("k")).count().where(col("count") > 1).count() == 0)
  }

  test("no nested-loop join: the anti-join stays a hash/merge equi-join") {
    val plan = Upsert.upsert(base, updates, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"upsert must plan an equi-join:\n$plan")
  }
}
