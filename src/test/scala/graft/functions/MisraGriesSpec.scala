package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.HeavyHitters

/** Pins the Misra–Gries guarantees in the regime the driver fixture
  * cannot reach (k < vocabulary, heavy skew, adversarial
  * partitioning): membership of every true heavy hitter, the
  * n/(k+1) error bound on estimates, serde roundtrip, and the
  * determinism of the sketch-then-confirm output.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf-ish stream: item i appears ~N/(i+1) times, vocabulary 200. */
  private def zipfItems(n: Int, vocab: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    val weights = (1 to vocab).map(i => 1.0 / i)
    val total = weights.sum
    val cdf = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    Seq.fill(n) {
      val u = rnd.nextDouble()
      val i = cdf.indexWhere(u <= _)
      s"item_${if (i < 0) vocab - 1 else i}"
    }
  }

  test("every item above n/(k+1) survives the sketch under adversarial partitioning") {
    import spark.implicits._
    val k = 8
    val items = zipfItems(20000, 200, seed = 1)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHeavy = exact.filter { case (_, c) => c * (k + 1) > items.size }.keySet
    assert(trueHeavy.nonEmpty && trueHeavy.size < k,
      s"fixture must exercise the k < vocab regime (got ${trueHeavy.size} heavy of 200)")

    // Three partitionings of the SAME stream: sorted (all copies of an
    // item adjacent), round-robin-ish (repartition by hash), and a
    // hostile one (heavy items split across every partition).
    val layouts = Seq(
      items.sorted.toDF("item").repartitionByRange(7, col("item")),
      items.toDF("item").repartition(13),
      Random.shuffle(items).toDF("item").repartition(3))
    layouts.foreach { df =>
      val survived = HeavyHitters.sketch(df, "item", k)
        .select(explode(map_keys(col("candidates"))).as("item"))
        .as[String].collect().toSet
      assert(survived.size <= k, s"summary must hold at most k=$k items, got ${survived.size}")
      assert(trueHeavy.subsetOf(survived),
        s"missing true heavy hitters: ${trueHeavy -- survived}")
    }
  }

  test("estimates are lower bounds within n/(k+1) of the exact counts") {
    import spark.implicits._
    val k = 8
    val items = zipfItems(20000, 200, seed = 2)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = HeavyHitters.sketch(items.toDF("item").repartition(11), "item", k)
      .select(explode(col("candidates")).as(Seq("item", "est")))
      .as[(String, Long)].collect().toMap
    val bound = items.size / (k + 1)
    est.foreach { case (item, e) =>
      val t = exact(item)
      assert(e <= t, s"$item: estimate $e must never exceed exact $t")
      assert(e >= t - bound, s"$item: estimate $e below exact $t - n/(k+1)=$bound")
    }
  }

  test("confirmedHeavy output is exact and identical across partitionings") {
    import spark.implicits._
    val k = 8
    val items = zipfItems(20000, 200, seed = 3)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = exact.filter { case (_, c) => c * (k + 1) > items.size }
      .toSeq.sortBy(_._1)
    Seq(3, 13).foreach { parts =>
      val got = HeavyHitters
        .confirmedHeavy(items.toDF("item").repartition(parts), "item", k)
        .as[(String, Long)].collect().toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("confirmedHeavy ignores null items in the total (threshold matches the non-null stream)") {
    import spark.implicits._
    // 12 'a', 8 'b', 5 nulls. k=2 → threshold n*(k+1) > total.
    // Against the non-null total (20): a 36>20 heavy, b 24>20 heavy.
    // Against an inflated null-counting total (25): b 24>25 would be
    // WRONGLY dropped — this pins total = count(itemCol).
    val items = (Seq.fill(12)(Some("a")) ++ Seq.fill(8)(Some("b")) ++
      Seq.fill(5)(Option.empty[String])).toDF("item").repartition(4)
    val got = HeavyHitters.confirmedHeavy(items, "item", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("a" -> 12L, "b" -> 8L))
  }

  test("merge of summaries built on disjoint shards keeps the union guarantee") {
    // Driver-side check of the raw summary algebra (no Spark): shard
    // the stream 5 ways, build one summary per shard, fold-merge.
    val k = 8
    val items = zipfItems(20000, 200, seed = 4)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHeavy = exact.filter { case (_, c) => c * (k + 1) > items.size }.keySet
    val shards = items.zipWithIndex.groupBy(_._2 % 5).values.map(_.map(_._1))
    val merged = shards.map { shard =>
      val s = new MisraGriesSummary(k)
      shard.foreach(s.add(_))
      s
    }.reduce(_ mergeWith _)
    assert(merged.counts.size <= k)
    assert(merged.decremented <= items.size / (k + 1),
      s"total decrement ${merged.decremented} exceeds n/(k+1)")
    assert(trueHeavy.subsetOf(merged.counts.keySet))
  }

  test("serialize/deserialize roundtrips the summary exactly") {
    val agg = MisraGriesTopK(
      org.apache.spark.sql.catalyst.expressions.Literal.create("x"), 8)
    val s = new MisraGriesSummary(8)
    zipfItems(5000, 50, seed = 5).foreach(s.add(_))
    val back = agg.deserialize(agg.serialize(s))
    assert(back.k == s.k)
    assert(back.decremented == s.decremented)
    assert(back.counts == s.counts)
  }

  test("null items are skipped, not counted as a sentinel bucket") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("item")
    val m = HeavyHitters.sketch(df, "item", 4)
      .select(explode(col("candidates")).as(Seq("item", "est")))
      .as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 2L, "b" -> 1L))
  }
}
