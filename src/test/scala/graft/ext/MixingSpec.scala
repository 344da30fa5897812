package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Weighted-mix semantics: per-group rates honored approximately, the
  * decision is per-row deterministic (stable under repartitioning and
  * subsetting), and unknown groups follow the default.
  */
class MixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = (1L to 4000L)
    .map(i => (i, if (i % 2 == 0) "web" else "books")).toDF("id", "src")

  test("per-group percentages are honored within hash jitter") {
    val kept = Mixing.sampleByPct(rows, "id", "src", Map("web" -> 20), defaultPct = 100)
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("books") == 2000L, "default 100% must keep every row")
    assert(kept("web") > 300 && kept("web") < 500,
      s"20% of 2000 should keep ~400, got ${kept("web")}")
  }

  test("row fate is deterministic and stable under repartition and subset") {
    val once = Mixing.sampleByPct(rows, "id", "src", Map("web" -> 20, "books" -> 50))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val again = Mixing.sampleByPct(rows.repartition(13), "id", "src",
      Map("web" -> 20, "books" -> 50)).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(once == again, "mix must not depend on partitioning")
    val subset = Mixing.sampleByPct(rows.where(col("id") <= 1000), "id", "src",
      Map("web" -> 20, "books" -> 50)).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(subset == once.filter(_ <= 1000L), "a row's fate must not depend on the corpus")
  }

  test("tokenBudgetPerGroup: inclusive prefix in hash order, whole small groups, deterministic") {
    val df = ((1L to 40L).map(i => (i, "big", 10L)) ++      // 400 tokens total
      (101L to 103L).map(i => (i, "small", 5L)))            // 15 — under budget
      .toDF("id", "g", "n")
    val out = Mixing.tokenBudgetPerGroup(df, "id", "g", col("n"), budget = 100L)
    assert(out.columns.toSeq == df.columns.toSeq, "schema must be the input schema")
    val kept = out.collect().map(r => (r.getString(1), r.getLong(0)))
    // Small group fits whole.
    assert(kept.count(_._1 == "small") == 3, s"under-budget group truncated: ${kept.toSeq}")
    // Big group: exactly 10 docs of 10 tokens — and precisely the
    // first 10 in (orderHash, id) order, the same prefix an
    // independent sort computes.
    val bigKept = kept.filter(_._1 == "big").map(_._2).toSet
    assert(bigKept.size == 10, s"expected 10 big docs kept, got ${bigKept.size}")
    val expected = df.where(col("g") === "big")
      .select(col("id"), Mixing.orderHash(col("id")).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(10).map(_._2).toSet
    assert(bigKept == expected, s"kept set is not the hash-order prefix: $bigKept vs $expected")
    // Deterministic under repartition.
    val again = Mixing.tokenBudgetPerGroup(df.repartition(7), "id", "g", col("n"), 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_._2).toSet)
  }

  test("sqrtTemperatureMix: min group whole, keep pct = floor(100*sqrt(cmin/c)), deterministic") {
    // Counts: tiny=4 (pct 100 — exact), big=16 (4/16 = 0.25 exact,
    // sqrt = 0.5 exact → pct 50), mid=9 (floor(100*sqrt(4/9)) = 66).
    val df = ((1L to 4L).map(i => (i, "tiny")) ++
      (101L to 116L).map(i => (i, "big")) ++
      (201L to 209L).map(i => (i, "mid"))).toDF("id", "g")
    val mixed = Mixing.sqrtTemperatureMix(df, "id", "g")
    val kept = mixed.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("tiny", 0L) == 4L, s"min group must survive whole: $kept")
    // The realized keep per group equals the independent bucket filter
    // at the predicted percentage — the mix IS that composition.
    def expect(lo: Long, hi: Long, pct: Int) =
      df.where(col("id").between(lo, hi) &&
        TextAnalysis.splitBucket(col("id")) < pct).count()
    assert(kept.getOrElse("big", 0L) == expect(101, 116, 50),
      s"big group must keep exactly its bucket<50 rows: $kept")
    assert(kept.getOrElse("mid", 0L) == expect(201, 209, 66),
      s"mid group must keep exactly its bucket<66 rows: $kept")
    // Deterministic under repartition; schema unchanged.
    val again = Mixing.sqrtTemperatureMix(df.repartition(7), "id", "g")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(again == mixed.select(col("id")).collect().map(_.getLong(0)).toSet)
    assert(mixed.columns.toSeq.sorted == df.columns.toSeq.sorted,
      "output schema must be the input schema")
    // Empty input: empty output with the input schema, no NPE.
    assert(Mixing.sqrtTemperatureMix(df.where(lit(false)), "id", "g").count() == 0)
  }
}
