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
}
