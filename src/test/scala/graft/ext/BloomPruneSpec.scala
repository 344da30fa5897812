package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom-pruned join contract: result identical to the plain join
  * (no false negatives, ever), pruning actually drops the bulk of
  * non-matching rows, and null keys are join-semantics-safe.
  */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val big = ((1L to 10000L).map(k => (k, s"v$k")) :+
    (0L, "null-key")).map { case (k, v) => (if (k == 0L) null else k: java.lang.Long, v) }
    .toDF("k", "payload")
  private lazy val small = (1L to 10000L by 100L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("pruned join equals the plain join exactly") {
    val pruned = BloomPrune.prunedJoin(big, small, "k", expectedKeys = 100)
      .select(col("k"), col("payload"), col("name"))
    val plain = big.join(small, Seq("k")).select(col("k"), col("payload"), col("name"))
    assert(pruned.exceptAll(plain).unionAll(plain.exceptAll(pruned)).count() == 0,
      "bloom pruning must never change the join result")
  }

  test("pruning drops the bulk of non-matching rows at fpp 0.01") {
    val bf = BloomPrune.keyFilter(small, "k", expectedKeys = 100, fpp = 0.01)
    val kept = BloomPrune.prune(big, "k", bf).count()
    // 100 true keys + ~1% false positives of the other ~9900 (+ slack):
    // anything near the full 10001 means the filter is not pruning.
    assert(kept >= 100 && kept < 600, s"unexpected post-prune count: $kept")
  }

  test("null keys are dropped (equi-join semantics preserved)") {
    val bf = BloomPrune.keyFilter(small, "k", expectedKeys = 100)
    val keptNull = BloomPrune.prune(big.where(col("k").isNull), "k", bf).count()
    assert(keptNull == 0)
  }
}
