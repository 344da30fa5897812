package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the generic connected-components operator on shapes the driver
  * fixture (a 2-level membership tree) cannot reach: long paths — the
  * worst case that separates O(log n)-round star algorithms from
  * O(diameter)-round label propagation — plus multi-component graphs,
  * self loops, and label determinism under permuted ids.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("a 256-node path converges within the default round cap") {
    // Label propagation needs ~256 rounds here; the alternating
    // algorithm's default cap of 25 only suffices because it
    // converges in O(log² n) — this IS the scale property.
    val path = (0L until 255L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 256 && got.values.forall(_ == 0L))
  }

  test("components, labels, and sizes on a permuted multi-component graph") {
    // Same path shape but with ids shuffled so no monotone-id shortcut
    // can fake convergence, plus a triangle, a self loop, and a pair.
    val rnd = new Random(7)
    val perm = rnd.shuffle((1000L to 1100L).toVector)
    val path = perm.sliding(2).map(p => (p(0), p(1))).toSeq
    val extra = Seq((1L, 2L), (2L, 3L), (3L, 1L), (500L, 500L), (600L, 601L))
    val got = cc(path ++ extra)

    assert(got.size == 101 + 3 + 1 + 2)
    val pathRoot = perm.min
    perm.foreach(n => assert(got(n) == pathRoot, s"node $n"))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(500L) == 500L, "self-loop-only node is its own singleton component")
    assert(got(600L) == 600L && got(601L) == 600L)
  }

  test("labels are identical across input partitionings and edge orders") {
    val rnd = new Random(11)
    val edges = rnd.shuffle(
      (0L until 200L).map(i => (i, (i + 1) % 100)) // wraps: two dense blobs
    )
    val a = ConnectedComponents
      .run(edges.toDF("src", "dst").repartition(17), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val b = ConnectedComponents
      .run(edges.reverse.toDF("src", "dst").repartition(2), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
