package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Kill-mid-purge: the stage-and-swap purge must leave the index
  * READABLE (old or new state, never lost, never answer-changed) at
  * every crash point, and a purge re-run must complete from any of
  * them. The crash states are constructed by running exactly the
  * purge's own phases and stopping — the same on-disk/catalog states a
  * killed JVM leaves.
  */
class PurgeSwapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def winnowFixture(idx: String) = {
    import spark.implicits._
    val shared = "this exact passage appears verbatim in both documents today"
    val old = Seq(
      (1L, s"left context totally different $shared and then some more"),
      (2L, s"$shared trailing content that matches nothing else at all"),
      (3L, "an unrelated document with none of that text anywhere")).toDF("doc_id", "text")
    val probeDocs = Seq(
      (10L, s"late arrival also containing $shared in its middle part")).toDF("doc_id", "text")
    Seq(idx, idx + "_tombstones", PurgeSwap.stagingOf(idx))
      .foreach(t => graft.io.Writer.dropTableAndLocation(spark, t))
    WinnowIndex.build(old, "doc_id", "text", idx)
    (probeDocs, () => WinnowIndex
      .probeNewBatch(spark, idx, probeDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("crash after STAGE: index intact and serving; purge re-run completes over the leftover staging") {
    import spark.implicits._
    val idx = "purge_crash_stage_idx"
    val (_, probe) = winnowFixture(idx)
    assert(probe() == Set((1L, 10L), (2L, 10L)))
    WinnowIndex.delete(spark, idx, Seq(1L).toDF("id"))
    val expected = probe()
    assert(expected == Set((2L, 10L)))
    // CRASH STATE A — the STAGE phase ran (same code path: live rows
    // into the staging table, same bucketed layout), then the JVM died
    // before the swap.
    graft.io.Writer.bucketedTable(
      spark.table(idx).join(broadcast(spark.table(idx + "_tombstones")),
        Seq("id"), "left_anti"),
      PurgeSwap.stagingOf(idx), "fp", 16)
    // The index is untouched: still holds the tombstoned postings,
    // still answers through the tombstone filter.
    assert(spark.table(idx).where(col("id") === 1L).count() > 0,
      "crash-after-stage must leave the old table intact")
    assert(probe() == expected, "index must keep serving, answers unchanged")
    // Re-run completes: re-stages over the leftover, swaps, drops stones.
    val removed = WinnowIndex.purgeTombstones(spark, idx)
    assert(removed > 0)
    assert(!spark.catalog.tableExists(PurgeSwap.stagingOf(idx)))
    assert(!spark.catalog.tableExists(idx + "_tombstones"))
    assert(spark.table(idx).where(col("id") === 1L).count() == 0)
    assert(probe() == expected, "purge never changes answers")
  }

  test("crash mid-SWAP (old dropped, rename pending): recover() adopts the staged rows, nothing lost") {
    import spark.implicits._
    val idx = "purge_crash_swap_idx"
    val (_, probe) = winnowFixture(idx)
    WinnowIndex.delete(spark, idx, Seq(1L).toDF("id"))
    val expected = probe()
    val livePostings = spark.table(idx)
      .join(broadcast(spark.table(idx + "_tombstones")), Seq("id"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // CRASH STATE B — STAGE completed, then the swap's DROP of the old
    // table ran (swap's own first step) and the JVM died before the
    // RENAME. The catalog has no index table; the staged table holds
    // the complete purged index.
    graft.io.Writer.bucketedTable(
      spark.table(idx).join(broadcast(spark.table(idx + "_tombstones")),
        Seq("id"), "left_anti"),
      PurgeSwap.stagingOf(idx), "fp", 16)
    graft.io.Writer.dropTableAndLocation(spark, idx)
    assert(!spark.catalog.tableExists(idx))
    // Re-run: recover() renames the staging table into place; the
    // (already-applied) tombstones then purge as a no-op and drop.
    val removed = WinnowIndex.purgeTombstones(spark, idx)
    assert(removed == 0L, "the crashed attempt already removed the rows")
    assert(spark.catalog.tableExists(idx))
    assert(!spark.catalog.tableExists(PurgeSwap.stagingOf(idx)))
    assert(!spark.catalog.tableExists(idx + "_tombstones"))
    assert(spark.table(idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == livePostings,
      "recovered index must hold exactly the staged live postings")
    assert(probe() == expected, "recovery never changes answers")
  }

  test("cell-partitioned purge rewrites ONLY the touched cells' files (purge bytes ∝ touched partitions)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val corpus = e.where(col("vec_id") =!= 0)
    val t = "purge_touched_cells_idx"
    Seq(t, t + "_tombstones", PurgeSwap.stagingOf(t))
      .foreach(tb => graft.io.Writer.dropTableAndLocation(spark, tb))
    IvfIndex.build(corpus, "vec_id", "embedding", t, k = 8, iters = 1)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).first().getSeq[Float](0)
    def top() = IvfIndex.probeTopK(spark, t, "vec_id", "embedding", q, 10, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    // Tombstone two ids out of ONE cell.
    val victimCell = spark.table(t).select(col("cluster_id"))
      .groupBy(col("cluster_id")).count().orderBy(col("count").desc)
      .first().getInt(0)
    val victims = spark.table(t)
      .where(col("cluster_id") === victimCell)
      .select(col("vec_id")).orderBy(col("vec_id")).limit(2)
      .collect().map(_.getLong(0)).toSeq
    IvfIndex.delete(spark, t, victims.toDF("id"))
    val expected = top()
    // Snapshot every partition directory's file listing (name, mtime,
    // length) BEFORE the purge.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(warehouse),
      t.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(): Map[String, Set[(String, Long, Long)]] =
      fs.listStatus(loc).filter(_.isDirectory).map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath)
          .filter(s => !s.getPath.getName.startsWith("_"))
          .map(s => (s.getPath.getName, s.getModificationTime, s.getLen))
          .toSet
      }.toMap
    val before = listing()
    // A stale staging table from an earlier crashed attempt must be
    // dropped and replaced, never merged.
    Seq((999L, Seq.fill(64)(0.1f), 0L, 0))
      .toDF("vec_id", "embedding", "pq_code", "cluster_id")
      .write.saveAsTable(PurgeSwap.stagingOf(t))
    val removed = IvfIndex.purgeTombstones(spark, t, "vec_id")
    assert(removed == 2L)
    val after = listing()
    val touchedDir = s"cluster_id=$victimCell"
    assert(after(touchedDir) != before(touchedDir),
      "the touched cell's files must be rewritten")
    (before.keySet - touchedDir).foreach { d =>
      assert(after(d) == before(d),
        s"untouched cell $d was rewritten — purge bytes must be " +
          "proportional to the touched partitions only")
    }
    assert(top() == expected, "purge never changes answers")
    assert(spark.table(t).where(col("vec_id").isin(victims: _*)).count() == 0)
    assert(!spark.catalog.tableExists(t + "_tombstones"))
    assert(!spark.catalog.tableExists(PurgeSwap.stagingOf(t)))
    assert(IvfIndex.purgeTombstones(spark, t, "vec_id") == 0L)
  }

  test("cell-partitioned purge drops a cell the takedown EMPTIES") {
    import spark.implicits._
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val corpus = e.where(col("vec_id") =!= 0)
    val t = "purge_empty_cell_idx"
    Seq(t, t + "_tombstones", PurgeSwap.stagingOf(t))
      .foreach(tb => graft.io.Writer.dropTableAndLocation(spark, tb))
    IvfIndex.build(corpus, "vec_id", "embedding", t, k = 8, iters = 1)
    // Tombstone EVERY id of the smallest cell.
    val victimCell = spark.table(t).select(col("cluster_id"))
      .groupBy(col("cluster_id")).count().orderBy(col("count").asc)
      .first().getInt(0)
    val victims = spark.table(t).where(col("cluster_id") === victimCell)
      .select(col("vec_id").as("id"))
    val nVictims = victims.count()
    IvfIndex.delete(spark, t, victims)
    val removed = IvfIndex.purgeTombstones(spark, t, "vec_id")
    assert(removed == nVictims)
    assert(spark.table(t).where(col("cluster_id") === victimCell).count() == 0,
      "an emptied cell must not resurrect its tombstoned rows")
    assert(spark.table(t).count() > 0)
  }
}
