package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The index ops census (IndexOps.census): the when-to-compact report.
  * Mid-lifecycle state must surface as nonzero backlog / merge_parts /
  * zeroed_grams with compact_due = 1, and running each family's OWN
  * compaction path (purgeTombstones for the tombstoned batch layouts,
  * compact for the LM's wave layout) must collapse the census —
  * backlog 0, merge_parts ≤ 1, zeroed 0, compact_due 0.
  */
class IndexOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def byFamily(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap

  test("an absent index yields a dashboard row, not an exception") {
    val got = IndexOps.census(spark,
      Seq(IndexOps.Entry("ghost", "census_spec_no_such_table")))
      .collect().head
    assert(got.getString(1) == "<absent>" && got.getLong(3) == 0L &&
      got.getLong(6) == 0L, got.toString)
  }

  test("mid-lifecycle census surfaces backlog/waves/zeroed-grams; each family's compaction collapses it") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .where(col("doc_id") < 60 && col("text").isNotNull)
    val dels = docs.where(col("doc_id") % 20 === 3) // 3, 23, 43
    val delIds = dels.select(col("doc_id").as("id"))
    val em = Tables.embeddings(spark, TestSpark.sf0001)
      .where(col("vec_id") < 60).select(col("vec_id"), col("embedding"))
    val emDelIds = em.where(col("vec_id") % 20 === 3)
      .select(col("vec_id").as("id"))
    def t(n: String) = "census_spec_" + n
    val entries = Seq(
      IndexOps.Entry("bands", t("bands")),
      IndexOps.Entry("bm25", t("bm25"),
        Seq(t("bm25") + "_docs", t("bm25") + "_stats",
          t("bm25") + "_stats_deltas")),
      IndexOps.Entry("ivf", t("ivf"),
        Seq(IvfIndex.centroidsTable(t("ivf")))),
      IndexOps.Entry("lm", t("lm"), Seq(t("lm") + "_docs"),
        gramDeltas = true))
    try {
      DedupIndex.build(docs, "doc_id", "text", t("bands"))
      DedupIndex.delete(spark, t("bands"), delIds)
      PostingsIndex.build(spark, docs, "doc_id", "text", t("bm25"))
      PostingsIndex.delete(spark, t("bm25"), delIds)
      IvfIndex.build(em, "vec_id", "embedding", t("ivf"), k = 4, iters = 1)
      IvfIndex.delete(spark, t("ivf"), emDelIds)
      LmIndex.build(spark, docs.where(col("doc_id") < 40), "doc_id", "text", t("lm"))
      LmIndex.append(spark, t("lm"), docs.where(col("doc_id") >= 40),
        "doc_id", "text")
      LmIndex.delete(spark, t("lm"), dels, "doc_id", "text")

      val mid = byFamily(IndexOps.census(spark, entries))
      assert(mid("bands") == (("", 0L, 2L, 3L, 0L, 1L)),
        s"bands mid-lifecycle census off: ${mid("bands")}")
      // 5 tables mid-lifecycle: main, _docs, _stats, the takedown's
      // _stats_deltas row, and the tombstone list.
      assert(mid("bm25") == (("", 0L, 5L, 3L, 0L, 1L)),
        s"bm25 mid-lifecycle census off: ${mid("bm25")}")
      assert(mid("ivf") == (("cluster_id", 0L, 3L, 3L, 0L, 1L)),
        s"ivf mid-lifecycle census off: ${mid("ivf")}")
      val (lmLayout, lmWaves, lmTables, lmBacklog, lmZeroed, lmDue) = mid("lm")
      assert(lmLayout == "__wave" && lmWaves == 3L && lmTables == 3L &&
        lmBacklog == 3L && lmDue == 1L,
        s"lm mid-lifecycle census off: ${mid("lm")}")
      // The deleted docs' exclusive bigrams are exactly the zeroed
      // gram rows — replay the definition over the data.
      def bg(df: org.apache.spark.sql.DataFrame) = df.select(
          explode(TextAnalysis.shingleStrings(col("text"), 2)).as("g"))
        .distinct()
      val expectZeroed = bg(dels)
        .join(bg(docs.where(col("doc_id") % 20 =!= 3)), Seq("g"), "left_anti")
        .count()
      assert(lmZeroed == expectZeroed,
        s"lm zeroed_grams $lmZeroed != data-derived $expectZeroed")

      DedupIndex.purgeTombstones(spark, t("bands"))
      PostingsIndex.purgeTombstones(spark, t("bm25"))
      IvfIndex.purgeTombstones(spark, t("ivf"), "vec_id")
      LmIndex.compact(spark, t("lm"))
      val post = byFamily(IndexOps.census(spark, entries))
      post.foreach { case (fam, (_, mergeParts, _, backlog, zeroed, due)) =>
        assert(backlog == 0L && mergeParts <= 1L && zeroed == 0L && due == 0L,
          s"$fam census did not collapse post-compaction: ${post(fam)}")
      }
    } finally {
      entries.flatMap(e => (e.table +: e.siblings) :+
          IndexLifecycle.tombstonesOf(e.table))
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS `$x`"))
    }
  }
}
