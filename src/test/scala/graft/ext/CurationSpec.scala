package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamOps

/** The streaming curation pipeline (Curation.streamCurate): arrival-
  * order exact-dedup survivorship (cross-batch and within-batch), NFC
  * feeding the fingerprint (composed and decomposed Unicode collide),
  * the quality gate dropping junk without registering nothing-burgers
  * as state, and the house restart + crashed-attempt redelivery
  * discipline — including the excludeBatch rule (a crashed attempt's
  * own fingerprints must not suppress its redelivery).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // A gate-passing text: 24 tokens (≥ 20), one stopword (50·1 ≥ 24),
  // all-distinct words (max_tok·5 = 5 < 24), avg consonant length in
  // the [3·n_tok, 10·n_tok] band.
  private def goodText(seed: Int): String =
    "the " + (1 to 23).map(i => s"w${seed}word$i").mkString(" ")

  private def mkDocs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")

  private def shardDirs(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_curation_spec_").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/in"))
    (base, s"$base/in")
  }

  private def addShard(base: String, inDir: String, i: Int,
                       docs: org.apache.spark.sql.DataFrame): Unit = {
    val w = s"$base/w$i"
    docs.coalesce(1).write.mode("overwrite").parquet(w)
    val part = new java.io.File(w).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(inDir, s"shard_$i.parquet"))
  }

  test("arrival-order survivorship, NFC-fed fingerprints, and the gate") {
    val t = "curation_spec_sink"
    val all = Seq(t, Curation.fingerprintIndexOf(t))
    try {
      all.foreach(graft.io.Writer.dropTableAndLocation(spark, _))
      val (base, inDir) = shardDirs()
      // Shard 0: 0 and 3 are byte-identical twins (min id 0 survives)
      // plus a gate-failing short doc 6. Shard 1: 4 repeats doc 0's
      // text (cross-batch loser), 7 carries the composed e-acute.
      // Shard 2: 8 carries the DECOMPOSED form — same NFC as 7, so 7
      // survives and 8 must not.
      val eAcute = "caf\u00e9word" // composed e-acute
      val eDecomp = "cafe\u0301word" // e + combining acute: same NFC
      addShard(base, inDir, 0, mkDocs(Seq(
        0L -> goodText(1), 3L -> goodText(1), 6L -> "tiny text")))
      addShard(base, inDir, 1, mkDocs(Seq(
        4L -> goodText(1), 7L -> goodText(2).replace("w2word5", eAcute))))
      addShard(base, inDir, 2, mkDocs(Seq(
        8L -> goodText(2).replace("w2word5", eDecomp),
        11L -> goodText(3))))
      val docs = mkDocs(Nil)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val (acc, n) = Curation.streamCurate(spark, t, stream,
        "doc_id", "text", queryName = "curation_spec")
      assert(n == 3)
      val ids = acc.select("id").collect().map(_.getLong(0)).toSet
      // 0 beats 3 (within-batch min id) and 4 (later batch); 7 beats 8
      // through NFC; 6 fails the gate; 11 passes.
      assert(ids == Set(0L, 7L, 11L), ids.toString)
      // The gate-failing doc still REGISTERED its fingerprint (dedup
      // sees all arrivals), and losers did not.
      val fps = spark.table(Curation.fingerprintIndexOf(t))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(fps == Set(0L, 6L, 7L, 11L), fps.toString)
      // Split/stat columns are the batch pieces' values.
      val row = acc.where(col("id") === 0L).collect().head
      assert(row.getAs[Long]("n_tok") == 24L, row.toString)
      assert(Set("train", "val", "test")(row.getAs[String]("split")))
    } finally {
      all.foreach(graft.io.Writer.dropTableAndLocation(spark, _))
    }
  }

  test("restart resumes after committed batches; a crashed attempt's rows (sink AND index) are replaced, not suppressing") {
    val t = "curation_spec_restart"
    val fpIdx = Curation.fingerprintIndexOf(t)
    val all = Seq(t, fpIdx)
    try {
      all.foreach(graft.io.Writer.dropTableAndLocation(spark, _))
      val (base, inDir) = shardDirs()
      val ckpt = s"$base/ckpt"
      val docs = mkDocs(Nil)
      def run(): Int = {
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
        Curation.streamCurate(spark, t, stream, "doc_id", "text",
          queryName = "curation_spec_restart",
          checkpointLocation = Some(ckpt))._2
      }
      addShard(base, inDir, 0, mkDocs(Seq(0L -> goodText(1))))
      addShard(base, inDir, 1, mkDocs(Seq(4L -> goodText(4))))
      assert(run() == 2, "first run must process its two files")
      // A crashed batch-2 ATTEMPT: the batch's REAL rows landed in
      // both tables under batch id 2, but the checkpoint never
      // committed. The index rows carry doc 8's real fingerprint — if
      // the redelivered probe failed to exclude its own batch id, doc
      // 8 would read as already-seen and silently vanish. The sink
      // carries a poison row that must not survive the overwrite.
      val batch2 = mkDocs(Seq(8L -> goodText(8)))
      val fp8 = TextAnalysis.nfcNormalize(batch2, "text", "__norm")
        .select(col("doc_id").as("id"),
          TextAnalysis.fingerprint(col("__norm")).as("fp"))
      StreamOps.writeBatchToSink(spark, fpIdx, fp8, 2L)
      StreamOps.writeBatchToSink(spark, t,
        mkDocs(Seq(999L -> goodText(9)))
          .select(col("doc_id").as("id"), lit("poison").as("split"),
            col("n_chars"), lit(1L).as("n_tok")), 2L)
      spark.catalog.refreshTable(t)
      addShard(base, inDir, 2, mkDocs(Seq(8L -> goodText(8))))
      assert(run() == 1, "restart must process only the uncommitted file")
      val got = spark.table(t).drop(StreamOps.BatchTag)
      val ids = got.select("id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(0L, 4L, 8L),
        s"redelivery must land doc 8 and purge the poison row: $ids")
      assert(got.where(col("split") === "poison").count() == 0L)
      // The index holds exactly the three survivors' fingerprints.
      assert(spark.table(fpIdx).select("id").collect()
        .map(_.getLong(0)).toSet == Set(0L, 4L, 8L))
    } finally {
      all.foreach(graft.io.Writer.dropTableAndLocation(spark, _))
    }
  }
}
