package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The snapshot drift census: whole-bit integer arithmetic makes
  * every row hand-checkable — the fixture's expected values are
  * computed in the comments, digit by digit. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(vs: Seq[Int]) = {
    import spark.implicits._
    vs.toDF("v")
  }

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("hand fixture: exact milli-shares, whole-bit odds, drift scores") {
    // width 10, maxBucket 3 -> smoothing mass B = 4; N_old = N_new = 5.
    // old [1,5,12,35,99] -> buckets {0:2, 1:1, 3:2}
    // new [2,14,16,18,99] -> buckets {0:1, 1:3, 3:1}
    // bucket 0: d = floor(2000/9) - floor(3000/9) = 222 - 333 = -111;
    //   odds = bits(2*9=18)=4 minus bits(3*9=27)=4 -> 0; score 0.
    // bucket 1: d = floor(4000/9) - floor(2000/9) = 444 - 222 = 222;
    //   odds = bits(4*9=36)=5 minus bits(2*9=18)=4 -> 1; score 222.
    // bucket 3: mirror of bucket 0 with old/new swapped -> -111, 0, 0.
    val got = rows(Drift.census(df(Seq(1, 5, 12, 35, 99)),
      df(Seq(2, 14, 16, 18, 99)), col("v"), 10.0, 3))
    assert(got == Seq(
      (0L, 2L, 1L, -111L, 0L, 0L),
      (1L, 1L, 3L, 222L, 1L, 222L),
      (3L, 2L, 1L, -111L, 0L, 0L)), got.toString)
  }

  test("identical snapshots drift to zero everywhere") {
    val vs = Seq(3, 17, 17, 42, 77, 103, 999)
    val got = rows(Drift.census(df(vs), df(vs), col("v"), 25.0, 8))
    assert(got.nonEmpty)
    got.foreach { case (_, no, nn, d, ob, sc) =>
      assert(no == nn && d == 0L && ob == 0L && sc == 0L, got.toString)
    }
  }

  test("values below zero and beyond the cap clamp to the edge buckets") {
    val got = rows(Drift.census(df(Seq(-5, 1000)), df(Seq(-1, 5000)),
      col("v"), 10.0, 3))
    assert(got.map(_._1) == Seq(0L, 3L), got.toString)
  }

  test("censusMulti slices equal the single-metric censuses exactly") {
    import spark.implicits._
    val old = Seq((1, 10.0), (5, 220.0), (12, 35.0), (35, 99.0), (99, 7.0))
      .toDF("a", "b")
    val nw = Seq((2, 14.0), (14, 16.0), (16, 5.0), (18, 990.0), (99, 44.0))
      .toDF("a", "b")
    val metrics = Seq(
      Drift.Metric("a", col("a"), 10.0, 3),
      Drift.Metric("b", col("b"), 25.0, 8))
    val multi = Drift.censusMulti(old, nw, metrics).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    metrics.foreach { m =>
      val single = rows(Drift.census(old, nw, m.value,
        m.bucketWidth, m.maxBucket))
        .map { case (b, no, nn, d, ob, sc) => (m.name, b, no, nn, d, ob, sc) }
      assert(multi.filter(_._1 == m.name) == single,
        s"metric ${m.name}: multi ${multi.filter(_._1 == m.name)} != " +
          s"single $single")
    }
  }

  test("a restarted streamCellDrift resumes after committed batches; a redelivered batch replaces a crashed attempt's rows") {
    // The serving loop's restart discipline (StreamServeSpec) applied
    // to the vector-drift monitor: resume-aware sink + batch-tagged
    // dynamic overwrite, so driver death between micro-batches and a
    // crashed attempt's orphan rows both heal into the uninterrupted
    // time series.
    import java.nio.file.{Files, Paths}
    import graft.{Tables, TestSpark}
    import graft.streaming.StreamOps
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val base = e.where(col("vec_id") >= 100 && col("vec_id") < 200)
    val cents = Similarity.ivfCentroids(base, "vec_id", "embedding", 4)
    val reference = Similarity.ivfAssign(base, "vec_id", "embedding", cents)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_live"))
    val arriving = e.where(col("vec_id") >= 200 && col("vec_id") < 260)
    val sink = "drift_stream_restart_sink"
    val basePath = Files.createTempDirectory("graft_vecdrift_restart_").toString
    val inDir = s"$basePath/in"
    val ckpt = s"$basePath/ckpt"
    Files.createDirectories(Paths.get(inDir))
    def addShard(i: Int): Unit = {
      val w = s"$basePath/w$i"
      arriving.where(pmod(col("vec_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(inDir, s"shard_$i.parquet"))
    }
    def run(): Int = {
      val stream = spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      IvfIndex.streamCellDrift(spark, reference, stream, "vec_id",
        "embedding", cents, sink, "drift_restart_spec",
        checkpointLocation = Some(ckpt))
    }
    def accumulated() = spark.table(sink).collect()
      .map(r => (r.getLong(6), r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    try {
      addShard(0); addShard(1)
      assert(run() == 2, "first run must process its two files")
      // Crashed batch-2 attempt: sink rows landed, commit didn't.
      val garbage = spark.table(sink)
        .where(col(StreamOps.BatchTag) === 0L)
        .drop(StreamOps.BatchTag)
        .withColumn("drift_score", lit(-999L))
      StreamOps.writeBatchToSink(spark, sink, garbage, 2L)
      spark.catalog.refreshTable(sink)
      assert(accumulated().exists(_._7 == -999L), "garbage must be planted")
      addShard(2)
      assert(run() == 1, "restart must process only the uncommitted file")
      val got = accumulated()
      assert(!got.exists(_._7 == -999L),
        "redelivery must replace the crashed attempt's rows")
      // The accumulated series equals the per-shard batch recompute.
      val expect = (0 to 2).flatMap { i =>
        Drift.contrastCounts(
          reference.select(col("cluster_id").cast("long").as("bucket"),
            col("n_live").as("n_old")),
          Similarity.ivfAssign(
              arriving.where(pmod(col("vec_id"), lit(3)) === i),
              "vec_id", "embedding", cents)
            .groupBy(col("cluster_id").cast("long").as("bucket"))
            .agg(count(lit(1)).as("n_new")),
          smoothingMass = 4L).collect()
          .map(r => (i.toLong, r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))
      }.toSet
      assert(got == expect,
        s"restarted series diverged: extra=${got -- expect} missing=${expect -- got}")
    } finally spark.sql(s"DROP TABLE IF EXISTS `$sink`")
  }

  test("a restarted streamCensusMulti resumes after committed batches and equals the per-shard multi census") {
    // The multi-metric monitor inherits the family restart discipline
    // (resume-aware sink + batch-tagged dynamic overwrite) and every
    // accumulated (batch, metric, bucket) slice is the batch-mode
    // censusMulti replayed on its shard.
    import java.nio.file.{Files, Paths}
    import graft.{Tables, TestSpark}
    import graft.streaming.StreamOps
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .where(col("text").isNotNull)
    val ref = docs.where(pmod(col("doc_id"), lit(2L)) === 0)
    val arriving = docs.where(pmod(col("doc_id"), lit(2L)) === 1)
      .select(col("doc_id"), col("text"))
    val metrics = Seq(
      Drift.Metric("chars", length(col("text")), 200.0, 8),
      Drift.Metric("tokens",
        graft.ext.TextAnalysis.wsTokenCount(col("text")), 32.0, 8))
    val sink = "drift_stream_multi_sink"
    val basePath = Files.createTempDirectory("graft_multidrift_restart_").toString
    val inDir = s"$basePath/in"
    val ckpt = s"$basePath/ckpt"
    Files.createDirectories(Paths.get(inDir))
    def addShard(i: Int): Unit = {
      val w = s"$basePath/w$i"
      arriving.where(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(inDir, s"shard_$i.parquet"))
    }
    def run(): Int = {
      val stream = spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      Drift.streamCensusMulti(spark, ref, stream, metrics, sink,
        "multidrift_restart_spec", checkpointLocation = Some(ckpt))
    }
    def accumulated() = spark.table(sink).collect()
      .map(r => (r.getLong(7), r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    try {
      addShard(0); addShard(1)
      assert(run() == 2, "first run must process its two files")
      // Crashed batch-2 attempt: sink rows landed, commit didn't.
      val garbage = spark.table(sink)
        .where(col(StreamOps.BatchTag) === 0L)
        .drop(StreamOps.BatchTag)
        .withColumn("drift_score", lit(-999L))
      StreamOps.writeBatchToSink(spark, sink, garbage, 2L)
      spark.catalog.refreshTable(sink)
      assert(accumulated().exists(_._8 == -999L), "garbage must be planted")
      addShard(2)
      assert(run() == 1, "restart must process only the uncommitted file")
      val got = accumulated()
      assert(!got.exists(_._8 == -999L),
        "redelivery must replace the crashed attempt's rows")
      val expect = (0 to 2).flatMap { i =>
        Drift.censusMulti(ref,
            arriving.where(pmod(col("doc_id"), lit(3)) === i), metrics)
          .collect()
          .map(r => (i.toLong, r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      }.toSet
      assert(got == expect,
        s"restarted series diverged: extra=${got -- expect} missing=${expect -- got}")
    } finally spark.sql(s"DROP TABLE IF EXISTS `$sink`")
  }

  test("NULL metric values are dropped, not bucketed (ADVICE r18)") {
    import spark.implicits._
    def dfN(vs: Seq[Option[Int]]) = vs.toDF("v")
    // With the nulls stripped the two snapshots are IDENTICAL — so the
    // census must be all-zero drift, and no null-bucket row may appear
    // (a null bucket would also break the sink schema and the replay).
    val got = rows(Drift.census(
      dfN(Seq(Some(1), None, Some(15), Some(35), None)),
      dfN(Seq(Some(1), Some(15), None, Some(35))), col("v"), 10.0, 3))
    assert(got.map(_._1) == Seq(0L, 1L, 3L), got.toString)
    got.foreach { case (_, no, nn, d, ob, sc) =>
      assert(no == nn && d == 0L && ob == 0L && sc == 0L, got.toString)
    }
  }
}
