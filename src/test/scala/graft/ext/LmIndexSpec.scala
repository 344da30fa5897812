package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The incremental bigram-LM index: additive integer counts make every
  * lifecycle contract VALUE-exact — probes must equal the scan-time
  * surprisal operator bit-for-bit whenever the index holds the probed
  * corpus's census, through any build/append/delete/compact sequence,
  * and every write must be retry-idempotent (deterministic wave
  * overwrite).
  */
class LmIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq

  private def scanTruth(docs: org.apache.spark.sql.DataFrame) =
    TextAnalysis.surprisalStats(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"), lit(0L).as("n_oov"),
        col("bits_sum"), col("mean_bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq

  test("build + probe equals scan-time surprisalStats bit-for-bit; append completes the corpus; retries are no-ops") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val t = "lm_idx_spec"
    val old = docs.where(pmod(col("doc_id"), lit(5)) =!= 4)
    val shard = docs.where(pmod(col("doc_id"), lit(5)) === 4)
    LmIndex.build(spark, old, "doc_id", "text", t)
    // Probe of the indexed slice against its own census == scan truth.
    assert(rows(LmIndex.probe(spark, t, old, "doc_id", "text")) ==
      scanTruth(old), "probe must equal surprisalStats on the built corpus")
    // Append the shard: now the full corpus's LM, and probes of the
    // FULL corpus equal the full-corpus scan truth (prefix masses
    // shifted by the appended counts included).
    LmIndex.append(spark, t, shard, "doc_id", "text")
    val full = rows(LmIndex.probe(spark, t, docs, "doc_id", "text"))
    assert(full == scanTruth(docs),
      "post-append probe must equal surprisalStats on the full corpus")
    // Retried append (same docs): deterministic wave overwrite + the
    // registry filter — counts unchanged either way.
    LmIndex.append(spark, t, shard, "doc_id", "text")
    LmIndex.append(spark, t, docs, "doc_id", "text")
    assert(rows(LmIndex.probe(spark, t, docs, "doc_id", "text")) == full,
      "retried/overlapping appends must not change any count")
  }

  test("delete subtracts the docs' counts exactly: probe equals a fresh build on the live corpus; OOV surfaces") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val t = "lm_del_spec"
    LmIndex.build(spark, docs, "doc_id", "text", t)
    val dead = docs.where(pmod(col("doc_id"), lit(5L)) === 0)
    val live = docs.where(pmod(col("doc_id"), lit(5L)) =!= 0)
    val removed = LmIndex.delete(spark, t, dead, "doc_id", "text")
    assert(removed == dead.where(col("text").isNotNull).count() ||
      removed == dead.count(), s"delete must report the wave size, got $removed")
    // Live-corpus probes equal a fresh build over the live docs —
    // counts AND prefix masses shed the deleted mass exactly.
    val got = rows(LmIndex.probe(spark, t, live, "doc_id", "text"))
    assert(got == scanTruth(live),
      "post-delete probe must equal surprisalStats on the live corpus")
    // Retried delete: no double subtraction.
    assert(LmIndex.delete(spark, t, dead, "doc_id", "text") == 0L)
    assert(rows(LmIndex.probe(spark, t, live, "doc_id", "text")) == got)
    // Grams absent from the live LM surface as OOV and score nothing
    // (a doc with one in-LM bigram and one never-seen bigram).
    locally {
      import spark.implicits._
      val inLm = live.where(col("text").isNotNull)
        .select(split(col("text"), " ")).first().getSeq[String](0).take(2)
      val probeDoc = Seq((999999L,
        s"${inLm.mkString(" ")} zzz-unseen-alpha zzz-unseen-beta"))
        .toDF("doc_id", "text")
      val r = LmIndex.probe(spark, t, probeDoc, "doc_id", "text").head()
      assert(r.getLong(2) > 0, s"unseen bigrams must count as OOV: $r")
      assert(r.getLong(1) > r.getLong(2), s"the in-LM bigram must score: $r")
    }
    // Compact: answer-stable, waves collapse, zeroed grams reclaim,
    // tombstones clear (deleted ids become appendable again).
    val wavesBefore = spark.sessionState.catalog.listPartitionNames(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).size
    val merged = LmIndex.compact(spark, t)
    assert(merged == wavesBefore - 1, s"expected ${wavesBefore - 1} waves merged")
    assert(spark.table(t).where(col("c") <= 0).count() == 0,
      "compact must drop zeroed/negative gram rows")
    assert(spark.sessionState.catalog.listPartitionNames(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).size == 1)
    assert(rows(LmIndex.probe(spark, t, live, "doc_id", "text")) == got,
      "compact never changes answers")
    assert(spark.table(t + "_tombstones").count() == 0)
    LmIndex.append(spark, t, dead, "doc_id", "text")
    assert(rows(LmIndex.probe(spark, t, docs, "doc_id", "text")) ==
      scanTruth(docs),
      "post-compact re-append of deleted docs must restore the full LM")
  }

  test("streamIngest: micro-batched shards accumulate to the one-shot census; probes serve mid-lifecycle state") {
    import java.nio.file.{Files, Paths}
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .where(col("doc_id") < 300)
    val base = Files.createTempDirectory("graft_lm_stream_").toString
    val inDir = s"$base/in"
    Files.createDirectories(Paths.get(inDir))
    (0 until 3).foreach { k =>
      val w = s"$base/w_$k"
      docs.where(pmod(col("doc_id"), lit(3L)) === k)
        .coalesce(1).write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(inDir, s"shard_$k.parquet"))
    }
    val t = "lm_stream_spec"
    val cp = s"$base/cp"
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val n = LmIndex.streamIngest(spark, t, stream, "doc_id", "text",
      queryName = "lm_stream_spec_q", checkpointLocation = Some(cp))
    assert(n == 3, s"expected 3 micro-batches, got $n")
    assert(rows(LmIndex.probe(spark, t, docs, "doc_id", "text")) ==
      scanTruth(docs),
      "stream-accumulated LM must probe exactly like a one-shot build")
    // Crash-then-compact refusal: a batch-N count wave BEYOND the
    // checkpoint's last committed batch is an orphan a restarted
    // stream would redeliver — absorbing it would double-count. Plant
    // one and compact with the checkpoint: must refuse; without the
    // orphan the same call succeeds.
    import org.apache.spark.sql.functions.{col => c, lit => l}
    spark.table(t).limit(1)
      .select(c("w1"), c("g"), c("c"), l("batch-7").as("__wave"))
      .write.mode("append").insertInto(t)
    val ex = intercept[IllegalStateException] {
      LmIndex.compact(spark, t, checkpointLocation = Some(cp))
    }
    assert(ex.getMessage.contains("batch-7"), ex.getMessage)
    spark.sql(s"ALTER TABLE `$t` DROP PARTITION (__wave='batch-7')")
    LmIndex.compact(spark, t, checkpointLocation = Some(cp))
    assert(rows(LmIndex.probe(spark, t, docs, "doc_id", "text")) ==
      scanTruth(docs),
      "post-compact probes unchanged once the orphan is resolved")
  }

  test("a crash inside the tombstone swap window heals at the next lifecycle entry") {
    import graft.io.Writer
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .where(col("doc_id") < 100)
    val t = "lm_heal_spec"
    LmIndex.build(spark, docs, "doc_id", "text", t)
    // Simulate compact's tombstone clear crashing between PurgeSwap's
    // drop and rename: staged empty table present, live table gone.
    val stones = t + "_tombstones"
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("__wave", StringType)))
    Writer.dropTableAndLocation(spark, PurgeSwap.stagingOf(stones))
    Writer.emptyPartitionedBucketedTable(spark, PurgeSwap.stagingOf(stones),
      schema, "__wave", "id", 1)
    Writer.dropTableAndLocation(spark, stones)
    // Every entry point recovers: the probe must not throw, and the
    // tombstone table must be back (the staged empty copy adopted).
    assert(rows(LmIndex.probe(spark, t, docs, "doc_id", "text")) ==
      scanTruth(docs), "probe after a swap-window crash must heal and serve")
    assert(spark.catalog.tableExists(stones),
      "recover() must adopt the staged tombstone table")
    assert(spark.table(stones).count() == 0)
    // Append still works post-heal (reads the recovered table).
    LmIndex.append(spark, t, docs.limit(0), "doc_id", "text")
  }
}
