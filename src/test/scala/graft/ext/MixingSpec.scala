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

  test("sqrtTemperatureMix: min group whole, keep rule bucket²·c < 10⁸·cmin, deterministic") {
    // Counts: tiny=4 (threshold ⇔ bucket ≤ 9999 — whole group), big=16
    // (bucket² ≤ (4·10⁸−1) div 16 = 24999999 ⇔ bucket < 5000 — the 50%
    // point of the 10⁴-bucket hash), mid=9 (bucket ≤ 6666 ⇔ the
    // 10⁴·√(4/9) = 6666.67 cut).
    val df = ((1L to 4L).map(i => (i, "tiny")) ++
      (101L to 116L).map(i => (i, "big")) ++
      (201L to 209L).map(i => (i, "mid"))).toDF("id", "g")
    val mixed = Mixing.sqrtTemperatureMix(df, "id", "g")
    val kept = mixed.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("tiny", 0L) == 4L, s"min group must survive whole: $kept")
    // The realized keep per group equals the independent bucket filter
    // at the predicted cut — the mix IS that composition.
    def expect(lo: Long, hi: Long, cut: Int) =
      df.where(col("id").between(lo, hi) &&
        TextAnalysis.idHashBucket(col("id"), 10000L) < cut).count()
    assert(kept.getOrElse("big", 0L) == expect(101, 116, 5000),
      s"big group must keep exactly its bucket<5000 rows: $kept")
    assert(kept.getOrElse("mid", 0L) == expect(201, 209, 6667),
      s"mid group must keep exactly its bucket<6667 rows: $kept")
    // Deterministic under repartition; schema unchanged.
    val again = Mixing.sqrtTemperatureMix(df.repartition(7), "id", "g")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(again == mixed.select(col("id")).collect().map(_.getLong(0)).toSet)
    assert(mixed.columns.toSeq.sorted == df.columns.toSeq.sorted,
      "output schema must be the input schema")
    // Empty input: empty output with the input schema, no NPE.
    assert(Mixing.sqrtTemperatureMix(df.where(lit(false)), "id", "g").count() == 0)
  }

  test("sqrtTemperatureMix: a 10⁵·cmin group keeps a ~√-proportional share, not zero") {
    // The integer-percentage form floored to pct 0 for any group past
    // 10⁴·cmin and dropped it WHOLE; the cross-multiplied rule keeps
    // bucket ≤ 31 (31² = 961 ≤ (10⁸−1) div 10⁵ = 999 < 32²), i.e. an
    // expected 32/10⁴ ≈ √(1/10⁵) share of a 100 000-row head group
    // against a 1-row tail.
    val df = ((1L to 100000L).map(i => (i, "head")) ++ Seq((2000000L, "tail")))
      .toDF("id", "g")
    val kept = Mixing.sqrtTemperatureMix(df, "id", "g")
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val headKept = kept.getOrElse("head", 0L)
    assert(headKept > 0L, "head group must not cliff to zero")
    val exact = df.where(col("g") === "head" &&
      TextAnalysis.idHashBucket(col("id"), 10000L) <= 31).count()
    assert(headKept == exact, s"head keep must be exactly the bucket≤31 cut: $headKept vs $exact")
    // ~316 expected (√(cmin·c) = √10⁵); hash jitter stays well inside 2×.
    assert(headKept > 150 && headKept < 650, s"share not ~√-proportional: $headKept")
  }

  test("tokenBudgetPerGroup equals the single-task window form row-for-row") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val df = (1L to 3000L)
      .map(i => (i, s"src${rnd.nextInt(4)}", (rnd.nextInt(50) + 1).toLong))
      .toDF("id", "g", "n")
    val got = Mixing.tokenBudgetPerGroup(df, "id", "g", col("n"), budget = 5000L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(Mixing.orderHash(col("id")), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("n")).over(w))
      .where(col("cum") <= 5000L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == expected, "keyed prefix-sum path must equal the window form")
  }

  test("trainOrder: positions are the (hash, id) permutation; round-robin shards balance") {
    val df = (1L to 1000L).map(i => (i, s"payload$i")).toDF("id", "t")
    val got = Mixing.trainOrder(df, "id", nShards = 8)
      .select(col("id"), col("epoch_pos"), col("shard"), col("pos_in_shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.length == 1000)
    // epoch_pos is a permutation of 0..n-1 in (orderHash, id) order.
    assert(got.map(_._2).sorted.toSeq == (0L until 1000L))
    val expectedOrder = df
      .withColumn("h", Mixing.orderHash(col("id")))
      .orderBy(col("h"), col("id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got.sortBy(_._2).map(_._1).toSeq == expectedOrder)
    // shard/pos arithmetic and balance (1000 = 8·125 exactly).
    assert(got.forall { case (_, p, s, ps) => s == (p % 8).toInt && ps == p / 8 })
    val sizes = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.toSet == Set(125))
  }

  test("streamTokenBudget: stream-kept equals the batch global-cumsum prefix over batch order") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.expressions.Window
    val base = Files.createTempDirectory("graft_budget_stream_").toString
    val inDir = s"$base/in"
    Files.createDirectories(Paths.get(inDir))
    val all = (1L to 300L)
      .map(i => (i, if (i % 3 == 0) "big" else s"t${i % 2}", 10L + i % 7))
      .toDF("id", "g", "tok")
    def addShard(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val w = s"$base/w_$name"
      df.coalesce(1).write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(inDir, s"$name.parquet"))
    }
    addShard(all.where(col("id") <= 150), "shard_0")
    addShard(all.where(col("id") > 150), "shard_1")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val (kept, n) = Mixing.streamTokenBudget(spark, "mix_budget_spec",
      stream, "id", "g", col("tok"), budget = 300L,
      queryName = "mix_budget_spec_q")
    assert(n == 2, s"expected 2 micro-batches, got $n")
    val got = kept.select(col("id")).collect().map(_.getLong(0)).toSet
    // The contract: kept == tokenBudgetPerGroup's global-cumsum prefix
    // over the (batch, id-hash, id) concatenation order — because the
    // ledger records total (kept + dropped) batch mass per group.
    val w = Window.partitionBy(col("g"))
      .orderBy(col("b"), Mixing.orderHash(col("id")), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = all
      .withColumn("b", when(col("id") <= 150, 0).otherwise(1))
      .withColumn("cum", sum(col("tok")).over(w))
      .where(col("cum") <= 300L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"stream diverged from the batch prefix: extra=${got -- expected} missing=${expected -- got}")
    // The budget binds: every group kept a strict partial prefix.
    assert(got.nonEmpty && got.size < 300)
  }

  test("streamTokenBudget: a crashed attempt's orphaned ledger row does not double-count on redelivery") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.StreamOps
    val base = Files.createTempDirectory("graft_budget_crash_").toString
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(inDir))
    val table = "mix_budget_crash_spec"
    val all = (1L to 200L).map(i => (i, "g", 10L)).toDF("id", "g", "tok")
    def addShard(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val w = s"$base/w_$name"
      df.coalesce(1).write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(inDir, s"$name.parquet"))
    }
    def run(): Set[Long] = {
      val stream = spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      Mixing.streamTokenBudget(spark, table, stream, "id", "g", col("tok"),
          budget = 1500L, queryName = "mix_budget_crash_q",
          checkpointLocation = Some(ckpt))
        ._1.select(col("id")).collect().map(_.getLong(0)).toSet
    }
    // Batch 0 (ids 1..100, 1000 tokens) commits: all kept.
    addShard(all.where(col("id") <= 100), "shard_0")
    assert(run().size == 100)
    // CRASH simulation: batch 1's LEDGER row lands but its commit does
    // not (the concurrent side-write raced ahead of the checkpoint
    // when the driver died).
    val orphanLedger = Seq(("g", 1000L)).toDF("g", "total_tok")
      .localCheckpoint(true)
    StreamOps.writeBatchToSink(spark, table + "_totals", orphanLedger, 1L)
    spark.catalog.refreshTable(table + "_totals")
    // Redelivery of batch 1 (ids 101..200, 1000 tokens): the in-flight
    // batch's OWN ledger partition is excluded, so prior mass is batch
    // 0's 1000 — budget 1500 keeps exactly 50 more rows. Counting the
    // orphan would read prior = 2000 and keep nothing.
    addShard(all.where(col("id") > 100), "shard_1")
    val kept = run()
    assert(kept.count(_ > 100L) == 50,
      s"redelivered batch must keep 50 rows (prior = batch 0 only), got ${kept.count(_ > 100L)}")
  }

  test("curriculumOrder: score leads, hash breaks ties, shard arithmetic holds") {
    val df = (1L to 800L).map(i => (i, s"p$i", i % 4)).toDF("id", "t", "score")
    val got = Mixing.curriculumOrder(df, "id", col("score"), nShards = 8)
      .select(col("id"), col("epoch_pos"), col("shard"), col("pos_in_shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.length == 800)
    assert(got.map(_._2).sorted.toSeq == (0L until 800L))
    // Expected order: (score, orderHash(id), id) — locally derived.
    val expected = df
      .withColumn("h", Mixing.orderHash(col("id")))
      .orderBy(col("score"), col("h"), col("id"))
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(got.sortBy(_._2).map(_._1).toSeq == expected,
      "positions must follow (score, hash, id), not insertion or hash-only order")
    // Easy→hard: every score-0 row ranks before every score-1 row, etc.
    val posById = got.map(g => g._1 -> g._2).toMap
    (0L until 3L).foreach { s =>
      val maxThis = (1L to 800L).filter(_ % 4 == s).map(posById).max
      val minNext = (1L to 800L).filter(_ % 4 == s + 1).map(posById).min
      assert(maxThis < minNext,
        s"every score-$s row must precede every score-${s + 1} row")
    }
    assert(got.forall { case (_, p, s, ps) => s == (p % 8).toInt && ps == p / 8 })
    val sizes = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.toSet == Set(100))
  }

  test("epochOrder: epoch 0 is trainOrder; later epochs are distinct reproducible permutations") {
    val df = (1L to 500L).map(i => (i, s"p$i")).toDF("id", "t")
    def positions(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("epoch_pos"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0 = positions(Mixing.epochOrder(df, "id", epoch = 0, nShards = 8))
    val t0 = positions(Mixing.trainOrder(df, "id", nShards = 8))
    assert(e0 == t0, "epoch 0 must reproduce trainOrder's order exactly")
    val e1 = positions(Mixing.epochOrder(df, "id", epoch = 1, nShards = 8))
    val e2 = positions(Mixing.epochOrder(df, "id", epoch = 2, nShards = 8))
    // Each epoch is a permutation of 0..n-1…
    Seq(e0, e1, e2).foreach(e =>
      assert(e.values.toSeq.sorted == (0L until 500L)))
    // …and different epochs genuinely reshuffle (identical orders
    // would need a 500-point hash coincidence).
    assert(e1 != e0 && e2 != e0 && e2 != e1)
    // Reproducible: same epoch, same order, any partitioning.
    val e1b = positions(Mixing.epochOrder(df.repartition(11), "id",
      epoch = 1, nShards = 8))
    assert(e1b == e1)
  }

  test("clusterSplit: component labels, no-straddle invariant, singleton fallthrough") {
    val docs = (1L to 200L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    // Chain 1–2–3 (one cluster via transitivity, no direct 1–3 edge)
    // plus a far-apart pair 10–150.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 150L)).toDF("id_a", "id_b")
    val out = Mixing.clusterSplit(docs, "doc_id", pairs)
    assert(out.columns.toSeq == Seq("doc_id", "text", "cluster_id", "split"),
      "output must be input schema + cluster_id + split")
    val rows = out.select(col("doc_id"), col("cluster_id"), col("split"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rows.size == 200)
    // Min-reachable-id labels; everyone else is their own singleton.
    assert(Seq(1L, 2L, 3L).forall(rows(_)._1 == 1L))
    assert(rows(10L)._1 == 10L && rows(150L)._1 == 10L)
    assert(rows(7L)._1 == 7L && rows(42L)._1 == 42L)
    // The defining invariant: a cluster occupies exactly one split.
    assert(Seq(1L, 2L, 3L).map(rows(_)._2).distinct.size == 1)
    assert(rows(10L)._2 == rows(150L)._2)
    // Singletons hash exactly like the per-doc split (cluster_id = id).
    val perDoc = TextAnalysis.assignSplit(docs, "doc_id")
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(7L)._2 == perDoc(7L) && rows(42L)._2 == perDoc(42L))
    // Paired docs hash from the CLUSTER id: 150 follows 10's bucket.
    assert(rows(150L)._2 == perDoc(10L))
  }
}
