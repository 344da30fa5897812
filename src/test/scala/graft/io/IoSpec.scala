package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.etl.{FlightSchema, Sources}

/** Source/sink edges: bz2-compressed CSV (the reference decompresses
  * with a shell loop — S2 — which the splittable codec makes
  * unnecessary), directory listing, and the size-aware write policy.
  */
class IoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bz2-compressed CSV reads natively — no decompress step needed (S2)") {
    val src = Sources.csv(spark,
      getClass.getResource("/flights_mini.csv").getPath, FlightSchema.schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bz2").toString
    src.write.mode("overwrite").option("header", "true")
      .option("compression", "bzip2").csv(tmp)
    assert(new java.io.File(tmp).listFiles().exists(_.getName.endsWith(".csv.bz2")))
    val back = Sources.csv(spark, tmp, FlightSchema.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0)
  }

  test("PERMISSIVE parse: malformed cells null out, corrupt rows are capturable (S5)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt")
    java.nio.file.Files.writeString(dir.resolve("rows.csv"),
      "a,b\n1,x\nnot_an_int,y\n3,z\n")
    // Default PERMISSIVE: the malformed int cell becomes null, row kept.
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val lax = Sources.csv(TestSpark.spark, dir.toString, schema)
    assert(lax.count() == 3)
    assert(lax.where(col("a").isNull).count() == 1)
    // With a corrupt-record column, the raw line is preserved for a
    // quarantine pipeline instead of silently nulling.
    // Spark disallows filtering a raw scan on ONLY the corrupt column —
    // cache the parsed result first (the documented pattern).
    val withCorrupt = TestSpark.spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema.add("_corrupt", StringType))
      .csv(dir.toString)
      .cache()
    val bad = withCorrupt.where(col("_corrupt").isNotNull)
    assert(bad.count() == 1)
    assert(bad.first().getAs[String]("_corrupt").startsWith("not_an_int"))
  }

  test("directory listing has the reference's 4-column shape and real sizes (S3)") {
    val ls = Sources.ls(spark, TestSpark.sf0001)
    assert(ls.columns.toSeq == Seq("path", "name", "size", "modificationTime"))
    val byName = ls.collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("size")).toMap
    assert(byName.keySet == Tables.names.map(_ + ".parquet").toSet)
    val onDisk = new java.io.File(TestSpark.sf0001, "lineitem.parquet").length()
    assert(byName("lineitem.parquet") == onDisk)
  }

  test("partition policy: ceil(bytes / 200MB), floor 1 (Y2)") {
    assert(Writer.partitionCount(BigInt(0)) == 1)
    assert(Writer.partitionCount(BigInt(1)) == 1)
    assert(Writer.partitionCount(BigInt(200L * 1024 * 1024)) == 1)
    assert(Writer.partitionCount(BigInt(200L * 1024 * 1024 + 1)) == 2)
    assert(Writer.partitionCount(BigInt(10L * 200 * 1024 * 1024)) == 10)
  }

  test("sizedParquet writes the policy's file count and round-trips") {
    val df = Tables.events(spark, TestSpark.sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sized").toString
    val n = Writer.sizedParquet(df, tmp)
    assert(n == 1) // sf0.001 events ≪ 200 MB
    val files = new java.io.File(tmp).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == n)
    assert(Sources.parquet(spark, tmp).count() == df.count())
  }

  test("ORC scan pushes filters and prunes columns like parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Tables.orders(spark, TestSpark.sf0001).write.mode("overwrite").orc(tmp)
    val plan = spark.read.orc(tmp)
      .where(col("o_orderkey") === 42L)
      .select(col("o_orderkey"), col("o_totalprice"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)")
      || plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      s"ORC scan must push the key filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"ORC scan must prune to the two projected columns:\n$plan")
  }

  test("shardedParquet: one sorted file per shard dir, routing is the id-hash, lossless") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Writer.shardedParquet(docs, tmp, "doc_id", shards = 4, sortCol = "doc_id")
    val dirs = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == 4, "every shard value must materialize as a directory")
    dirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName}: exactly one file per shard")
    }
    // Round-trip losslessly and route by the deterministic hash.
    val back = spark.read.parquet(tmp)
    assert(back.count() == docs.count())
    assert(back.drop("shard").exceptAll(docs).count() == 0)
    assert(back.where(col("shard") =!=
      graft.ext.Packing.shardOf(col("doc_id"), 4)).count() == 0)
    // Each file comes out sorted by the sort column.
    dirs.foreach { d =>
      val ids = spark.read.parquet(d.toString).select(col("doc_id"))
        .collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${d.getName} not sorted")
    }
  }

  test("partitioned write prunes partitions at read (PartitionFilters, not data filters)") {
    val df = Tables.events(spark, TestSpark.sf0001)
      .withColumn("day", col("ts").cast("date").cast("string"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Writer.partitionedParquet(df, tmp, Seq("day"))
    val someDay = df.select(col("day")).orderBy(col("day")).first().getString(0)
    // One directory per day on disk.
    assert(new java.io.File(tmp).listFiles().count(_.getName.startsWith("day=")) ==
      df.select(col("day")).distinct().count())
    val read = Sources.parquet(spark, tmp).where(col("day") === someDay)
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("day#"),
      s"expected partition pruning in scan:\n$scan")
    assert(read.count() == df.where(col("day") === someDay).count())
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Writer.bucketedTable(
        Tables.lineitem(spark, TestSpark.sf0001)
          .select(col("l_orderkey"), col("l_quantity")), "li_b", "l_orderkey", 4)
      Writer.bucketedTable(
        Tables.orders(spark, TestSpark.sf0001)
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
        "o_b", "l_orderkey", 4)
      val joined = spark.table("li_b").join(spark.table("o_b"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // Both sides pre-bucketed on the key: sort-merge join with ZERO
      // shuffle exchanges (only per-bucket sorts).
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      val plain = Tables.lineitem(spark, TestSpark.sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
        .join(Tables.orders(spark, TestSpark.sf0001)
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
          Seq("l_orderkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("multimodal decode partitioning targets bytes per task; chunk sampler strides") {
    import graft.ext.Multimodal
    val df = Tables.documents(spark, TestSpark.sf0001)
    val parts = Multimodal.repartitionForDecode(df, totalBytes = 10L * 256 * 1024 * 1024)
      .rdd.getNumPartitions
    assert(parts == 10)
    val sampled = df.limit(1).select(
      Multimodal.sampleChunkIndices(lit(10L), stride = 3).as("idx"))
      .first().getSeq[Long](0)
    assert(sampled == Seq(0L, 3L, 6L, 9L))
  }
}
