package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Spread.ensure policy: spread small inputs to full parallelism,
  * leave big inputs (and streaming DataFrames) untouched — WITHOUT
  * forcing physical planning at construction time. */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a small input is repartitioned to default parallelism") {
    val df = (1 to 100).toDF("x")
    val out = Spread.ensure(df)
    assert(out ne df, "small input must be repartitioned")
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("an input estimated at full parallelism passes through unchanged") {
    val conf = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(conf)
    // 1-byte splits: any non-empty stats estimate ≥ parallelism.
    spark.conf.set(conf, "1")
    try {
      val df = (1 to 100).toDF("x")
      assert(Spread.ensure(df) eq df,
        "an already-parallel input must not be reshuffled")
    } finally spark.conf.set(conf, prev)
  }

  test("no eager physical planning: a streaming DataFrame passes through (df.rdd would throw)") {
    val input = MemoryStream[Int](spark)
    val sdf = input.toDF()
    // The old df.rdd probe throws on a streaming plan; the stats-based
    // policy must neither throw nor touch the stream.
    assert(Spread.ensure(sdf) eq sdf)
    intercept[Throwable] { sdf.rdd } // pins that .rdd WOULD have thrown
  }

  test("result content is unchanged either way") {
    val df = (1 to 50).toDF("x")
    assert(Spread.ensure(df).agg(org.apache.spark.sql.functions.sum("x"))
      .first().getLong(0) == 1275L)
  }
}
