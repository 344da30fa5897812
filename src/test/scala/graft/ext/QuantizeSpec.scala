package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Int8 quantization semantics: exact rounding on hand-built vectors,
  * zero-vector edge, and ranking fidelity (quantized cosine must track
  * float cosine) on the driver embeddings.
  */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantize rounds half-up into [-127, 127] with per-vector scale") {
    val got = Seq(Seq(1.0f, -0.5f, 0.25f, 0.0f)).toDF("v")
      .select(Quantize.quantize(col("v")).as("q"))
      .collect().head.getSeq[Long](0)
    // scale = 127/1.0; floor(-63.5 + 0.5) = -63, floor(31.75 + 0.5) = 32.
    assert(got == Seq(127L, -63L, 32L, 0L))
  }

  test("zero vector quantizes to zeros and cosineQ is null on it") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("z", "v")
    val q = df.select(Quantize.quantize(col("z")).as("qz"),
      Quantize.quantize(col("v")).as("qv"))
    assert(q.collect().head.getSeq[Long](0) == Seq(0L, 0L))
    val c = q.select(Quantize.cosineQ(col("qz"), col("qv")).as("c"))
      .collect().head
    assert(c.isNullAt(0), "cosine against a zero vector must be null")
  }

  test("quantized cosine tracks float cosine within rounding noise") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select((col("vec_id") - 1).as("id_a"), col("embedding").as("v_b"))
    val worst = a.join(b, Seq("id_a"))
      .select(abs(
        Quantize.cosineQ(Quantize.quantize(col("v_a")), Quantize.quantize(col("v_b")))
          - Similarity.cosine(col("v_a"), col("v_b"))).as("err"))
      .agg(max(col("err"))).first().getDouble(0)
    // int8 rounding perturbs each coordinate by <= 0.5/127 of the max
    // coordinate; the cosine error stays well inside 0.02 in practice.
    assert(worst < 0.02, s"quantized cosine drifted: $worst")
  }

  test("quantized top-10 overlaps float top-10 on the fixture corpus") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val q = e.where(col("vec_id") === 0).select(col("embedding"))
      .first().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .select(col("vec_id"))
    val qlit = Quantize.quantize(array(q.map(x => lit(x)): _*))
    val quant = corpus.select(col("vec_id"),
        Quantize.cosineQ(Quantize.quantize(col("embedding")), qlit).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10).select(col("vec_id"))
    val overlap = exact.join(quant, Seq("vec_id")).count()
    assert(overlap >= 8, s"int8 ranking lost too much: $overlap of 10")
  }

  test("withQuantized and quantizeLocal agree exactly with the quantize expression") {
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
    // Column path: two-projection shape vs single-expression tree.
    val both = Quantize.withQuantized(e, "embedding", "q2")
      .select(col("vec_id"), col("q2"), Quantize.quantize(col("embedding")).as("q1"))
    assert(both.where(not(col("q1") <=> col("q2"))).count() == 0,
      "withQuantized must be value-identical to quantize()")
    // Driver path: same IEEE arithmetic as the expression tree.
    val row = both.select(col("q1"),
      transform(col("q2"), _.cast("double")).as("qd")).first()
    val v = e.select(col("embedding")).first().getSeq[Float](0)
    assert(Quantize.quantizeLocal(v).toSeq == row.getSeq[Double](1).map(identity),
      "quantizeLocal must replay the expression arithmetic bit-for-bit")
  }
}
