package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding vectors — the compression
  * step a 100 TB vector corpus runs before similarity search: a
  * float32 embedding column shrinks 4× (plus one scale per vector),
  * which is 4× less parquet scanned and 4× more vectors per executor
  * page during brute-force or IVF probes.
  *
  * Symmetric per-vector scheme: `scale = 127 / max(|x_i|)`,
  * `q_i = floor(x_i * scale + 0.5)` — i.e. round-half-up into
  * [-127, 127] (half-up via floor, NOT round(), because round()'s
  * half-even/half-away convention differs across engines while
  * floor(x + 0.5) is the same IEEE expression everywhere — the oracle
  * replays it in DuckDB bit-for-bit). The per-vector scale cancels in
  * cosine, so quantized cosine approximates float cosine with only
  * rounding noise — rank agreement is measured in QuantizeSpec and
  * oracle-gated by x_quantize_recall.
  *
  * Everything is builtin HOFs (transform / aggregate / zip_with) —
  * codegen'd, per-row, zero shuffles.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization → array<long> (long keeps
    * the downstream dot arithmetic in one type; values are in
    * [-127, 127]). The all-zero vector quantizes to all zeros. */
  def quantize(v: Column): Column =
    quantizeWith(v, array_max(transform(v, x => abs(x.cast("double")))))

  /** The one quantization kernel — [[quantize]] (inline maxAbs) and
    * [[withQuantized]] (aliased maxAbs) both call it, so the rounding
    * can never drift between the two paths.
    * floor(x * (127/maxAbs) + 0.5): see object doc for why not round(). */
  private def quantizeWith(v: Column, maxAbs: Column): Column =
    when(maxAbs === lit(0.0), transform(v, _ => lit(0L)))
      .otherwise(transform(v,
        x => floor(x.cast("double") * (lit(127.0) / maxAbs) + lit(0.5)).cast("long")))

  /** Quantize `vecCol` into `outCol` (array<long>) in TWO chained
    * projections: the per-vector scale is aliased first, so each
    * element lambda reads a bound attribute instead of re-evaluating
    * the embedded array_max. That matters because higher-order-function
    * lambdas are interpreted per element — an aggregate inside the
    * lambda makes the projection O(d²) per row and allocates a
    * temporary abs-array per element. CollapseProject keeps the
    * multi-referenced, non-cheap alias un-inlined, so the O(d) shape
    * survives optimization. Prefer this over [[quantize]] wherever the
    * input is a DataFrame column; [[quantize]] remains for literal /
    * oracle-replay use. */
  def withQuantized(df: org.apache.spark.sql.DataFrame, vecCol: String,
                    outCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("_graft_q_ma",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))))
      .withColumn(outCol, quantizeWith(col(vecCol), col("_graft_q_ma")))
      .drop("_graft_q_ma")

  /** Driver-side quantization of one query vector — the same IEEE
    * double arithmetic as [[quantize]] (max |x|, then
    * floor(x · (127/max) + 0.5)), returned as doubles so the result
    * can feed the codegen'd float/double kernels directly. Quantizing
    * a LITERAL via the expression tree would re-interpret the HOF per
    * row; a driver-computed literal array is free. */
  def quantizeLocal(v: Seq[Float]): Array[Double] = {
    val maxAbs = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
    if (maxAbs == 0.0) Array.fill(v.length)(0.0)
    else {
      val scale = 127.0 / maxAbs
      v.map(x => math.floor(x.toDouble * scale + 0.5)).toArray
    }
  }

  /** Integer dot product of two quantized vectors. Exact long
    * arithmetic — 128-dim worst case is 128 · 127² ≈ 2.1M, nowhere
    * near overflow. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine over quantized vectors. The per-vector scale divides out,
    * so this tracks float cosine up to rounding noise — the property
    * that makes int8 ranking usable. Null-safe zero guard: a zero
    * quantized vector has no direction → null (matches float cosine's
    * 0-norm convention). */
  def cosineQ(a: Column, b: Column): Column = {
    val num = dotQ(a, b).cast("double")
    val den = sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double"))
    when(den === lit(0.0), lit(null).cast("double")).otherwise(num / den)
  }
}
