package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.ext.Similarity

/** The approximate similarity-join rewrite: off by default (plan
  * unchanged, cartesian stays), on → bucketed equi-join with the exact
  * cosine re-check, results a (high-recall) subset of the naive join.
  */
class ApproxSimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val FLAG = "spark.graft.approxSimilarityJoin"

  private def naiveJoin() = {
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(200)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    a.crossJoin(b)
      .where(call_function("graft_cosine_sim", col("v_a"), col("v_b")) >= 0.99
        && col("id_a") < col("id_b"))
  }

  test("flag off: the naive plan keeps its cartesian product") {
    spark.conf.unset(FLAG)
    val plan = naiveJoin().queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoop"),
      s"expected the naive join untouched:\n$plan")
  }

  test("flag on: rewritten to a bucket equi-join; exact pairs survive (recall anchor)") {
    // The >= comparison must be the WHOLE join condition for the rule
    // to fire — compose the id ordering as a post-filter instead.
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(200)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    def query() = a.crossJoin(b)
      .where(call_function("graft_cosine_sim", col("v_a"), col("v_b")) >= lit(0.999999))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    spark.conf.unset(FLAG)
    val exact = query().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set(FLAG, "true")
    try {
      val plan = query().queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"rewrite must remove the cartesian:\n$plan")
      assert(plan.contains("__graft_lsh") || plan.contains("graftlshbucket"),
        s"expected LSH bucket columns in plan:\n$plan")
      val approx = query().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // Approximate ⊆ exact (the cosine re-check never admits extras)…
      assert(approx.subsetOf(exact), s"extras: ${approx -- exact}")
      // …and near-identical vectors (cos ≈ 1) share every hyperplane
      // side, so recall on this threshold is total.
      assert(approx == exact,
        s"missed pairs at cos≈1: ${exact -- approx}")
    } finally spark.conf.unset(FLAG)
  }

  test("upper-bound (dissimilarity) predicates never rewrite; commuted lower bounds do") {
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    spark.conf.set(FLAG, "true")
    try {
      // cos <= t finds DISSIMILAR pairs — same-bucket blocking would be
      // wrong, not approximate; the rule must leave the plan alone.
      val dissim = a.crossJoin(b)
        .where(call_function("graft_cosine_sim", col("v_a"), col("v_b")) <= lit(0.1))
        .queryExecution.executedPlan.toString
      assert(dissim.contains("CartesianProduct") || dissim.contains("BroadcastNestedLoop"),
        s"dissimilarity predicate must not be rewritten:\n$dissim")
      // lit(t) <= cos is the same lower bound, commuted — must rewrite.
      val commuted = a.crossJoin(b)
        .where(lit(0.9) <= call_function("graft_cosine_sim", col("v_a"), col("v_b")))
        .queryExecution.executedPlan.toString
      assert(!commuted.contains("CartesianProduct") && !commuted.contains("BroadcastNestedLoop"),
        s"commuted lower bound must be rewritten:\n$commuted")
      // A left_anti similarity join must stay untouched (approximate
      // anti-joins would let near-duplicates through).
      val anti = a.join(b,
          call_function("graft_cosine_sim", col("v_a"), col("v_b")) >= lit(0.9),
          "left_anti")
        .queryExecution.executedPlan.toString
      assert(anti.contains("BroadcastNestedLoop") || anti.contains("CartesianProduct"),
        s"anti join must not be rewritten:\n$anti")
    } finally spark.conf.unset(FLAG)
  }

  test("the registered approx query leaves the session flag untouched") {
    spark.conf.unset(FLAG)
    val df = graft.ExtensionQueries.all("x_approx_sim_join")(spark, TestSpark.sf0001)
    assert(spark.conf.getOption(FLAG).isEmpty, "flag leaked into the session")
    // Both the rewritten pass (under the flag) and the un-rewritten
    // truth pass already executed into checkpoints at construction;
    // the gate bits must hold: rewritten ⊆ truth, ⊇ identical pairs.
    val r = df.first()
    assert(r.getAs[Long]("n_true_pairs") >= 0)
    assert(r.getAs[Long]("le_true_ok") == 1L, "rewritten count exceeded truth")
    assert(r.getAs[Long]("ge_identical_ok") == 1L,
      "rewritten count below the identical-vector floor")
  }

  test("bits conf is clamped and parse-safe — the optimizer never throws on bad values") {
    val BITS = "spark.graft.approxSimilarityJoin.bits"
    spark.conf.set(FLAG, "true")
    try {
      for (bad <- Seq("abc", "200", "-3", "0")) {
        spark.conf.set(BITS, bad)
        // Must still rewrite (falling back to / clamping the width),
        // not throw inside the optimizer or degrade to a no-op bucket.
        val plan = naiveJoin().queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
          s"bits=$bad broke the rewrite:\n$plan")
      }
    } finally { spark.conf.unset(FLAG); spark.conf.unset(BITS) }
  }

  test("graft_lsh_bucket kernel equals the higher-order lshBucket") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val both = e.select(
        call_function("graft_lsh_bucket", col("embedding"), lit(8)).as("fast"),
        Similarity.lshBucket(col("embedding"), 8).as("slow"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"bucket diverges: ${r.getLong(0)} vs ${r.getLong(1)}"))
  }
}
