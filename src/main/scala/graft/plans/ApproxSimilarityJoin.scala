package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

import graft.functions.{GraftCosineSim, GraftLshBucket}

/** OPT-IN approximate rewrite of cosine-threshold similarity joins
  * (SURVEY §7.3: "the only place a custom rule pays for itself").
  *
  * A user writes the naive form —
  * {{{ a.crossJoin(b).where(call_function("graft_cosine_sim", va, vb) >= 0.9) }}}
  * — which plans a cartesian product: O(n²) and a non-starter at
  * scale. With `spark.graft.approxSimilarityJoin=true`, this rule
  * rewrites the join to first bucket both sides by random-hyperplane
  * LSH signatures and equi-join on the bucket, keeping the original
  * cosine predicate as an exact re-check inside each bucket:
  * cost collapses to Σ bucket², the shuffle is keyed, and the plan the
  * user gets is the one an expert would hand-write.
  *
  * APPROXIMATE by construction: cosine-similar pairs land in the same
  * bucket with probability (1 − θ/π)^bits, so recall < 1 — which is
  * why the rewrite is gated behind an explicit conf (plus
  * `spark.graft.approxSimilarityJoin.bits`, default 8) and never on by
  * default. An optimizer must not silently change results.
  */
class ApproxSimilarityJoin extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  val enabledKey = "spark.graft.approxSimilarityJoin"
  val bitsKey = "spark.graft.approxSimilarityJoin.bits"

  private def enabled: Boolean =
    SQLConf.get.getConfString(enabledKey, "false").toBoolean
  /** Clamped to [1, 63]: bits > 63 would silently wrap `1L << j` in the
    * bucket kernel (degrading bucketing), bits <= 0 yields a constant
    * bucket (the rewrite becomes a no-op cross join); a non-numeric
    * conf value falls back to the default instead of throwing inside
    * the optimizer. */
  private def bits: Int = {
    val parsed =
      try SQLConf.get.getConfString(bitsKey, "8").toInt
      catch { case _: NumberFormatException => 8 }
    math.max(1, math.min(63, parsed))
  }

  /** Some conjunct of the join condition is a cosine LOWER-bound
    * (similarity) comparison — `cos >= t`, `cos > t`, or the commuted
    * `t <= cos` / `t < cos`. Upper bounds (`cos <= t`, dissimilarity)
    * must NOT match: dissimilar vectors do not share LSH buckets, so
    * the rewrite would be wrong, not just approximate. Other conjuncts
    * (id ordering, extra filters) ride along unchanged. Joins already
    * carrying a bucket-equality conjunct were rewritten by a previous
    * fixed-point pass — never match them again.
    */
  private def cosineThreshold(cond: Expression): Option[GraftCosineSim] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val alreadyRewritten = conjuncts.exists {
      case EqualTo(a: Attribute, _) if a.name.startsWith("__graft_lsh") => true
      case _ => false
    }
    if (alreadyRewritten) None
    else conjuncts.collectFirst {
      case GreaterThanOrEqual(c: GraftCosineSim, Literal(_, _)) => c
      case GreaterThan(c: GraftCosineSim, Literal(_, _)) => c
      case LessThanOrEqual(Literal(_, _), c: GraftCosineSim) => c
      case LessThan(Literal(_, _), c: GraftCosineSim) => c
    }
  }

  /** Rewrite one qualifying join; None when the cosine's sides can't
    * be unambiguously bound to the two join children. */
  private def rewrite(j: Join, cond: Expression, sim: GraftCosineSim): Option[LogicalPlan] = {
    val Join(left, right, joinType, _, hint) = j
    val bound =
      if (sim.left.references.subsetOf(left.outputSet) &&
          sim.right.references.subsetOf(right.outputSet))
        Some((sim.left, sim.right))
      else if (sim.right.references.subsetOf(left.outputSet) &&
               sim.left.references.subsetOf(right.outputSet))
        Some((sim.right, sim.left))
      else None
    bound.map { case (lVec, rVec) =>
      val lBucket = Alias(GraftLshBucket(lVec, bits), "__graft_lsh_l")()
      val rBucket = Alias(GraftLshBucket(rVec, bits), "__graft_lsh_r")()
      val bucketEq = EqualTo(lBucket.toAttribute, rBucket.toAttribute)
      val rewritten = Join(
        Project(left.output :+ lBucket, left),
        Project(right.output :+ rBucket, right),
        joinType, Some(And(bucketEq, cond)), hint)
      // Strip the helper bucket columns from the output.
      Project(left.output ++ right.output, rewritten)
    }
  }

  /** Extractor: a qualifying join and its full condition, computed
    * once. Only Inner/Cross joins qualify — a semi/anti join's output
    * is left-only (the stripped Project would be unresolvable), and an
    * approximate ANTI join would be anti-conservative: missed
    * same-bucket matches let near-duplicates through.
    */
  private object SimilarityJoin {
    def unapply(plan: LogicalPlan): Option[LogicalPlan] = plan match {
      case j @ Join(_, _, org.apache.spark.sql.catalyst.plans.Inner |
                          org.apache.spark.sql.catalyst.plans.Cross,
                    Some(cond), _) =>
        cosineThreshold(cond).flatMap(sim => rewrite(j, cond, sim))
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
          j @ Join(_, _, org.apache.spark.sql.catalyst.plans.Inner |
                         org.apache.spark.sql.catalyst.plans.Cross,
                   None, _)) =>
        cosineThreshold(cond).flatMap(sim => rewrite(j, cond, sim))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case SimilarityJoin(rewritten) => rewritten
    }
  }
}
