package graft.plans

import graft.functions.{CosineSimilarity, LshBucketExpr}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule (SURVEY §7.3: "similarity-join → LSH bucket
  * join rewrite"): a cross/inner join whose condition demands
  * `cosine_similarity(a, b) >= θ` with θ > 0 gets an extra conjunct
  * `lsh_bucket(a) = lsh_bucket(b)`. The new equality depends on one side
  * each, so Catalyst's equi-key extraction turns the O(n·m) nested-loop
  * join into a shuffled equi-join on the bucket id — the only shape that
  * survives 100 TB.
  *
  * APPROXIMATE by construction (recall < 1: true pairs in different
  * buckets are dropped), hence gated behind
  * `spark.graft.ann.lshRewrite.enabled` (default false) and
  * `spark.graft.ann.lshRewrite.bits` (default 6). Enable it only for
  * workloads that accept ANN semantics.
  */
object GraftLshRewrite extends Rule[LogicalPlan] {

  private val enabledKey = "spark.graft.ann.lshRewrite.enabled"
  private val bitsKey = "spark.graft.ann.lshRewrite.bits"

  /** Find `cosine_similarity(a,b) >= θ` (or > θ) with θ > 0. */
  private def findCosineThreshold(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(CosineSimilarity(a, b), Literal(t: Double, _))
        if t > 0 => Some((a, b))
      case GreaterThan(CosineSimilarity(a, b), Literal(t: Double, _))
        if t > 0 => Some((a, b))
      case And(l, r) => findCosineThreshold(l).orElse(findCosineThreshold(r))
      case _ => None
    }

  private def alreadyBucketed(e: Expression): Boolean =
    e.exists(_.isInstanceOf[LshBucketExpr])

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "false").toBoolean) return plan
    val bits = conf.getConfString(bitsKey, "6").toInt
    plan.transform {
      case j @ Join(_, _, Inner | Cross, Some(cond), _)
        if !alreadyBucketed(cond) =>
        findCosineThreshold(cond) match {
          case Some((a, b)) =>
            val bucketEq = EqualTo(
              LshBucketExpr(a, bits, seed = 7),
              LshBucketExpr(b, bits, seed = 7))
            j.copy(condition = Some(And(cond, bucketEq)))
          case None => j
        }
    }
  }
}
