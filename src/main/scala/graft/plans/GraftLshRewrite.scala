package graft.plans

import graft.functions.{CosineSimilarity, JaccardSim, LshBucketExpr, MinHashSignatureExpr}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule (SURVEY §7.3: "similarity-join → LSH bucket
  * join rewrite"): a cross/inner join whose condition demands a
  * similarity threshold gets an extra LSH-key equality conjunct. The
  * new equality depends on one side each, so Catalyst's equi-key
  * extraction turns the O(n·m) nested-loop join into a shuffled
  * equi-join on the key — the only shape that survives 100 TB. The
  * user keeps writing the naive all-pairs query; the optimizer makes
  * it a bucketed one.
  *
  * Two similarity families:
  *  - `cosine_similarity(a, b) >= θ`, θ > 0 → `lsh_bucket(a) =
  *    lsh_bucket(b)` (sign-LSH, `bits` hyperplanes);
  *  - `jaccard_sim(ta, tb) >= θ`, θ > 0 → `minhash_signature(ta, r) =
  *    minhash_signature(tb, r)` — one r-row MinHash band as the join
  *    key (array equality is a hashable equi-key). Per-pair recall is
  *    θ^r; a conjunct must stay a single band because an OR of bands
  *    would defeat equi-key extraction (the multi-band construction is
  *    the explicit q75/q97 explode pipeline).
  *
  * APPROXIMATE by construction (recall < 1: true pairs in different
  * buckets/bands are dropped), hence gated behind
  * `spark.graft.ann.lshRewrite.enabled` (default false),
  * `spark.graft.ann.lshRewrite.bits` (default 6) and
  * `spark.graft.ann.lshRewrite.jaccardRows` (default derived from the
  * matched θ via LshKnobs.singleBandRows — the longest band keeping
  * single-band recall ≥ 0.8; the conf is a per-session override).
  * Enable only for workloads that accept ANN semantics.
  */
object GraftLshRewrite extends Rule[LogicalPlan] {

  private val enabledKey = "spark.graft.ann.lshRewrite.enabled"
  private val bitsKey = "spark.graft.ann.lshRewrite.bits"
  private val rowsKey = "spark.graft.ann.lshRewrite.jaccardRows"

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

  /** Find `jaccard_sim(ta,tb) >= θ` (or > θ) with θ > 0 — the threshold
    * itself is returned so the band length can be picked from the
    * shared [[graft.functions.LshKnobs]] table. */
  private def findJaccardThreshold(e: Expression): Option[(Expression, Expression, Double)] =
    e match {
      case GreaterThanOrEqual(JaccardSim(a, b), Literal(t: Double, _))
        if t > 0 => Some((a, b, t))
      case GreaterThan(JaccardSim(a, b), Literal(t: Double, _))
        if t > 0 => Some((a, b, t))
      case And(l, r) => findJaccardThreshold(l).orElse(findJaccardThreshold(r))
      case _ => None
    }

  private def alreadyBucketed(e: Expression): Boolean =
    e.exists(x => x.isInstanceOf[LshBucketExpr] ||
      x.isInstanceOf[MinHashSignatureExpr])

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
          case None => findJaccardThreshold(cond) match {
            case Some((a, b, theta)) =>
              // band length comes from the SAME tuning table the
              // hand-built pipelines use (LshKnobs); the conf is an
              // explicit per-session override, not a second default
              val rows = conf.getConfString(rowsKey, "").trim match {
                case "" => graft.functions.LshKnobs.singleBandRows(theta)
                case v => v.toInt
              }
              val bandEq = EqualTo(
                MinHashSignatureExpr(a, rows),
                MinHashSignatureExpr(b, rows))
              j.copy(condition = Some(And(cond, bandEq)))
            case None => j
          }
        }
    }
  }
}
