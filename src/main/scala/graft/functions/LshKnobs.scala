package graft.functions

import org.apache.spark.sql.SparkSession

/** THE single MinHash-LSH tuning table — every surface that picks a
  * banding scheme consults this object, so the optimizer rewrite
  * (plans/GraftLshRewrite), the hand-built candidate pipelines
  * (queries/Pipeline.lshCandidates) and the full dedup composition
  * (queries/Pipeline3.verifiedPairs) cannot drift apart on a future
  * retune. LshRewriteSpec asserts both mechanisms read from here.
  *
  * Recall model (standard LSH banding): a pair at similarity θ lands in
  * the same band with probability θ^rows, in at least one of `bands`
  * bands with 1-(1-θ^rows)^bands. Longer bands suppress false
  * candidates (the binding constraint at 100 TB — candidate volume is
  * quadratic in bucket occupancy); more bands buy recall back linearly
  * in compute.
  */
object LshKnobs {

  /** Per-corpus banding overrides. The defaults below are tuned for
    * this fixture's dup-family shape; a production corpus owner picks
    * their own point on the recall/candidate-volume curve (q170 vs
    * q170b publish two points of it) without touching code. Both confs
    * must be set together — a lone override would silently change the
    * recall model the other half was tuned against. */
  val bandsConf = "spark.graft.dedup.lsh.bands"
  val rowsConf = "spark.graft.dedup.lsh.rows"

  /** (bands, rows) for the multi-band explode pipelines, keyed by the
    * exact-verify threshold the candidates feed:
    *  - θ ≥ 0.95 (q75/q97 near-identical dedup): 8×32 — recall
    *    1-(1-0.95^32)^8 ≈ 0.82 with <1% false-candidate rate at j=0.8;
    *  - θ ≥ 0.85 (q129 full-pipeline dedup at 0.9): 8×8 — recall
    *    1-(1-0.9^8)^8 ≈ 0.989;
    *  - looser: short 4-row bands, recall-first. */
  def bandsRows(theta: Double): (Int, Int) =
    if (theta >= 0.95) (8, 32)
    else if (theta >= 0.85) (8, 8)
    else (16, 4)

  /** Conf-resolved banding: the spark.graft.dedup.lsh.{bands,rows}
    * pair when set, else the theta-keyed table. Every production
    * surface (lshCandidates, the q129/q162 pipelines) resolves through
    * here, so one session conf retunes them all coherently. */
  def bandsRows(theta: Double, s: SparkSession): (Int, Int) = {
    val b = s.conf.getOption(bandsConf).map(_.toInt)
    val r = s.conf.getOption(rowsConf).map(_.toInt)
    (b, r) match {
      case (Some(bb), Some(rr)) =>
        require(bb > 0 && rr > 0,
          s"$bandsConf/$rowsConf must be positive, got ($bb, $rr)")
        (bb, rr)
      case (None, None) => bandsRows(theta)
      case _ => throw new IllegalArgumentException(
        s"set both $bandsConf and $rowsConf or neither — a lone " +
          "override silently changes the recall model")
    }
  }

  /** Band length for the SINGLE-band equi-key conjunct rewrite
    * (GraftLshRewrite) — one band only, because an OR over bands would
    * defeat Catalyst's equi-key extraction. The longest band that keeps
    * single-band recall θ^rows ≥ 0.8 (longer = fewer false candidates,
    * same reasoning as above, but recall has no multi-band rescue
    * here). Capped at 64: past that the per-row signature cost buys
    * no useful selectivity, and θ→1 would otherwise send the formula
    * to thousands of rows (θ ≥ 1 means exact equality — band of 1 on
    * the full fingerprint is already a perfect filter). */
  def singleBandRows(theta: Double): Int =
    if (theta >= 1.0) 1
    else math.min(64, math.max(1, (math.log(0.8) / math.log(theta)).toInt))
}
