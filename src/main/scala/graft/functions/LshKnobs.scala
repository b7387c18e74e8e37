package graft.functions

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

  /** Band length for the SINGLE-band equi-key conjunct rewrite
    * (GraftLshRewrite) — one band only, because an OR over bands would
    * defeat Catalyst's equi-key extraction. The longest band that keeps
    * single-band recall θ^rows ≥ 0.8 (longer = fewer false candidates,
    * same reasoning as above, but recall has no multi-band rescue
    * here). */
  def singleBandRows(theta: Double): Int =
    math.max(1, (math.log(0.8) / math.log(theta)).toInt)
}
