package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-stability goldens (reference analog:
  * dev/auron-it/src/test/scala/.../PlanStabilityChecker.scala, which
  * diffs stored plan text per TPC-DS query): the normalized
  * operator-tree shape of every non-streaming bench headline query is
  * pinned to a checked-in golden file. A future change that drops a
  * broadcast, adds an exchange, or loses a partial aggregate fails
  * `sbt test` here instead of silently regressing at scale.
  *
  * Regenerate INTENTIONALLY with `GRAFT_REGEN_GOLDENS=1 sbt test`,
  * then review the golden diff like code: every changed line is a
  * physical-plan change at 100 TB.
  */
class PlanGoldenSpec extends AnyFunSuite {
  import TestSession._

  private val goldenDir = Paths.get("src/test/resources/plan_goldens")
  private val regen = sys.env.contains("GRAFT_REGEN_GOLDENS")

  // streaming plans (q85) re-plan per micro-batch; shape is asserted in
  // StreamingSpec behavior tests instead. Beyond the bench headline,
  // pin the scale-critical non-bench shapes: the binned range join
  // (no-BNLJ contract), IVF ANN (broadcast centroids + cell equi-join),
  // decontamination (broadcast bench grams, no corpus self-join), and
  // the k-min sketch dedup (WindowGroupLimit + hash equi-join).
  private val extraPinned = Seq("q108_range_join_binned", "q111_ann_ivf",
    "q113_decontamination", "q127_kmin_sketch_dedup",
    "q151_rollup_window_topk", "q152_cumulative_compare",
    "q153_channel_rollup", "q154_channel_intersect",
    "q155_hour_band_counts", "q156_crossborder_flows",
    "q158_lm_quality",
    // the four TPC-DS-topology gap closers: q385's two global ranks
    // must ride range partitioning (DistributedPrefix), q386's
    // residual date predicate must stay inside the equi-join (no
    // BNLJ), q387/q388 pin their rollup/window shapes
    "q385_rank_align", "q386_return_repurchase",
    "q387_frequent_best", "q388_channel_balance")
  // q176's two union branches consume IDENTICAL set-building subtrees;
  // WHICH branch materializes its exchange first (and which prints as
  // ReusedExchange) is stage-completion-order dependent under AQE — a
  // position-sensitive fingerprint of it flakes with no code change
  // (this repo's known golden-race mode). The reuse CONTRACT is
  // asserted position-independently in PlanSpec instead. q215 has the
  // same structure: its bigram and trigram branches share the token
  // subtree, and which branch materializes the shared exchange first
  // is stage-completion-order dependent (flaked once in a full-suite
  // run, stable in isolation) — its partial-agg contract lives in
  // PlanSpec.
  // q239's two year-legs are NEAR-EQUAL census subtrees; AQE picks the
  // build side of their self-pairing from runtime sizes that differ by
  // noise, flipping the printed tree. Contract pinned in PlanSpec.
  // q385 has the same structure post-prefix-rework: its two global-rank
  // legs are near-equal PartitionSweep subtrees whose broadcast build
  // side is an AQE coin flip (flaked in a full-suite run after the
  // regen run passed, same code). Contract pinned in PlanSpec.
  private val racePrune = Set("q176_cte_reuse", "q215_repetition_quality",
    "q239_repeat_buyers", "q385_rank_align")

  private val pinned =
    (Bench.headline.filterNot(_.contains("stream")) ++ extraPinned)
      .distinct.filterNot(racePrune)

  /** Normalized fingerprint: tree prefix + operator name per line.
    * Strips codegen stage ids, expression ids, literals, paths, stats —
    * anything run-variable — keeping exactly the operator tree. Keeps
    * the partitioning kind on Exchange lines (hash vs range vs single
    * IS the scale contract). */
  private def fingerprint(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // drive AQE to the final plan
    val planText = df.queryExecution.executedPlan.toString
      .split("\\+- == Initial Plan ==").head
    planText.split('\n').iterator.flatMap { raw =>
      val line = raw.replaceAll("\\*\\(\\d+\\) ", "")
      "^([ :+\\-]*)([A-Za-z][A-Za-z0-9_]*)".r.findFirstMatchIn(line).map {
        m =>
          val prefix = m.group(1)
          val op = m.group(2)
          val detail = op match {
            case "Exchange" =>
              "(hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)".r
                .findFirstIn(line).map(" " + _).getOrElse("")
            case "AQEShuffleRead" =>
              "(coalesced|local)".r.findFirstIn(line)
                .map(" " + _).getOrElse("")
            case _ => ""
          }
          prefix + op + detail
      }
    }.mkString("\n") + "\n"
  }

  pinned.foreach { q =>
    test(s"plan shape of $q matches its golden") {
      val fp = fingerprint(q)
      val file = goldenDir.resolve(s"$q.txt")
      if (regen) {
        Files.createDirectories(goldenDir)
        Files.writeString(file, fp)
        info(s"golden (re)written: $file")
      } else if (!Files.exists(file)) {
        // a silently auto-written golden would pin a never-reviewed plan
        fail(s"no golden for $q — run GRAFT_REGEN_GOLDENS=1 sbt test and " +
          "review the new file like code before committing it")
      } else {
        val want = Files.readString(file)
        assert(fp == want,
          s"""plan shape of $q drifted from src/test/resources/plan_goldens/$q.txt.
             |If intentional, GRAFT_REGEN_GOLDENS=1 sbt test and review the diff.
             |--- golden ---
             |$want
             |--- actual ---
             |$fp""".stripMargin)
      }
    }
  }
}
