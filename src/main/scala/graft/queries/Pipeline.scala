package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.{LshKnobs, SimHash64, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-training-data pipeline operators over `documents` (north star
  * beyond the reference surface): text statistics / quality scoring,
  * language-ID, exact dedup, n-gram Jaccard near-dup, bag-of-words
  * fingerprinting, MinHash+LSH near-dup at scale, SimHash.
  *
  * Scale design: every operator is a scan → map → (shuffle-on-key) agg/
  * join. The only self-join (q73) is the *oracle calibration* variant on a
  * bounded slice; the scale path is q75's LSH banding — candidates come
  * from an equi-join on (band, band_hash), never a cross join.
  */
object Pipeline extends QueryModule {

  import TextOps._

  /** Narrow-key MinHash-LSH candidate pairs: signature → band keys →
    * band equi-join carrying doc_id ONLY (the shuffle payload is three
    * longs per row) → distinct over the narrow (a_id, b_id) pair.
    * Token arrays are deliberately NOT in flight here — the band join
    * duplicates every row ×bands, so at 100 TB an array payload would
    * multiply the shuffle by the corpus token volume, and a distinct()
    * over array columns compares array-wide. The q78 ANN pattern:
    * dedup on the narrow key, re-attach payloads after. */
  private[graft] def lshCandidatePairs(docsIn: DataFrame,
                                       bands: Int, rows: Int): DataFrame = {
    // Explicit repartition on the band key makes both sides of the
    // self-join IDENTICAL exchange subtrees, so ReuseExchange computes
    // the minhash signatures + band explode ONCE and the co-partitioned
    // join adds no further shuffle. (Letting the planner broadcast one
    // side would re-evaluate the signature subtree per side — and a
    // broadcast of the banded corpus is exactly what cannot exist at
    // 100 TB.) The shuffle_hash hint pins that choice.
    // Explicit partition count: the banded rows are narrow (three
    // longs), so AQE would coalesce this exchange to one or two
    // partitions by SIZE — but each (band,bh) dup-family bucket fans
    // out quadratically in the join below, so the cheap-looking
    // exchange feeds heavy partitions; byte-based coalescing strangles
    // the join and the pair-distinct that follow.
    val nPart = docsIn.sparkSession.sessionState.conf.numShufflePartitions
    val banded = docsIn
      .select(col("doc_id"),
        posexplode(minhashBands(col("text"), bands, rows))
          .as(Seq("band", "bh")))
      .repartition(nPart, col("band"), col("bh"))
    banded.as("x").hint("shuffle_hash").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** The verify threshold the default banding serves (q75/q97's
    * near-identical dedup target); the (bands, rows) defaults below
    * come from the ONE shared tuning table (LshKnobs) keyed by it. */
  private[graft] val defaultVerifyThreshold = 0.95

  /** Shared MinHash-LSH candidate generation: narrow-key pairs (above),
    * then token sets re-joined once per side for the exact-Jaccard
    * verification. Default banding is LshKnobs.bandsRows(0.95) = 8×32:
    * at corpus scale the CANDIDATE VOLUME, not recall, is the binding
    * constraint — this fixture has large j≈0.8 template families, and
    * 16-row bands admit them at ~10% pair rate (quadratic blowup at
    * 100 TB) where 32-row bands hold the false-candidate rate at j=0.8
    * under 1%. Recall at the j≥0.95 verify target is 1-(1-0.95^32)^8
    * ≈ 0.82 (PipelineSpec cross-checks ≥ 0.6 against the exact pairs);
    * more bands buy recall back linearly in compute if a corpus needs
    * it. */
  private[graft] def lshCandidates(
      docsIn: DataFrame,
      bandsIn: Int = -1,
      rowsIn: Int = -1): DataFrame = {
    // default banding resolves through the conf-aware knob table, so a
    // corpus owner retunes the recall/candidate-volume point with
    // spark.graft.dedup.lsh.{bands,rows} — no code change. Half a
    // banding is rejected loudly (same rule as the conf pair): a lone
    // override would silently change the recall model.
    require((bandsIn > 0) == (rowsIn > 0),
      s"pass both bands and rows or neither, got ($bandsIn, $rowsIn)")
    val (bands, rows) =
      if (bandsIn > 0) (bandsIn, rowsIn)
      else LshKnobs.bandsRows(defaultVerifyThreshold, docsIn.sparkSession)
    // tok_a/tok_b are sorted 64-bit token-hash SETS (hashed once per
    // document), so the per-pair exact-jaccard verify is a primitive
    // merge (JaccardSortedLongs) — identical values to string-set
    // jaccard modulo 64-bit hash collisions, at a fraction of the cost
    // and an 8-bytes-per-token re-attach payload.
    //
    // r21 negative result, REVERTED: a single-pass GATHER re-attach
    // (explode each pair into its two ids, join toks ONCE, fold back
    // with a per-(a_id,b_id) argmin) was prototyped to halve the toks
    // passes — and measured q129 6.1–6.8 s → 9.0–9.3 s in alternating
    // same-window A/B (3 reps/side): the pair-grain fold is an
    // array-buffer SortAggregate shuffling token payloads, while the
    // two-join shape below already broadcasts toks ONCE and reuses it
    // for both sides (ReusedExchange in the q97 golden), so there is
    // no second tokenization pass to save here. At a scale where toks
    // cannot broadcast, the same fold re-appears as a candidate-sized
    // shuffle — revisit only with evidence the planner's two shuffled
    // re-attach joins do not share the toks exchange.
    val toks = docsIn.select(col("doc_id"), tokenHashSet(col("text")).as("tok"))
    lshCandidatePairs(docsIn, bands, rows)
      .join(toks.select(col("doc_id").as("a_id"), col("tok").as("tok_a")), "a_id")
      .join(toks.select(col("doc_id").as("b_id"), col("tok").as("tok_b")), "b_id")
      .select(col("a_id"), col("b_id"), col("tok_a"), col("tok_b"))
  }

  /** q170/q170b shared audit body: LSH-verified pairs vs the exact
    * all-pairs ground truth on the doc_id ≤ 200 calibration slice.
    * Banding comes from whatever the frame's session confs resolve to
    * (LshKnobs via lshCandidates), so each variant is purely a conf
    * choice. */
  private def dedupQualityAudit(docsAll: DataFrame): DataFrame = {
    val docs = docsAll.filter(col("doc_id") <= 200)
    val t = docs.select(col("doc_id"), uniqueTokens(col("text")).as("tok"))
    val a = t.select(col("doc_id").as("a_id"), col("tok").as("tok_a"))
    val b = t.select(col("doc_id").as("b_id"), col("tok").as("tok_b"))
    val exact = a.join(b, col("a_id") < col("b_id"))
      .filter(jaccard(col("tok_a"), col("tok_b")) >= 0.95)
      .select(col("a_id"), col("b_id"))
    val lsh = lshCandidates(docs)
      .filter(jaccardHashed(col("tok_a"), col("tok_b")) >= 0.95)
      .select(col("a_id"), col("b_id"))
    val tp = lsh.join(exact.select(col("a_id").as("ea"),
        col("b_id").as("eb")),
      col("a_id") === col("ea") && col("b_id") === col("eb"), "left_semi")
    val fn = exact.join(lsh.select(col("a_id").as("la"),
        col("b_id").as("lb")),
      col("a_id") === col("la") && col("b_id") === col("lb"), "left_anti")
    val row = lsh.agg(count(lit(1)).as("n_lsh"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(tp.agg(count(lit(1)).as("n_tp")))
      .crossJoin(fn.agg(count(lit(1)).as("n_fn")))
    row.select(col("n_lsh"), col("n_exact"), col("n_tp"), col("n_fn"),
      round(col("n_tp").cast(DoubleType) / col("n_exact"), 6)
        .as("recall"),
      round(col("n_tp").cast(DoubleType) / col("n_lsh"), 6)
        .as("lsh_precision"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-document text statistics & quality signals.
    "q70_text_stats" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars_m"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"),
          size(uniqueTokens(col("text"))).cast(LongType).as("n_uniq"),
          avgWordLen(col("text")).as("avg_wlen"),
          stopRatio(col("text")).as("stop_ratio"),
          (size(uniqueTokens(col("text"))).cast(DoubleType) /
            size(tokens(col("text")))).as("ttr"),
          (size(tokens(col("text"))) < 40).as("is_short"))
        .orderBy(col("doc_id"))
    },

    // Stopword-profile language identification.
    "q71_lang_id" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("lang_label"),
          langScore(col("text"), stopwords.head._2).as("score_en"),
          langScore(col("text"), stopwords(1)._2).as("score_de"),
          langScore(col("text"), stopwords(2)._2).as("score_es"),
          langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    },

    // Language-ID QUALITY report (the q170 eval pattern applied to
    // q71): per-language accuracy of the stopword-profile classifier
    // against the fixture's lang label — the calibration table a
    // pipeline owner reads before trusting a language filter at corpus
    // scale. One scan, one narrow groupBy.
    "q182_langid_quality" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("lang"), langId(col("text")).as("pred"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L))
            .as("n_correct"),
          sum(when(col("pred") === "und", 1L).otherwise(0L)).as("n_und"))
        .select(col("lang"), col("n_docs"), col("n_correct"), col("n_und"),
          round(col("n_correct").cast(DoubleType) / col("n_docs"), 6)
            .as("accuracy"))
        .orderBy(col("lang"))
    },

    // Context-length histogram — the token-count distribution a
    // sequence-packing planner (q163) reads to size its budget:
    // power-of-two buckets with per-bucket doc count, token mass and
    // mass share. The bucket is length(bin(n)) = floor(log2 n)+1,
    // EXACT integer arithmetic on both engines (a float log2 flips
    // floor() at exact powers of two). The share window runs over the
    // ~30-row bucket frame, never the corpus.
    "q183_length_histogram" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.df(s, dir, "documents")
        .select(size(tokens(col("text"))).cast(LongType).as("n_tok"))
        .filter(col("n_tok") > 0)
        .select(col("n_tok"), length(bin(col("n_tok"))).cast(LongType)
          .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok_mass"),
          min(col("n_tok")).as("min_tok"),
          max(col("n_tok")).as("max_tok"))
        .withColumn("mass_share",
          round(col("tok_mass").cast(DoubleType) /
            sum(col("tok_mass")).over(Window.partitionBy()), 6))
        .orderBy(col("bucket"))
    },

    // Exact dedup summary (hash-groupBy on md5(text); scale: one shuffle
    // on the 128-bit key, count-style agg, no row explosion).
    "q72_dedup_exact" -> { (s, dir) =>
      val perText = Tables.df(s, dir, "documents")
        .groupBy(md5(col("text").cast(BinaryType)).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      perText.agg(
        sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(when(col("n") > 1, col("n") - 1).otherwise(0L)).as("n_dup_docs"))
    },

    // Brute-force token-set Jaccard near-dup pairs on a bounded slice —
    // the exactness oracle for what q75 approximates at scale.
    "q73_jaccard_pairs" -> { (s, dir) =>
      val t = Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"), uniqueTokens(col("text")).as("tok"))
      val a = t.select(col("doc_id").as("a_id"), col("tok").as("tok_a"))
      val b = t.select(col("doc_id").as("b_id"), col("tok").as("tok_b"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          jaccard(col("tok_a"), col("tok_b")).as("jac"))
        .filter(col("jac") >= 0.95)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Bag-of-words fingerprint dedup groups (order-insensitive near-dup).
    "q74_fingerprint" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
        .orderBy(col("fp"))
    },

    // MinHash + LSH banding near-dup, the 100 TB scale path:
    // fused signature+banding (8 bands × 32 rows) → equi-join on band
    // key → exact-Jaccard verification of the candidates only. The
    // minhash kernel is engine-native, but the pair set it finds is
    // deterministic given the fixture: the oracle pins the candidate
    // ids found at sf0.01 and DuckDB recomputes each pair's EXACT
    // jaccard from the documents table — a kernel change shifts the
    // pair set and goes red. Recall vs the exact q73 pairs is also
    // spec'd (PipelineSpec, ≥ 0.6).
    "q75_minhash_lsh" -> { (s, dir) =>
      lshCandidates(Tables.df(s, dir, "documents")
          .filter(col("doc_id") <= 200))
        .select(col("a_id"), col("b_id"),
          jaccardHashed(col("tok_a"), col("tok_b")).as("jac"))
        .filter(col("jac") >= 0.95)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Full-corpus MinHash-LSH dedup (no doc_id bound — the actual scale
    // path q75 calibrates): banding over every document, exact-Jaccard
    // verification of candidates only, single summary row. The counts
    // are deterministic given the fixture, so they are PINNED at
    // sf0.01 (the driver's correctness scale) via the q44 pattern:
    // matches_pinned recomputes the equality in-engine, and the oracle
    // restates the same literals — a minhash/banding kernel change
    // flips the boolean and goes red in CORRECTNESS, not just in specs.
    "q97_minhash_full" -> { (s, dir) =>
      lshCandidates(Tables.df(s, dir, "documents"))
        .select(col("a_id"),
          (jaccardHashed(col("tok_a"), col("tok_b")) >= 0.95).as("verified"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("verified"), 1L).otherwise(0L)).as("n_verified"))
        .select(col("n_candidates"), col("n_verified"),
          (col("n_candidates") === 3876L && col("n_verified") === 1564L)
            .as("matches_pinned"))
    },

    // Flagship composite: the corpus-cleaning pipeline end-to-end —
    // quality filter (length), near-dup removal (bag-of-words
    // fingerprint groups keep the lowest doc_id). One scan, one shuffle
    // on the fingerprint, a window top-1 per group: linear at 100 TB.
    "q95_clean_corpus" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"),
          fingerprint(col("text")).as("fp"))
        .filter(col("n_tokens") >= 40)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // Dedup-quality evaluation — the recall/precision report every
    // production dedup pipeline publishes next to its output: the
    // verified MinHash-LSH pairs (q75's scale path) scored against the
    // exact all-pairs ground truth (q73's calibration slice). One
    // slice-bounded exact join + the LSH path + two narrow-key
    // semi/anti joins; at scale the ground truth is always a bounded
    // audit sample exactly like this. Expected: precision 1.0 (LSH
    // verifies with exact jaccard), recall = the banding recall.
    "q170_dedup_quality" -> { (s, dir) =>
      dedupQualityAudit(Tables.df(s, dir, "documents"))
    },

    // The same audit at a SECOND banding operating point (16×16),
    // selected through the public spark.graft.dedup.lsh.{bands,rows}
    // confs (exercised end-to-end: child session conf → LshKnobs →
    // lshCandidates). Together with q170 this publishes two points of
    // the recall/candidate-volume curve a corpus owner tunes along:
    // 8×32 trades recall (≈0.73 here) for ~1% false-candidate volume;
    // 16×16 buys recall ≈1 at j≥0.95 (1-(1-0.95^16)^16) by admitting
    // more candidates into the exact-verify stage.
    "q170b_dedup_quality_16x16" -> { (s, dir) =>
      val tuned = s.newSession()
      tuned.conf.set(LshKnobs.bandsConf, "16")
      tuned.conf.set(LshKnobs.rowsConf, "16")
      dedupQualityAudit(Tables.df(tuned, dir, "documents"))
    },

    // SimHash NEAR-DUP dedup — the banded-signature pipeline over q76's
    // signatures (the third dedup modality next to exact-hash and
    // MinHash-Jaccard; simhash catches "mostly same words, slightly
    // permuted" families cheaply because the signature is one long per
    // doc). Standard construction: split the 64-bit signature into four
    // 16-bit bands; any shared band makes a candidate pair (a pair
    // within hamming distance 3 always shares at least one intact band
    // — pigeonhole); verify with exact popcount(xor) <= 6. Scale shape
    // is q75's: the band equi-join carries (doc_id, band, bh) ONLY,
    // signatures re-attach per side after the narrow-key distinct; the
    // per-band bucket key space is 4 x 2^16, so bucket occupancy (and
    // the quadratic fan-out) shrinks as corpora grow only via real
    // near-dup families, not hash crowding. Engine-native values
    // (DuckDB cannot compute simhash) -> q44/q97 pattern: pinned
    // counts + an order-independent pair checksum, matches_pinned
    // re-derived in-engine.
    "q189_simhash_dedup" -> { (s, dir) =>
      val sigs = Tables.df(s, dir, "documents")
        .select(col("doc_id"), SimHash64.simhash64(tokens(col("text")))
          .as("sig"))
      val banded = sigs.select(col("doc_id"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sig"), i * 16) % 65536): _*))
          .as(Seq("band", "bh")))
      val nPart = s.sessionState.conf.numShufflePartitions
      val keyed = banded.repartition(nPart, col("band"), col("bh"))
      val cand = keyed.as("x").hint("shuffle_hash").join(keyed.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      val verified = cand
        .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("sig_a")),
          "a_id")
        .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sig_b")),
          "b_id")
        .withColumn("hamming",
          expr("bit_count(sig_a ^ sig_b)").cast(LongType))
      verified.agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("hamming") <= 6, 1L).otherwise(0L))
            .as("n_dups"),
          sum(when(col("hamming") <= 6,
              (col("a_id") * 100000L + col("b_id")) % 1000000000L)
            .otherwise(0L)).as("pair_checksum"))
        .select(col("n_candidates"), col("n_dups"), col("pair_checksum"),
          (col("n_candidates") === 3971L && col("n_dups") === 143L &&
            col("pair_checksum") === 2360747421L).as("matches_pinned"))
    },

    // SimHash (custom codegen'd Catalyst Expression) over the full
    // corpus, reduced to an order-independent checksum row: count,
    // mod-folded sum, xor fold, distinct signatures/buckets. The
    // per-doc values are engine-native (DuckDB cannot compute simhash),
    // but the checksums are deterministic given the fixture — pinned
    // at sf0.01 via the q44 pattern (matches_pinned in-engine, same
    // literals in the oracle), so a SimHash64 kernel change goes red
    // in CORRECTNESS. Every pinned value is FLOAT64-SAFE (< 2^53):
    // a full sum(sim) needs 22 decimal digits, which no driver-side
    // decimal→float canonicalization can hash bit-exactly, so the sum
    // is folded mod 1e9 per term (|sum| < 500×1e9 ≈ 2^39). Per-doc
    // behavior is spec'd (PipelineSpec: identical docs → identical
    // sigs, near-dups → close in hamming).
    "q76_simhash" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          SimHash64.simhash64(tokens(col("text"))).as("sim"))
        .select(col("sim"), shiftrightunsigned(col("sim"), 52).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("sim") % 1000000000L).as("sum_sim_mod"),
          expr("bit_xor(sim)").as("xor_sim"),
          countDistinct(col("sim")).as("n_distinct_sim"),
          countDistinct(col("bucket")).as("n_buckets"))
        .select(col("n_docs"), col("sum_sim_mod"), col("xor_sim"),
          col("n_distinct_sim"), col("n_buckets"),
          (col("n_docs") === 500L &&
            col("sum_sim_mod") === -214330880280L &&
            col("xor_sim") === 3804085301084074568L &&
            col("n_distinct_sim") === 496L && col("n_buckets") === 145L)
            .as("matches_pinned"))
    }
  )

  private val tokSql = "string_split(text, ' ')"
  private val utokSql = s"list_distinct($tokSql)"

  /** The q71 language-ID decision as oracle SQL — shared with
    * q182's per-language quality report so the two cannot
    * drift. */
  private val langPredSql: String =
    s"CASE " +
    s" WHEN len(list_intersect($utokSql, " +
    s"   ['the','a','an','of','and','to','in','is'])) >= greatest( " +
    s"     len(list_intersect($utokSql, ['der','die','das','und','zu','ein','ist'])), " +
    s"     len(list_intersect($utokSql, ['el','la','de','que','y','en','un','es'])), " +
    s"     len(list_intersect($utokSql, ['le','la','de','et','un','une','est'])), " +
    s"     len(list_intersect($utokSql, ['de5','shi4','le5','zai4','he2']))) " +
    s"  AND len(list_intersect($utokSql, " +
    s"   ['the','a','an','of','and','to','in','is'])) > 0 THEN 'en' " +
    s" WHEN len(list_intersect($utokSql, " +
    s"   ['der','die','das','und','zu','ein','ist'])) >= greatest( " +
    s"     len(list_intersect($utokSql, ['el','la','de','que','y','en','un','es'])), " +
    s"     len(list_intersect($utokSql, ['le','la','de','et','un','une','est'])), " +
    s"     len(list_intersect($utokSql, ['de5','shi4','le5','zai4','he2']))) " +
    s"  AND len(list_intersect($utokSql, " +
    s"   ['der','die','das','und','zu','ein','ist'])) > 0 THEN 'de' " +
    s" WHEN len(list_intersect($utokSql, " +
    s"   ['el','la','de','que','y','en','un','es'])) >= greatest( " +
    s"     len(list_intersect($utokSql, ['le','la','de','et','un','une','est'])), " +
    s"     len(list_intersect($utokSql, ['de5','shi4','le5','zai4','he2']))) " +
    s"  AND len(list_intersect($utokSql, " +
    s"   ['el','la','de','que','y','en','un','es'])) > 0 THEN 'es' " +
    s" WHEN len(list_intersect($utokSql, " +
    s"   ['le','la','de','et','un','une','est'])) >= len(list_intersect( " +
    s"     $utokSql, ['de5','shi4','le5','zai4','he2'])) " +
    s"  AND len(list_intersect($utokSql, " +
    s"   ['le','la','de','et','un','une','est'])) > 0 THEN 'fr' " +
    s" WHEN len(list_intersect($utokSql, " +
    s"   ['de5','shi4','le5','zai4','he2'])) > 0 THEN 'zh' " +
    s" ELSE 'und' END "


  /** The (a_id, b_id) candidate pairs q75's LSH finds at sf0.01 —
    * regenerate with graft.Scratch if the minhash/banding kernel or the
    * fixture changes. The ORACLE recomputes each pair's exact jaccard;
    * only the pair ids are pinned. */
  private val q75PinnedPairs: String =
    "(20,56),(20,57),(20,63),(20,66),(20,98),(20,100),(20,111),(20,142)," +
    "(20,147),(20,167),(20,173),(22,190),(24,135),(25,56),(25,57)," +
    "(25,98),(25,100),(25,111),(25,142),(25,147),(25,167),(25,173)," +
    "(27,81),(56,57),(56,63),(56,73),(56,98),(56,100),(56,111),(56,127)," +
    "(56,135),(56,142),(56,147),(56,151),(56,167),(56,173),(56,184)," +
    "(56,197),(57,63),(57,73),(57,98),(57,100),(57,111),(57,127)," +
    "(57,135),(57,142),(57,147),(57,151),(57,167),(57,173),(57,184)," +
    "(57,197),(61,185),(63,66),(63,98),(63,100),(63,111),(63,142)," +
    "(63,147),(63,167),(63,173),(70,187),(73,98),(73,100),(73,111)," +
    "(73,142),(73,147),(73,167),(73,173),(76,135),(91,127),(91,176)," +
    "(98,100),(98,111),(98,127),(98,135),(98,142),(98,147),(98,151)," +
    "(98,167),(98,173),(98,184),(98,197),(100,111),(100,127),(100,135)," +
    "(100,142),(100,147),(100,151),(100,167),(100,173),(100,184)," +
    "(100,197),(103,184),(111,127),(111,135),(111,142),(111,147)," +
    "(111,151),(111,167),(111,173),(111,184),(111,197),(127,142)," +
    "(127,147),(127,162),(127,167),(127,173),(127,176),(128,187)," +
    "(135,142),(135,147),(135,167),(135,173),(142,147),(142,151)," +
    "(142,167),(142,173),(142,184),(142,197),(147,151),(147,167)," +
    "(147,173),(147,184),(147,197),(151,167),(151,173),(152,178)," +
    "(153,197),(167,173),(167,184),(167,197),(173,184),(173,197)"

  /** The (a_id, b_id) LSH-verified pairs at the 16×16 operating point
    * (q170b) on the sf0.01 calibration slice — regenerate with
    * graft.Scratch (Q170B_PAIRS) if the kernel or fixture changes. */
  private val q170bPinnedPairs: String =
    "(18,32),(18,81),(20,56),(20,57),(20,63),(20,66),(20,98),(20,100)," +
    "(20,111),(20,142),(20,147),(20,167),(20,173),(22,56),(22,57)," +
    "(22,98),(22,100),(22,111),(22,142),(22,147),(22,167),(22,173)," +
    "(22,190),(24,135),(25,56),(25,57),(25,98),(25,100),(25,111)," +
    "(25,142),(25,147),(25,167),(25,173),(27,81),(27,135),(32,56)," +
    "(32,57),(32,98),(32,100),(32,111),(32,142),(32,147),(32,167)," +
    "(32,173),(56,57),(56,60),(56,63),(56,73),(56,81),(56,98),(56,100)," +
    "(56,111),(56,127),(56,135),(56,142),(56,147),(56,151),(56,167)," +
    "(56,173),(56,184),(56,187),(56,197),(57,60),(57,63),(57,73)," +
    "(57,81),(57,98),(57,100),(57,111),(57,127),(57,135),(57,142)," +
    "(57,147),(57,151),(57,167),(57,173),(57,184),(57,187),(57,197)," +
    "(60,98),(60,100),(60,111),(60,142),(60,147),(60,167),(60,173)," +
    "(61,185),(63,66),(63,98),(63,100),(63,111),(63,142),(63,147)," +
    "(63,167),(63,173),(70,187),(73,98),(73,100),(73,111),(73,142)," +
    "(73,147),(73,167),(73,173),(76,135),(81,98),(81,100),(81,111)," +
    "(81,142),(81,147),(81,167),(81,173),(91,127),(91,176),(98,100)," +
    "(98,111),(98,127),(98,135),(98,142),(98,147),(98,151),(98,167)," +
    "(98,173),(98,184),(98,187),(98,197),(100,111),(100,127),(100,135)," +
    "(100,142),(100,147),(100,151),(100,167),(100,173),(100,184)," +
    "(100,187),(100,197),(103,184),(109,184),(111,127),(111,135)," +
    "(111,142),(111,147),(111,151),(111,167),(111,173),(111,184)," +
    "(111,187),(111,197),(127,142),(127,147),(127,162),(127,167)," +
    "(127,173),(127,176),(128,187),(135,142),(135,147),(135,167)," +
    "(135,173),(142,147),(142,151),(142,167),(142,173),(142,184)," +
    "(142,187),(142,197),(147,151),(147,167),(147,173),(147,184)," +
    "(147,187),(147,197),(151,167),(151,173),(152,178),(153,197)," +
    "(167,173),(167,184),(167,187),(167,197),(173,184),(173,187)," +
    "(173,197)"

  /** q170/q170b oracle body, parameterized by the pinned LSH pair
    * list (the only banding-dependent input — the exact ground truth
    * and the report arithmetic are identical at every operating
    * point). */
  private def dedupQualityOracle(pins: String): String =
    s"""WITH t AS (SELECT doc_id, $utokSql AS tok FROM documents
       |           WHERE doc_id <= 200),
       |exact AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM t a JOIN t b ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
       |      / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE)
       |      >= 0.95),
       |lsh(a_id, b_id) AS (VALUES $pins),
       |tp AS (SELECT l.a_id, l.b_id FROM lsh l
       |       WHERE EXISTS (SELECT 1 FROM exact e
       |                     WHERE e.a_id = l.a_id AND e.b_id = l.b_id)),
       |fn AS (SELECT e.a_id, e.b_id FROM exact e
       |       WHERE NOT EXISTS (SELECT 1 FROM lsh l
       |                         WHERE l.a_id = e.a_id AND l.b_id = e.b_id))
       |SELECT (SELECT count(*) FROM lsh) AS n_lsh,
       |  (SELECT count(*) FROM exact) AS n_exact,
       |  (SELECT count(*) FROM tp) AS n_tp,
       |  (SELECT count(*) FROM fn) AS n_fn,
       |  round(CAST((SELECT count(*) FROM tp) AS DOUBLE)
       |    / (SELECT count(*) FROM exact), 6) AS recall,
       |  round(CAST((SELECT count(*) FROM tp) AS DOUBLE)
       |    / (SELECT count(*) FROM lsh), 6) AS lsh_precision
       |""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q170_dedup_quality" -> dedupQualityOracle(q75PinnedPairs),
    "q170b_dedup_quality_16x16" -> dedupQualityOracle(q170bPinnedPairs),
    "q70_text_stats" ->
      s"""SELECT doc_id,
         | CAST(length(text) AS BIGINT) AS n_chars_m,
         | CAST(len($tokSql) AS BIGINT) AS n_tokens,
         | CAST(len($utokSql) AS BIGINT) AS n_uniq,
         | CAST(length(text) - (len($tokSql) - 1) AS DOUBLE)
         |   / len($tokSql) AS avg_wlen,
         | CAST(len(list_filter($tokSql, t -> list_contains(
         |   ['the','a','an','of','and','to','in','is'], t))) AS DOUBLE)
         |   / len($tokSql) AS stop_ratio,
         | CAST(len($utokSql) AS DOUBLE) / len($tokSql) AS ttr,
         | len($tokSql) < 40 AS is_short
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q71_lang_id" ->
      s"""SELECT doc_id, lang AS lang_label,
         | CAST(len(list_intersect($utokSql,
         |   ['the','a','an','of','and','to','in','is'])) AS BIGINT) AS score_en,
         | CAST(len(list_intersect($utokSql,
         |   ['der','die','das','und','zu','ein','ist'])) AS BIGINT) AS score_de,
         | CAST(len(list_intersect($utokSql,
         |   ['el','la','de','que','y','en','un','es'])) AS BIGINT) AS score_es,
         | $langPredSql AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q182_langid_quality" ->
      s"""WITH p AS (SELECT lang, $langPredSql AS pred FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  CAST(sum(CASE WHEN pred = 'und' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_und,
         |  round(CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS accuracy
         |FROM p GROUP BY lang ORDER BY lang""".stripMargin,
    "q183_length_histogram" ->
      s"""WITH d AS (
         |  SELECT CAST(len($tokSql) AS BIGINT) AS n_tok FROM documents
         |  WHERE len($tokSql) > 0),
         |g AS (
         |  SELECT CAST(length(format('{:b}', n_tok)) AS BIGINT)
         |      AS bucket,
         |    count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_mass,
         |    min(n_tok) AS min_tok, max(n_tok) AS max_tok
         |  FROM d GROUP BY 1)
         |SELECT bucket, n_docs, tok_mass, min_tok, max_tok,
         |  round(CAST(tok_mass AS DOUBLE)
         |    / CAST(sum(tok_mass) OVER () AS DOUBLE), 6) AS mass_share
         |FROM g ORDER BY bucket""".stripMargin,
    "q72_dedup_exact" ->
      """SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        | count(*) AS n_distinct,
        | CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_dup_groups,
        | CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
        |   AS n_dup_docs
        |FROM (SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
        |      FROM documents GROUP BY md5(text))""".stripMargin,
    "q73_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, $utokSql AS tok FROM documents
         |           WHERE doc_id <= 200)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
         |    / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE) AS jac
         |FROM t a JOIN t b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
         |    / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE) >= 0.95
         |ORDER BY a_id, b_id""".stripMargin,
    "q75_minhash_lsh" ->
      s"""WITH t AS (SELECT doc_id, $utokSql AS tok FROM documents
         |           WHERE doc_id <= 200),
         |ids(a_id, b_id) AS (VALUES $q75PinnedPairs)
         |SELECT CAST(i.a_id AS BIGINT) AS a_id,
         |  CAST(i.b_id AS BIGINT) AS b_id,
         |  CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
         |    / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE) AS jac
         |FROM ids i
         |JOIN t a ON a.doc_id = i.a_id
         |JOIN t b ON b.doc_id = i.b_id
         |ORDER BY a_id, b_id""".stripMargin,
    "q97_minhash_full" ->
      """SELECT CAST(3876 AS BIGINT) AS n_candidates,
        |  CAST(1564 AS BIGINT) AS n_verified,
        |  true AS matches_pinned""".stripMargin,
    "q189_simhash_dedup" ->
      """SELECT CAST(3971 AS BIGINT) AS n_candidates,
        |  CAST(143 AS BIGINT) AS n_dups,
        |  CAST(2360747421 AS BIGINT) AS pair_checksum,
        |  true AS matches_pinned""".stripMargin,
    "q76_simhash" ->
      """SELECT CAST(500 AS BIGINT) AS n_docs,
        |  CAST(-214330880280 AS BIGINT) AS sum_sim_mod,
        |  CAST(3804085301084074568 AS BIGINT) AS xor_sim,
        |  CAST(496 AS BIGINT) AS n_distinct_sim,
        |  CAST(145 AS BIGINT) AS n_buckets,
        |  true AS matches_pinned""".stripMargin,
    "q95_clean_corpus" ->
      s"""SELECT doc_id, lang, n_tokens FROM (
         |  SELECT doc_id, lang,
         |    CAST(len($tokSql) AS BIGINT) AS n_tokens,
         |    row_number() OVER (
         |      PARTITION BY md5(array_to_string(list_sort($utokSql), ' '))
         |      ORDER BY doc_id) AS rn
         |  FROM documents WHERE len($tokSql) >= 40
         |) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q74_fingerprint" ->
      s"""SELECT md5(array_to_string(list_sort($utokSql), ' ')) AS fp,
         | count(*) AS n_docs, min(doc_id) AS keep_id
         |FROM documents
         |GROUP BY md5(array_to_string(list_sort($utokSql), ' '))
         |ORDER BY fp""".stripMargin
  )
}
