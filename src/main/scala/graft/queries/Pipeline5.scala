package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fifth wave of LLM-training-data pipeline operators: the duplicate-MASS
  * repetition signals — Gopher §A1.1's "fraction of positions inside
  * repeated n-grams", complementing q131, which measures the
  * distinct/total ratio and top-token share. The two families disagree
  * exactly on docs with one heavy loop, which is what the filter exists
  * to catch, so production pipelines run both.
  *
  * Scale design (100 TB): q215 is two independent two-level aggregations
  * on (doc_id, gram) then doc_id — the high-cardinality first level
  * partial-aggregates map-side; grams are near-unique within a doc so no
  * key skews.
  */
object Pipeline5 extends QueryModule {

  /** Token n-grams over a column named `t`: space-joined strings at
    * positions 1..size-n+1. */
  private def grams(n: Int) =
    expr(s"transform(sequence(1, size(t) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice(t, i, $n)))")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact set-similarity self-join via PREFIX FILTERING (the PPJoin
    // family) at Jaccard τ = 0.9 — the EXACT counterpart to q75's
    // MinHash-LSH: same all-pairs problem, but candidates come from a
    // provably complete filter instead of a probabilistic one. Tokens
    // get a global rarity order (df asc, token asc); each doc emits
    // only its |x| − ⌈τ·|x|⌉ + 1 RAREST tokens, and any pair with
    // J ≥ τ must share one of those prefix tokens (float ceil can only
    // lengthen the prefix — the safe direction). Prefix tokens are
    // rare by construction, so the token self-join fan-out stays
    // bounded at corpus scale where a raw token join explodes on
    // stopwords; payload token arrays re-attach only to the distinct
    // candidate pairs (the q78 narrow-key pattern). The DuckDB oracle
    // brute-forces ALL pairs — a missed candidate goes red, so
    // completeness is oracle-gated, not assumed.
    "q312_ppjoin_exact" -> { (s, dir) =>
      val tau = 0.9
      val docs = Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"), uniqueTokens(col("text")).as("tok"))
      val toks = docs.select(col("doc_id"), size(col("tok")).as("len"),
        explode(col("tok")).as("t"))
      val dfreq = toks.groupBy(col("t")).agg(count(lit(1)).as("dfreq"))
      val ordered = toks.join(dfreq, "t")
        .groupBy(col("doc_id"), col("len"))
        .agg(sort_array(collect_list(struct(col("dfreq"), col("t"))))
          .as("ord"))
      val prefLen = (col("len") - ceil(lit(tau) * col("len")) + 1)
        .cast(IntegerType)
      val prefix = ordered.select(col("doc_id"),
        explode(slice(expr("transform(ord, x -> x.t)"), lit(1), prefLen))
          .as("pt"))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.pt") === col("b.pt") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      cand
        .join(docs.select(col("doc_id").as("a_id"), col("tok").as("tok_a")),
          "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("tok").as("tok_b")),
          "b_id")
        .select(col("a_id"), col("b_id"),
          jaccard(col("tok_a"), col("tok_b")).as("jac"))
        .filter(col("jac") >= tau)
        .orderBy(col("a_id"), col("b_id"))
    },

    // Collocation mining (PMI) — the NLP lexicon extractor: adjacent
    // token pairs scored by pointwise mutual information, PMI =
    // ln(c_ab·N²/(B·c_a·c_b)) — deliberately ONE ratio of exact
    // integer products so the only float ops are a single
    // correctly-rounded division and one ln; min count 5 kills the
    // hapax noise, ranking uses the 6dp-rounded PMI with pair
    // tiebreaks. (q158's LM scores coverage; PMI finds the pairs
    // MORE bound than chance — different lexicography.)
    "q376_collocations" -> { (s, dir) =>
      val toks = Tables.df(s, dir, "documents")
        .select(tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
      val bg = toks.select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS a, " +
          "element_at(t, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val cab = bg.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cab")).filter(col("cab") >= 5)
      val uni = Tables.df(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val totals = uni.agg(sum(col("c")).as("nt"))
        .crossJoin(bg.agg(count(lit(1)).as("bt")))
      cab
        .join(broadcast(uni.toDF("ka", "ca")), col("a") === col("ka"))
        .join(broadcast(uni.toDF("kb", "cb")), col("b") === col("kb"))
        .crossJoin(broadcast(totals))
        .select(col("a"), col("b"), col("cab"),
          round(log((col("cab") * col("nt") * col("nt"))
            .cast(DoubleType) /
            (col("bt") * col("ca") * col("cb"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("a"), col("b"))
        .limit(20)
    },

    // Boilerplate STRIP — the transform that q169's census only
    // reports: docs are rebuilt with their boilerplate chunks
    // (32-token fingerprints appearing in ≥3 docs) removed, keeping
    // the surviving chunks in original order. Output = the changed
    // docs with their cleaned-text md5 and token count — the oracle
    // reconstructs every cleaned text independently, so the rebuild
    // (not just the flag census) is hash-checked. collect_list skips
    // the nulled boiler chunks; sort_array restores chunk order.
    "q360_boilerplate_strip" -> { (s, dir) =>
      val tok = tokens(col("text"))
      val chunks = Tables.df(s, dir, "documents")
        .select(col("doc_id"), tok.as("tok"))
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("tok")) - 1, lit(32)))
            .as("start"), col("tok"))
        .select(col("doc_id"), col("start"),
          array_join(slice(col("tok"), col("start") + 1, lit(32)), " ")
            .as("ct"))
        .withColumn("h", md5(col("ct").cast(BinaryType)))
      val boiler = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3).select(col("h").as("bh"))
      chunks.join(broadcast(boiler), col("h") === col("bh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("bh").isNull, 1L).otherwise(0L)).as("n_kept"),
          concat_ws(" ", expr("transform(" +
            "array_sort(collect_list(CASE WHEN bh IS NULL THEN " +
            "struct(start, ct) END)), e -> e.ct)")).as("cleaned"))
        .filter(col("n_kept") < col("n_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("cleaned").cast(BinaryType)).as("cleaned_md5"),
          size(split(col("cleaned"), " ")).cast(LongType)
            .as("n_tokens_clean"))
        .orderBy(col("doc_id"))
    },

    // Dedup-transitivity audit — the diagnostic that decides whether
    // connected-components clustering over-merges: near-dup (j ≥ 0.9)
    // is not transitive in theory, so count the wedges A~B~C whose
    // closing pair A~C is absent. A high closure rate justifies CC
    // (chains are real clusters); a low one means CC glues unrelated
    // docs through bridge docs and the pipeline should verify-per-pair
    // instead. Wedge enumeration is the q227 shape on the (tiny)
    // verified edge set; the closing probe is one LEFT join.
    "q336_dedup_transitivity" -> { (s, dir) =>
      val t = Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"), uniqueTokens(col("text")).as("tok"))
      val e = t.toDF("a_id", "tok_a")
        .join(t.toDF("b_id", "tok_b"), col("a_id") < col("b_id"))
        .filter(jaccard(col("tok_a"), col("tok_b")) >= 0.9)
        .select(col("a_id").as("u"), col("b_id").as("v"))
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val wedges = sym.toDF("z", "x")
        .join(sym.toDF("z2", "y"),
          col("z") === col("z2") && col("x") < col("y"))
        .select(col("x"), col("y"))
      val closed = wedges.join(e,
        col("x") === col("u") && col("y") === col("v"), "leftsemi")
      wedges.agg(count(lit(1)).as("n_wedges"))
        .crossJoin(closed.agg(count(lit(1)).as("n_closed")))
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .select(col("n_edges"), col("n_wedges"), col("n_closed"),
          round(col("n_closed").cast(DoubleType) / col("n_wedges"), 6)
            .as("closure_rate"))
    },

    // Tokenizer fertility report — the bytes-per-token ratio by
    // language, THE metric behind multilingual tokenizer budgeting
    // (a lang at 2× fertility pays 2× the context window for the
    // same text). All sums are exact integers (byte lengths, char
    // lengths, token counts); the three ratios divide once in double.
    "q341_tokenizer_fertility" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("text")).cast(LongType))
            .as("total_bytes"),
          sum(length(col("text")).cast(LongType)).as("total_chars"),
          sum(size(split(col("text"), " ")).cast(LongType))
            .as("total_toks"))
        .select(col("lang"), col("n_docs"), col("total_bytes"),
          col("total_chars"), col("total_toks"),
          round(col("total_bytes").cast(DoubleType) /
            col("total_toks"), 4).as("bytes_per_tok"),
          round(col("total_chars").cast(DoubleType) /
            col("total_toks"), 4).as("chars_per_tok"),
          round(col("total_bytes").cast(DoubleType) /
            col("total_chars"), 4).as("bytes_per_char"))
        .orderBy(col("lang"))
    },

    // Vocabulary growth curve (Heaps' law) — the corpus-stats report
    // behind tokenizer sizing: distinct vocabulary after the first
    // 40/80/.../200 docs. One explode + min-doc-per-token aggregate
    // (each token contributes ONE row: the first doc it appears in),
    // then the growth curve is a cumulative count over the
    // checkpoint-bucketed firsts — the corpus is scanned once no
    // matter how many checkpoints.
    "q337_vocab_growth" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val firsts = Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"), explode(uniqueTokens(col("text")))
          .as("tok"))
        .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      val perCp = firsts
        .select((ceil((col("first_doc") + 1) / 40.0) * 40)
          .cast(LongType).as("checkpoint"))
        .groupBy(col("checkpoint")).agg(count(lit(1)).as("new_tokens"))
      val w = Window.orderBy(col("checkpoint"))
        .rowsBetween(Window.unboundedPreceding, 0)
      perCp.withColumn("vocab_size", sum(col("new_tokens")).over(w))
        .orderBy(col("checkpoint"))
    },

    // Near-dup DIFF explanation — curator tooling for q73's pairs:
    // not just "these two are 95% similar" but WHAT differs — the
    // sorted token sets unique to each side and their counts. The
    // report a human reviews before approving a dedup policy change;
    // array_except runs only on the already-verified pair set, so the
    // explanation costs nothing at corpus scale.
    "q331_dup_diff_report" -> { (s, dir) =>
      val t = Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"), uniqueTokens(col("text")).as("tok"))
      val a = t.select(col("doc_id").as("a_id"), col("tok").as("tok_a"))
      val b = t.select(col("doc_id").as("b_id"), col("tok").as("tok_b"))
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("jac", jaccard(col("tok_a"), col("tok_b")))
        .filter(col("jac") >= 0.95)
        .select(col("a_id"), col("b_id"), round(col("jac"), 6).as("jac"),
          size(array_except(col("tok_a"), col("tok_b")))
            .cast(LongType).as("n_only_a"),
          size(array_except(col("tok_b"), col("tok_a")))
            .cast(LongType).as("n_only_b"),
          array_join(array_sort(array_except(col("tok_a"),
            col("tok_b"))), " ").as("only_a"),
          array_join(array_sort(array_except(col("tok_b"),
            col("tok_a"))), " ").as("only_b"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Exact-QUOTA stratified sample: exactly ⌈n/5⌉ docs per lang
    // stratum, chosen by deterministic salted-md5 rank. Hash-threshold
    // sampling (q119) hits its rate only in EXPECTATION — a benchmark
    // slice or eval split needs exact per-stratum counts. One window
    // per stratum (partitioned — parallel across strata, no global
    // sort), quota via an integer ⌈n/5⌉ from a broadcast stratum
    // census; salted md5 makes the draw reproducible and
    // partition-count-independent.
    "q317_stratified_quota" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          md5(concat(lit("strat"), col("doc_id").cast(StringType)))
            .as("h"))
      val w = Window.partitionBy(col("lang")).orderBy(col("h"),
        col("doc_id"))
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      d.withColumn("rk", row_number().over(w))
        .join(broadcast(counts), "lang")
        .filter(col("rk") <= expr("(n_lang + 4) div 5"))
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // Contrastive-pair mining for embedding/classifier training:
    // positives = consecutive docs within a source (lead over the
    // source-partitioned window); negatives = a DETERMINISTIC hash
    // ring over the dense doc_id space — neg_id = (id·7919 + 13) mod N
    // — one equi-join against the corpus, no randomness, no global
    // window (ids are dense here; at ingest scale the same ring runs
    // on a zipWithIndex'd surrogate). Self-hits are excluded in the
    // join condition; negatives that land in the anchor's own source
    // are counted as collisions (what a curator monitors to decide if
    // the ring needs re-salting). O(sources) census output.
    "q309_contrastive_pairs" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val wSrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val pos = d.withColumn("pos_id", lead(col("doc_id"), 1).over(wSrc))
      pos.crossJoin(broadcast(n))
        .withColumn("neg_id", (col("doc_id") * 7919L + 13L) % col("n_docs"))
        .join(d.select(col("doc_id").as("nid"),
          col("source").as("neg_source")),
          col("neg_id") === col("nid") && col("neg_id") =!= col("doc_id"),
          "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_anchors"),
          count(col("pos_id")).as("n_pos_pairs"),
          count(col("nid")).as("n_neg_pairs"),
          sum(when(col("neg_source") === col("source"), 1L)
            .otherwise(0L)).as("n_neg_collisions"))
        .orderBy(col("source"))
    },

    // BM25 ranked retrieval (Robertson k1=1.2, b=0.75) for a fixed
    // 3-term query over `documents` — the relevance scorer behind
    // query-targeted training-data selection. The isin filter prunes
    // the token explode to query-term hits BEFORE any shuffle, so the
    // corpus contributes ≤|Q| rows per doc to the (doc_id, term)
    // aggregation; document frequency and the (N, avgdl) corpus stats
    // are two tiny broadcast sides. Per-term weights are computed as
    // the IDENTICAL double expression on both engines, then cast to
    // DECIMAL(18,8) before the cross-term sum — exact decimal addition
    // makes the score independent of partial-agg merge order, so the
    // top-10 is stable at any parallelism.
    "q305_bm25_search" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      val qTerms = Seq("vector", "stream", "window")
      val stats = docs.agg(
        count(lit(1)).cast(DoubleType).as("n_docs"),
        avg(size(tokens(col("text")))).as("avgdl"))
      val hits = docs
        .select(col("doc_id"), size(tokens(col("text"))).as("dl0"),
          explode(tokens(col("text"))).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).cast(DoubleType).as("tf"),
          min(col("dl0")).cast(DoubleType).as("dl"))
      val dfreq = hits.groupBy(col("term"))
        .agg(count(lit(1)).cast(DoubleType).as("dfreq"))
      val idf = log((col("n_docs") - col("dfreq") + 0.5) /
        (col("dfreq") + 0.5) + 1.0)
      val w = idf * (col("tf") * 2.2) /
        (col("tf") + lit(1.2) *
          (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
      hits.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
        .select(col("doc_id"), w.cast(DecimalType(18, 8)).as("wd"))
        .groupBy(col("doc_id"))
        .agg(sum(col("wd")).cast(DoubleType).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    },


    // Gopher-style duplicate-MASS signals: top-bigram coverage (most
    // frequent bigram's share of bigram positions) and duplicate-trigram
    // position share (how much of the doc sits inside a trigram that
    // occurs >= 2 times). q131 measures how VARIED a doc is
    // (distinct/total); this measures how much mass the repeats carry —
    // the two disagree exactly on docs with one heavy loop, which is
    // what the filter is for. Exact-integer thresholds (top bigram >=
    // 10% of positions, or >= 20% of trigram positions repeated) so the
    // flag boundary is bit-identical in both engines.
    "q215_repetition_quality" -> { (s, dir) =>
      val toks = Tables.df(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
      def gramCounts(n: Int) = toks.filter(size(col("t")) > n - 1)
        .select(col("doc_id"), explode(grams(n)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      val bi = gramCounts(2).groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bi"))
      val tri = gramCounts(3).groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tri"),
          sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_tri"))
      bi.join(tri, Seq("doc_id"))
        .withColumn("repetitive",
          col("top_bigram_n") * 10 >= col("n_bi") ||
            col("dup_tri") * 5 >= col("n_tri"))
        .select(col("doc_id"), col("n_bi"), col("top_bigram_n"),
          col("n_tri"), col("dup_tri"), col("repetitive"))
        .orderBy(col("doc_id"))
    },

    // Corpus-snapshot overlap — the crawl-merge decision report: before
    // ingesting a new snapshot (side B), measure how much of it the
    // standing corpus (side A) already contains, as exact Jaccard +
    // containment over word-trigram shingle SETS. One shuffle on the
    // shingle string; the per-shingle presence flags collapse to four
    // integers, so the answer is O(1) no matter the corpus size —
    // the same shape production runs at snapshot scale (the
    // MinHash-sketch approximation of this number is q75/q97's
    // signature machinery; this is the exact version both are
    // validated against).
    "q229_corpus_overlap" -> { (s, dir) =>
      val sh = Tables.df(s, dir, "documents")
        .select((col("doc_id") % 2 === 0).as("in_a"),
          tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("in_a"), explode(grams(3)).as("g"))
      sh.groupBy(col("g")).agg(
          max(when(col("in_a"), 1).otherwise(0)).as("a"),
          max(when(!col("in_a"), 1).otherwise(0)).as("b"))
        .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
          sum(col("a") * col("b")).as("n_inter"),
          count(lit(1)).as("n_union"))
        .select(col("n_a"), col("n_b"), col("n_inter"), col("n_union"),
          round(col("n_inter").cast(DoubleType) / col("n_union"), 6)
            .as("jaccard"),
          round(col("n_inter").cast(DoubleType) / col("n_b"), 6)
            .as("containment_b_in_a"))
    },

    // Tokenizer-induction census — one BPE merge round: count adjacent
    // CHARACTER pairs across every word occurrence in the corpus and
    // rank the merge candidates (the argmax pair is exactly what a BPE
    // trainer would merge next). Two explodes (word, then position) of
    // narrow projections; the (pair) census partial-aggregates
    // map-side; output is top-20, O(1). The full BPE loop re-runs this
    // census per merge on re-tokenized text — each round is this exact
    // plan shape.
    "q248_bpe_pair_census" -> { (s, dir) =>
      val words = Tables.df(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
      words
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), " +
            "i -> substring(w, i, 2))")).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },

    // N-gram novelty scoring — how much of each incoming doc is UNSEEN
    // relative to the standing corpus (q229's per-document refinement;
    // the memorization-risk signal pipelines gate on): per new-side doc,
    // the fraction of its distinct trigrams absent from the corpus-side
    // trigram set, via a LEFT ANTI join on the gram string. Narrow keys
    // end to end; the corpus set is distinct-deduped once.
    "q255_ngram_novelty" -> { (s, dir) =>
      val toks = Tables.df(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
      def grams3(df: DataFrame) = df
        .select(col("doc_id"), explode(grams(3)).as("g")).distinct()
      val corpus = grams3(toks.filter(col("doc_id") % 2 === 0))
        .select(col("g")).distinct()
      val incoming = grams3(toks.filter(col("doc_id") % 2 === 1))
      val totals = incoming.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      val unseen = incoming.join(corpus, Seq("g"), "leftanti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_unseen"))
      totals.join(unseen, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_unseen"), lit(0L)).as("n_unseen"))
        .withColumn("novelty", round(
          col("n_unseen").cast(DoubleType) / col("n_grams"), 6))
        .orderBy(col("doc_id"))
    },

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    // top-k by ln(u)/w where u is a deterministic salted-hash uniform
    // and w the quality weight — the corpus-subsampling primitive that
    // upweights quality without a quota table. One pass + a top-k; the
    // ranking key is computed identically on both engines (md5-derived
    // u, same double arithmetic), so the SAMPLE ITSELF is verified,
    // not just its size.
    "q259_weighted_sample" -> { (s, dir) =>
      val u = (conv(substring(md5(concat(lit("ws"),
        col("doc_id").cast(StringType))), 1, 8), 16, 10)
        .cast(LongType) + 1).cast(DoubleType) / lit(4294967296.0)
      val keyed = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (log(u) / col("n_chars")).as("key"))
      // top-50 via orderBy().limit() → distributed
      // TakeOrderedAndProject; rk is then a window over the already-
      // bounded 50-row sample, never over the corpus
      keyed.orderBy(col("key").desc, col("doc_id")).limit(50)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("key").desc, col("doc_id"))).cast(LongType))
        .select(col("doc_id"), col("n_chars"), round(col("key"), 6)
          .as("skey"), col("rk"))
        .orderBy(col("rk"))
    },

    // Source-pair similarity matrix — corpus-structure report: exact
    // Jaccard between every pair of domains over their trigram SETS
    // (which crawl sources substantially mirror each other — the
    // domain-level view of q229's two-corpus number). The gram
    // self-join fans out C(k,2) per gram with k <= #sources, bounded;
    // output is O(sources²).
    "q260_source_similarity" -> { (s, dir) =>
      val sg = Tables.df(s, dir, "documents")
        .select(col("source"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("source"), explode(grams(3)).as("g"))
        .distinct()
      val sizes = sg.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val inter = sg.toDF("sa", "g")
        .join(sg.toDF("sb", "g2"),
          col("g") === col("g2") && col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.toDF("s1", "na")), col("sa") === col("s1"))
        .join(broadcast(sizes.toDF("s2", "nb")), col("sb") === col("s2"))
        .select(col("sa"), col("sb"), col("n_inter"),
          round(col("n_inter").cast(DoubleType) /
            (col("na") + col("nb") - col("n_inter")), 6).as("jaccard"))
        .orderBy(col("sa"), col("sb"))
    },

    // Quality-distribution drift (PSI, population stability index) —
    // the monitoring number that says whether a new snapshot's quality
    // profile shifted: doc length bucketed into 10 equal-width bins
    // over the GLOBAL range (bounds from a 1-row broadcast aggregate,
    // integer bin arithmetic so assignment is exact), smoothed
    // (+0.5/bin) shares per half, PSI = sum (pa-pb)·ln(pa/pb). Only
    // the final PSI is a rounded double; everything upstream is exact
    // integer counts.
    "q257_quality_psi" -> { (s, dir) =>
      val d = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val bounds = d.agg(min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"))
      val binned = d.crossJoin(broadcast(bounds))
        .select((col("doc_id") % 2 === 0).as("in_a"),
          least(lit(9L), floor((col("n_chars") - col("lo")) * lit(10.0) /
            (col("hi") - col("lo") + 1)).cast(LongType)).as("bin"))
      val census = binned.groupBy(col("bin")).agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
      val tot = census.agg(sum(col("ca")).as("ta"),
        sum(col("cb")).as("tb"))
      census.crossJoin(broadcast(tot))
        .select(((col("ca") + 0.5) / (col("ta") + 5.0)).as("pa"),
          ((col("cb") + 0.5) / (col("tb") + 5.0)).as("pb"))
        .agg(round(sum((col("pa") - col("pb")) *
          log(col("pa") / col("pb"))), 6).as("psi"),
          count(lit(1)).as("n_bins"))
    },

    // Sequence packing — the concat-then-chunk layout LLM pretraining
    // actually feeds the model: the corpus is concatenated in doc_id
    // order and cut into fixed 2048-token context windows, documents
    // straddling a boundary spanning both bins. Tokens are the
    // chars/4 heuristic (ceil — exact in double: division by a power
    // of two). The global running token offset is the textbook
    // DistributedPrefix.prefixSum consumer (range partition +
    // per-partition window + broadcast offsets — NO single-partition
    // stage at corpus scale); each doc then explodes into the ~1.1
    // bins its span intersects, and the per-bin census (docs touching,
    // token fill, first doc) partial-aggregates map-side. The oracle
    // recomputes the identical spans with a SQL window + generate_
    // series, so a one-token drift in any prefix goes red.
    "q393_sequence_packing" -> { (s, dir) =>
      val W = 2048L
      val docs = Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          ceil(col("n_chars") / lit(4.0)).cast(LongType).as("tok"))
        .filter(col("tok") > 0)
      val cum = graft.operators.DistributedPrefix
        .prefixSum(docs, Seq(col("doc_id")), col("tok"), "cum")
      val spans = cum.select(col("doc_id"), col("tok"),
        (col("cum") - col("tok")).as("st"), (col("cum") - 1).as("en"))
      spans
        .select(col("doc_id"), col("tok"), col("st"), col("en"),
          explode(sequence((col("st") / W).cast(LongType),
            (col("en") / W).cast(LongType))).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("en"), (col("bin") + 1) * W - 1) -
            greatest(col("st"), col("bin") * W) + 1).as("fill"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("bin"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q393_sequence_packing" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |    CAST(sum(tok) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM d WHERE tok > 0),
        |s AS (
        |  SELECT doc_id, tok, cum - tok AS st, cum - 1 AS en FROM c),
        |e AS (
        |  SELECT doc_id, tok, st, en,
        |    unnest(generate_series(st // 2048, en // 2048)) AS bin
        |  FROM s)
        |SELECT bin, count(*) AS n_docs,
        |  CAST(sum(least(en, (bin + 1) * 2048 - 1)
        |    - greatest(st, bin * 2048) + 1) AS BIGINT) AS fill,
        |  min(doc_id) AS first_doc
        |FROM e GROUP BY bin ORDER BY bin""".stripMargin,
    "q376_collocations" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT t[i] AS a, t[i + 1] AS b
        |  FROM toks, unnest(range(1, len(t))) AS x(i)),
        |cab AS (
        |  SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2
        |  HAVING count(*) >= 5),
        |uni AS (
        |  SELECT tok, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok
        |    FROM documents) GROUP BY 1),
        |totals AS (
        |  SELECT (SELECT sum(c) FROM uni) AS nt,
        |    (SELECT count(*) FROM bg) AS bt)
        |SELECT a, b, cab,
        |  round(ln((cab * nt * nt)::DOUBLE
        |    / (bt * ua.c * ub.c)), 6) AS pmi
        |FROM cab
        |JOIN uni ua ON a = ua.tok
        |JOIN uni ub ON b = ub.tok, totals
        |ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin,
    "q360_boilerplate_strip" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tok
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, tok,
        |    unnest(range(0, len(tok), 32)) AS start FROM d),
        |chunks AS (
        |  SELECT doc_id, start,
        |    array_to_string(tok[start+1:start+32], ' ') AS ct,
        |    md5(array_to_string(tok[start+1:start+32], ' ')) AS h
        |  FROM starts),
        |boiler AS (
        |  SELECT h FROM chunks
        |  GROUP BY h HAVING count(DISTINCT doc_id) >= 3),
        |flagged AS (
        |  SELECT c.doc_id, c.start, c.ct,
        |    (b.h IS NOT NULL) AS ib
        |  FROM chunks c LEFT JOIN boiler b ON c.h = b.h),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_chunks,
        |    sum(CASE WHEN NOT ib THEN 1 ELSE 0 END) AS n_kept,
        |    coalesce(array_to_string(
        |      list(ct ORDER BY start) FILTER (NOT ib), ' '), '')
        |      AS cleaned
        |  FROM flagged GROUP BY 1)
        |SELECT doc_id, n_chunks, CAST(n_kept AS BIGINT) AS n_kept,
        |  md5(cleaned) AS cleaned_md5,
        |  CAST(len(string_split(cleaned, ' ')) AS BIGINT)
        |    AS n_tokens_clean
        |FROM agg WHERE n_kept < n_chunks
        |ORDER BY doc_id""".stripMargin,
    "q341_tokenizer_fertility" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_toks,
        |  round(sum(strlen(text))::DOUBLE
        |    / sum(len(string_split(text, ' '))), 4) AS bytes_per_tok,
        |  round(sum(length(text))::DOUBLE
        |    / sum(len(string_split(text, ' '))), 4) AS chars_per_tok,
        |  round(sum(strlen(text))::DOUBLE / sum(length(text)), 4)
        |    AS bytes_per_char
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q336_dedup_transitivity" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id <= 200),
        |e AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
        |      / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE)
        |      >= 0.9),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |wedges AS (
        |  SELECT a.v AS x, b.v AS y
        |  FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v),
        |closed AS (
        |  SELECT count(*) AS n_closed FROM wedges w
        |  WHERE EXISTS (SELECT 1 FROM e
        |    WHERE e.u = w.x AND e.v = w.y))
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM wedges) AS n_wedges,
        |  n_closed,
        |  round(n_closed::DOUBLE
        |    / (SELECT count(*) FROM wedges), 6) AS closure_rate
        |FROM closed""".stripMargin,
    "q337_vocab_growth" ->
      """WITH firsts AS (
        |  SELECT tok, min(doc_id) AS first_doc FROM (
        |    SELECT doc_id,
        |      unnest(list_distinct(string_split(text, ' '))) AS tok
        |    FROM documents WHERE doc_id <= 200)
        |  GROUP BY tok),
        |per AS (
        |  SELECT CAST(ceil((first_doc + 1) / 40.0) * 40 AS BIGINT)
        |    AS checkpoint, count(*) AS new_tokens
        |  FROM firsts GROUP BY 1)
        |SELECT checkpoint, new_tokens,
        |  CAST(sum(new_tokens) OVER (ORDER BY checkpoint
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS vocab_size
        |FROM per ORDER BY checkpoint""".stripMargin,
    "q331_dup_diff_report" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id <= 200)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
        |    / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE), 6)
        |    AS jac,
        |  len(list_filter(a.tok, x -> NOT list_contains(b.tok, x)))
        |    AS n_only_a,
        |  len(list_filter(b.tok, x -> NOT list_contains(a.tok, x)))
        |    AS n_only_b,
        |  coalesce(array_to_string(list_sort(list_filter(a.tok,
        |    x -> NOT list_contains(b.tok, x))), ' '), '') AS only_a,
        |  coalesce(array_to_string(list_sort(list_filter(b.tok,
        |    x -> NOT list_contains(a.tok, x))), ' '), '') AS only_b
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
        |    / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE)
        |    >= 0.95
        |ORDER BY a_id, b_id""".stripMargin,
    "q317_stratified_quota" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    md5('strat' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM d)
        |SELECT lang, doc_id FROM r WHERE rk <= (n_lang + 4) // 5
        |ORDER BY lang, doc_id""".stripMargin,
    "q312_ppjoin_exact" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id <= 200)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
        |    / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE) AS jac
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
        |    / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE) >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,
    "q309_contrastive_pairs" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |d AS (SELECT doc_id, source FROM documents),
        |pos AS (
        |  SELECT doc_id, source,
        |    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS pos_id
        |  FROM d),
        |j AS (
        |  SELECT p.source, p.pos_id, nd.doc_id AS nid,
        |    nd.source AS neg_source
        |  FROM pos p CROSS JOIN n LEFT JOIN d nd
        |    ON nd.doc_id = (p.doc_id * 7919 + 13) % n.n_docs
        |      AND nd.doc_id <> p.doc_id)
        |SELECT source, count(*) AS n_anchors,
        |  count(pos_id) AS n_pos_pairs,
        |  count(nid) AS n_neg_pairs,
        |  CAST(sum(CASE WHEN neg_source = source THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_neg_collisions
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q305_bm25_search" ->
      """WITH stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    avg(len(string_split(text, ' '))) AS avgdl FROM documents),
        |hits AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
        |    CAST(min(dl0) AS DOUBLE) AS dl
        |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS dl0,
        |          unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  WHERE term IN ('vector', 'stream', 'window')
        |  GROUP BY doc_id, term),
        |dfreq AS (
        |  SELECT term, CAST(count(*) AS DOUBLE) AS dfreq
        |  FROM hits GROUP BY term)
        |SELECT doc_id, CAST(sum(wd) AS DOUBLE) AS bm25 FROM (
        |  SELECT h.doc_id,
        |    CAST(ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        |      * (tf * 2.2)
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |      AS DECIMAL(18,8)) AS wd
        |  FROM hits h JOIN dfreq USING (term), stats)
        |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
    "q215_repetition_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT doc_id, array_to_string(list_slice(t, i, i+1), ' ') AS g,
        |    count(*) AS c
        |  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS u(i)
        |  WHERE len(t) >= 2 GROUP BY 1, 2),
        |tri AS (
        |  SELECT doc_id, array_to_string(list_slice(t, i, i+2), ' ') AS g,
        |    count(*) AS c
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS u(i)
        |  WHERE len(t) >= 3 GROUP BY 1, 2),
        |bi_doc AS (
        |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n,
        |    CAST(sum(c) AS BIGINT) AS n_bi FROM bi GROUP BY 1),
        |tri_doc AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri,
        |    CAST(coalesce(sum(c) FILTER (c >= 2), 0) AS BIGINT) AS dup_tri
        |  FROM tri GROUP BY 1)
        |SELECT b.doc_id, b.n_bi, b.top_bigram_n, t.n_tri, t.dup_tri,
        |  (b.top_bigram_n * 10 >= b.n_bi OR t.dup_tri * 5 >= t.n_tri)
        |    AS repetitive
        |FROM bi_doc b JOIN tri_doc t USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    "q229_corpus_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id % 2 = 0 AS in_a, string_split(text, ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT in_a, array_to_string(list_slice(t, i, i+2), ' ') AS g
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS u(i)
        |  WHERE len(t) >= 3),
        |flags AS (
        |  SELECT g, max(CASE WHEN in_a THEN 1 ELSE 0 END) AS a,
        |         max(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS b
        |  FROM sh GROUP BY g)
        |SELECT CAST(sum(a) AS BIGINT) AS n_a,
        |  CAST(sum(b) AS BIGINT) AS n_b,
        |  CAST(sum(a*b) AS BIGINT) AS n_inter,
        |  count(*) AS n_union,
        |  round(sum(a*b)::DOUBLE / count(*), 6) AS jaccard,
        |  round(sum(a*b)::DOUBLE / sum(b), 6) AS containment_b_in_a
        |FROM flags""".stripMargin,
    "q255_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(list_slice(t, i, i+2), ' ') AS g
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS u(i)
        |  WHERE len(t) >= 3),
        |corpus AS (SELECT DISTINCT g FROM sh WHERE doc_id % 2 = 0),
        |inc AS (SELECT doc_id, g FROM sh WHERE doc_id % 2 = 1),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM inc GROUP BY 1),
        |uns AS (
        |  SELECT doc_id, count(*) AS n_unseen FROM inc
        |  WHERE g NOT IN (SELECT g FROM corpus) GROUP BY 1)
        |SELECT t.doc_id, t.n_grams,
        |  CAST(coalesce(u.n_unseen, 0) AS BIGINT) AS n_unseen,
        |  round(coalesce(u.n_unseen, 0)::DOUBLE / t.n_grams, 6)
        |    AS novelty
        |FROM tot t LEFT JOIN uns u ON t.doc_id = u.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q259_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |    ln((('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)),
        |        1, 8))::UBIGINT + 1) / 4294967296.0) / n_chars AS key
        |  FROM documents)
        |SELECT doc_id, n_chars, round(key, 6) AS skey,
        |  CAST(rk AS BIGINT) AS rk
        |FROM (SELECT *, row_number() OVER
        |        (ORDER BY key DESC, doc_id) AS rk FROM keyed)
        |WHERE rk <= 50 ORDER BY rk""".stripMargin,
    "q260_source_similarity" ->
      """WITH sg AS (
        |  SELECT DISTINCT source,
        |    array_to_string(list_slice(t, i, i+2), ' ') AS g
        |  FROM (SELECT source, string_split(text, ' ') AS t
        |        FROM documents) toks,
        |    UNNEST(generate_series(1, len(t)-2)) AS u(i)
        |  WHERE len(t) >= 3),
        |sizes AS (SELECT source, count(*) AS n FROM sg GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS sa, b.source AS sb, count(*) AS n_inter
        |  FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT sa, sb, n_inter,
        |  round(n_inter::DOUBLE / (x.n + y.n - n_inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes x ON sa = x.source JOIN sizes y ON sb = y.source
        |ORDER BY sa, sb""".stripMargin,
    "q257_quality_psi" ->
      """WITH b AS (
        |  SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
        |binned AS (
        |  SELECT doc_id % 2 = 0 AS in_a,
        |    least(9, CAST(floor((n_chars - lo) * 10.0 /
        |      (hi - lo + 1)) AS BIGINT)) AS bin
        |  FROM documents, b),
        |census AS (
        |  SELECT bin,
        |    sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS cb
        |  FROM binned GROUP BY 1),
        |tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM census)
        |SELECT round(sum((pa - pb) * ln(pa / pb)), 6) AS psi,
        |  count(*) AS n_bins
        |FROM (
        |  SELECT (ca + 0.5) / (ta + 5.0) AS pa,
        |         (cb + 0.5) / (tb + 5.0) AS pb
        |  FROM census, tot)""".stripMargin,
    "q248_bpe_pair_census" ->
      """WITH words AS (
        |  SELECT w FROM documents,
        |    UNNEST(string_split(text, ' ')) AS u(w)
        |  WHERE length(w) >= 2),
        |pairs AS (
        |  SELECT substr(w, i, 2) AS pair
        |  FROM words, UNNEST(generate_series(1, length(w) - 1)) AS g(i))
        |SELECT pair, count(*) AS n FROM pairs
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin
  )
}
