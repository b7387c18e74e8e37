package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth wave of LLM-training-data pipeline operators: repetition
  * quality signals (the "repeated n-gram" degenerate-text detector) and
  * deterministic train/val/test split assignment.
  *
  * Scale design (100 TB):
  *  - q131's gram-repetition ratio is map-only (one pass per doc); the
  *    top-token frequency is a two-level aggregation on high-cardinality
  *    (doc_id, term) then doc_id keys — both shuffles partial-aggregate
  *    map-side first.
  *  - q132 is map-only: the split is a pure function of a salted hash of
  *    the doc id, so any cluster layout / rerun assigns identically, and
  *    a doc never migrates between splits when the corpus grows (the
  *    hash ignores corpus size — unlike randomSplit, whose assignment
  *    depends on partitioning).
  */
object Pipeline4 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Incremental dedup — the production "today's batch vs the standing
    // corpus" shape the full-corpus pipelines (q129/q133) don't cover:
    // the last 100 docs of the id space play the incoming batch (the
    // split bound computed in-plan, as q113), everything before is the
    // corpus. Exact layer: batch fingerprints probe the corpus
    // fingerprint set via a left join flag on the 128-bit key (at scale
    // the corpus side is a precomputed index; the join shuffles on fp —
    // never broadcast, the corpus is the BIG side). Near layer:
    // ASYMMETRIC MinHash-LSH — batch band keys equi-join corpus band
    // keys (candidates are batch×dup-family, never batch×corpus),
    // exact-Jaccard >= 0.9 verification on candidates only, with the
    // shared LshKnobs(0.9) = 8×8 banding. Output: one row per batch doc
    // with dup evidence + keep decision. Oracle: DuckDB brute-forces
    // both layers; the 8×8 banding's ~98.9% per-pair recall reproduces
    // the exact flags on this fixture (same argument as q129).
    "q162_incremental_dedup" -> { (s, dir) =>
      val (bands, rows) = graft.functions.LshKnobs.bandsRows(0.9, s)
      val docs = Tables.df(s, dir, "documents")
      val cut = docs.agg((max(col("doc_id")) - 100).cast(LongType)
        .as("cut"))
      val withCut = docs.crossJoin(broadcast(cut))
      val batch = withCut.filter(col("doc_id") >= col("cut"))
      val corpus = withCut.filter(col("doc_id") < col("cut"))
      // shuffle_hash hints pin the physical choice (both sides here are
      // corpus-scaled at 100 TB — neither may broadcast — and at test
      // scale an unhinted AQE conversion is a plan-golden coin flip)
      val exactDup = batch
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .join(corpus.select(fingerprint(col("text")).as("fp")).distinct()
          .withColumn("fp_hit", lit(true)).hint("shuffle_hash"),
          Seq("fp"), "left")
        .select(col("doc_id"),
          coalesce(col("fp_hit"), lit(false)).as("exact_dup"))
      def banded(df: DataFrame, idCol: String) = df.select(
        col("doc_id").as(idCol),
        posexplode(minhashBands(col("text"), bands, rows))
          .as(Seq("band", "bh")))
      val candidates = banded(batch, "b_id").hint("shuffle_hash")
        .join(banded(corpus, "c_id"), Seq("band", "bh"))
        .select(col("b_id"), col("c_id")).distinct()
      val bToks = batch.select(col("doc_id").as("b_id"),
        tokenHashSet(col("text")).as("tok_b"))
      val cToks = corpus.select(col("doc_id").as("c_id"),
        tokenHashSet(col("text")).as("tok_c"))
      val nearDup = candidates.join(bToks, "b_id").join(cToks, "c_id")
        .filter(jaccardHashed(col("tok_b"), col("tok_c")) >= 0.9)
        .select(col("b_id").as("doc_id")).distinct()
        .withColumn("near_hit", lit(true))
      exactDup.join(nearDup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("exact_dup"),
          coalesce(col("near_hit"), lit(false)).as("near_dup"))
        .withColumn("keep", !col("exact_dup") && !col("near_dup"))
        .orderBy(col("doc_id"))
    },

    // Sequence packing — concatenation-style packing of documents into
    // fixed-length (2048-token) training sequences, the layout step
    // right before tokenized-shard export in a pretraining pipeline.
    // Deterministic: docs are ordered by a salted hash within their
    // export shard (q120's sharding), the running token offset is ONE
    // window cumulative sum per shard, and each doc's (seq_id, offset)
    // falls out arithmetically — docs crossing a 2048 boundary simply
    // continue into the next sequence, exactly like packed pretraining
    // data. All shards pack in parallel; no global sort, no driver
    // state, identical output on any cluster layout.
    "q163_sequence_packing" -> { (s, dir) =>
      val seqLen = 2048L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"),
          md5(concat(lit("pack"), col("doc_id").cast(StringType))
            .cast(BinaryType)).as("h"))
        .withColumn("shard",
          ((expr("position(substr(h, 1, 1), '0123456789abcdef')") - 1) % 4)
            .cast(LongType))
        .withColumn("start_tok",
          coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          // integer `div`, not `/`: double division is only exact below
          // 2^53 cumulative tokens, which a 100 TB shard can exceed
          expr(s"start_tok div $seqLen").as("seq_id"),
          (col("start_tok") % seqLen).as("seq_offset"))
        .orderBy(col("shard"), col("seq_id"), col("seq_offset"),
          col("doc_id"))
    },

    // Repetition signals: 1 - distinct/total 3-grams (degenerate-text
    // detector — boilerplate and looped generations repeat grams), plus
    // the most-frequent-token share of the doc.
    "q131_repetition" -> { (s, dir) =>
      val grams = Tables.df(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tok"))
        .filter(size(col("tok")) >= 3)
        .select(col("doc_id"), col("tok"),
          transform(sequence(lit(0), size(col("tok")) - 3),
            i => array_join(slice(col("tok"), i + 1, lit(3)), " ")).as("g3"))
        .select(col("doc_id"),
          size(col("g3")).cast(LongType).as("n_grams"),
          size(array_distinct(col("g3"))).cast(LongType).as("n_uniq_grams"),
          explode(col("tok")).as("term"))
      grams
        .groupBy(col("doc_id"), col("n_grams"), col("n_uniq_grams"),
          col("term"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id"), col("n_grams"), col("n_uniq_grams"))
        .agg(max(col("tf")).as("max_tf"), sum(col("tf")).as("n_tokens"))
        .select(col("doc_id"), col("n_grams"), col("n_uniq_grams"),
          round(lit(1.0) - col("n_uniq_grams") / col("n_grams").cast(DoubleType), 6)
            .as("rep_ratio"),
          round(col("max_tf") / col("n_tokens").cast(DoubleType), 6)
            .as("top_tok_share"))
        .orderBy(col("doc_id"))
    },

    // The CURATION PIPELINE end-to-end, oracle-checkable: the whole
    // LLM-data flow in one declarative plan — quality filter (length),
    // near-dup removal (fingerprint groups keep the min doc_id),
    // benchmark decontamination (drop docs sharing >= 3 word-4-grams
    // with the fixed 200-doc benchmark tail, and the tail itself), and
    // deterministic split assignment on the survivors. Every stage is
    // the oracle-expressible variant of its scalable twin (fingerprint
    // ~ q129's LSH clusters, gram overlap = q113, split = q132), so
    // DuckDB replays the ENTIRE pipeline hash-exactly.
    // Scale: scan → window-on-fp → gram join vs broadcast bench set →
    // anti join → map-only split. No stage is quadratic in the corpus.
    "q149_curation" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.df(s, dir, "documents")
      val cut = docs.agg((max(col("doc_id")) - 200).cast(LongType).as("cut"))
      val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val quality = docs
        .select(col("doc_id"), col("text"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"))
        .filter(col("n_tokens") >= 40)
      val deduped = quality
        .withColumn("fp", fingerprint(col("text")))
        .withColumn("rn", row_number().over(wFp))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text"))
      val grams = Pipeline2.docGrams(docs).crossJoin(broadcast(cut))
      val bench = grams.filter(col("doc_id") >= col("cut"))
        .select(col("g")).distinct()
      val contaminated = grams.filter(col("doc_id") < col("cut"))
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        .filter(col("n_hits") >= 3)
        .select(col("doc_id"))
      val u = substring(md5(concat(lit("split"),
        col("doc_id").cast(StringType)).cast(BinaryType)), 1, 8)
      deduped.crossJoin(broadcast(cut))
        .filter(col("doc_id") < col("cut"))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          when(u < "cccccccc", "train")
            .when(u < "e6666666", "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },

    // TEMPERATURE (α=0.5) mixture re-sampling — the standard
    // multilingual/multi-domain re-balancing recipe: target weight
    // w_s ∝ n_s^α flattens the domain distribution (α=1 keeps it,
    // α=0 is uniform), per-domain keep fraction = min(1, T·w_s/n_s)
    // for a half-corpus budget, membership decided by a deterministic
    // per-doc uniform draw (Knuth multiplicative hash — exact integer
    // arithmetic on both engines; sqrt not pow, because sqrt is
    // IEEE-correctly-rounded everywhere and pow's last ulp is
    // platform-library-dependent). Scale: two tiny aggregates + one
    // broadcast join; the corpus is scanned twice, never shuffled.
    "q186_temperature_mixture" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          // doc_id is reduced mod 2^31 BEFORE the Knuth multiply so the
          // product (< 2^31 × 2654435761 ≈ 5.7e18) stays inside Int64:
          // unmasked, Spark would wrap silently past doc_id ≈ 3.47e9
          // while DuckDB raises on BIGINT overflow — engine and oracle
          // would diverge exactly at the scale this query targets
          ((((col("doc_id") % 2147483648L) * 2654435761L) % 4294967296L)
            .cast(DoubleType) / 4294967296.0).as("u"))
      val counts = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum(sqrt(col("n_docs"))).as("z"),
        sum(col("n_docs")).as("n_total"))
      val plan = counts.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          (sqrt(col("n_docs")) / col("z")).as("w"),
          least(lit(1.0), lit(0.5) * col("n_total") *
            (sqrt(col("n_docs")) / col("z")) / col("n_docs")).as("frac"))
      docs.join(broadcast(plan), "source")
        .groupBy(col("source"), col("n_docs"), col("w"), col("frac"))
        .agg(sum(when(col("u") < col("frac"), 1L).otherwise(0L))
          .as("n_sampled"))
        .select(col("source"), col("n_docs"),
          round(col("w"), 6).as("weight"),
          round(col("frac"), 6).as("keep_frac"), col("n_sampled"))
        .orderBy(col("source"))
    },

    // Deterministic train/val/test split (80/10/10): a salted md5 maps
    // every doc to a stable uniform draw; thresholds on the 8-hex-char
    // prefix partition the unit interval. Emits the assignment — the
    // production write is partitionBy(split).
    "q132_train_split" -> { (s, dir) =>
      val u = substring(md5(concat(lit("split"),
        col("doc_id").cast(StringType)).cast(BinaryType)), 1, 8)
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          when(u < "cccccccc", "train")
            .when(u < "e6666666", "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },

    // Corpus heavy hitters — exact frequent-token census via a
    // Misra-Gries sketch (functions/HeavyHitters.scala) in the classic
    // 2-pass sketch-then-verify layout. Pass 1 reduces the whole token
    // stream to ONE 256-counter sketch (constant memory per partition,
    // mergeable partial -> final, so no shuffle carries per-token
    // rows); its candidate list is guaranteed to contain every token
    // with true frequency > n/257. Pass 2 broadcast-joins the tiny
    // candidate set back onto the token stream and counts EXACTLY, so
    // only candidate tokens reach the second aggregation and the
    // published counts have zero sketch error. At 100 TB the
    // alternative — a full groupBy over every distinct token just to
    // keep the top handful — shuffles the whole vocabulary; this plan
    // shuffles 256 strings plus the exact counts of ~30 survivors.
    // Threshold n/200 (inside the n/257 guarantee, so the sketch
    // provably loses nothing; HeavyHittersSpec proves the bound).
    "q206_heavy_hitters" -> { (s, dir) =>
      val toks = Tables.df(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
      // total token count rides the SAME pass as the sketch, so the
      // corpus is scanned exactly twice (sketch+count, then the
      // candidate-restricted exact recount) — n reaches the final
      // filter on the candidate rows themselves, no third scan
      val cands = toks
        .agg(graft.functions.MisraGriesSketch.misraGries(col("tok"), 256)
          .as("sketch"), count(lit(1)).as("n"))
        .select(col("n"), explode(col("sketch")).as("c"))
        .select(col("c.token").as("cand"), col("n"))
      toks.join(broadcast(cands), col("tok") === col("cand"))
        .groupBy(col("tok"), col("n")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") * 200 > col("n"))
        .select(col("tok"), col("freq"))
        .orderBy(col("freq").desc, col("tok"))
    }
  )

  private val tokSql = "string_split(text, ' ')"

  override def oracle: Map[String, String] = Map(
    "q206_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tot AS (SELECT count(*) AS n FROM toks)
        |SELECT tok, count(*) AS freq FROM toks, tot
        |GROUP BY tok, n HAVING count(*) * 200 > n
        |ORDER BY freq DESC, tok""".stripMargin,
    "q163_sequence_packing" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    md5('pack' || CAST(doc_id AS VARCHAR)) AS h,
        |    CAST((strpos('0123456789abcdef',
        |      substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 4
        |      AS BIGINT) AS shard
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, shard, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard
        |      ORDER BY h, doc_id) - n_tokens, 0) AS start_tok
        |  FROM d)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(start_tok // 2048 AS BIGINT) AS seq_id,
        |  CAST(start_tok % 2048 AS BIGINT) AS seq_offset
        |FROM p ORDER BY shard, seq_id, seq_offset, doc_id""".stripMargin,
    "q162_incremental_dedup" ->
      """WITH cut AS (SELECT CAST(max(doc_id) - 100 AS BIGINT) AS cut
        |             FROM documents),
        |d AS (SELECT doc_id,
        |        list_distinct(string_split(text, ' ')) AS tok,
        |        md5(array_to_string(
        |          list_sort(list_distinct(string_split(text, ' '))), ' '))
        |          AS fp
        |      FROM documents),
        |b AS (SELECT d.* FROM d, cut WHERE doc_id >= cut),
        |c AS (SELECT d.* FROM d, cut WHERE doc_id < cut)
        |SELECT b.doc_id,
        |  EXISTS (SELECT 1 FROM c WHERE c.fp = b.fp) AS exact_dup,
        |  EXISTS (SELECT 1 FROM c
        |          WHERE CAST(len(list_intersect(b.tok, c.tok)) AS DOUBLE)
        |              / CAST(len(list_distinct(b.tok || c.tok)) AS DOUBLE)
        |              >= 0.9) AS near_dup,
        |  NOT (EXISTS (SELECT 1 FROM c WHERE c.fp = b.fp)
        |    OR EXISTS (SELECT 1 FROM c
        |         WHERE CAST(len(list_intersect(b.tok, c.tok)) AS DOUBLE)
        |             / CAST(len(list_distinct(b.tok || c.tok)) AS DOUBLE)
        |             >= 0.9)) AS keep
        |FROM b ORDER BY b.doc_id""".stripMargin,
    "q149_curation" ->
      s"""WITH cut AS (SELECT CAST(max(doc_id) - 200 AS BIGINT) AS cut
         |             FROM documents),
         |quality AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE len($tokSql) >= 40),
         |deduped AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (
         |      PARTITION BY md5(array_to_string(list_sort(
         |        list_distinct($tokSql)), ' '))
         |      ORDER BY doc_id) AS rn
         |    FROM quality) WHERE rn = 1),
         |d AS (SELECT doc_id, $tokSql AS tok FROM documents
         |      WHERE len($tokSql) >= 4),
         |idx AS (SELECT doc_id, tok, unnest(range(1, len(tok) - 2)) AS i
         |        FROM d),
         |grams AS (SELECT DISTINCT doc_id,
         |            array_to_string(tok[i:i+3], ' ') AS g FROM idx),
         |bench AS (SELECT DISTINCT g FROM grams, cut WHERE doc_id >= cut),
         |contaminated AS (
         |  SELECT c.doc_id FROM grams c JOIN bench b USING (g), cut
         |  WHERE c.doc_id < cut
         |  GROUP BY c.doc_id HAVING count(*) >= 3)
         |SELECT doc_id,
         |  CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
         |         < 'cccccccc' THEN 'train'
         |       WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
         |         < 'e6666666' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM deduped, cut
         |WHERE doc_id < cut
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |ORDER BY doc_id""".stripMargin,
    "q131_repetition" ->
      s"""WITH d AS (SELECT doc_id, $tokSql AS tok FROM documents
         |           WHERE len($tokSql) >= 3),
         |g AS (SELECT doc_id, tok,
         |        [array_to_string(tok[i:i+2], ' ')
         |         FOR i IN range(1, len(tok) - 1)] AS g3 FROM d),
         |base AS (SELECT doc_id, CAST(len(g3) AS BIGINT) AS n_grams,
         |           CAST(len(list_distinct(g3)) AS BIGINT) AS n_uniq_grams,
         |           unnest(tok) AS term FROM g),
         |tf AS (SELECT doc_id, n_grams, n_uniq_grams, term,
         |         count(*) AS tf FROM base GROUP BY 1, 2, 3, 4)
         |SELECT doc_id, n_grams, n_uniq_grams,
         |  round(1.0 - n_uniq_grams / CAST(n_grams AS DOUBLE), 6)
         |    AS rep_ratio,
         |  round(max(tf) / CAST(sum(tf) AS DOUBLE), 6) AS top_tok_share
         |FROM tf GROUP BY doc_id, n_grams, n_uniq_grams
         |ORDER BY doc_id""".stripMargin,
    "q186_temperature_mixture" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
        |      AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source),
        |t AS (SELECT sum(sqrt(n_docs)) AS z, sum(n_docs) AS n_total
        |      FROM c),
        |p AS (SELECT source, n_docs, sqrt(n_docs) / z AS w,
        |    least(1.0, 0.5 * n_total * (sqrt(n_docs) / z) / n_docs)
        |      AS frac
        |  FROM c, t)
        |SELECT p.source, p.n_docs, round(p.w, 6) AS weight,
        |  round(p.frac, 6) AS keep_frac,
        |  CAST(sum(CASE WHEN d.u < p.frac THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sampled
        |FROM d JOIN p ON d.source = p.source
        |GROUP BY p.source, p.n_docs, p.w, p.frac
        |ORDER BY p.source""".stripMargin,
    "q132_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         < 'cccccccc' THEN 'train'
        |       WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
