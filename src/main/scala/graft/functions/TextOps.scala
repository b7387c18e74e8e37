package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis Column builders for the LLM-data-pipeline operators
  * (tokenize, language-ID, quality scoring, fingerprinting, MinHash).
  *
  * All pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * partition-parallel, no UDFs, no driver materialization: the shapes
  * hold unchanged on a 1000-executor cluster.
  */
object TextOps {

  /** Whitespace tokenization (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def uniqueTokens(text: Column): Column = array_distinct(tokens(text))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small so the DuckDB oracle can mirror them. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ein", "ist"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Count of distinct tokens that appear in `words`. */
  def langScore(text: Column, words: Seq[String]): Column =
    size(array_intersect(uniqueTokens(text),
      array(words.map(lit): _*))).cast(LongType)

  /** Predicted language: argmax of stopword scores, ties broken by the
    * declared language order. */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, ws) => l -> langScore(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, sc), els) =>
      when(sc === best && sc > 0, l).otherwise(els)
    }
  }

  /** Fraction of tokens that are (English) stopwords — a quality signal. */
  def stopRatio(text: Column): Column = {
    val stops = array(stopwords.head._2.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t)))
      .cast(DoubleType) / size(tokens(text))
  }

  /** Mean token length, exactly: (chars - separators) / n_tokens. */
  def avgWordLen(text: Column): Column =
    (length(text) - (size(tokens(text)) - 1)).cast(DoubleType) /
      size(tokens(text))

  /** Order-insensitive bag-of-words document fingerprint (near-dup key). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(uniqueTokens(text)), " ").cast(BinaryType))

  /** MinHash signature over the distinct token set — fused native
    * expression (one pass computes all k slots via double hashing; see
    * MinHashSignatureExpr). Mirrors the classic shingle→minhash
    * construction; the reference has no built-in equivalent. */
  def minhashSignature(text: Column, k: Int): Column =
    MinHashSignatureExpr.minhashSignature(uniqueTokens(text), k)

  /** LSH band key: hash of `r` consecutive signature slots (band `b`). */
  def bandHash(sig: Column, b: Int, r: Int): Column = {
    val slots = (0 until r).map(j => element_at(sig, b * r + j + 1))
    xxhash64((lit(b) +: slots): _*)
  }

  /** All LSH band keys at once: fused signature + per-band fold (see
    * MinHashBandsExpr) — one expression call per document where the
    * bandHash composition generated bands×rows element_at calls. */
  def minhashBands(text: Column, bands: Int, rows: Int): Column =
    MinHashSignatureExpr.minhashBands(uniqueTokens(text), bands, rows)

  /** Exact token-set Jaccard similarity of two token arrays — fused
    * single-pass native expression (see JaccardSim; replaces the
    * array_intersect/array_union composition that allocated two arrays
    * per evaluation on the million-pair LSH verify path). */
  def jaccard(tokA: Column, tokB: Column): Column =
    JaccardSim.jaccardSim(tokA, tokB)

  /** Sorted 64-bit token-hash set — hashed+sorted ONCE per document so
    * the pairwise verify (run once per candidate pair, millions per
    * batch) is a primitive-long merge instead of a string hash-set
    * build. Pair with [[jaccardHashed]]. */
  def tokenHashSet(text: Column): Column =
    array_sort(transform(uniqueTokens(text), t => xxhash64(t)))

  /** Jaccard over two [[tokenHashSet]] columns (see JaccardSortedLongs:
    * equals string-set jaccard modulo 64-bit collisions). */
  def jaccardHashed(hashA: Column, hashB: Column): Column =
    JaccardSim.jaccardSortedLongsCol(hashA, hashB)
}
