package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, shingling, MinHash, SimHash, language ID,
  * quality scoring, fingerprinting. All pure Catalyst column trees
  * (split/transform/aggregate HOFs) — codegen-friendly, no UDFs.
  *
  * Two hash families:
  *  - md5-derived 32-bit hashes (`md5Hash32`): slower, but identical in
  *    any engine with standard md5 — used by the oracle-checked queries;
  *  - xxhash64 (`fastHash64`): Spark-native codegen'd hash for the
  *    production path.
  */
object TextFunctions {

  /** Whitespace word split of normalized text. */
  def words(text: Column): Column =
    split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks each count as one token. */
  def subTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles: `"a b c d"` → `["a b c", "b c d"]` (n=3). */
  def shingles(text: Column, n: Int): Column = {
    val ws = words(text)
    transform(sequence(lit(1), greatest(size(ws) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(ws, i, lit(n))))
  }

  /** 32-bit engine-portable hash: first 8 hex chars of md5(seed:s). */
  def md5Hash32(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 8), 16, 10).cast("long")

  /** Spark-native 64-bit hash (production path). */
  def fastHash64(s: Column, seed: Int): Column = xxhash64(lit(seed), s)

  /** MinHash signature over word `n`-gram shingles: array of `k`
    * minima, one per seeded hash function. */
  def minhashSignature(text: Column, n: Int, k: Int,
      hash: (Column, Int) => Column = md5Hash32): Column = {
    val sh = shingles(text, n)
    array((0 until k).map(seed => array_min(transform(sh, hash(_, seed)))): _*)
  }

  /** LSH band keys from a minhash signature: `bands` strings of
    * `k/bands` signature entries each. */
  def bandKeys(signature: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        concat_ws(",", transform(slice(signature, b * rows + 1, rows),
          _.cast("string"))).as("bucket"))
    }: _*)
  }

  /** SimHash over word hashes: bit b is set iff Σ_w (±1 per word's bit
    * b) ≥ 0. `bits` ≤ 32 with the portable hash. */
  def simhash(text: Column, bits: Int = 32,
      hash: (Column, Int) => Column = md5Hash32): Column = {
    val hashes = transform(words(text), hash(_, 0))
    (0 until bits).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact word-set Jaccard similarity of two texts' n-gram sets. */
  def jaccardShingles(a: Column, b: Column): Column = {
    val (sa, sb) = (array_distinct(a), array_distinct(b))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text
    * (rolling-hash alternative: `fastHash64(normalized)`). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", words(text)))

  // --- language ID + quality -------------------------------------------

  /** Tiny per-language stopword lists (top function words). Public
    * knowledge; enough for the n-gram-heuristic language ID the
    * pipeline needs. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "zu", "den", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"))

  /** Stopword-hit count for one language. */
  def stopwordHits(text: Column, lang: String): Column =
    size(array_intersect(words(text),
      array(stopwords(lang).map(lit): _*)))

  /** Heuristic language ID: argmax of stopword hits, ties broken by
    * language code ascending; no hits at all → 'und'. */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val best = langs.map(l => struct(stopwordHits(text, l).as("hits"),
      lit(l).as("lang"))).reduce((a, b) =>
        when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality heuristics: token count, mean word length, punctuation
    * ratio, English-stopword ratio, and a blended [0,1] score. */
  def qualityFeatures(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val meanLen = length(concat_ws("", words(text))).cast("double") / nTok
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
      .cast("double") / length(text).cast("double")
    val stopRatio = stopwordHits(text, "en").cast("double") / nTok
    struct(nTok.as("n_tokens"), meanLen.as("mean_word_len"),
      punct.as("punct_ratio"), stopRatio.as("stopword_ratio"))
  }
}
