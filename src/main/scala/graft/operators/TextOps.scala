package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality metrics, language ID, and content fingerprinting.
 *
 * Everything here composes codegen'd Spark builtins (split / regexp_replace /
 * md5 / higher-order array functions) — no UDFs — so the operators stay
 * inside whole-stage codegen and scale linearly with no shuffle of their
 * own. Formulas deliberately use integer arithmetic and plain (non-regex)
 * separators where possible so results are reproducible bit-for-bit in any
 * ANSI SQL engine (the DuckDB oracles mirror them exactly).
 */
object TextOps {

  /** Lower-cased whitespace tokens. */
  def words(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(words(text))

  /**
   * Content fingerprint: md5 of the whitespace-normalized, lower-cased text.
   * Two documents with the same fingerprint are duplicates up to case and
   * whitespace.
   */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Count of characters of the given regex class (e.g. "[^0-9]" inverted). */
  private def countClass(text: Column, keepClassInverted: String): Column =
    length(regexp_replace(text, keepClassInverted, ""))

  def alphaCount(text: Column): Column = countClass(text, "[^a-zA-Z]")
  def digitCount(text: Column): Column = countClass(text, "[^0-9]")
  def punctCount(text: Column): Column = countClass(text, "[^.,;:!?]")

  /**
   * Number of occurrences of `word` as a standalone token, via plain
   * (non-overlapping) split on " word " over the padded normalized text.
   * Adjacent repeats count once per non-overlapping match — deterministic
   * and mirrored by `len(string_split(...))-1` in the oracle.
   */
  def wordHits(text: Column, word: String): Column = {
    val padded = concat(lit(" "), regexp_replace(lower(text), "\\s+", " "), lit(" "))
    // split's separator is a Java regex: quote so words containing
    // metacharacters ("c++", "a.b") count literally like the oracle's
    // plain string_split
    size(split(padded, lit(java.util.regex.Pattern.quote(s" $word ")))) - 1
  }

  /** Marker stopwords per language for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "las", "que"),
    "fr" -> Seq("le", "la", "les", "des"))

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang).map(w => wordHits(text, w)).reduce(_ + _)

  /**
   * Stopword-count argmax language ID. Ties break in `langMarkers` order;
   * all-zero scores -> "und" (undetermined).
   */
  def languageId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, _) => lang -> langScore(text, lang) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), alt) =>
      when(score === best && best > 0, lit(lang)).otherwise(alt)
    }
  }

  /**
   * BPE-ish subword token count: runs of letters, runs of digits, and
   * individual punctuation each count as one token (the shape a byte-pair
   * vocabulary converges to), over the lower-cased text. A cheap,
   * deterministic stand-in for a real tokenizer's length signal.
   */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /**
   * Winnowing document fingerprints (Schleimer et al.): Karp-Rabin
   * rolling hash of every character k-gram of the normalized text, then
   * the minimum hash of each sliding window of `w` consecutive gram
   * hashes, deduplicated. Guarantees any shared substring of length
   * >= k+w-1 between two documents yields a shared fingerprint — the
   * standard plagiarism/near-dup fingerprinting scheme.
   *
   * Runs as the native `graft_winnow` expression: one integer-arithmetic
   * pass over the characters with a monotonic-deque window minimum —
   * O(chars) total, versus one md5 digest per character in the previous
   * builtin-composed formulation. Base-257 mod-1e9+7 hashes over
   * codepoints keep it reproducible in any integer-SQL engine (the
   * DuckDB oracle mirrors the same arithmetic).
   */
  def withWinnowingFingerprints(
      df: DataFrame,
      textCol: String,
      outCol: String,
      k: Int = 8,
      w: Int = 4): DataFrame =
    df.withColumn(outCol, call_function("graft_winnow", col(textCol), lit(k), lit(w)))

  /**
   * Heuristic quality flag over integer metrics only (reproducible across
   * engines): enough tokens, bounded length, mostly-alphabetic, and a
   * minimal English stopword rate.
   */
  def qualityFlag(text: Column): Column = {
    val nTokens = tokenCount(text)
    val nChars = length(text)
    (nTokens >= 5) && (nChars <= 20000) &&
      (alphaCount(text) * 100 >= nChars * 50) &&
      (langScore(text, "en") * 100 >= nTokens * 2)
  }
}
