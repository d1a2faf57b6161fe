/**
 * Native text-pipeline expressions: `graft_simhash`, `graft_hamming_hex`,
 * `graft_minhash`, `graft_winnow`.
 */
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_simhash(text)` — 64-bit SimHash document fingerprint over
 * lower-cased whitespace tokens, returned as a 16-char lowercase hex
 * string. Near-identical documents get bitwise-close fingerprints, so
 * hamming distance (or banded equality on hex substrings) finds near-dups
 * with a single shuffle on the fingerprint.
 *
 * Exact bit semantics (chosen to be reproducible in plain SQL for the
 * oracle): for each token, take md5 hex; hex digit d (0..15), bit k
 * (0..3) contributes +1 if `(digit >> k) & 1 = 1` else -1 to counter
 * (d,k); output digit d = sum over k of `(counter > 0) << k`.
 *
 * Tokenization pins the same Spark-builtin semantics as every other
 * native text expression here ([[WordShingleHashes]], [[MarkerHits]],
 * [[RepetitionStats]]): `split(trim(lower(text)), "\s+")` with Spark
 * `trim` (U+0020 only — tab/newline edges survive) and `split`'s default
 * limit -1 (edge whitespace yields empty tokens, which contribute their
 * md5("") votes exactly as the SQL mirror's `list_transform` does).
 *
 * One md5 per token per document (the SQL-mirror formulation recomputes it
 * per bit; this native expression is the production path).
 */
case class SimHash64(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_simhash"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(SimHash64.compute(input.asInstanceOf[UTF8String]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(org.apache.spark.sql.graft.SimHash64.compute($c))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  private val HEX = "0123456789abcdef"

  /** Test/driver convenience overload. */
  def compute(text: String): String = compute(UTF8String.fromString(text))

  def compute(input: UTF8String): String = {
    // UTF8String.toLowerCase / .trim are the same methods Spark's
    // Lower / StringTrim evaluate; split(_, -1) matches StringSplit's
    // default limit. Empty edge tokens are NOT skipped — they vote with
    // md5(""), matching the oracle's list_transform over every token.
    val tokens = input.toLowerCase.trim.toString.split("\\s+", -1)
    val counters = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      md.reset()
      val bytes = md.digest(tok.getBytes("UTF-8"))
      var d = 0
      while (d < 16) {
        val digit = if ((d & 1) == 0) (bytes(d >> 1) >> 4) & 0xF else bytes(d >> 1) & 0xF
        var k = 0
        while (k < 4) {
          counters(d * 4 + k) += (if (((digit >> k) & 1) == 1) 1 else -1)
          k += 1
        }
        d += 1
      }
      t += 1
    }
    val sb = new java.lang.StringBuilder(16)
    var d = 0
    while (d < 16) {
      var v = 0
      var k = 0
      while (k < 4) {
        if (counters(d * 4 + k) > 0) v |= (1 << k)
        k += 1
      }
      sb.append(HEX.charAt(v))
      d += 1
    }
    sb.toString
  }

  /**
   * Hamming distance between two hex fingerprints (driver/SQL helper).
   * Case-insensitive; a non-hex digit or a missing digit (unequal lengths)
   * counts as a full 4-bit mismatch, so malformed input inflates distance
   * instead of faking similarity.
   */
  def hamming(a: String, b: String): Int = {
    def digit(s: String, i: Int): Int =
      if (i < s.length) Character.digit(s.charAt(i), 16) else -1
    var dist = 0
    var i = 0
    val len = math.max(a.length, b.length)
    while (i < len) {
      val da = digit(a, i)
      val db = digit(b, i)
      dist += (if (da < 0 || db < 0) 4 else java.lang.Integer.bitCount(da ^ db))
      i += 1
    }
    dist
  }
}

/**
 * `graft_minhash(shingles, numHashes)` — MinHash signature of a shingle
 * set in ONE hash pass per shingle. Two independent xxhash64 values (h1,
 * h2) per element generate the whole family g_i = h1 + i*h2
 * (Kirsch-Mitzenmacher double hashing; h2 forced odd for full period mod
 * 2^64), so computing all `numHashes` minima costs 2 hashes + numHashes
 * adds per shingle — versus one full hash pass per signature position in
 * the higher-order-function formulation (64 aggregate folds in the
 * previous `Dedup.minhashSignature`). Downstream LSH correctness does not
 * depend on the hash family (candidates are exact-verified); only recall
 * does, and double hashing is the standard family for it.
 *
 * Accepts either raw `array<string>` shingles or pre-hashed
 * `array<long>` shingle keys (the `graft_word_shingles` output): for
 * longs, (h1, h2) derive from two seeded `XXH64.hashLong` calls instead
 * of byte-range hashes — same family, no string round-trip.
 */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(numHashes > 0, "numHashes must be positive")

  private def longInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def prettyName: String = "graft_minhash"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(StringType), ArrayType(LongType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val isLong = longInput
    val n = input.numElements()
    var j = 0
    while (j < n) {
      if (!input.isNullAt(j)) {
        var h1 = 0L
        var h2 = 0L
        if (isLong) {
          val v = input.getLong(j)
          h1 = XXH64.hashLong(v, 42L)
          h2 = XXH64.hashLong(v, 0x9e3779b97f4a7c15L) | 1L
        } else {
          val s = input.getUTF8String(j)
          h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          h2 = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9e3779b97f4a7c15L) | 1L
        }
        var g = h1
        var i = 0
        while (i < numHashes) {
          if (g < mins(i)) mins(i) = g
          g += h2
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `graft_winnow(text, k, w)` — winnowing document fingerprints (Schleimer
 * et al.): Karp-Rabin rolling hash of every character k-gram of the
 * whitespace-normalized lower-cased text (codepoints, base 257, mod
 * 1e9+7 — reproducible in integer SQL for the oracle), then the minimum
 * of each sliding window of `w` gram hashes, deduplicated in first-seen
 * order. One pass over the characters with a monotonic deque: O(chars)
 * total versus one md5 digest per character in the previous builtin
 * formulation (TextOps history). Texts shorter than k hash to a single
 * whole-text gram; gram counts shorter than w yield one window.
 */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(k > 0 && w > 0, "k and w must be positive")

  override def prettyName: String = "graft_winnow"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val M = 1000000007L
  private val B = 257L
  // B^(k-1) mod M, for removing the outgoing character of the window
  private val pow: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p = p * B % M; i += 1 }
    p
  }

  def compute(input: UTF8String): ArrayData = {
    // normalize: lower-case, any whitespace run -> single space
    val raw = input.toString.toLowerCase(java.util.Locale.ROOT)
    val norm = raw.replaceAll("\\s+", " ")
    // codepoints (not UTF-16 units) so the SQL mirror's per-character
    // unicode() semantics match beyond the BMP
    val cps = norm.codePoints().toArray
    val n = cps.length
    if (n < k) {
      // whole text as the single gram
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + cps(i)) % M; i += 1 }
      return new GenericArrayData(Array(h))
    }
    val nGrams = n - k + 1
    // rolling gram hashes + sliding-window minimum via monotonic deque
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val dqIdx = new Array[Int](nGrams)
    val dqVal = new Array[Long](nGrams)
    var head = 0
    var tail = 0 // deque is dqIdx/dqVal[head until tail], values increasing
    var h = 0L
    var i = 0
    while (i < n) {
      // evict the outgoing character BEFORE the multiply-add, while its
      // weight is still B^(k-1)
      if (i >= k) h = (h + M - cps(i - k) * pow % M) % M
      h = (h * B + cps(i)) % M
      if (i >= k - 1) {
        val g = i - (k - 1) // gram index
        // drop larger-or-equal tail values (keep FIRST min on ties ->
        // strict <, matching list_min's first-minimum determinism)
        while (tail > head && dqVal(tail - 1) > h) tail -= 1
        dqIdx(tail) = g
        dqVal(tail) = h
        tail += 1
        if (dqIdx(head) <= g - w) head += 1
        // window [g-w+1, g] complete once g >= w-1; also emit the single
        // clamped window when there are fewer than w grams in total
        if (g >= w - 1 || g == nGrams - 1) out.add(dqVal(head))
      }
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `graft_word_shingles(text, n)` — DISTINCT 64-bit hashes of the word
 * n-gram shingles of `text`, without ever materializing a gram string:
 * tokenize with the EXACT semantics of `TextOps.words` =
 * `split(trim(lower(text)), "\\s+")` — Spark `lower`/`trim` (trim strips
 * U+0020 only, NOT tab/newline) and Spark `split` with its default
 * limit -1 (leading/trailing empty tokens are kept) — then xxhash64
 * each word once and chain the n word hashes of each gram through
 * seeded `XXH64.hashLong` (order-dependent). Replicating the builtins
 * exactly (rather than Java `String.trim`/2-arg `split`) keeps the
 * hash<->string bijection intact for texts with leading/trailing
 * tab/newline whitespace. Texts shorter than n words produce the single
 * whole-text shingle hash, mirroring `Dedup.shingles`'s
 * short-document rule.
 *
 * Word-equality is collision-equivalent to string-shingle equality:
 * words cannot contain whitespace, so the " "-joined gram string is in
 * bijection with the word sequence; two grams hash equal iff their word
 * sequences match (modulo ~2^-64 hash collisions, the same model the
 * pairwise operators already accept when joining on xxhash64 keys).
 * Replaces the builtin-composed `array_join(slice(words))` construction
 * whose per-gram string/array allocation dominated shingle-heavy
 * operators (measured 6.8s of an 11s decontamination+Jaccard pass at
 * sf0.1).
 */
case class WordShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(n > 0, "n must be positive")

  override def prettyName: String = "graft_word_shingles"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val SEED_WORD = 42L
  private val SEED_GRAM = 0x9e3779b97f4a7c15L

  def compute(input: UTF8String): ArrayData = {
    // UTF8String.toLowerCase / .trim are the same methods Spark's
    // Lower / StringTrim evaluate; split(_, -1) matches StringSplit's
    // default limit (keeps trailing empty tokens).
    val words = input.toLowerCase.trim.toString.split("\\s+", -1)
    val w = words.length
    val wh = new Array[Long](w)
    var i = 0
    while (i < w) {
      val b = words(i).getBytes("UTF-8")
      wh(i) = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, SEED_WORD)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (w < n) {
      var g = SEED_GRAM
      i = 0
      while (i < w) { g = XXH64.hashLong(wh(i), g); i += 1 }
      out.add(g)
    } else {
      var s = 0
      while (s <= w - n) {
        var g = SEED_GRAM
        var j = 0
        while (j < n) { g = XXH64.hashLong(wh(s + j), g); j += 1 }
        out.add(g)
        s += 1
      }
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingleHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `graft_word_shingle_seq(text, n)` — the word-n-gram hash SEQUENCE of a
 * document, in position order and WITHOUT deduplication (one element per
 * n-gram start position; a document shorter than n words yields its
 * single whole-document hash). Same tokenizer and same XXH64 hashing as
 * [[WordShingleHashes]] — that expression's LinkedHashSet dedup serves
 * set-similarity (Jaccard / MinHash); this positional variant serves
 * SPAN mining, where two documents sharing a copied passage show up as
 * a run of equal hashes at consecutive positions with a constant
 * position offset ([[graft.operators.Dedup.repeatedSpans]]).
 */
case class WordShingleSeq(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(n > 0, "n must be positive")

  override def prettyName: String = "graft_word_shingle_seq"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val SEED_WORD = 42L
  private val SEED_GRAM = 0x9e3779b97f4a7c15L

  def compute(input: UTF8String): ArrayData = {
    val words = input.toLowerCase.trim.toString.split("\\s+", -1)
    val w = words.length
    val wh = new Array[Long](w)
    var i = 0
    while (i < w) {
      val b = words(i).getBytes("UTF-8")
      wh(i) = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, SEED_WORD)
      i += 1
    }
    if (w < n) {
      var g = SEED_GRAM
      i = 0
      while (i < w) { g = XXH64.hashLong(wh(i), g); i += 1 }
      new GenericArrayData(Array(g))
    } else {
      val out = new Array[Long](w - n + 1)
      var s = 0
      while (s <= w - n) {
        var g = SEED_GRAM
        var j = 0
        while (j < n) { g = XXH64.hashLong(wh(s + j), g); j += 1 }
        out(s) = g
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingleSeq", this, classOf[WordShingleSeq].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_hamming_hex(a, b)` — bitwise hamming distance of two hex strings. */
case class HammingHex(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_hamming_hex"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SimHash64.hamming(a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.SimHash64.hamming($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * `graft_fold_accents(text)` — strip diacritics: NFD-decompose, drop
 * combining marks (Unicode categories Mn/Me/Mc), NFC-recompose. Maps
 * á→a, é→e, ñ→n, ü→u, ç→c etc. while leaving non-Latin scripts and
 * base punctuation untouched — the standard text-normalization step
 * before tokenization/dedup so that accent variants of the same word
 * collapse. Pure-ASCII inputs short-circuit without allocating (the
 * overwhelmingly common case in web corpora).
 *
 * Matches DuckDB's `strip_accents` (utf8proc) on Latin diacritics —
 * both reduce to "remove combining marks after canonical
 * decomposition" — which is what makes the operator oracle-checkable.
 */
/**
 * `graft_normalize_unicode(text, form)` — Unicode normalization to a
 * constant form (NFC / NFD / NFKC / NFKD) via `java.text.Normalizer`.
 * The canonicalization step BEFORE any hash-keyed text operator: two
 * crawls of the same page often differ only in composed vs decomposed
 * accents (café as U+00E9 vs e+U+0301), which would defeat exact and
 * normalized dedup alike. ASCII fast path skips the Normalizer call
 * (the common case for web English). NFC matches DuckDB/utf8proc
 * `nfc_normalize`, which is what makes the operator oracle-checkable.
 */
case class NormalizeUnicode(child: Expression, form: String)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form must be one of NFC, NFD, NFKC, NFKD, got $form")

  override def prettyName: String = "graft_normalize_unicode"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val f: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  def compute(input: UTF8String): UTF8String = {
    // pure-ASCII strings are normalization-invariant in every form
    val n = input.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if ((input.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(input.toString, f))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizeUnicode", this, classOf[NormalizeUnicode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FoldAccents(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_fold_accents"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FoldAccents.fold(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.FoldAccents.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FoldAccents {
  import java.text.Normalizer

  def fold(input: UTF8String): UTF8String = {
    // ASCII fast path: bytes < 0x80 can't carry diacritics
    val nb = input.numBytes()
    val base = input.getBaseObject
    val off = input.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) return input
    val s = input.toString
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var j = 0
    while (j < decomposed.length) {
      val c = decomposed.charAt(j)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK &&
          t != Character.COMBINING_SPACING_MARK) {
        sb.append(c)
      }
      j += 1
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

/**
 * `graft_marker_hits(text, w1, ..., wN)` — exact token-equality counts of
 * N constant marker words over ONE tokenize pass, as `array<long>` in
 * marker order. Tokenization replicates `TextOps.words` exactly (Spark
 * `lower`/`trim`/`split("\s+", -1)` — the same semantics
 * [[WordShingleHashes]] pins), and each token costs one hash-map lookup,
 * so scoring 16 language markers is O(chars + tokens) per document.
 *
 * Replaces per-marker builtin formulations: the padded-split version ran
 * a regexp_replace + split PER MARKER (32 regex passes per document
 * through the 4-language argmax), and the `filter(words(text), eq)`
 * version fell out of whole-stage codegen entirely — higher-order
 * functions are CodegenFallback, evaluated interpreted with per-element
 * boxing.
 */
case class MarkerHits(child: Expression, markers: Seq[String])
  extends UnaryExpression with ImplicitCastInputTypes {

  require(markers.nonEmpty, "at least one marker word is required")

  override def prettyName: String = "graft_marker_hits"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // markers are matched against LOWERCASED tokens, so fold them too —
  // a caller passing 'The' means the word "the", not a guaranteed zero
  @transient private lazy val folded: Array[String] =
    markers.map(_.toLowerCase(java.util.Locale.ROOT)).toArray

  // read-only after construction — the expression instance is shared
  // across concurrently-running tasks in one JVM, so per-call state must
  // stay on the stack
  @transient private lazy val slot: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    folded.zipWithIndex.foreach { case (w, i) =>
      if (!m.containsKey(w)) m.put(w, i)
    }
    m
  }

  def compute(input: UTF8String): ArrayData = {
    val out = new Array[Long](markers.length)
    val words = input.toLowerCase.trim.toString.split("\\s+", -1)
    var i = 0
    while (i < words.length) {
      val s = slot.get(words(i))
      if (s != null) out(s) += 1L
      i += 1
    }
    // a marker listed twice (in any case) mirrors its first slot's count
    var j = 0
    while (j < folded.length) {
      val f = slot.get(folded(j))
      if (f != j) out(j) = out(f)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerHits", this, classOf[MarkerHits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `graft_repetition_stats(text)` — the integer counts behind the
 * Gopher-style repetition signals, in ONE tokenize pass, as
 * `array<long>`:
 *
 *   [0] n_words            whitespace tokens ([[MarkerHits]] semantics)
 *   [1] n_distinct_words
 *   [2] n_2grams           word 2-grams (= max(n_words-1, 0))
 *   [3] top_2gram_count    multiplicity of the most frequent 2-gram
 *   [4] n_3grams
 *   [5] n_distinct_3grams
 *
 * Grams are compared by chained xxhash64 of the token hashes — the
 * collision model (~2^-64) every hash-keyed operator here accepts.
 * Replaces the array-local higher-order formulation
 * (transform/array_sort/zip_with): HOFs are CodegenFallback — evaluated
 * interpreted, boxing every element — and the sort made the top-gram
 * count O(n log n) where one counting pass is O(n).
 */
case class RepetitionStats(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_repetition_stats"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val SEED_WORD = 42L

  def compute(input: UTF8String): ArrayData = {
    val words = input.toLowerCase.trim.toString.split("\\s+", -1)
    val n = words.length
    val wh = new Array[Long](n)
    val distinctWords = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      val b = words(i).getBytes("UTF-8")
      wh(i) = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, SEED_WORD)
      distinctWords.add(words(i))
      i += 1
    }
    val g2counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    var top2 = 0L
    i = 0
    while (i + 1 < n) {
      val g = XXH64.hashLong(wh(i + 1), wh(i))
      val c = g2counts.merge(g, 1L, (a, b) => a + b)
      if (c > top2) top2 = c
      i += 1
    }
    val g3set = new java.util.HashSet[java.lang.Long]()
    i = 0
    while (i + 2 < n) {
      g3set.add(XXH64.hashLong(wh(i + 2), XXH64.hashLong(wh(i + 1), wh(i))))
      i += 1
    }
    val n2 = math.max(n - 1, 0).toLong
    val n3 = math.max(n - 2, 0).toLong
    new GenericArrayData(Array[Long](
      n.toLong, distinctWords.size.toLong, n2, top2, n3, g3set.size.toLong))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `graft_hashed_bow_score(text, weights)` — linear
 * hashed-bag-of-words document score: each token hashes to a slot
 * `md5_32(token) mod |weights|` (the hashing trick — first 4 md5 bytes
 * big-endian, unsigned) and contributes its slot's weight; the score is
 * the sequential sum over tokens in document order. This is the
 * fastText-/CCNet-style linear quality classifier inference step with
 * the trained weight vector frozen into the plan — scoring a 100 TB
 * corpus is then a map-only pass with no model lookup join.
 *
 * Tokenization pins the same Spark-builtin semantics as every other
 * native text expression here ([[SimHash64]], [[MarkerHits]],
 * [[RepetitionStats]]): `split(trim(lower(text)), "\s+")` with Spark
 * `trim` (U+0020 only) and split limit -1 (edge whitespace yields empty
 * tokens, which score like any token — md5("") has a slot too, matching
 * the SQL mirror exactly).
 *
 * md5 (not xxhash64) so the slot assignment is reproducible in plain
 * SQL for the oracle, like [[SimHash64]]; one md5 per token.
 * Integer-valued weights make the double sum exact and
 * order-independent — recommended for cross-engine comparisons
 * (quantized weights are standard for classifier shipping anyway).
 */
case class HashedBowScore(child: Expression, weights: Seq[Double])
  extends UnaryExpression with ImplicitCastInputTypes {

  require(weights.nonEmpty, "weights must be non-empty")

  override def prettyName: String = "graft_hashed_bow_score"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // read-only after construction (the expression instance is shared
  // across concurrent tasks); the Seq is materialized to a primitive
  // array once so the token loop never boxes
  @transient private lazy val w: Array[Double] = weights.toArray

  def compute(input: UTF8String): Double = {
    val tokens = input.toLowerCase.trim.toString.split("\\s+", -1)
    val dim = w.length
    val md = MessageDigest.getInstance("MD5")
    var sum = 0.0
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val b = md.digest(tokens(t).getBytes("UTF-8"))
      val v = ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) |
        ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
      sum += w((v % dim).toInt)
      t += 1
    }
    sum
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bowScore", this, classOf[HashedBowScore].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `graft_filter_lines(text, minWords, requirePunct, m1...mN)` — C4-style
 * line-level document cleaning in ONE pass: split the document on
 * newlines, keep lines with at least `minWords` whitespace-separated
 * words that (when `requirePunct`) end in terminal punctuation
 * (`.` `!` `?` `"`) and contain none of the constant `dropMarkers`
 * substrings (matched case-insensitively — the boilerplate phrase list:
 * "lorem ipsum", "javascript", cookie banners). Returns
 * STRUCT<text (kept lines re-joined by newline), n_lines, n_kept>, so
 * callers can both take the cleaned text and filter on the kept ratio.
 *
 * Line-level rules are the ONLY per-document way to salvage a page
 * whose body is fine but whose template lines are junk — document-level
 * quality scores would drop or keep the whole page. One linear pass per
 * document, zero shuffle; rules frozen into the plan as literals.
 *
 * Exact semantics (reproducible in plain SQL for the oracle): lines =
 * `split(text, '\n', -1)`; a line's word count is its number of maximal
 * runs of non-whitespace (Java `\s`) characters; terminal punctuation
 * tests the line's LAST character verbatim (no trailing-space
 * forgiveness — a trailing space fails the check, as in C4); marker
 * matching is substring containment on the lowercased line.
 */
case class FilterLines(
    child: Expression,
    minWords: Int,
    requirePunct: Boolean,
    dropMarkers: Seq[String])
  extends UnaryExpression with ImplicitCastInputTypes {

  require(minWords >= 0, "minWords must be >= 0")

  override def prettyName: String = "graft_filter_lines"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false)))

  @transient private lazy val markersLower: Array[String] =
    dropMarkers.map(_.toLowerCase(java.util.Locale.ROOT)).toArray

  private def wordCount(line: String): Int = {
    var n = 0
    var inWord = false
    var i = 0
    while (i < line.length) {
      val ws = Character.isWhitespace(line.charAt(i))
      if (!ws && !inWord) n += 1
      inWord = !ws
      i += 1
    }
    n
  }

  def compute(input: UTF8String): InternalRow = {
    val lines = input.toString.split("\n", -1)
    val kept = new java.lang.StringBuilder
    var nKept = 0
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      var ok = wordCount(line) >= minWords
      if (ok && requirePunct) {
        ok = line.nonEmpty && {
          val c = line.charAt(line.length - 1)
          c == '.' || c == '!' || c == '?' || c == '"'
        }
      }
      if (ok && markersLower.nonEmpty) {
        val lower = line.toLowerCase(java.util.Locale.ROOT)
        var m = 0
        while (ok && m < markersLower.length) {
          if (lower.contains(markersLower(m))) ok = false
          m += 1
        }
      }
      if (ok) {
        if (nKept > 0) kept.append('\n')
        kept.append(line)
        nKept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kept.toString), lines.length, nKept))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("filterLines", this, classOf[FilterLines].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `graft_drop_words(text, positions)` — removes the words of `text` (under
 * the pinned lower/trim/split tokenizer) whose 0-based positions appear in
 * the SORTED-ASCENDING `positions` array, re-joining the survivors with
 * single spaces, as STRUCT<text, n_words, n_dropped>. The cut step of
 * span-level dedup ([[graft.operators.Dedup.dedupSpansRewrite]]): the
 * positions come from a runtime join, so they are a column, not a literal
 * (callers coalesce the join's null to an empty array = drop nothing).
 * Out-of-range positions are ignored; n_dropped counts only positions
 * that named an actual word. Output text is whitespace-normalized and
 * lower-cased, like every token-level operator here.
 */
case class DropWords(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_drop_words"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(IntegerType, containsNull = false))
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))

  def compute(input: UTF8String, positions: ArrayData): InternalRow = {
    val words = input.toLowerCase.trim.toString.split("\\s+", -1)
    val np = positions.numElements()
    val kept = new java.lang.StringBuilder
    var nKept = 0
    var dropped = 0
    var p = 0
    var i = 0
    while (i < words.length) {
      // positions sorted ascending: advance the pointer past stale entries
      while (p < np && positions.getInt(p) < i) p += 1
      if (p < np && positions.getInt(p) == i) {
        dropped += 1
        p += 1
      } else {
        // join on the KEPT-word count, not buffer length: an empty token
        // (non-space whitespace edge under the pinned tokenizer) must
        // still claim its separator, or the output would not re-tokenize
        // to the kept word sequence (the NativeParitySuite property)
        if (nKept > 0) kept.append(' ')
        kept.append(words(i))
        nKept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kept.toString), words.length, dropped))
  }

  override def nullSafeEval(t: Any, ps: Any): Any =
    compute(t.asInstanceOf[UTF8String], ps.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dropWords", this, classOf[DropWords].getName)
    defineCodeGen(ctx, ev, (t, ps) => s"$ref.compute($t, $ps)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
