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

  /**
   * Flesch reading-ease score in 1e3 fixed point (milli-points), the
   * classic `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`
   * with the heuristics large-corpus QC actually runs:
   * sentences = runs of `[.!?]`, clamped to >= 1 (headlines and
   * fragments still score); syllables = runs of `[aeiouy]` in the
   * lower-cased text, clamped to >= words (every word carries at least
   * one syllable). All three divisions are integer floor on scaled
   * longs — the score is bit-identical across engines, which is what
   * lets a quality threshold be a portable contract rather than a
   * per-engine tune. NULL on null/wordless input.
   */
  def readabilityMilli(text: Column): Column = {
    // exact long floor-div for non-negative operands, expressed with
    // pmod so it composes over arbitrary Columns (quotients here are
    // << 2^53, so the intermediate double division is exact)
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val w = tokenCount(text).cast("long")
    val s = greatest(regexp_count(text, lit("[.!?]+")).cast("long"), lit(1L))
    val syl = greatest(regexp_count(lower(text), lit("[aeiouy]+")).cast("long"), w)
    when(text.isNotNull && w > 0L,
      lit(206835L) - idiv(lit(1015L) * w, s) - idiv(lit(84600L) * syl, w))
      .cast("long")
  }

  /** Count of characters of the given regex class (e.g. "[^0-9]" inverted). */
  private def countClass(text: Column, keepClassInverted: String): Column =
    length(regexp_replace(text, keepClassInverted, ""))

  def alphaCount(text: Column): Column = countClass(text, "[^a-zA-Z]")
  def digitCount(text: Column): Column = countClass(text, "[^0-9]")
  def punctCount(text: Column): Column = countClass(text, "[^.,;:!?]")

  /**
   * Exact token-equality counts of constant marker words over ONE
   * tokenize pass ([[words]] semantics), as array<long> in marker
   * order — the native `graft_marker_hits` expression
   * ([[org.apache.spark.sql.graft.MarkerHits]]). One hash lookup per
   * token; full whole-stage codegen. The builtin alternatives both
   * lose: a padded-split per marker re-runs regexp_replace + split per
   * marker (32 regex passes/doc through languageId), and
   * `filter(words(text), eq)` is a higher-order function —
   * CodegenFallback, evaluated interpreted with per-element boxing
   * (measured ~4x on the langid bench query).
   */
  def markerHits(text: Column, ws: Seq[String]): Column =
    call_function("graft_marker_hits", (text +: ws.map(lit)): _*)

  /**
   * Number of occurrences of `word` as a standalone token: an exact
   * equality count over [[words]] (adjacent repeats each count).
   */
  def wordHits(text: Column, word: String): Column =
    element_at(markerHits(text, Seq(word)), 1)

  /** Marker stopwords per language for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "las", "que"),
    "fr" -> Seq("le", "la", "les", "des"))

  def langScore(text: Column, lang: String): Column = {
    val ws = langMarkers.toMap.apply(lang)
    val hits = markerHits(text, ws)
    ws.indices.map(i => element_at(hits, i + 1)).reduce(_ + _)
  }

  /**
   * Stopword-count argmax language ID. Ties break in `langMarkers` order;
   * all-zero scores -> "und" (undetermined). All 16 marker counts come
   * from ONE `graft_marker_hits` subtree — every score/comparison
   * references the same expression, which physical subexpression
   * elimination evaluates once per row.
   */
  def languageId(text: Column): Column = {
    val hits = markerHits(text, langMarkers.flatMap(_._2))
    var off = 0
    val scores = langMarkers.map { case (lang, ws) =>
      val s = ws.indices.map(i => element_at(hits, off + i + 1)).reduce(_ + _)
      off += ws.size
      lang -> s
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), alt) =>
      when(score === best && best > 0, lit(lang)).otherwise(alt)
    }
  }

  /**
   * Language ID with a CONFIDENCE margin: the argmax language (exactly
   * [[languageId]]'s pick) plus the best and second-best stopword
   * scores and their difference — the filter signal "how sure was the
   * ID": margin 0 means two languages tied (or nothing matched), and
   * thresholding on it is how a pipeline drops mixed-language or
   * too-short documents instead of trusting a coin-flip label. All 16
   * marker counts still come from ONE `graft_marker_hits` pass.
   */
  def languageConfidence(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withHits = df.select(col(idCol).as("id"), col(textCol).as("__t"))
      .withColumn("__hits", markerHits(col("__t"), langMarkers.flatMap(_._2)))
    var off = 0
    val scores = langMarkers.map { case (lang, ws) =>
      val s = ws.indices.map(i => element_at(col("__hits"), off + i + 1)).reduce(_ + _)
      off += ws.size
      lang -> s
    }
    val arr = sort_array(array(scores.map(_._2): _*), asc = false)
    withHits
      .withColumn("lang_pred", languageId(col("__t")))
      .withColumn("best", element_at(arr, 1).cast("long"))
      .withColumn("second", element_at(arr, 2).cast("long"))
      .withColumn("margin", (element_at(arr, 1) - element_at(arr, 2)).cast("long"))
      .select("id", "lang_pred", "best", "second", "margin")
  }

  /**
   * Paragraph-level language profile — the mixed-language-document
   * detector [[languageId]] alone is blind to: a document that is half
   * English half French argmaxes to ONE label, but its paragraphs
   * don't. Splits on `sepRegex`, IDs each paragraph, and reports per
   * document: paragraph count, number of distinct non-'und' paragraph
   * languages, the majority label (ties to the lexicographically
   * smallest) and its share in ppm (integer division — exact).
   * `n_langs > 1` is the mixed-document flag.
   *
   * Two hash aggregations — (id, lang) counts, then the per-id argmax
   * via `min(struct(-count, lang))` — both partial-aggregable; no
   * window, no per-document buffering, paragraphs never reassemble.
   */
  def paragraphLangProfile(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String): DataFrame = {
    val pred = df
      .select(col(idCol).as("id"),
        explode(split(col(textCol), sepRegex)).as("__para"))
      .select(col("id"), languageId(col("__para")).as("lang_pred"))
    pred.groupBy("id", "lang_pred").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum("c").as("n_paras"),
        sum(when(col("lang_pred") =!= "und", 1L).otherwise(0L)).as("n_langs"),
        min(struct((-col("c")).as("nc"), col("lang_pred").as("l"))).as("m"))
      .select(col("id"), col("n_paras"), col("n_langs"),
        col("m.l").as("major_lang"),
        expr("(-m.nc) * 1000000 DIV n_paras").as("major_share_ppm"))
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

  /** Non-overlapping match count of `pattern` (leftmost-first, the same
   *  semantics as the oracle's `regexp_extract_all`); patterns must stay
   *  within the Java∩RE2 common dialect (no backrefs/lookaround). */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /**
   * Gopher-style repetition/boilerplate signals, per document:
   *  - `n_words` — whitespace token count;
   *  - `dup_word_frac` — fraction of tokens that repeat an earlier token
   *    (1 - distinct/total);
   *  - `dup_3gram_frac` — same over word 3-grams (the classic "repeated
   *    phrase" signal);
   *  - `top_2gram_frac` — share of the document's 2-grams claimed by its
   *    single most frequent 2-gram (boilerplate/chant detector).
   *
   * Scale design: all counts come from ONE pass of the native
   * `graft_repetition_stats` expression
   * ([[org.apache.spark.sql.graft.RepetitionStats]]) — no explode, no
   * shuffle, the corpus streams through map tasks untouched; the
   * fractions are plain codegen'd arithmetic over the count array (the
   * single `__st` subtree is shared by subexpression elimination). The
   * previous array-local higher-order formulation
   * (transform/array_sort/zip_with) computed identical values but HOFs
   * are CodegenFallback — interpreted evaluation, per-element boxing,
   * and an O(n log n) sort where one counting pass suffices.
   */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    def st(i: Int) = element_at(col("__st"), i)
    df.withColumn("__st", call_function("graft_repetition_stats", col(textCol)))
      .withColumn("n_words", st(1))
      .withColumn("dup_word_frac", round(lit(1) - st(2) / st(1), 9))
      .withColumn("dup_3gram_frac", when(st(5) > 0,
          round(lit(1) - st(6) / st(5), 9))
        .otherwise(lit(0.0)))
      .withColumn("top_2gram_frac", when(st(3) > 0,
          round(st(4) / st(3), 9))
        .otherwise(lit(0.0)))
      .drop("__st")
  }

  /**
   * Per-source boilerplate n-grams: word n-grams appearing in at least
   * `num/den` of a source's documents (site footers, navigation chrome,
   * license blurbs — the text a curation pipeline strips before
   * training). The threshold is rational and enforced in integer
   * arithmetic. Returns (source, gram, n_docs, total_docs) — gram as a
   * STRING, because the output is a human-reviewed strip-list.
   *
   * Scale shape, two phases:
   *  1. HASH-ONLY counting: per-doc distinct shingle hashes explode to
   *     (source, hash) counts — one shuffle of longs with map-side
   *     combine; per-source totals broadcast back; survivors of the
   *     threshold are a tiny broadcastable set.
   *  2. String resolution only where needed: documents containing at
   *     least one surviving hash (a broadcast semi-join on hashes) are
   *     re-shingled as strings; each candidate gram re-hashes via the
   *     same `graft_word_shingles` chain (a gram IS its own single
   *     n-word shingle) and joins the surviving set. Gram-string
   *     construction — the dominant cost of the naive one-phase shape,
   *     measured ~2x the whole rest of the operator — thus touches
   *     only boilerplate-bearing documents, typically a small fraction
   *     of the corpus.
   */
  def boilerplateNgrams(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      textCol: String,
      n: Int,
      num: Int,
      den: Int): DataFrame = {
    val docs = df.select(col(sourceCol).as("source"), col(idCol).as("id"),
      col(textCol).as("text"))
    // The per-doc hash arrays feed BOTH the df-count aggregate and the
    // candidate-document probe, and Spark does no cross-branch CSE —
    // uncached, the corpus-wide tokenize+shingle pass re-runs per branch.
    // Cached form is one array<long> row per doc (~8 bytes/token), far
    // smaller than the raw text it replaces in those rescans.
    val hashArrays = docs.select(col("source"), col("id"),
      Dedup.shingleHashes(col("text"), n).as("hs")).cache()
    val hashed = hashArrays.select(col("source"), col("id"),
      explode(col("hs")).as("h"))
    val totals = docs.groupBy("source").agg(count(lit(1)).as("total_docs"))
    // `surviving` (grams above the df threshold — tiny by construction) is
    // likewise referenced twice; cache so the corpus aggregate runs once.
    val surviving = hashed.groupBy("source", "h").agg(count(lit(1)).as("n_docs"))
      .join(broadcast(totals), "source")
      .where(col("n_docs") * den >= col("total_docs") * num)
      .cache()
    val candidateDocs = hashed
      .join(broadcast(surviving.select("source", "h")), Seq("source", "h"), "left_semi")
      .select("source", "id").distinct()
    // Resolve hash -> gram string POSITIONALLY: shingleHashes and shingles
    // both emit distinct entries in first-occurrence order over the same
    // gram sequence, so index i of one is index i of the other (modulo a
    // 2^-64 hash collision, the model every hash join here accepts).
    // Re-hashing the gram STRING instead would silently drop grams whose
    // word sequence has an empty edge token (leading \t / trailing \n
    // documents): the gram string round-trips through trim/split
    // differently than the in-document gram.
    val candidateGrams = docs.join(candidateDocs, Seq("source", "id"), "left_semi")
      .select(col("source"),
        Dedup.shingleHashes(col("text"), n).as("hs"),
        Dedup.shingles(col("text"), n).as("gs"))
      .select(col("source"), col("gs"), posexplode(col("hs")).as(Seq("pos", "h")))
      .select(col("source"), col("h"), element_at(col("gs"), col("pos") + 1).as("gram"))
    candidateGrams.join(broadcast(surviving), Seq("source", "h"))
      .select(col("source"), col("gram"), col("n_docs"), col("total_docs"))
      .distinct()
  }

  /**
   * Top-`k` characteristic terms per document by tf-idf. Scale shape:
   * tokenize+explode, per-(doc, term) counts (one shuffle with map-side
   * combine), document frequencies as a second small aggregate that
   * BROADCASTS back (vocabulary << corpus), then a per-doc window top-k
   * (WindowGroupLimit prunes map-side). Scores are rounded to 6 dp and
   * ranked by (rounded score, term), so the ranking is reproducible
   * across engines — last-ulp `ln` differences sit ~1e-10 below the
   * rounding grain.
   */
  def tfIdfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = df.select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("term"))
    val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("int").as("rk"), col("term"), col("score"))
  }

  /**
   * Top-`k` DISTINCTIVE terms per group (source/language/domain) by
   * corpus lift: `lift = P(term | group) / P(term | corpus)`, in 1e4
   * fixed point — the group-level complement to the per-document
   * [[tfIdfTopTerms]]. High-lift terms are what a source contributes
   * that the rest of the corpus doesn't (jargon, boilerplate, spam
   * vocabulary); a source whose lift profile suddenly shifts between
   * crawls is the cheapest drift alarm that names actual words.
   *
   * All-integer scoring: `lift_fp = (c_gw * T * 10000) DIV (T_g * c_w)`
   * over exact token counts (c_gw = term count in group, T_g = group
   * tokens, c_w = corpus term count, T = corpus tokens) — no floats, so
   * ties and ordering replay bit-for-bit in any engine. `minCount`
   * suppresses the rare-term noise floor (a term seen twice in a small
   * group otherwise tops every lift ranking).
   *
   * Scale shape: one tokenize+explode pass feeds (group, term) counts
   * with map-side combine; corpus-level term counts re-aggregate from
   * the GROUP counts (vocabulary-sized, not corpus-sized) and broadcast
   * back, as do the one-row totals; the final per-group top-k window is
   * WindowGroupLimit-pruned map-side.
   */
  def groupLiftTerms(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(groupCol).as("g"), explode(words(col(textCol))).as("term"))
    val gc = toks.groupBy("g", "term").agg(count(lit(1)).as("c_gw")).cache()
    val groupTot = gc.groupBy("g").agg(sum(col("c_gw")).as("t_g"))
    val termTot = gc.groupBy("term").agg(sum(col("c_gw")).as("c_w"))
    val corpusTot = gc.agg(sum(col("c_gw")).as("t"))
    val scored = gc
      .join(broadcast(termTot), Seq("term"))
      .join(broadcast(groupTot), Seq("g"))
      .crossJoin(broadcast(corpusTot))
      .where(col("c_gw") >= minCount)
      .withColumn("lift_fp", expr("(c_gw * t * 10000L) DIV (t_g * c_w)"))
    val w = Window.partitionBy("g").orderBy(col("lift_fp").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select(col("g"), col("rk"), col("term"), col("c_gw"), col("lift_fp"))
  }

  /**
   * Per-term burstiness: the variance-to-mean ratio of a term's per-
   * document counts, in 1e4 fixed point. VMR ≈ 1 is Poisson scatter
   * (function words); VMR >> 1 means the term CLUMPS — most documents
   * never use it, a few repeat it heavily — the signature of topical
   * terms, and at the extreme, of spam/keyword-stuffed documents.
   * Church & Gale 1995's burstiness, as a corpus-health profile.
   *
   * All-integer: with N = corpus doc count, S = Σc, Q = Σc² over the
   * term's per-doc counts (absent docs contribute c = 0, changing
   * neither sum), sample variance s² = (N·Q − S²)/(N(N−1)) and
   * `vmr_fp = (10000 · (N·Q − S²)) DIV ((N−1) · S)` — exact sums, one
   * floor division, engine-portable ordering.
   *
   * Scale shape: one tokenize+explode to per-(doc, term) counts with
   * map-side combine, one vocabulary-sized re-aggregate, one-row doc
   * count broadcast. Output: (term, n_docs_with, total, vmr_fp).
   */
  def termBurstiness(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("c"))
    val nDocs = broadcast(df.agg(count(lit(1)).as("n")))
    tf.groupBy("term")
      .agg(count(lit(1)).as("n_docs_with"),
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
      .crossJoin(nDocs)
      .select(col("term"), col("n_docs_with"), col("s").as("total"),
        when(col("n") > 1,
          expr("(10000L * (n * q - s * s)) DIV ((n - 1L) * s)"))
          .otherwise(0L).as("vmr_fp"))
  }

  /**
   * Token-budget sequence packing — assign each document a training
   * sequence id and a token offset inside it, the layout step that turns
   * a curated corpus into fixed-length training sequences. Documents are
   * laid out contiguously in a deterministic seedless-shuffled order
   * (md5 of the id, as the sampling operators use) and a document is
   * assigned to the sequence where its first token lands:
   * `seq = floor(tokens_before / budget)`, `offset = tokens_before %
   * budget` — the streaming-concat packing rule, replayable exactly in
   * plain SQL (all-integer arithmetic).
   *
   * Scale design: sequence ids are per-shard (`shardCol` — a language,
   * source, or an explicit shard key), mirroring how real pipelines
   * pack per-worker, and the running token sum inside a shard is a
   * DISTRIBUTED prefix sum (the [[graft.operators.Sampling
   * .distributedCumSum]] pattern over the md5 shuffle order): rows
   * bucket by approximate md5-key ranges, the cumulative window runs
   * per (shard, bucket) — parallel even when one language IS most of
   * the corpus — and per-bucket offsets restore the exact shard-wide
   * sum. Equal md5 keys land in one bucket, so the (md5, id) order
   * composes exactly. Tokens are whitespace tokens ([[words]]).
   */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      budget: Int,
      buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "budget must be positive")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = df.select(col(shardCol).as("shard"), col(idCol).as("id"),
      size(words(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("__ord", md5(col("id").cast("string")))
    val boundsRow = toks.agg(call_function("approx_partition_bounds_str",
      col("__ord"), lit(buckets)).as("bs")).collect()(0)
    val bucketed =
      if (boundsRow.isNullAt(0)) toks.withColumn("__b", lit(0))
      else toks.withColumn("__b", call_function("graft_bucket_index",
        array(boundsRow.getSeq[String](0).map(lit): _*), col("__ord")))
    val wLocal = Window.partitionBy("shard", "__b")
      .orderBy(col("__ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partial = bucketed.withColumn("__pc", sum(col("n_tokens")).over(wLocal))
    // (shard, bucket) totals: a droplet table; offset windows see at
    // most `buckets` rows per shard
    val wOff = Window.partitionBy("shard").orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketed.groupBy("shard", "__b")
      .agg(sum(col("n_tokens")).as("__bw"))
      .withColumn("__off", coalesce(sum(col("__bw")).over(wOff), lit(0L)))
      .select(col("shard"), col("__b"), col("__off"))
    partial.join(offs, Seq("shard", "__b"))
      .withColumn("tokens_before", col("__off") + col("__pc") - col("n_tokens"))
      .select(col("shard"), col("id"), col("n_tokens"),
        expr(s"tokens_before DIV $budget").as("seq_id"), // integer div, not double
        (col("tokens_before") % budget).as("seq_offset"))
  }

  /**
   * Split each document into overlapping token-window chunks (the
   * retrieval/context-window layout step): chunk `i` covers tokens
   * `[i*(chunkTokens-overlap), ...+chunkTokens)` of the normalized
   * token stream, so consecutive chunks share `overlap` tokens. Emits
   * one row per (doc, chunk): (id, chunk_id, n_chunk_tokens, chunk
   * text). All-integer start arithmetic — `chunk_id = start / step` —
   * replayable exactly in any SQL engine.
   *
   * Scale design: chunking is array-local (`sequence` + `slice` inside
   * one projection, then a generator) — zero shuffle; output row count
   * is ~`n_tokens/step` per doc, bounded and predictable. The token
   * array is materialized as its own column first (no CSE inside HOF
   * lambdas).
   */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    df.select(col(idCol).as("id"), words(col(textCol)).as("__w"))
      .withColumn("__chunks",
        transform(sequence(lit(0), size(col("__w")) - 1, lit(step)),
          s => array_join(slice(col("__w"), s + 1, lit(chunkTokens)), " ")))
      .select(col("id"), col("__w"), posexplode(col("__chunks")).as(Seq("chunk_id", "chunk")))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(chunkTokens), size(col("__w")) - col("chunk_id") * step)
          .cast("long").as("n_chunk_tokens"),
        col("chunk"))
  }

  /**
   * Clip each document to its first `maxTokens` whitespace tokens (the
   * sequence-length cap applied before packing/training). Clipping is
   * defined over the NORMALIZED token stream ([[words]]: lower-cased,
   * whitespace-split) and reassembles with single spaces, so the output
   * is engine-reproducible; adds `n_tokens_kept` and a `was_truncated`
   * flag (corpus accounting — silent truncation skews length stats).
   * Array-local codegen'd builtins only: no shuffle, no UDF.
   */
  def truncateToTokens(
      df: DataFrame,
      textCol: String,
      outCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val w = words(col(textCol))
    df.withColumn(outCol, array_join(slice(w, 1, maxTokens), " "))
      .withColumn("n_tokens_kept", least(size(w), lit(maxTokens)).cast("long"))
      .withColumn("was_truncated", size(w) > maxTokens)
  }

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

  /** All word-bigram hashes of a token array, in order, WITH repeats
   *  (contrast `graft_word_shingles`, which dedups) — `xxhash64(w1, w2)`
   *  hashes the two tokens as separate fields, so no join-delimiter
   *  ambiguity is possible. */
  private def bigramHashes(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => xxhash64(element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast("array<long>"))

  /**
   * Reference-corpus language-model coverage signals (the integerized
   * CCNet-style quality filter): a vocabulary (words seen >= `minCount`
   * times) and a bigram set are "trained" on `ref` — the curated
   * reference slice — and every document of `df` is scored against them:
   *
   *   - `n_oov`       tokens absent from the reference vocabulary
   *   - `oov_frac`    n_oov / n_tokens (rounded, integer-count division)
   *   - `n_known_bigrams` bigram occurrences present in the reference
   *   - `bigram_cov`  n_known_bigrams / n_bigrams
   *
   * High OOV / low bigram coverage marks text unlike the reference —
   * the same signal a KenLM perplexity filter thresholds on, built from
   * integer counts only so any SQL engine reproduces it exactly (a
   * floating log-prob sum would be summation-order-sensitive).
   *
   * Scale design: tokens and bigrams travel as xxhash64 longs, never
   * strings (collision-equivalent to string matching, the model every
   * hash join here accepts). The model sides are DISTINCT-aggregated
   * (bounded by reference vocabulary size, not corpus size) and, with
   * `broadcastModel` (default), explicitly broadcast into the
   * left_anti/left_semi joins — a trained LM vocabulary is fixed-size
   * (a Wikipedia-scale vocab at ~10^7 longs is ~80 MB, broadcastable),
   * and broadcasting avoids shuffling the exploded corpus-side tokens,
   * the dominant cost at 100 TB. Pass `broadcastModel = false` for a
   * reference corpus with an unbounded vocabulary: the joins degrade
   * gracefully to hash-shuffles on 8-byte keys.
   */
  def lmCoverageSignals(
      df: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Int = 2,
      broadcastModel: Boolean = true): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    def model(side: DataFrame): DataFrame =
      if (broadcastModel) broadcast(side) else side
    // cached: the per-doc token arrays feed three consumers (token
    // explode, bigram explode, per-doc base row); one array<string> row
    // per doc, far smaller than re-tokenizing the raw text per branch.
    val docWords = df.select(col(idCol).as("id"), words(col(textCol)).as("ws")).cache()
    val refWords = ref.select(words(col(textCol)).as("ws"))
    val vocab = refWords.select(explode(col("ws")).as("w"))
      .groupBy(xxhash64(col("w")).as("wh")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount).select("wh")
    val refBigrams = refWords.select(explode(bigramHashes(col("ws"))).as("gh")).distinct()
    val oov = docWords.select(col("id"), explode(col("ws")).as("w"))
      .select(col("id"), xxhash64(col("w")).as("wh"))
      .join(model(vocab), Seq("wh"), "left_anti")
      .groupBy("id").agg(count(lit(1)).as("n_oov"))
    val known = docWords.select(col("id"), explode(bigramHashes(col("ws"))).as("gh"))
      .join(model(refBigrams), Seq("gh"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_known_bigrams"))
    // split() never yields an empty array, so n_tokens >= 1 and the
    // oov_frac division is total; single-token docs have no bigrams.
    docWords.select(col("id"), size(col("ws")).cast("long").as("n_tokens"),
      greatest(size(col("ws")) - 1, lit(0)).cast("long").as("n_bigrams"))
      .join(oov, Seq("id"), "left")
      .join(known, Seq("id"), "left")
      .na.fill(0L, Seq("n_oov", "n_known_bigrams"))
      .withColumn("oov_frac", round(col("n_oov") / col("n_tokens"), 9))
      .withColumn("bigram_cov",
        when(col("n_bigrams") > 0, round(col("n_known_bigrams") / col("n_bigrams"), 9))
          .otherwise(lit(0.0)))
      .select("id", "n_tokens", "n_oov", "oov_frac",
        "n_bigrams", "n_known_bigrams", "bigram_cov")
  }

  /**
   * Term-distribution drift between two corpus snapshots (the data-mix
   * monitoring step a continuously-ingested 100 TB corpus needs): for
   * every term, occurrence counts in `dfA` and `dfB` and an
   * integer-exact drift rank. Drift is |cntA*totalB - cntB*totalA| —
   * the cross-multiplied difference of the two relative frequencies
   * scaled by totalA*totalB, so ranking needs NO floating division:
   * counts bounded by 2^31 tokens per side keep the product inside a
   * 63-bit long. Returns the top `k` drifting terms with both counts
   * (0 for a term absent from one side — the appear/disappear case that
   * matters most).
   *
   * Scale shape: one (term)-keyed count aggregate per side with map-side
   * partial combine, a full outer join on the term, two one-row total
   * broadcasts, one global top-k (TakeOrderedAndProject — never a full
   * sort).
   */
  def termDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      textCol: String,
      k: Int): DataFrame = {
    // cached: each side's count table feeds BOTH the full-outer join and
    // its one-row total — uncached, the corpus-wide tokenize+aggregate
    // would run twice per side (vocabulary-sized rows, cheap to hold)
    def counts(df: DataFrame) =
      df.select(explode(words(col(textCol))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .cache()
    val a = counts(dfA).withColumnRenamed("cnt", "cnt_a")
    val b = counts(dfB).withColumnRenamed("cnt", "cnt_b")
    val totals = a.agg(sum(col("cnt_a")).as("total_a"))
      .crossJoin(b.agg(sum(col("cnt_b")).as("total_b")))
    val joined = a.join(b, Seq("term"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(broadcast(totals))
      .withColumn("drift",
        abs(col("cnt_a") * col("total_b") - col("cnt_b") * col("total_a")))
    joined
      .orderBy(col("drift").desc, col("term"))
      .limit(k)
      .select(col("term"), col("cnt_a"), col("cnt_b"), col("drift"))
  }

  /** The PII patterns [[redactPii]] scrubs, applied in list order. URLs go
   *  first (an email inside a URL is consumed by the URL tag), then
   *  emails, then phone numbers; the Java-regex ∩ RE2 common dialect the
   *  pattern-count operator already uses, so non-overlapping
   *  leftmost-match semantics agree across engines. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("n_urls", "https?://[^\\s]+", "<URL>"),
    ("n_emails", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("n_phones", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /**
   * PII redaction: lower-case the text, then replace every URL, email,
   * and phone-number match with its tag (in that order — each count is
   * measured on the text AFTER the previous replacement, so an email
   * inside an already-tagged URL is not double-counted). The tags stay
   * uppercase in otherwise-lowered text, and no tag re-matches any later
   * pattern. Pure codegen'd regexp builtins — no shuffle, linear scan,
   * the shape that runs at 100 TB as a map-only pass.
   *
   * Output: id, clean_text, one count column per pattern.
   */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val start: (Column, Seq[(String, Column)]) = (lower(col(textCol)), Nil)
    val (cleaned, counts) = piiPatterns.foldLeft(start) {
      case ((text, acc), (countName, pattern, tag)) =>
        val n = size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")
        (regexp_replace(text, pattern, tag), acc :+ (countName -> n))
    }
    df.select((col(idCol).as("id") +: cleaned.as("clean_text") +:
      counts.map { case (name, c) => c.as(name) }): _*)
  }

  /**
   * C4-style line-level cleaning: keep lines with >= `minWords` words,
   * (optionally) terminal punctuation, and none of the `dropMarkers`
   * boilerplate substrings — the per-LINE salvage pass document-level
   * quality scores can't do (they keep or drop the whole page). One
   * native `graft_filter_lines` pass per document, zero shuffle, rules
   * frozen into the plan. Output: (id, text_filtered, n_lines, n_kept).
   */
  def filterLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 3,
      requirePunct: Boolean = false,
      dropMarkers: Seq[String] = Nil): DataFrame = {
    val fl = call_function("graft_filter_lines",
      (col(textCol) +: lit(minWords) +: lit(requirePunct) +:
        dropMarkers.map(lit(_))): _*)
    df.select(col(idCol).as("id"), fl.as("__fl"))
      .select(col("id"), col("__fl.text").as("text_filtered"),
        col("__fl.n_lines").cast("long").as("n_lines"),
        col("__fl.n_kept").cast("long").as("n_kept"))
  }

  /**
   * Vocabulary builder — tokenizer-training prep: the top-N corpus terms
   * by occurrence count, with each prefix's exact cumulative token
   * coverage ("the 30k most frequent words cover 97.1% of all tokens").
   * Output: (rank, term, n_occ, cum_occ, cov_ppm) where cov_ppm is the
   * integer parts-per-million coverage of ranks 1..rank — all-integer
   * arithmetic (BIGINT division), so results replay exactly anywhere.
   *
   * Scale design: the token explode partial-aggregates map-side, so the
   * term-count shuffle carries each partition's DISTINCT vocabulary
   * (Zipf-bounded), not its token stream; top-N is TakeOrdered (no
   * global sort of the vocabulary); the total-token count reuses the
   * already-aggregated counts rather than rescanning the corpus. The
   * final running sum is a global window over EXACTLY N pre-limited
   * rows — bounded by construction. Ties break lexicographically.
   */
  def buildVocab(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df
      .select(explode(words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n_occ"))
    val total = counts.agg(sum(col("n_occ")).as("total"))
    val top = counts.orderBy(col("n_occ").desc, col("term")).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occ").desc, col("term"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_occ", sum(col("n_occ")).over(w))
      .select(col("rank"), col("term"), col("n_occ"), col("cum_occ"),
        expr("cum_occ * 1000000L div total").as("cov_ppm"))
  }

  /**
   * Out-of-vocabulary rate per group against the corpus-global top-N
   * vocabulary (count-desc, lexicographic ties — [[buildVocab]]'s
   * order): per group, token count, OOV token count, OOV
   * parts-per-million, and distinct OOV types. The tokenizer-coverage
   * gate per language/source: a group whose oov_ppm spikes is about to
   * shred into byte-fallback tokens.
   *
   * The vocabulary stays a DATAFRAME and reaches the corpus as a
   * BROADCAST left join (membership flag) — at a realistic 100k-term
   * vocab an `isin` literal would inflate the plan tree and codegen
   * with a 100k-element IN list; the broadcast hash join is the same
   * semantics as data flow. The group pass is ONE explode + the join +
   * partial-aggregable conditional sums; the corpus shuffles only
   * (group, term)-level distinct counts.
   */
  def oovRate(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df
      .select(explode(words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("n_occ"))
    val vocab = counts.orderBy(col("n_occ").desc, col("term")).limit(topN)
      .select(col("term"), lit(1).as("__in_vocab"))
    val oov = col("__in_vocab").isNull
    df.select(col(groupCol).as("g"), explode(words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("g").as(groupCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(oov, 1L).otherwise(0L)).as("n_oov"),
        count_distinct(when(oov, col("term"))).as("n_oov_types"))
      .withColumn("oov_ppm", expr("n_oov * 1000000L DIV n_tokens"))
      .select(col(groupCol), col("n_tokens"), col("n_oov"), col("oov_ppm"),
        col("n_oov_types"))
  }

  /**
   * Heaps-law vocabulary growth: distinct word types and cumulative
   * token mass among documents with `idCol <= t`, for each checkpoint
   * t — the "is more data still buying new vocabulary" diagnostic that
   * decides whether to keep crawling a source. Flat growth = the
   * source is exhausted (or boilerplate).
   *
   * One pass to the (word, first-seen id) table — `min(id)` per word,
   * partial-aggregable, vocabulary-sized output — then |checkpoints|
   * conditional sums on it (the [[Profiler.filterSweep]] stack
   * pattern) joined with the same sums on the doc-level token counts.
   * The corpus is never multiplied by |checkpoints|.
   */
  def vocabGrowth(
      df: DataFrame,
      idCol: String,
      textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "need at least one checkpoint")
    require(checkpoints.distinct.size == checkpoints.size, "duplicate checkpoints")
    val firstSeen = df
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(min(col("id")).as("first_id"))
    def sweep(src: DataFrame, gate: Column, weight: Column, prefix: String) = {
      val aggs = checkpoints.zipWithIndex.map { case (t, i) =>
        coalesce(sum(when(gate <= t, weight).otherwise(0L)), lit(0L))
          .as(s"$prefix$i")
      }
      src.agg(aggs.head, aggs.tail: _*)
    }
    val v = sweep(firstSeen, col("first_id"), lit(1L), "__v")
    val tok = sweep(
      df.select(col(idCol).as("id"), tokenCount(col(textCol)).cast("long").as("tc")),
      col("id"), col("tc"), "__t")
    val stackArgs = checkpoints.zipWithIndex
      .map { case (t, i) => s"CAST($t AS BIGINT), __v$i, __t$i" }
      .mkString(", ")
    v.crossJoin(tok).select(expr(
      s"stack(${checkpoints.size}, $stackArgs) AS (checkpoint, vocab_size, tokens)"))
  }

  /**
   * Zipf rank-frequency slope of the corpus vocabulary: the ordinary
   * least-squares slope of `ln(freq)` on `ln(rank)` — healthy natural
   * text sits near -1; a flat slope flags templated/boilerplate
   * corpora, a cliff flags tiny-vocabulary spam. Returns one row
   * `(n_types, slope_fp)` with the slope in 1e4 fixed point.
   *
   * Engine-exact: each point's `ln` is 1e4 fixed-point (the q129
   * convention), the OLS sums run in decimal(38) — order-independent
   * integer arithmetic — and the final `(n·Σxy − ΣxΣy) / (n·Σxx −
   * Σx²)` resolves with sign-split truncating integer division (both
   * engines truncate toward zero). Ranks come from
   * [[Classifier.globalRankDesc]], so there is no single-partition
   * window even at a 100 TB vocabulary.
   */
  def zipfSlope(df: DataFrame, textCol: String): DataFrame = {
    val vocab = df.select(explode(words(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n_occ"))
    val ranked = Classifier.globalRankDesc(vocab, "w", "n_occ", "rk")
    ranked.select(
        round(log(col("rk").cast("double")) * lit(1e4))
          .cast("decimal(20,0)").as("x"),
        round(log(col("n_occ").cast("double")) * lit(1e4))
          .cast("decimal(20,0)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_types"),
        expr("""CAST(CASE
          |  WHEN n * sxx - sx * sx = 0 THEN 0
          |  WHEN n * sxy - sx * sy < 0
          |    THEN -((-(n * sxy - sx * sy) * 10000) DIV (n * sxx - sx * sx))
          |  ELSE ((n * sxy - sx * sy) * 10000) DIV (n * sxx - sx * sx)
          |END AS BIGINT)""".stripMargin).as("slope_fp"))
  }

  /**
   * Adjacent-word bigram structs `(w1, w2)` of a tokenized array;
   * arrays shorter than 2 contribute an empty list. `ws` MUST be a
   * bound column (select `words(...)` into a column first): a raw
   * tokenizer subtree inside the transform lambda would re-evaluate
   * per element — higher-order functions don't codegen, so nothing
   * hoists it.
   */
  def bigramsOf(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => struct(element_at(ws, i + 1).as("w1"),
          element_at(ws, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /**
   * PMI collocations: the top-k adjacent word pairs by pointwise mutual
   * information `ln(c(a,b) * N / (c(a) * c(b)))` — the classic
   * statistically-associated-phrase extractor (multi-word expressions,
   * named entities, boilerplate formulas). `minCount` floors the bigram
   * count (PMI is noise-dominated on rare pairs). The PMI is 1e4
   * fixed-point (the q129 log convention): the value inside `ln` is an
   * exact integer ratio, so both engines round the same double.
   *
   * Scale: the token stream is read ONCE — one hash aggregation to the
   * (w1, w2, count) bigram table, which is vocabulary²-bounded; slot
   * marginals and the total both derive from that small cached table,
   * and top-k is TakeOrdered, never a global sort.
   */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, s"bad minCount=$minCount / k=$k")
    val bigrams = df
      .select(words(col(textCol)).as("ws"))
      .select(explode(bigramsOf(col("ws"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")
    // the ONLY pass over the token stream; everything below runs on
    // this vocabulary^2-bounded table (per-query working state, cleared
    // by the harness/caller)
    val cbAll = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb")).cache()
    val cb = cbAll.where(col("cb") >= minCount)
    val cu = cbAll
      .select(explode(array(
        struct(col("w1").as("w"), col("cb")),
        struct(col("w2").as("w"), col("cb")))).as("e"))
      .groupBy(col("e.w").as("w")).agg(sum(col("e.cb")).as("cw"))
    val total = broadcast(cbAll.groupBy().agg((sum(col("cb")) * 2).as("n")))
    cb.join(cu.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(cu.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .crossJoin(total)
      .withColumn("pmi_fp",
        round(log(col("cb").cast("double") * col("n") /
          (col("c1").cast("double") * col("c2"))) * lit(1e4)).cast("long"))
      .select(col("w1"), col("w2"), col("cb"), col("pmi_fp"))
      .orderBy(col("pmi_fp").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /**
   * HTML stripping — the first cleaning step of any web-crawl pipeline:
   * drop tags, decode the common entities, collapse whitespace. Composed
   * entirely of codegen'd builtins (regexp_replace / replace), map-only,
   * and expressible verbatim in the DuckDB oracle. Tags are removed
   * BEFORE entities decode (so a literal `&lt;b&gt;` in text survives as
   * `<b>` instead of being re-stripped), `&amp;` decodes last, and the
   * result is whitespace-collapsed and trimmed.
   */
  def stripHtml(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Number of HTML tags in the raw text (a "was this HTML" signal). */
  def htmlTagCount(text: Column): Column = regexp_count(text, lit("<[^>]*>"))

  /**
   * Per-document encoding-health signals — the decode-QC pass a
   * web-crawl corpus runs before any text filter (mis-decoded bytes
   * poison tokenization, language-ID, and dedup fingerprints alike):
   *
   *   - `n_non_ascii`   codepoints above U+007F (legitimate for most
   *                     languages; a *ratio* spike against the doc's
   *                     claimed language is the suspect signal)
   *   - `non_ascii_frac` n_non_ascii / char length (rounded, 9 places)
   *   - `n_replacement` U+FFFD replacement chars — a decoder already
   *                     gave up on those bytes
   *   - `n_ctrl`        C0 control chars other than tab/LF/CR — raw
   *                     binary that survived into "text"
   *   - `n_mojibake`    UTF-8-read-as-Latin-1 digraph markers (`Ã`,
   *                     `Â`, `â€`) — the classic double-decode artifact
   *   - `enc_suspect`   any replacement / control / mojibake hit
   *
   * Pure per-row codegen'd expressions (regexp counts over the text
   * column): embarrassingly parallel, no shuffle, no UDF.
   */
  def encodingSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nNonAscii = regexp_count(t, lit("[^\\x00-\\x7F]")).cast("long")
    val nRepl = regexp_count(t, lit("�")).cast("long")
    val nCtrl = regexp_count(t, lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")).cast("long")
    val nMoji = regexp_count(t, lit("Ã|Â|â€")).cast("long")
    df.select(
      col(idCol),
      nNonAscii.as("n_non_ascii"),
      round(nNonAscii / greatest(length(t), lit(1)), 9).as("non_ascii_frac"),
      nRepl.as("n_replacement"),
      nCtrl.as("n_ctrl"),
      nMoji.as("n_mojibake"),
      (nRepl + nCtrl + nMoji > 0).as("enc_suspect"))
  }

  /**
   * Deterministic T5-style span corruption pairs for denoising training:
   * every token whose 0-based position `i` satisfies
   * `(i + doc_id) % every == 0` is replaced by a numbered sentinel
   * `<extra_id_K>` (K counts masked slots within the doc, 0-based), and
   * the TARGET sequence pairs each sentinel with the token it hid. The
   * doc-id phase shift varies WHICH positions mask across documents
   * while staying a pure function of (id, position) — reproducible
   * across runs, engines and retries, unlike RNG masking, so a restarted
   * 100 TB job regenerates byte-identical training pairs. Map-only: no
   * shuffle, no state; the pinned [[words]] tokenizer.
   *
   * Output: (id, corrupted, target, n_masked).
   */
  def spanCorruptionPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      every: Int = 7): DataFrame = {
    require(every >= 2, s"every must be >= 2, got $every")
    val ws = words(col(textCol))
    val m = pmod(col(idCol), lit(every.toLong)).cast("int")
    val j0 = pmod(lit(every) - m, lit(every))
    def isMasked(i: Column): Column = pmod(i + m, lit(every)) === 0
    def sentinel(i: Column): Column =
      concat(lit("<extra_id_"), ((i - j0) / lit(every)).cast("int").cast("string"), lit(">"))
    val corrupted = array_join(
      transform(ws, (w, i) => when(isMasked(i), sentinel(i)).otherwise(w)), " ")
    val target = array_join(
      filter(
        transform(ws, (w, i) =>
          when(isMasked(i), concat(sentinel(i), lit(" "), w)).otherwise(lit(null))),
        x => x.isNotNull),
      " ")
    val nMasked = size(filter(transform(ws, (_, i) => isMasked(i)), x => x)).cast("long")
    df.select(col(idCol).as("id"), corrupted.as("corrupted"),
      target.as("target"), nMasked.as("n_masked"))
  }

  /**
   * Per-document Shannon entropy of the token distribution, integerized:
   * `entropy_fp = sum over token types of round(-(c/n) ln(c/n) * 1e8)`
   * (exact long sum; ln ulps vanish at 1e-8 granularity). Low entropy
   * flags chant/boilerplate/gibberish documents whose token mass
   * concentrates in a few types — the signal length and stopword ratios
   * miss. Also returns n_tokens and n_types.
   *
   * Scale design: tokens shuffle once as xxhash64 longs (8-byte keys,
   * collision-equivalent to string grouping — the q59 hash-join model),
   * per-(doc, type) counts partially aggregate map-side, and the windowed
   * n-per-doc reuses the same partitioning, so the doc-level reduce is
   * the only other exchange.
   */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
    val counts = toks.groupBy(col("id"), xxhash64(col("w")).as("wh"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("id")
    counts.withColumn("n", sum(col("c")).over(w))
      .withColumn("term_fp",
        round(-(col("c") / col("n")) * log(col("c") / col("n")) * lit(1e8)).cast("long"))
      .groupBy("id")
      .agg(max(col("n")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("term_fp")).as("entropy_fp"))
  }
}
