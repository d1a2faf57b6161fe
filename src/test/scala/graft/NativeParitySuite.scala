package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based parity: every native text expression must agree with an
 * INDEPENDENT Scala reference of its documented semantics on randomized
 * inputs — including the whitespace edges (tabs, newlines, leading/
 * trailing runs, empty tokens) where tokenizer drift historically hides.
 * Cases are generated with a FIXED seed so failures reproduce.
 */
class NativeParitySuite extends AnyFunSuite with GraftSparkSession {

  // --- the pinned tokenizer, replicated independently ------------------
  // UTF8String.trim strips U+0020 ONLY; split("\s+", -1) keeps leading/
  // trailing empty tokens produced by non-space whitespace edges.
  private def refWords(text: String): Array[String] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val trimmed = lower.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    trimmed.split("\\s+", -1)
  }

  private val wordGen: Gen[String] = Gen.oneOf(
    "alpha", "Beta", "GAMMA", "d1", "e2e", "click", "here", "buy", "now",
    "x.", "y!", "z?", "q\"", "..", "")
  private val sepGen: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\n\n")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(n, sepGen)
    lead <- Gen.oneOf("", " ", "\t", "\n")
    tail <- Gen.oneOf("", " ", "\t", "\n")
  } yield lead + ws.zip(seps).map { case (w, s) => w + s }.mkString + tail

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, rng.Seed(42L + i)))
  }

  test("graft_word_shingle_seq deduplicates to graft_word_shingles") {
    import spark.implicits._
    val texts = samples(textGen, 80)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.graft_word_shingles(col("text"), 3).as("set"),
        call_function("graft_word_shingle_seq", col("text"), lit(3)).as("seq"))
      .collect()
    rows.foreach { r =>
      val set = r.getSeq[Long](1)
      val seq = r.getSeq[Long](2)
      assert(seq.distinct === set, s"id=${r.getLong(0)}")
      // positional length: max(1, words - n + 1)
      val w = refWords(texts(r.getLong(0).toInt)).length
      assert(seq.length === math.max(1, w - 3 + 1))
    }
  }

  test("graft_filter_lines agrees with the documented per-line reference") {
    import spark.implicits._
    val texts = samples(textGen, 80)
    val markers = Seq("click here", "buy")
    def ref(t: String): (String, Int, Int) = {
      val lines = t.split("\n", -1)
      val kept = lines.filter { line =>
        val wc = line.split("\\s+", -1).count(_.nonEmpty)
        val punctOk = line.nonEmpty &&
          Seq('.', '!', '?', '"').contains(line.last)
        val lower = line.toLowerCase(java.util.Locale.ROOT)
        wc >= 2 && punctOk && !markers.exists(lower.contains)
      }
      (kept.mkString("\n"), lines.length, kept.length)
    }
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), call_function("graft_filter_lines", col("text"),
        lit(2), lit(true), lit("click here"), lit("buy")).as("fl"))
      .collect()
    rows.foreach { r =>
      val (txt, nl, nk) = ref(texts(r.getLong(0).toInt))
      val st = r.getStruct(1)
      assert(st.getString(0) === txt, s"id=${r.getLong(0)}")
      assert(st.getInt(1) === nl && st.getInt(2) === nk, s"id=${r.getLong(0)}")
    }
  }

  test("graft_drop_words agrees with the tokenizer reference on random drop sets") {
    import spark.implicits._
    val texts = samples(textGen, 80)
    val posGen = Gen.listOf(Gen.choose(0, 30)).map(_.distinct.sorted)
    val drops = samples(posGen, 80)
    def ref(t: String, ps: Seq[Int]): (String, Int, Int) = {
      val ws = refWords(t)
      val kept = ws.zipWithIndex.collect { case (w, i) if !ps.contains(i) => w }
      (kept.mkString(" "), ws.length, ps.count(_ < ws.length))
    }
    val rows = texts.zip(drops).zipWithIndex
      .map { case ((t, ps), i) => (i.toLong, t, ps) }
      .toDF("id", "text", "ps")
      .select(col("id"),
        call_function("graft_drop_words", col("text"),
          col("ps").cast("array<int>")).as("dw"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val (txt, nw, nd) = ref(texts(i), drops(i))
      val st = r.getStruct(1)
      assert(st.getString(0) === txt, s"id=$i text=${texts(i).take(40)}")
      assert(st.getInt(1) === nw && st.getInt(2) === nd, s"id=$i")
    }
  }

  test("graft_bucket_index agrees with linear counting on random sorted bounds") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(1, 12)
      bs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
      v <- Gen.choose(-150.0, 150.0)
    } yield (bs.sorted, v)
    val cases = samples(caseGen, 120)
    val rows = cases.zipWithIndex.map { case ((bs, v), i) => (i.toLong, bs, v) }
      .toDF("id", "bs", "v")
      .select(col("id"),
        graft.functions.graft_bucket_index(col("bs"), col("v")).as("b"))
      .collect()
    rows.foreach { r =>
      val (bs, v) = cases(r.getLong(0).toInt)
      assert(r.getInt(1) === bs.count(_ <= v), s"id=${r.getLong(0)}")
    }
  }

  test("graft_marker_hits agrees with token-equality counting") {
    import spark.implicits._
    val texts = samples(textGen, 80)
    val markers = Seq("alpha", "BETA", "e2e", "")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.graft_marker_hits(col("text"), markers).as("h"))
      .collect()
    rows.foreach { r =>
      val ws = refWords(texts(r.getLong(0).toInt))
      val exp = markers.map(m =>
        ws.count(_ == m.toLowerCase(java.util.Locale.ROOT)).toLong)
      assert(r.getSeq[Long](1) === exp, s"id=${r.getLong(0)}")
    }
  }

  test("graft_simhash and graft_repetition_stats agree with token references") {
    import spark.implicits._
    val texts = samples(textGen, 60)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        call_function("graft_simhash", col("text")).as("sh"),
        call_function("graft_repetition_stats", col("text")).as("rs"))
      .collect()
    rows.foreach { r =>
      val t = texts(r.getLong(0).toInt)
      // simhash: identical to the reference compute on the same string
      assert(r.getString(1) ===
        org.apache.spark.sql.graft.SimHash64.compute(t), s"id=${r.getLong(0)}")
      // repetition stats vs a direct reference over the pinned tokenizer
      val ws = refWords(t).toSeq
      val g2 = ws.sliding(2).filter(_.size == 2).map(_.mkString("\u0000")).toSeq
      val g3 = ws.sliding(3).filter(_.size == 3).map(_.mkString("\u0000")).toSeq
      val rs = r.getSeq[Long](2)
      assert(rs(0) === ws.length.toLong, s"id=${r.getLong(0)}")
      assert(rs(1) === ws.distinct.length.toLong)
      assert(rs(2) === g2.length.toLong)
      val top2 = if (g2.isEmpty) 0L
        else g2.groupBy(identity).values.map(_.size).max.toLong
      assert(rs(3) === top2, s"id=${r.getLong(0)} text=${t.take(40)}")
      assert(rs(4) === g3.length.toLong)
      assert(rs(5) === g3.distinct.length.toLong)
    }
  }
}
