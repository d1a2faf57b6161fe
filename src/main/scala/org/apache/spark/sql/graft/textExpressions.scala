/**
 * Native text-pipeline expressions. Currently: `graft_simhash`.
 */
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
 * One md5 per token per document (the SQL-mirror formulation recomputes it
 * per bit; this native expression is the production path).
 */
case class SimHash64(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_simhash"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(SimHash64.compute(text))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(org.apache.spark.sql.graft.SimHash64.compute($c.toString()))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  private val HEX = "0123456789abcdef"

  def compute(text: String): String = {
    val tokens = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val counters = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty) {
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
