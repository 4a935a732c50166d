package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer–Wilkerson–Aiken):
  * `winnow_fps(text, k, w)` → `array<string>` of the distinct sliding-
  * window minima over the salted-md5 hex hashes of every word k-gram —
  * first-occurrence order, exactly the value of the composable
  * formulation in [[graft.functions.DedupFunctions.winnowFingerprints]]
  * (which stays as the bit-parity spec twin).
  *
  * The HOF chain pays interpreted lambdas, a concat/hex allocation per
  * gram, and a slice copy per window even after its bind-once repair;
  * fingerprinting is a corpus-sized pass (one hash per token), so this
  * tokenizes once, reuses ONE StringBuilder and ONE MessageDigest per
  * row, and takes window minima over an index ring — O(m·w) string
  * compares with zero per-window allocation. Lexicographic order on
  * lowercase-hex md5 matches the SQL `array_min`/DuckDB
  * `list_aggregate('min')` order byte for byte. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"winnow_fps requires k >= 1 and w >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val toks = TextTok.tokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(128)
    val m = toks.length - k + 1
    val hashes = new Array[String](m)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      sb.append("wn|")
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val dig = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((dig(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(dig(b) & 0xf)
        b += 1
      }
      hashes(i) = new String(hex)
      i += 1
    }
    // sliding minima, first-occurrence distinct (== array_distinct order)
    val seen = new java.util.LinkedHashSet[String]()
    val nWin = math.max(m - (w - 1), 1)
    var jw = 0
    while (jw < nWin) {
      var best = hashes(jw)
      var t = jw + 1
      val end = math.min(jw + w, m)
      while (t < end) {
        if (hashes(t).compareTo(best) < 0) best = hashes(t)
        t += 1
      }
      seen.add(best)
      jw += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
