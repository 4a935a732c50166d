package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding-window digests: `window_digests(text, L)` →
  * `array<binary>` of the 16-byte md5 of every L-token window
  * (position i holds the digest of tokens `[i, i+L)`), empty when the
  * text has fewer than L tokens.
  *
  * Bit-identical to the composable-HOF specification
  * `transform(sequence(0, n-L), i -> unhex(md5(concat_ws(' ',
  * slice(tk, i+1, L)))))` that [[graft.functions.DedupFunctions
  * .repeatedSpans]] is defined by. The HOF chain allocates a slice copy,
  * a joined string, a hex string and an unhex pass per window; this
  * tokenizes once and reuses ONE StringBuilder and ONE MessageDigest per
  * row, hashing each window's bytes directly — the repeated-substring
  * scan is a corpus-wide pass (one window per token position), so the
  * per-window constant is the whole cost. */
case class WindowDigestsExpr(child: Expression, l: Int)
    extends UnaryExpression with CodegenFallback {

  require(l >= 2, "window_digests requires L >= 2")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "window_digests"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextTok.tokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length < l) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(128)
    val out = new Array[Any](toks.length - l + 1)
    var i = 0
    while (i <= toks.length - l) {
      sb.setLength(0)
      var j = 0
      while (j < l) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      out(i) = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
