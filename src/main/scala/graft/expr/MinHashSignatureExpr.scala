package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash-signature expression: `minhash_signature(text, n, k)` →
  * `array<string>` of k lowercase-hex md5 minima over word n-gram shingles.
  *
  * Semantics are bit-identical to the composable-HOF formulation
  * ([[graft.functions.DedupFunctions.minhashSignature]]) and to the DuckDB
  * oracle (`min(md5('s<j>' || shingle))`): salt for hash j is the ASCII
  * string `s<j>`; min is lexicographic over the hex digest, which equals
  * unsigned-byte order over the raw digest, so the loop compares raw bytes
  * and hex-encodes only the winners.
  *
  * Why a custom Expression (SURVEY.md §4 preference order (b)): the HOF
  * version (`aggregate(transform(...))`) is interpreted per element and
  * allocates per shingle — profiled 4.3 s for 5 k docs at sf0.1. An
  * explode+window rewrite is codegen'd but shuffles every token — wrong
  * trade at 100 TB. This expression is one narrow pass, no shuffle, tight
  * Scala loops, one MessageDigest per row batch.
  */
case class MinHashSignatureExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1 && k >= 1, "minhash_signature requires n >= 1 and k >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(k)(j => s"s$j".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val mins = new Array[Array[Byte]](k)
    val toks = TextTok.tokens(input.asInstanceOf[UTF8String].toString)
    locally {
      if (toks.length >= n) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val shingleBytes = sb.toString.getBytes("UTF-8")
          var h = 0
          while (h < k) {
            md.reset()
            md.update(salts(h))
            md.update(shingleBytes)
            val digest = md.digest()
            if (mins(h) == null || unsignedLess(digest, mins(h))) mins(h) = digest
            h += 1
          }
          i += 1
        }
      }
    }
    new GenericArrayData(mins.map { b =>
      if (b == null) null else UTF8String.fromString(toHex(b))
    }.asInstanceOf[Array[Any]])
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xFF; val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(b: Array[Byte]): String = {
    val hexChars = "0123456789abcdef"
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = hexChars((b(i) >> 4) & 0xF)
      out(2 * i + 1) = hexChars(b(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
