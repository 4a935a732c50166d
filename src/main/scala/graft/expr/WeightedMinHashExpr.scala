package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The unary-expansion reduction for WEIGHTED (multiset / term-frequency)
  * Jaccard: each token occurrence becomes the distinct element
  * `token#k` (k = how many identical tokens precede it), so plain SET
  * Jaccard over these elements equals the weighted Jaccard
  * Σ min(tfₐ, tf_b) / Σ max(tfₐ, tf_b) over integer term frequencies —
  * the classic expansion (Haveliwala et al. 2000; the integer-weight case
  * of Ioffe's consistent weighted sampling). A page that repeats a
  * paragraph five times is NOT a 0.9-Jaccard twin of the single-paragraph
  * page under this measure, where distinct-shingle Jaccard says it is.
  *
  * `multiset_elems(text)` → the occurrence-indexed element set (for exact
  * verification — already distinct by construction; encounter order).
  * Expansion size = token count, so the payload equals the document's own
  * token mass — nothing is amplified.
  */
case class MultisetElemsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multiset_elems"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextTok.tokens(input.asInstanceOf[UTF8String].toString)
    val seen = new java.util.HashMap[String, Integer](toks.length * 2)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val c = seen.getOrDefault(t, 0)
      seen.put(t, c + 1)
      out(i) = UTF8String.fromString(t + "#" + c)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-hash MinHash signature over the [[MultisetElemsExpr]] element set —
  * `weighted_minhash_signature(text, k)` → `array<string>` of k
  * lowercase-hex md5 minima, so P[sig_a(j) = sig_b(j)] = the WEIGHTED
  * Jaccard. Same salt idiom (`s<j>`), same raw-digest comparison and
  * hex-encode-winners-only discipline as [[MinHashSignatureExpr]]; the
  * existing band-key slicing and the whole LSH bucket machinery apply
  * unchanged on top.
  */
case class WeightedMinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "weighted_minhash_signature requires k >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "weighted_minhash_signature"

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(k)(j => s"s$j".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val mins = new Array[Array[Byte]](k)
    val toks = TextTok.tokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length > 0) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val seen = new java.util.HashMap[String, Integer](toks.length * 2)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        val c = seen.getOrDefault(t, 0)
        seen.put(t, c + 1)
        val elemBytes = (t + "#" + c).getBytes("UTF-8")
        var h = 0
        while (h < k) {
          md.reset()
          md.update(salts(h))
          md.update(elemBytes)
          val digest = md.digest()
          if (mins(h) == null || unsignedLess(digest, mins(h))) mins(h) = digest
          h += 1
        }
        i += 1
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
