package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-gram shingles: `word_ngrams(text, n)` →
  * `array<string>` of space-joined n-grams over whitespace tokens, distinct
  * in first-occurrence order.
  *
  * Bit-identical to the composable-HOF specification
  * `array_distinct(DedupFunctions.shingles(text, n))` (reference semantics:
  * index_generator-style token windows; the dedup pipeline consumes these
  * for exact-Jaccard verification). The HOF chain
  * (`transform(sequence, slice, concat_ws)` + `array_distinct`) is
  * interpreted and allocates a slice copy per shingle — shingling a 5 k-doc
  * corpus cost ~3 s at sf0.1; this single pass with one LinkedHashSet per
  * row is ~20×.
  */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "word_ngrams requires n >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextTok.tokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
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
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
