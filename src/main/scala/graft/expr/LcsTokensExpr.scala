package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-level longest-common-subsequence length:
  * `lcs_tokens(cand, ref)` → INT — the integer core of ROUGE-L
  * (precision = lcs/cand_n, recall = lcs/ref_n; both single IEEE
  * divisions of exact integers, so a DuckDB oracle reproduces the
  * scores bit-for-bit, the q159/ngramOverlap convention).
  *
  * Tokens are whitespace runs ([[TextTok.tokens]] — the same
  * tokenization every text operator in the engine uses), compared
  * exactly (case-sensitive). Classic two-row dynamic program:
  * O(n·m) time, O(min tokens) space per row, with ref tokens interned
  * against a candidate-token dictionary first so the inner loop
  * compares ints, never strings (a ref token absent from the candidate
  * can never match and is dropped up front, which also shrinks m).
  *
  * Scale shape: a scalar per-row expression — eval scoring stays a
  * narrow projection over the scan with no shuffle; per-row cost is
  * quadratic in tokens, so callers scoring open-ended documents (not
  * sentence/paragraph eval references) should pre-truncate with
  * `slice(tokens, …)`. CodegenFallback: the DP loop dominates the
  * per-row virtual dispatch, and fallback keeps the surrounding
  * projection inside whole-stage codegen.
  */
case class LcsTokensExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lcs_tokens needs string inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cand = TextTok.tokens(a.asInstanceOf[UTF8String].toString)
    val ref = TextTok.tokens(b.asInstanceOf[UTF8String].toString)
    if (cand.length == 0 || ref.length == 0) return 0
    // Intern candidate tokens; map ref tokens to ids, dropping tokens the
    // candidate never contains (they cannot participate in the LCS).
    val dict = new java.util.HashMap[String, Integer](cand.length * 2)
    val candIds = new Array[Int](cand.length)
    var i = 0
    while (i < cand.length) {
      var id = dict.get(cand(i))
      if (id == null) { id = dict.size(); dict.put(cand(i), id) }
      candIds(i) = id
      i += 1
    }
    val refIds = new Array[Int](ref.length)
    var m = 0
    i = 0
    while (i < ref.length) {
      val id = dict.get(ref(i))
      if (id != null) { refIds(m) = id; m += 1 }
      i += 1
    }
    if (m == 0) return 0
    // dp[j] = LCS(cand[0..i), ref[0..j)) rolled over candidate positions.
    val dp = new Array[Int](m + 1)
    i = 0
    while (i < cand.length) {
      val ci = candIds(i)
      var prevDiag = 0 // dp_old[j-1]
      var j = 1
      while (j <= m) {
        val oldJ = dp(j)
        val best =
          if (refIds(j - 1) == ci) prevDiag + 1
          else if (oldJ >= dp(j - 1)) oldJ
          else dp(j - 1)
        prevDiag = oldJ
        dp(j) = best
        j += 1
      }
      i += 1
    }
    dp(m)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
