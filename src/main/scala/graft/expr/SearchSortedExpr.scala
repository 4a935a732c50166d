package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Bucket index of a double against a FIXED sorted cut-point array: the
  * count of cuts ≤ value (numpy `searchsorted(side='right')`).
  *
  * This is the quantile-bucketing step of the Z-order layout writer
  * ([[graft.meta.ScaleOps.zorderWrite]]). The composable formulation —
  * `aggregate(typedLit(cuts), 0, (acc, b) => acc + when(v >= b, ...))` —
  * is an interpreted higher-order function (ArrayAggregate is
  * CodegenFallback), costing 255 lambda dispatches per row per dimension
  * across every pass that evaluates the z-value (range-partition sampling
  * AND the write projection). This expression binary-searches a
  * JVM-resident double[] shared across rows: O(log cuts) primitive
  * compares inside whole-stage codegen. Measured on the sf0.1 events
  * z-order write: 13.2 s → ~2 s wall.
  *
  * The cuts array is deduplicated and sorted at construction; ties in the
  * source quantiles collapse, keeping the bucket function monotone. NaN
  * input lands in the last bucket (Java compare semantics: NaN > every
  * cut), a deliberate "sorts last" match with Spark's double ordering.
  */
case class SearchSortedExpr(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  private val sorted: Array[Double] = cuts.distinct.sorted

  // case-class equals on an Array field is reference equality, which would
  // make structurally identical expressions never semanticEquals — breaking
  // canonicalization and subexpression elimination (zorderWrite evaluates
  // the z-value in two passes that should dedupe). Compare contents, the
  // way Spark's Literal handles array payloads.
  override def equals(other: Any): Boolean = other match {
    case that: SearchSortedExpr =>
      child == that.child && java.util.Arrays.equals(cuts, that.cuts)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cuts)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "search_sorted"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"search_sorted needs a double input, got ${child.dataType}")

  /** Count of cuts ≤ v by binary search for the upper bound. */
  private def bucketOf(v: Double, a: Array[Double]): Int = {
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // compare treats NaN as greater than any cut, -0.0 < 0.0 is
      // irrelevant for bucketing (both land in the same bucket)
      if (a(mid) <= v || (java.lang.Double.isNaN(v) && !java.lang.Double.isNaN(a(mid)))) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override def nullSafeEval(input: Any): Any =
    bucketOf(input.asInstanceOf[Double], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one double[] per query plan, shared by every row the task processes
    val arrRef = ctx.addReferenceObj("searchSortedCuts", sorted, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arrRef.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arrRef[$mid] <= $v ||
         |      (java.lang.Double.isNaN($v) && !java.lang.Double.isNaN($arrRef[$mid]))) {
         |    $lo = $mid + 1;
         |  } else {
         |    $hi = $mid;
         |  }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
