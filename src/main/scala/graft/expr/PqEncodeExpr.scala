package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Product-quantization encode: split a dim-D embedding into `m` contiguous
  * subvectors and replace each with the index of its nearest codebook
  * centroid → `array<byte>` of length m (one code byte per subspace,
  * codebooks of ≤ 256 centroids).
  *
  * The composable formulation (per-subspace `least(struct(dist, idx))` over
  * 256 centroid literals) builds a 256-branch expression tree whose
  * distance folds are interpreted higher-order functions — the same
  * CodegenFallback trap [[SearchSortedExpr]] exists for. This expression
  * keeps the codebooks as one plan-shared float[] and runs the
  * m × 256 × (D/m) distance loop as primitive arithmetic inside
  * whole-stage codegen: encoding IS the corpus-sized pass, so it must be
  * scan-speed.
  *
  * Codebook layout: flattened row-major [m][k][subDim]. Ties break to the
  * lowest centroid index (strict less-than), matching the spec twin.
  */
case class PqEncodeExpr(child: Expression, codebooks: Array[Float],
                        m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && k <= 256 && subDim >= 1, "bad PQ shape")
  require(codebooks.length == m * k * subDim, "codebook length != m*k*subDim")

  // content-based equality for the Array field (see SearchSortedExpr): the
  // default case-class reference compare defeats semanticEquals / CSE
  override def equals(other: Any): Boolean = other match {
    case that: PqEncodeExpr =>
      child == that.child && m == that.m && k == that.k && subDim == that.subDim &&
        java.util.Arrays.equals(codebooks, that.codebooks)
    case _ => false
  }
  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + m; h = 31 * h + k; h = 31 * h + subDim
    31 * h + java.util.Arrays.hashCode(codebooks)
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs array<float|double>, got $dt")
    }

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    require(emb.numElements() == m * subDim,
      s"pq_encode: embedding length ${emb.numElements()} != m*subDim ${m * subDim}")
    val isF = elemIsFloat
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (s * k + c) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val v = if (isF) emb.getFloat(s * subDim + j).toDouble
                  else emb.getDouble(s * subDim + j)
          val diff = v - codebooks(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, emb => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      s"""
         |if ($emb.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException("pq_encode: embedding length " +
         |    $emb.numElements() + " != ${m * subDim}");
         |}
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $base = ($s * $k + $c) * $subDim;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      double $diff = ((double) $emb.$get($s * $subDim + $j)) - $cb[$base + $j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$s] = (byte) $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
