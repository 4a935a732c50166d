package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** 64-bit random-hyperplane sign sketch over a dense embedding — SimHash
  * for vectors (Charikar, STOC 2002): bit i is set iff
  * dot(emb, plane_i) >= 0, so P[bit differs] = θ/π and the hamming
  * distance between two sketches is an unbiased 64-trial estimate of the
  * angle (E[dist] = 64·θ/π; dist ≤ 11 ≈ cosine ≥ 0.87).
  *
  * This is what drops EMBEDDINGS onto the engine's shared 64-bit hamming
  * plane: the same banded-LSH join
  * ([[graft.functions.DedupFunctions.neardupPairsByHamming64]]), the same
  * persisted index format (writeHammingIndex/probeHammingIndex), and the
  * same 8-byte shuffle payload that text simhash and the image/audio/video
  * perceptual hashes already use — a 256-byte float[64] never has to leave
  * its scan task to be near-dup-joined at corpus scale.
  *
  * The hyperplanes are NOT sampled from an RNG: they come from an integer
  * bit-mixing formula over (plane, component) indices
  * ([[graft.functions.SimilarityFunctions.rhpSketchPlanes]]), exact in
  * 64-bit integer arithmetic, so an independent engine (the DuckDB oracle)
  * re-derives the identical planes from the same closed form — nothing is
  * pinned, everything is recomputed. Sign-of-dot is gain-invariant
  * (sig(c·x) = sig(x) for c > 0), which is the property that makes the
  * sketch a near-DUP detector rather than a magnitude-sensitive hash.
  *
  * The composable formulation (64 `when(dot(...) >= 0, bit)` terms) builds
  * a 64-branch tree of interpreted HOF folds; this expression keeps the
  * 64×dim plane matrix as one plan-shared float[] and runs the loop as
  * primitive arithmetic inside whole-stage codegen — sketching IS the
  * corpus-sized pass, so it must run at scan speed. The HOF form survives
  * as the bit-parity spec twin (RhpSketchSpec).
  *
  * Contract: finite inputs (a NaN component poisons its projections; the
  * JVM and SQL engines order NaN differently against 0, so the sketch of a
  * NaN vector is engine-defined — RhpSketchSpec pins the testdata finite
  * and the sign margins ≫ float error). Plane values are small integers
  * in [-2048, 2047] stored exactly as floats; accumulation is double,
  * ascending component order in both eval paths.
  */
case class RhpSketch64Expr(child: Expression, planes: Array[Float], dim: Int)
    extends UnaryExpression {

  require(dim >= 1 && planes.length == 64 * dim,
    s"rhp_sketch64: planes length ${planes.length} != 64*dim ${64 * dim}")

  // content-based equality for the Array field (see SearchSortedExpr): the
  // default case-class reference compare defeats semanticEquals / CSE
  override def equals(other: Any): Boolean = other match {
    case that: RhpSketch64Expr =>
      child == that.child && dim == that.dim &&
        java.util.Arrays.equals(planes, that.planes)
    case _ => false
  }
  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + dim
    31 * h + java.util.Arrays.hashCode(planes)
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_sketch64"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rhp_sketch64 needs array<float|double>, got $dt")
    }

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    require(emb.numElements() == dim,
      s"rhp_sketch64: embedding length ${emb.numElements()} != dim $dim")
    val isF = elemIsFloat
    var sig = 0L
    var i = 0
    while (i < 64) {
      var s = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) {
        val v = if (isF) emb.getFloat(j).toDouble else emb.getDouble(j)
        s += v * planes(base + j)
        j += 1
      }
      if (s >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("rhpPlanes", planes, "float[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, emb => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      s"""
         |if ($emb.numElements() != $dim) {
         |  throw new IllegalArgumentException("rhp_sketch64: embedding length " +
         |    $emb.numElements() + " != $dim");
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  double $s = 0.0;
         |  int $base = $i * $dim;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $s += ((double) $emb.$get($j)) * $pl[$base + $j];
         |  }
         |  if ($s >= 0) $sig |= 1L << $i;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
