package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native nearest-neighbour resample of a row-major (h×w) tile to
  * (outH×outW) — collections/utils.py:317–348's `out_shape` read.
  * Primitive index loop; used by the overview pyramid (S8), which touches
  * ~⅓ of corpus bytes at ingest (Σ 1/4ᵏ), so it gets the same native
  * treatment as [[BandMathExpr]]/[[TileSceneExpr]].
  */
case class ResampleNearestExpr(pixels: Expression, inH: Expression, inW: Expression,
                               outH: Expression, outW: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(pixels, inH, inW, outH, outW)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "resample_nearest"

  override def eval(input: InternalRow): Any = {
    val px = pixels.eval(input)
    if (px == null) return null
    val data = px.asInstanceOf[ArrayData]
    val h = inH.eval(input).asInstanceOf[Number].longValue()
    val w = inW.eval(input).asInstanceOf[Number].longValue()
    val oh = outH.eval(input).asInstanceOf[Number].intValue()
    val ow = outW.eval(input).asInstanceOf[Number].intValue()
    val out = new Array[Float](oh * ow)
    var r = 0
    while (r < oh) {
      val sr = r * h / oh
      val rowBase = sr * w
      var c = 0
      while (c < ow) {
        out(r * ow + c) = data.getFloat((rowBase + c * w / ow).toInt)
        c += 1
      }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pixels = newChildren(0), inH = newChildren(1), inW = newChildren(2),
      outH = newChildren(3), outW = newChildren(4))
}
