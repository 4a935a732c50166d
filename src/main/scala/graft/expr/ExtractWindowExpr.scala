package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native scene tiling: splits a full-scene row-major `array<float>` band
  * image into block windows in ONE pass — the scene buffer is materialized
  * once and each tile is row-wise `System.arraycopy`, no per-pixel
  * interpreted lambdas. The scene→tiles explode is the ingest path (it
  * touches every pixel of a 100 TB corpus once), hence the native kernel
  * (same rationale as [[BandMathExpr]]).
  *
  * Returns `array<struct<window_row:int, window_col:int, h:int, w:int,
  * pixels:array<float>>>` — callers `posexplode` it into tile rows.
  * Ragged right/bottom edges produce smaller tiles (rasterio block_windows
  * semantics, collections/utils.py:351).
  */
case class TileSceneExpr(pixels: Expression, sceneH: Expression, sceneW: Expression,
                         blockH: Int, blockW: Int)
  extends Expression with CodegenFallback {

  require(blockH > 0 && blockW > 0, "block dims must be positive")

  override def children: Seq[Expression] = Seq(pixels, sceneH, sceneW)
  override def nullable: Boolean = true
  override def prettyName: String = "tile_scene"

  private val tileType = StructType(Seq(
    StructField("window_row", IntegerType, nullable = false),
    StructField("window_col", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType, containsNull = false), nullable = false)))

  override def dataType: DataType = ArrayType(tileType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val px = pixels.eval(input)
    if (px == null) return null
    val h = sceneH.eval(input).asInstanceOf[Number].intValue()
    val w = sceneW.eval(input).asInstanceOf[Number].intValue()
    val src = px.asInstanceOf[ArrayData].toFloatArray() // one copy per scene band
    require(src.length >= h * w, s"pixels ${src.length} < $h x $w")
    val nbr = (h + blockH - 1) / blockH
    val nbc = (w + blockW - 1) / blockW
    val tiles = new Array[Any](nbr * nbc)
    var br = 0
    while (br < nbr) {
      val th = math.min(blockH, h - br * blockH)
      var bc = 0
      while (bc < nbc) {
        val tw = math.min(blockW, w - bc * blockW)
        val out = new Array[Float](th * tw)
        var r = 0
        while (r < th) {
          System.arraycopy(src, (br * blockH + r) * w + bc * blockW, out, r * tw, tw)
          r += 1
        }
        tiles(br * nbc + bc) = new GenericInternalRow(Array[Any](
          br, bc, th, tw, UnsafeArrayData.fromPrimitiveArray(out)))
        bc += 1
      }
      br += 1
    }
    new GenericArrayData(tiles)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pixels = newChildren(0), sceneH = newChildren(1), sceneW = newChildren(2))
}
