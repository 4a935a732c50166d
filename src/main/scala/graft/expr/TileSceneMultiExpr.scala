package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native pivot-free multi-band tiling: splits ALL bands of a scene
  * (`map<band, array<float>>` of full row-major images) into block windows
  * in one pass, emitting each window WITH its band→pixels map — the
  * pivoted shape [[graft.raster.RasterKernels.bandMath]] consumes, with no
  * shuffle and no per-struct interpreted zipping (the `arrays_zip` +
  * explode composition of per-band [[TileSceneExpr]] runs ~5× slower on
  * the same corpus: every pixel crosses three generic-row copies there,
  * one arraycopy here).
  *
  * Returns `array<struct<window_row:int, window_col:int, h:int, w:int,
  * bands:map<string, array<float>>>>`. Ragged edges produce smaller tiles
  * (rasterio block_windows semantics, collections/utils.py:351).
  */
case class TileSceneMultiExpr(bands: Expression, sceneH: Expression, sceneW: Expression,
                              bandNames: Seq[String], blockH: Int, blockW: Int)
  extends Expression with CodegenFallback {

  require(blockH > 0 && blockW > 0, "block dims must be positive")
  require(bandNames.nonEmpty, "bandNames must be non-empty")

  override def children: Seq[Expression] = Seq(bands, sceneH, sceneW)
  override def nullable: Boolean = true
  override def prettyName: String = "tile_scene_multiband"

  private val tileType = StructType(Seq(
    StructField("window_row", IntegerType, nullable = false),
    StructField("window_col", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("bands",
      MapType(StringType, ArrayType(FloatType, containsNull = false), valueContainsNull = false),
      nullable = false)))

  override def dataType: DataType = ArrayType(tileType, containsNull = false)

  @transient private lazy val keyArray: ArrayData =
    new GenericArrayData(bandNames.map(b => UTF8String.fromString(b): Any).toArray)

  override def eval(input: InternalRow): Any = {
    val m = bands.eval(input)
    if (m == null) return null
    val h = sceneH.eval(input).asInstanceOf[Number].intValue()
    val w = sceneW.eval(input).asInstanceOf[Number].intValue()
    val mapData = m.asInstanceOf[MapData]
    val keys = mapData.keyArray()
    val vals = mapData.valueArray()
    val byName = (0 until mapData.numElements())
      .map(i => keys.getUTF8String(i).toString -> i).toMap
    val srcs = bandNames.map { b =>
      val idx = byName.getOrElse(b,
        throw new IllegalArgumentException(s"band $b missing from bands map"))
      val arr = vals.getArray(idx).toFloatArray() // one copy per scene band
      require(arr.length >= h * w, s"band $b: ${arr.length} px < $h x $w")
      arr
    }.toArray
    val nbr = (h + blockH - 1) / blockH
    val nbc = (w + blockW - 1) / blockW
    val tiles = new Array[Any](nbr * nbc)
    var br = 0
    while (br < nbr) {
      val th = math.min(blockH, h - br * blockH)
      var bc = 0
      while (bc < nbc) {
        val tw = math.min(blockW, w - bc * blockW)
        val tileBands = new Array[Any](srcs.length)
        var b = 0
        while (b < srcs.length) {
          val out = new Array[Float](th * tw)
          var r = 0
          while (r < th) {
            System.arraycopy(srcs(b), (br * blockH + r) * w + bc * blockW, out, r * tw, tw)
            r += 1
          }
          tileBands(b) = UnsafeArrayData.fromPrimitiveArray(out)
          b += 1
        }
        tiles(br * nbc + bc) = new GenericInternalRow(Array[Any](
          br, bc, th, tw,
          new ArrayBasedMapData(keyArray, new GenericArrayData(tileBands))))
        bc += 1
      }
      br += 1
    }
    new GenericArrayData(tiles)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bands = newChildren(0), sceneH = newChildren(1), sceneW = newChildren(2))
}
