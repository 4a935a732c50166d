package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native 64-bit DCT perceptual hash (pHash) over a row-major 32×32
  * grayscale grid — the image twin of [[SimHashExpr]]: a compact
  * similarity-preserving signature whose Hamming distance feeds the SAME
  * near-dup machinery as text simhash
  * ([[graft.functions.DedupFunctions.hamming64]], band-prefix LSH
  * bucketing), so image near-dup scales exactly like text near-dup —
  * signatures shuffle, pixels never do.
  *
  * Role anchor: the reference publishes per-scene quicklook thumbnails as
  * its image surface (bdc_collection_builder/celery/publish.py:59–91); a
  * catalog at crawl scale needs to near-dedup those, and a resize/
  * re-encode/brightness-shifted copy defeats byte- and exact-pixel
  * hashing. The DCT sign hash is invariant to exactly those edits.
  *
  * The CONTRACT (what the DuckDB oracle replays from pixel literals, and
  * what [[PHash64.hashDirect]] re-derives as an executable spec twin):
  *  - input: the 1024 mean-pooled luma values of a 32×32 grid, row-major
  *    (`g(y*32+x)`), integer-valued 0..255 for exact-size inputs;
  *  - DCT: `c(u,v) = Σ_{y,x} g(y*32+x) · cos((2x+1)uπ/64) ·
  *    cos((2y+1)vπ/64)` for u,v ∈ 0..7 — plain cosine sums, NO
  *    orthonormalization factors (per-(u,v) positive scales cannot be
  *    dropped once a cross-coefficient median is taken, so the contract
  *    fixes them at 1 on both engines);
  *  - threshold: the median of the 63 AC coefficients (DC excluded; 63 is
  *    odd, so the median is the exact middle element — no interpolation,
  *    identical to DuckDB's `median` on odd counts);
  *  - hash: bit `u*8+v` set iff `c(u,v) > median` (the DC bit rides along
  *    at bit 0 and is set for any non-degenerate image).
  *
  * Float-order independence: the separable evaluation here and the
  * single-SUM oracle differ by ~1e-9 absolute at worst; the committed
  * battery's smallest |c − median| margin is ~0.24 (PHashSpec pins a
  * 1e-3 floor), so summation order can never flip a bit.
  */
case class PHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"phash64 needs array<double>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val g = input.asInstanceOf[ArrayData].toDoubleArray()
    if (g.length != PHash64.GridPixels) null
    else java.lang.Long.valueOf(PHash64.hash(g))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PHash64 {
  val Grid = 32
  val GridPixels: Int = Grid * Grid
  private val Freqs = 8

  /** cosTab(u)(x) = cos((2x+1)·u·π/64) — shared by both axes (square grid). */
  private val cosTab: Array[Array[Double]] =
    Array.tabulate(Freqs, Grid)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 64))

  /** Separable evaluation of the contract above (O(8·32·32 + 8·8·32)
    * multiplies instead of the direct 8·8·1024). */
  def hash(g: Array[Double]): Long = signBits(coefficients(g))

  /** Direct 1024-term-per-coefficient evaluation — the executable spec
    * twin (mirrors the DuckDB oracle's single SUM); PHashSpec asserts it
    * produces the identical hash on the battery and on fuzzed grids. */
  def hashDirect(g: Array[Double]): Long = {
    require(g.length == GridPixels, s"phash64 grid must be $GridPixels values")
    val c = new Array[Double](Freqs * Freqs)
    var u = 0
    while (u < Freqs) {
      var v = 0
      while (v < Freqs) {
        var s = 0.0
        var y = 0
        while (y < Grid) {
          var x = 0
          while (x < Grid) {
            s += g(y * Grid + x) *
              math.cos((2 * x + 1) * u * math.Pi / 64) *
              math.cos((2 * y + 1) * v * math.Pi / 64)
            x += 1
          }
          y += 1
        }
        c(u * Freqs + v) = s
        v += 1
      }
      u += 1
    }
    signBits(c)
  }

  /** Smallest |c − median| over coefficients ≠ the median element — the
    * float-order safety margin PHashSpec pins for the committed battery. */
  def medianMargin(g: Array[Double]): Double = {
    val c = coefficients(g)
    val med = medianAc(c)
    c.iterator.map(v => math.abs(v - med)).filter(_ > 0).min
  }

  private def coefficients(g: Array[Double]): Array[Double] = {
    require(g.length == GridPixels, s"phash64 grid must be $GridPixels values")
    // t(u)(y) = Σ_x g(y*32+x)·cosTab(u)(x)
    val t = Array.ofDim[Double](Freqs, Grid)
    var y = 0
    while (y < Grid) {
      val row = y * Grid
      var u = 0
      while (u < Freqs) {
        val cu = cosTab(u)
        var s = 0.0
        var x = 0
        while (x < Grid) { s += g(row + x) * cu(x); x += 1 }
        t(u)(y) = s
        u += 1
      }
      y += 1
    }
    val c = new Array[Double](Freqs * Freqs)
    var u = 0
    while (u < Freqs) {
      val tu = t(u)
      var v = 0
      while (v < Freqs) {
        val cv = cosTab(v)
        var s = 0.0
        var yy = 0
        while (yy < Grid) { s += tu(yy) * cv(yy); yy += 1 }
        c(u * Freqs + v) = s
        v += 1
      }
      u += 1
    }
    c
  }

  private def medianAc(c: Array[Double]): Double = {
    val ac = java.util.Arrays.copyOfRange(c, 1, c.length)
    java.util.Arrays.sort(ac)
    ac(31) // exact middle of 63 — no interpolation
  }

  private def signBits(c: Array[Double]): Long = {
    val med = medianAc(c)
    var out = 0L
    var k = 0
    while (k < c.length) {
      if (c(k) > med) out |= (1L << k)
      k += 1
    }
    out
  }
}
