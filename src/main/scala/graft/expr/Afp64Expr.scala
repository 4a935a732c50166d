package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 64-bit audio fingerprint — the audio member of the perceptual
  * signature family ([[SimHashExpr]] for text, [[PHash64Expr]] for
  * images): Haitsma–Kalker band-energy-difference sign bits over a
  * 5-frame × 17-band sequency-energy grid
  * ([[graft.functions.MultimodalFunctions.AudioCodec.bandEnergies]]),
  * feeding the SAME hamming64 / band-prefix LSH near-dup machinery — at
  * 100 TB only the 8-byte signatures shuffle, PCM stays in the scan task.
  *
  * The CONTRACT (replayed end-to-end by the q172 DuckDB oracle from the
  * integer PCM formula, and integer-exact by construction — the
  * Walsh–Hadamard energies are Longs, so there is no cross-engine float
  * question at all):
  *  - input: 85 energies, row-major `(frame t ∈ 0..4, band b ∈ 0..16)`;
  *  - bit `(t−1)·16 + b` (t ∈ 1..4, b ∈ 0..15) is set iff
  *    `(E(t,b) − E(t,b+1)) − (E(t−1,b) − E(t−1,b+1)) > 0` — the classic
  *    time-and-frequency double difference, invariant to global gain
  *    (scaling PCM by c scales every energy by c², preserving every
  *    sign) and robust to small perturbations (AudioPhashSpec pins both).
  */
case class Afp64Expr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "afp64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"afp64 needs array<bigint>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData].toLongArray()
    if (e.length != Afp64.Frames * Afp64.Bands) null
    else java.lang.Long.valueOf(Afp64.hash(e))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Afp64 {
  val Frames = 5
  val Bands = 17

  /** Difference-sign bits over the (frame, band) energy grid. */
  def hash(e: Array[Long]): Long = {
    require(e.length == Frames * Bands, s"afp64 grid must be ${Frames * Bands} energies")
    var out = 0L
    var t = 1
    while (t < Frames) {
      var b = 0
      while (b < Bands - 1) {
        val cur = e(t * Bands + b) - e(t * Bands + b + 1)
        val prev = e((t - 1) * Bands + b) - e((t - 1) * Bands + b + 1)
        if (cur - prev > 0) out |= (1L << ((t - 1) * 16 + b))
        b += 1
      }
      t += 1
    }
    out
  }
}
