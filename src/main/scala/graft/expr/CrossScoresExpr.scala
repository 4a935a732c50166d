package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Blocked all-pairs cosine scoring: given two blocks of (id, embedding,
  * norm) members, emit every cross pair with `id_a < id_b` whose cosine
  * reaches `threshold` — one native B×B loop per block pair instead of a
  * joined row per candidate pair.
  *
  * This is the dense-compute half of exact all-pairs similarity
  * (`SimilarityFunctions.allPairsCosineBlocked`): the join shrinks from
  * O(n²) rows to O((n/B)²) block pairs, so per-row join machinery stops
  * dominating and the arithmetic runs as tight primitive loops over
  * buffers that stay cache-resident. Scoring is bit-identical to the
  * row-wise formulation: sequential double accumulation over float
  * casts ([[DotProductExpr]] order), cosine = dot / (normA · normB).
  *
  * Input member arrays: `array<struct<id:long, emb:array<float>,
  * nrm:double>>`; output `array<struct<id_a:long, id_b:long, cos:double>>`.
  */
case class CrossScoresExpr(membersA: Expression, membersB: Expression, threshold: Double)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(membersA, membersB)
  override def nullable: Boolean = true
  override def prettyName: String = "cross_scores"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  private def unpack(raw: ArrayData): (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = raw.numElements()
    val ids = new Array[Long](n)
    val embs = new Array[Array[Float]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = raw.getStruct(i, 3)
      ids(i) = row.getLong(0)
      embs(i) = row.getArray(1).toFloatArray()
      nrms(i) = row.getDouble(2)
      i += 1
    }
    (ids, embs, nrms)
  }

  override def eval(input: InternalRow): Any = {
    val a = membersA.eval(input)
    val b = membersB.eval(input)
    if (a == null || b == null) return null
    val (idsA, embsA, nrmsA) = unpack(a.asInstanceOf[ArrayData])
    val (idsB, embsB, nrmsB) = unpack(b.asInstanceOf[ArrayData])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < idsA.length) {
      val ea = embsA(i)
      var j = 0
      while (j < idsB.length) {
        if (idsA(i) < idsB(j)) {
          val eb = embsB(j)
          val len = math.min(ea.length, eb.length)
          var dot = 0.0
          var k = 0
          while (k < len) { dot += ea(k).toDouble * eb(k).toDouble; k += 1 }
          val denom = nrmsA(i) * nrmsB(j)
          val cos = if (denom == 0.0) 0.0 else dot / denom
          if (cos >= threshold)
            out += new GenericInternalRow(Array[Any](idsA(i), idsB(j), cos))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(membersA = newChildren(0), membersB = newChildren(1))
}
