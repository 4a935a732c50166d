package graft.expr

import java.nio.{ByteBuffer, ByteOrder}

/** WKB (Well-Known Binary) polygon codec — the wire format the reference
  * stores in PostGIS (GeoAlchemy2 `from_shape`, celery/publish.py:272–273,
  * 591–593) and the format GeoParquet interop expects. Little-endian,
  * geometry type 3 (POLYGON), outer ring only (footprints are convex
  * hulls — single ring by construction).
  */
object Wkb {

  private val POLYGON = 3

  /** Encode an open ring (first point NOT repeated) as WKB POLYGON. */
  def fromPolygon(ring: Seq[(Double, Double)]): Array[Byte] = {
    require(ring.nonEmpty, "empty ring")
    val closed = ring :+ ring.head
    val buf = ByteBuffer.allocate(1 + 4 + 4 + 4 + closed.size * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte) // little-endian marker
    buf.putInt(POLYGON)
    buf.putInt(1) // one ring
    buf.putInt(closed.size)
    closed.foreach { case (x, y) => buf.putDouble(x); buf.putDouble(y) }
    buf.array()
  }

  /** Decode a WKB POLYGON's outer ring to an open point list. */
  def toPolygon(wkb: Array[Byte]): Either[String, Seq[(Double, Double)]] = {
    try {
      val buf = ByteBuffer.wrap(wkb)
      val order = if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      buf.order(order)
      val gtype = buf.getInt()
      if (gtype != POLYGON) return Left(s"not a POLYGON (type $gtype)")
      val nRings = buf.getInt()
      if (nRings < 1) return Left("no rings")
      val nPts = buf.getInt()
      val pts = (0 until nPts).map(_ => (buf.getDouble(), buf.getDouble()))
      if (pts.size >= 2 && pts.head == pts.last) Right(pts.init) else Right(pts)
    } catch {
      case e: Exception => Left(s"WKB decode error: ${e.getMessage}")
    }
  }

  // Column-level codecs (UDFs — publish-time only, not in query hot paths)
  import org.apache.spark.sql.functions.udf
  val fromPolygonUdf = udf { rows: Seq[org.apache.spark.sql.Row] =>
    if (rows == null || rows.isEmpty) null
    else fromPolygon(rows.map(r => (r.getDouble(0), r.getDouble(1))))
  }
  val toPolygonUdf = udf { wkb: Array[Byte] =>
    if (wkb == null) null
    else toPolygon(wkb).toOption.map(_.map { case (x, y) => Geo.PtRow(x, y) }).orNull
  }
}
