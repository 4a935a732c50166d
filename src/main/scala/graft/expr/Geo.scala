package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry helpers for the catalog's spatial predicates, without a GIS
  * dependency. Mirrors how the reference uses PostGIS:
  *  - cheap envelope intersection for queries (controller.py:563–570)
  *  - convex-hull footprints at publish time (collections/utils.py:240–274)
  *  - raster extent → polygon (collections/utils.py:223–237)
  *
  * Polygons are `array<struct<x:double,y:double>>` columns (closed ring not
  * required). The exact predicates are Scala UDFs — catalog scale is
  * 10⁵–10⁷ items, and every query prefilters with the codegen'd bbox
  * predicate so the UDF touches few rows.
  */
object Geo {

  type Pt = (Double, Double)

  /** bbox struct from xmin/ymin/xmax/ymax. */
  def bbox(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    struct(xmin.as("xmin"), ymin.as("ymin"), xmax.as("xmax"), ymax.as("ymax"))

  /** Envelope-overlap predicate on two bbox structs — pure Catalyst
    * comparisons, pushdown-friendly (the ST_MakeEnvelope && ST_Intersects
    * prefilter of controller.py:566–569). */
  def bboxIntersects(a: Column, b: Column): Column =
    !(a.getField("xmax") < b.getField("xmin") || a.getField("xmin") > b.getField("xmax") ||
      a.getField("ymax") < b.getField("ymin") || a.getField("ymin") > b.getField("ymax"))

  // ---- pure-Scala computational geometry -----------------------------------

  /** Monotone-chain convex hull, counter-clockwise, no duplicate last point.
    * Replaces rasterio polygonize + shapely convex_hull
    * (collections/utils.py:240–274) — only the hull survives there, so
    * exact polygonization is unnecessary. */
  def convexHull(points: Seq[Pt]): Seq[Pt] = {
    val ps = points.distinct.sorted
    if (ps.size <= 2) return ps
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(src: Seq[Pt]): List[Pt] =
      src.foldLeft(List.empty[Pt]) { (acc, p) =>
        var h = acc
        while (h.size >= 2 && cross(h.tail.head, h.head, p) <= 0) h = h.tail
        p :: h
      }.reverse
    val lower = half(ps)
    val upper = half(ps.reverse)
    (lower.init ++ upper.init)
  }

  /** Ray-casting point-in-polygon (boundary counts as inside). */
  def pointInPolygon(p: Pt, poly: Seq[Pt]): Boolean = {
    val n = poly.size
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val (xi, yi) = poly(i); val (xj, yj) = poly(j)
      if (onSegment(p, (xi, yi), (xj, yj))) return true
      val intersects = (yi > p._2) != (yj > p._2) &&
        p._1 < (xj - xi) * (p._2 - yi) / (yj - yi) + xi
      if (intersects) inside = !inside
      j = i; i += 1
    }
    inside
  }

  private def onSegment(p: Pt, a: Pt, b: Pt): Boolean = {
    val cross = (b._1 - a._1) * (p._2 - a._2) - (b._2 - a._2) * (p._1 - a._1)
    if (math.abs(cross) > 1e-12) return false
    p._1 >= math.min(a._1, b._1) - 1e-12 && p._1 <= math.max(a._1, b._1) + 1e-12 &&
      p._2 >= math.min(a._2, b._2) - 1e-12 && p._2 <= math.max(a._2, b._2) + 1e-12
  }

  private def segmentsIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    def orient(p: Pt, q: Pt, r: Pt): Double =
      (q._1 - p._1) * (r._2 - p._2) - (q._2 - p._2) * (r._1 - p._1)
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
        ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) true
    else onSegment(c, a, b) || onSegment(d, a, b) || onSegment(a, c, d) || onSegment(b, c, d)
  }

  /** Exact polygon-intersection test: any vertex containment or any edge
    * crossing (sufficient for simple polygons — the ST_Intersects of
    * controller.py:566). */
  def polygonsIntersect(p1: Seq[Pt], p2: Seq[Pt]): Boolean = {
    if (p1.isEmpty || p2.isEmpty) return false
    if (p1.exists(pointInPolygon(_, p2)) || p2.exists(pointInPolygon(_, p1))) return true
    val e1 = p1.indices.map(i => (p1(i), p1((i + 1) % p1.size)))
    val e2 = p2.indices.map(i => (p2(i), p2((i + 1) % p2.size)))
    e1.exists { case (a, b) => e2.exists { case (c, d) => segmentsIntersect(a, b, c, d) } }
  }

  // ---- Column-level API ----------------------------------------------------

  private val ptSchema = "array<struct<x:double,y:double>>"

  private def toPts(rows: Seq[org.apache.spark.sql.Row]): Seq[Pt] =
    if (rows == null) Seq.empty else rows.map(r => (r.getDouble(0), r.getDouble(1)))

  /** Named point row so UDF results carry x/y struct fields. */
  final case class PtRow(x: Double, y: Double)

  /** UDF: convex hull of an array<struct<x,y>> column. */
  val convexHullUdf = udf { rows: Seq[org.apache.spark.sql.Row] =>
    convexHull(toPts(rows)).map { case (x, y) => PtRow(x, y) }
  }

  /** UDF: exact polygon intersects (use after [[bboxIntersects]] prefilter). */
  val polygonsIntersectUdf = udf { (a: Seq[org.apache.spark.sql.Row], b: Seq[org.apache.spark.sql.Row]) =>
    polygonsIntersect(toPts(a), toPts(b))
  }

  /** Polygon extent as a bbox struct (utils.py:223–237 raster extent). */
  def polygonBbox(poly: Column): Column =
    bbox(
      array_min(transform(poly, p => p.getField("x"))),
      array_min(transform(poly, p => p.getField("y"))),
      array_max(transform(poly, p => p.getField("x"))),
      array_max(transform(poly, p => p.getField("y"))))

  /** Per-row extreme valid-pixel coordinates of a tile, as polygon points
    * feeding per-scene convex-hull footprints (utils.py:240–274). For each
    * tile row, emits the leftmost and rightmost valid pixel in global pixel
    * space. Exact: every convex-hull vertex is an x-extreme of its row, so
    * hull(per-tile row extremes) == hull(all valid pixels) while shipping
    * 2·h points per tile instead of w·h. */
  def tileRowExtremePoints(pixels: Column, nodata: Column, height: Column, width: Column,
                           windowRow: Column, windowCol: Column): Column = {
    val rows = sequence(lit(0), height - 1)
    val perRow = transform(rows, r => {
      val validCols = filter(sequence(lit(0), width - 1),
        c => element_at(pixels, r * width + c + 1) =!= nodata.cast("float"))
      val y = (r + windowRow * height).cast("double")
      val base = (windowCol * width).cast("double")
      when(size(validCols) > 0, array(
        struct((array_min(validCols) + base).as("x"), y.as("y")),
        struct((array_max(validCols) + base).as("x"), y.as("y"))))
        .otherwise(array().cast("array<struct<x:double,y:double>>"))
    })
    flatten(perRow)
  }
}
