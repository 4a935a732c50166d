package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import Geo._

  test("convex hull of an L-shaped mask (FIXTURES.md §6)") {
    // L-shape: unit squares (0,0)-(2,1) plus (0,1)-(1,3)
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0),
      (1.0, 2.0), (1.0, 3.0), (0.0, 3.0), (0.0, 1.0), (0.5, 0.5))
    val hull = convexHull(pts)
    assert(hull.toSet == Set((0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 3.0), (0.0, 3.0)))
  }

  test("convex hull degenerate cases") {
    assert(convexHull(Seq((1.0, 1.0))) == Seq((1.0, 1.0)))
    assert(convexHull(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0))).toSet ==
      Set((0.0, 0.0), (2.0, 2.0))) // collinear
  }

  test("point in polygon incl. boundary") {
    val sq = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    assert(pointInPolygon((2.0, 2.0), sq))
    assert(pointInPolygon((0.0, 2.0), sq)) // boundary
    assert(!pointInPolygon((5.0, 2.0), sq))
  }

  test("polygon intersection: overlap, containment, disjoint, edge-touch") {
    val a = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))
    val b = Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))
    val c = Seq((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0))
    val inner = Seq((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5))
    val touch = Seq((2.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0))
    assert(polygonsIntersect(a, b))
    assert(polygonsIntersect(a, inner)) // containment
    assert(!polygonsIntersect(a, c))
    assert(polygonsIntersect(a, touch)) // shared edge
  }

  test("bboxIntersects column predicate matches exact check") {
    import spark.implicits._
    val df = Seq((0.0, 0.0, 2.0, 2.0, 1.0, 1.0, 3.0, 3.0, true),
      (0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, false))
      .toDF("ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1", "expected")
    val got = df.select(bboxIntersects(
      bbox(col("ax0"), col("ay0"), col("ax1"), col("ay1")),
      bbox(col("bx0"), col("by0"), col("bx1"), col("by1"))).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("tileRowExtremePoints + hull = scene footprint (R6 pipeline)") {
    import spark.implicits._
    // 4×4 tile with a diamond of valid pixels
    val px = Array(
      -9999f, -9999f, 1f, -9999f,
      -9999f, 1f, 1f, 1f,
      1f, 1f, 1f, 1f,
      -9999f, 1f, 1f, -9999f)
    val df = Seq((px, -9999.0, 4, 4, 0, 0)).toDF("pixels", "nodata", "h", "w", "wr", "wc")
    val pts = df.select(tileRowExtremePoints(col("pixels"), col("nodata"),
      col("h"), col("w"), col("wr"), col("wc")).as("pts"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))
    // row extremes: (2,0),(2,0),(1,1),(3,1),(0,2),(3,2),(1,3),(2,3)
    assert(pts.toSet == Set((2.0, 0.0), (1.0, 1.0), (3.0, 1.0), (0.0, 2.0),
      (3.0, 2.0), (1.0, 3.0), (2.0, 3.0)))
    val hull = convexHull(pts)
    // (1,1) is collinear on the (0,2)-(2,0) edge, so it is not a vertex
    assert(hull.toSet == Set((2.0, 0.0), (3.0, 1.0), (3.0, 2.0), (2.0, 3.0),
      (1.0, 3.0), (0.0, 2.0)))
  }

  test("WKB polygon round-trip incl. Column codecs (publish.py:272–273)") {
    val ring = Seq((-45.25, -10.5), (-44.0, -10.5), (-44.0, -11.0), (-45.25, -11.0))
    val wkb = Wkb.fromPolygon(ring)
    assert(Wkb.toPolygon(wkb) == Right(ring))
    assert(Wkb.toPolygon("junk".getBytes).isLeft)
    assert(Wkb.toPolygon(Array[Byte](1, 2, 0, 0, 0)).isLeft) // LINESTRING type
    import spark.implicits._
    val df = Seq(Seq((-45.25, -10.5), (-44.0, -10.5), (-44.0, -11.0))).toDF("poly")
      .select(col("poly").cast("array<struct<x:double,y:double>>").as("poly"))
    val rt = df.select(Wkb.toPolygonUdf(Wkb.fromPolygonUdf(col("poly"))).as("back"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rt == Seq((-45.25, -10.5), (-44.0, -10.5), (-44.0, -11.0)))
  }

  test("polygonBbox computes extent struct (R5)") {
    import spark.implicits._
    val df = Seq(Seq((1.0, 5.0), (3.0, 2.0), (2.0, 8.0))).toDF("poly")
      .select(col("poly").cast("array<struct<x:double,y:double>>").as("poly"))
    val r = df.select(polygonBbox(col("poly")).as("b")).head().getStruct(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) == (1.0, 2.0, 3.0, 8.0))
  }

  test("UTM↔WGS84: anchors, round-trip, hemisphere handling (R5/R8, §7(c))") {
    // anchor: a point ON the central meridian at the equator maps to the
    // false easting with northing 0 (north) / 1e7 (south)
    val (e0, n0) = Crs.wgs84ToUtm(0.0, -45.0, zone = 23, north = true)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    val (_, nS) = Crs.wgs84ToUtm(0.0, -45.0, zone = 23, north = false)
    assert(math.abs(nS - 10000000.0) < 1e-6)
    // scale at the central meridian is k0: 1° of latitude ≈ 110574.39 m * k0⁻¹…
    // checked via round-trip instead of absolute values:
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val lat = rnd.nextDouble() * 160 - 80          // stay off the poles
      val lon = -45.0 + (rnd.nextDouble() * 6 - 3)   // inside zone 23
      val north = lat >= 0
      val (e, n) = Crs.wgs84ToUtm(lat, lon, 23, north)
      val (lat2, lon2) = Crs.utmToWgs84(e, n, 23, north)
      assert(math.abs(lat2 - lat) < 1e-7 && math.abs(lon2 - lon) < 1e-7,
        s"round-trip drifted at ($lat, $lon) -> ($lat2, $lon2)")
    }
    // a Sentinel-2 scene corner (T23LLF-ish): forward then inverse lands
    // within a micrometre, and easting/northing are in-range for the zone
    val (se, sn) = Crs.wgs84ToUtm(-9.5, -45.8, 23, north = false)
    assert(se > 100000 && se < 900000 && sn > 0 && sn < 10000000)
    // Column wrapper
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq((se, sn)).toDF("e", "n")
      .select(Crs.utmToWgs84Col(col("e"), col("n"), lit(23), lit(false)).as("p"))
      .head().getStruct(0)
    assert(math.abs(got.getDouble(0) - (-9.5)) < 1e-7 && math.abs(got.getDouble(1) - (-45.8)) < 1e-7)
  }

  test("MODIS sinusoidal round-trip (hdf.py grid)") {
    for ((lat, lon) <- Seq((0.0, 0.0), (-10.0, -52.3), (45.0, 120.0))) {
      val (x, y) = Crs.wgs84ToSinusoidal(lat, lon)
      val (lat2, lon2) = Crs.sinusoidalToWgs84(x, y)
      assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lon2 - lon) < 1e-9)
    }
    // h13v10-style tile offsets are metres on a 6371007.181 m sphere:
    // 10° of longitude at the equator ≈ 1111950.9 m
    val (x10, _) = Crs.wgs84ToSinusoidal(0.0, 10.0)
    assert(math.abs(x10 - 1111950.9) < 1.0)
  }
}
