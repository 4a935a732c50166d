package graft.api

import org.scalatest.funsuite.AnyFunSuite

class FormsSpec extends AnyFunSuite {
  import Forms._

  private val base = SearchForm(dataset = "S2MSI1C",
    bbox = Some(BBoxForm(-46, -12, -44, -10)), tasks = Seq("download", "publish"))

  test("valid bbox form passes") {
    assert(validate(base) == Valid)
  }

  test("bbox sanity: w<=e, s<=n, world bounds (forms.py:166–178)") {
    val Invalid(e1) = validate(base.copy(bbox = Some(BBoxForm(-44, -12, -46, -10)))): @unchecked
    assert(e1.exists(_.contains("west")))
    val Invalid(e2) = validate(base.copy(bbox = Some(BBoxForm(-46, -10, -44, -12)))): @unchecked
    assert(e2.exists(_.contains("south")))
    val Invalid(e3) = validate(base.copy(bbox = Some(BBoxForm(-200, -12, -44, -10)))): @unchecked
    assert(e3.exists(_.contains("out of range")))
  }

  test("mutually exclusive bbox/scenes/tiles (forms.py:180–196)") {
    val Invalid(e1) = validate(base.copy(scenes = Some(Seq("S2A_X")))): @unchecked
    assert(e1.exists(_.contains("exactly one")))
    val Invalid(e2) = validate(base.copy(bbox = None)): @unchecked
    assert(e2.exists(_.contains("exactly one")))
    assert(validate(base.copy(bbox = None, tiles = Some(Seq("23LLF")))) == Valid)
  }

  test("task type enum membership (forms.py:123)") {
    val Invalid(e) = validate(base.copy(tasks = Seq("download", "explode"))): @unchecked
    assert(e.exists(_.contains("unknown task type 'explode'")))
  }

  test("date order + cloud range") {
    val Invalid(e) = validate(base.copy(startDate = Some("2020-02-01"),
      endDate = Some("2020-01-01"), cloud = 120)): @unchecked
    assert(e.size == 2)
  }

  test("WKT round-trips through WKB for random convex rings") {
    val rng = new scala.util.Random(3)
    for (_ <- 1 to 25) {
      val pts = graft.expr.Geo.convexHull(
        Seq.fill(12)((rng.nextDouble() * 100, rng.nextDouble() * 100)))
      if (pts.size >= 3) {
        val wkb = graft.expr.Wkb.fromPolygon(pts)
        assert(graft.expr.Wkb.toPolygon(wkb) == Right(pts))
      }
    }
  }

  test("WKT POLYGON parse + failure modes (forms.py:222–234)") {
    val ok = parseWktPolygon("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(ok == Right(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))))
    assert(parseWktPolygon("LINESTRING(0 0, 1 1)").isLeft)
    assert(parseWktPolygon("POLYGON((0 0, 1 1, 0 0))").isLeft)     // too few points
    assert(parseWktPolygon("POLYGON((0 0, 4 0, 4 4, 0 4))").isLeft) // not closed
    assert(parseWktPolygon("POLYGON((a b, c d, e f, a b))").isLeft)
  }
}
