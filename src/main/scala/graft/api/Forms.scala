package graft.api

/** Request-form validation (SURVEY.md P6 — forms.py:120–234): plain-Scala
  * input validation before any plan is built, mirroring the reference's
  * marshmallow schemas: bbox sanity, mutually-exclusive search modes, task
  * type enum membership, WKT/GeoJSON-style geometry parsing.
  */
object Forms {

  val TaskTypes = Set("download", "correction", "publish", "post", "harmonization")

  final case class BBoxForm(w: Double, s: Double, e: Double, n: Double)

  final case class SearchForm(
      dataset: String,
      bbox: Option[BBoxForm] = None,
      scenes: Option[Seq[String]] = None,
      tiles: Option[Seq[String]] = None,
      startDate: Option[String] = None,
      endDate: Option[String] = None,
      cloud: Double = 100.0,
      tasks: Seq[String] = Nil)

  sealed trait Validation
  case object Valid extends Validation
  final case class Invalid(errors: Seq[String]) extends Validation

  /** forms.py:166–196: bbox w<=e s<=n; exactly one of bbox/scenes/tiles;
    * forms.py:120–127: task enum membership; date order. */
  def validate(f: SearchForm): Validation = {
    val errs = Seq.newBuilder[String]
    val modes = Seq(f.bbox.isDefined, f.scenes.exists(_.nonEmpty), f.tiles.exists(_.nonEmpty))
    if (modes.count(identity) != 1)
      errs += "exactly one of bbox/scenes/tiles is required (forms.py:180–196)"
    f.bbox.foreach { b =>
      if (b.w > b.e) errs += s"bbox west ${b.w} > east ${b.e} (forms.py:166–178)"
      if (b.s > b.n) errs += s"bbox south ${b.s} > north ${b.n} (forms.py:166–178)"
      if (b.w < -180 || b.e > 180 || b.s < -90 || b.n > 90) errs += "bbox out of range"
    }
    f.tasks.filterNot(TaskTypes).foreach(t =>
      errs += s"unknown task type '$t' (allowed: ${TaskTypes.mkString(",")}) (forms.py:123)")
    (f.startDate, f.endDate) match {
      case (Some(s), Some(e)) if s > e => errs += s"start_date $s after end_date $e"
      case _ =>
    }
    if (f.cloud < 0 || f.cloud > 100) errs += s"cloud ${f.cloud} outside [0,100]"
    val es = errs.result()
    if (es.isEmpty) Valid else Invalid(es)
  }

  /** Minimal WKT POLYGON parser (forms.py:222–234 tries WKT then GeoJSON):
    * outer ring only, returns x/y points. */
  def parseWktPolygon(wkt: String): Either[String, Seq[(Double, Double)]] = {
    val m = "(?i)^\\s*POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)".r
      .findFirstMatchIn(wkt.trim)
    m match {
      case None => Left(s"not a WKT POLYGON: '${wkt.take(40)}'")
      case Some(g) =>
        try {
          val pts = g.group(1).split(",").toSeq.map { pair =>
            val xy = pair.trim.split("\\s+")
            require(xy.length == 2, s"bad coordinate '$pair'")
            (xy(0).toDouble, xy(1).toDouble)
          }
          if (pts.size < 4) Left("polygon ring needs >= 4 points")
          else if (pts.head != pts.last) Left("polygon ring not closed")
          else Right(pts.init)
        } catch {
          case e: Exception => Left(s"WKT parse error: ${e.getMessage}")
        }
    }
  }
}
