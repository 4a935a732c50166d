package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface of the reference's metadata API, re-expressed
  * as reusable DataFrame combinators (SURVEY.md §2.2–2.7).
  *
  * Reference citations (into /root/reference):
  *  - dynamic conjunctive filters: controller.py:86–110, 404–423
  *  - anti-join "skip already published": controller.py:298–337
  *  - 3-way status-count joins: controller.py:438–468
  *  - latest-run-per-group (raw-SQL CTE): controller.py:479–495
  *  - distinct tiles per collection: controller.py:683–690
  *  - provider priority failover order: collect.py:108–120
  *  - pagination: views.py:37–49
  *  - interval overlap predicate: controller.py:571–575
  *  - bbox intersection: controller.py:563–570
  *  - set reconciliation (check_scenes): controller.py:595–618
  *
  * All combinators are lazy `DataFrame -> DataFrame` transforms: Catalyst
  * handles pushdown/pruning/join selection; at cluster scale the small
  * dimension sides (nation/region/providers) are broadcast.
  */
object MetaQueries {

  /** Fold a dynamic list of predicates conjunctively (controller.py:86–110).
    * Empty list is rejected, mirroring the reference's "no restriction" guard.
    */
  def conjunctiveFilter(df: DataFrame, preds: Seq[Column]): DataFrame = {
    require(preds.nonEmpty, "restart requires at least one restriction (controller.py:99)")
    df.filter(preds.reduce(_ && _))
  }

  /** Candidates not yet published: left-anti membership on composite key
    * (controller.py:298–337). Broadcast-anti when the published side is small.
    */
  def notPublished(candidates: DataFrame, published: DataFrame, keys: Seq[String]): DataFrame =
    candidates.join(published, keys, "left_anti")

  /** Published membership (left-semi): the EXISTS side of the same check. */
  def published(candidates: DataFrame, published: DataFrame, keys: Seq[String]): DataFrame =
    candidates.join(published, keys, "left_semi")

  /** Count per group, ordered — the status/date count endpoints
    * (controller.py:438–468). Map-side partial agg + final hash agg.
    */
  def countBy(df: DataFrame, groups: Seq[Column], alias: String = "n"): DataFrame =
    df.groupBy(groups: _*).agg(count(lit(1)).as(alias))

  /** Latest row per group, the window form of the reference's raw-SQL
    * max-per-group CTE + self-join (controller.py:479–495). One shuffle on
    * the group keys instead of the CTE's aggregate + theta-join.
    * `tieBreakers` make the top-1 deterministic.
    */
  def latestPerGroup(df: DataFrame, groupKeys: Seq[Column], orderCol: Column,
                     tieBreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(groupKeys: _*)
      .orderBy((orderCol.desc +: tieBreakers.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Pagination (views.py:37–49): ORDER BY ... OFFSET ... LIMIT. Executed as
    * a global sort + CollectLimit; at scale prefer keyset pagination
    * (predicate on last-seen key) which this also supports via `after`.
    */
  def paginate(df: DataFrame, order: Seq[Column], page: Int, perPage: Int = 10): DataFrame =
    df.orderBy(order: _*).offset((page - 1) * perPage).limit(perPage)

  /** Keyset pagination — the deep-page scale path: `key > lastSeen` pushes
    * to the scan (row-group pruning on a sorted/partitioned key), and the
    * plan is TakeOrderedAndProject — per-partition top-k, no global sort,
    * no OFFSET scan of the skipped pages. Page N costs the same as page 1
    * at any depth. */
  def paginateKeyset(df: DataFrame, key: Column, lastSeen: Any, perPage: Int = 10): DataFrame =
    df.filter(key > lit(lastSeen)).orderBy(key.asc).limit(perPage)

  /** Temporal interval-overlap predicate (controller.py:571–575). The three
    * OR arms of the reference collapse to `s <= pe && e >= ps`.
    */
  def intervalOverlap(start: Column, end: Column, pStart: Column, pEnd: Column): Column =
    start <= pEnd && end >= pStart

  /** Cheap bbox intersection on (xmin,ymin,xmax,ymax) structs — the
    * pushdown-friendly prefilter for ST_Intersects (controller.py:563–570).
    */
  def bboxOverlap(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
                  qxmin: Double, qymin: Double, qxmax: Double, qymax: Double): Column =
    !(xmax < lit(qxmin) || xmin > lit(qxmax) || ymax < lit(qymin) || ymin > lit(qymax))

  /** Two-phase spatial search (controller.py:563–570): cheap bbox-struct
    * overlap predicate (codegen, pushdown-friendly) prunes the scan, exact
    * polygon intersection (UDF) runs only on bbox survivors — the same
    * envelope-then-exact split PostGIS uses with its GiST index. `items`
    * needs `bbox` (struct) and `footprint` (array<struct<x,y>>) columns. */
  def spatialSearch(items: DataFrame, queryPoly: Seq[(Double, Double)]): DataFrame = {
    import graft.expr.Geo
    require(queryPoly.size >= 3, "query polygon needs >= 3 points")
    val qxs = queryPoly.map(_._1); val qys = queryPoly.map(_._2)
    val qBbox = Geo.bbox(lit(qxs.min), lit(qys.min), lit(qxs.max), lit(qys.max))
    val qLit = typedLit(queryPoly.map { case (x, y) => Geo.PtRow(x, y) })
    items
      .filter(Geo.bboxIntersects(col("bbox"), qBbox))
      .filter(Geo.polygonsIntersectUdf(col("footprint"), qLit))
  }

  /** Set reconciliation (controller.py:595–618): external − internal. */
  def missingScenes(external: DataFrame, internal: DataFrame, key: String): DataFrame =
    external.join(internal, Seq(key), "left_anti")

  /** Cube-item end-date from the collection's temporal composition
    * (publish.py:321–330): `start + (step−1) unit` with the clock pinned
    * to 23:59:59 — e.g. a 16-day MODIS composite starting 2020-01-01 ends
    * 2020-01-16 23:59:59. */
  def compositionEnd(start: Column, step: Int, unit: String): Column = {
    require(step >= 1, s"step must be >= 1, got $step")
    val base = unit match {
      case "day"   => start + expr(s"interval ${step - 1} days")
      case "month" => add_months(start, step - 1)
      case "year"  => add_months(start, (step - 1) * 12)
      case other   => throw new IllegalArgumentException(s"unit must be day|month|year, got $other")
    }
    to_timestamp(concat(date_format(base, "yyyy-MM-dd"), lit(" 23:59:59")))
  }

  /** Calendar periods (controller.py:45–68): month- or year-aligned tumbling
    * windows over [start, end], as a DataFrame of (period_start, period_end).
    * Built with sequence+explode — no driver-side loop.
    */
  def periods(df: DataFrame, start: Column, end: Column, unit: String = "month"): DataFrame = {
    val step = unit match {
      case "month" => expr("interval 1 month")
      case "year"  => expr("interval 1 year")
      case other   => throw new IllegalArgumentException(s"unit must be month|year, got $other")
    }
    df.select(explode(sequence(date_trunc(unit, start), date_trunc(unit, end), step)).as("period_start"))
      .select(col("period_start"),
        (col("period_start") + step - expr("interval 1 second")).as("period_end"))
  }
}
