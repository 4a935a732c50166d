package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.concurrent.ConcurrentHashMap

/** §2.1 S1 live-provider path — a DataSource V2 connector for remote
  * imagery catalogs with REAL filter pushdown: Catalyst hands the scan its
  * predicates (`SupportsPushDownFilters`), the supported subset translates
  * into the provider search call (dataset / cloud-cover / date-range — the
  * parameters `provider.search` takes at controller.py:263–295), and only
  * the residual evaluates in Spark. Column pruning
  * (`SupportsPushDownRequiredColumns`) reaches the row materialization.
  *
  * The provider callback runs DRIVER-side at planning time (the reference's
  * search is a synchronous HTTPS call too); result records ship to
  * executors inside input partitions, `partitionSize` scenes each. That is
  * the right shape for catalog-scale results (10³–10⁶ records per query) —
  * the 100 TB pixel payload never flows through this source, only scene
  * METADATA does.
  *
  * Providers register driver-side under a name (the reference's
  * entry-point driver registry, utils.py:472–483):
  * {{{
  * RemoteCatalog.register("usgs", filters => search(filters))
  * spark.read.format("remote_catalog").option("provider", "usgs").load()
  *   .filter($"cloud_cover" <= 20 && $"dataset" === "S2_MSI_L1C")
  * }}}
  */
object RemoteCatalog {
  /** A provider search: receives the pushed-down Catalyst source filters,
    * returns matching scene records. Implementations translate the filters
    * into their query API (bbox/date/cloud params) and MAY over-return —
    * Spark re-applies every filter after the scan, so pushdown is an
    * optimization contract, not a correctness one. */
  type SearchFn = Seq[Filter] => Seq[SceneRecord]

  /** Search that also receives a pushed-down LIMIT (the reference's
    * provider APIs take a max-results parameter, collect.py:80–137);
    * `None` = unbounded. Providers may return fewer or more rows — Spark
    * keeps its own Limit on top (partial pushdown), so the wire limit is
    * a transfer-volume optimization like the filters. */
  type SearchFnLimited = (Seq[Filter], Option[Int]) => Seq[SceneRecord]

  final case class SceneRecord(scene_id: String, dataset: String,
                               cloud_cover: Double, sensing_micros: Long, link: String)

  /** Matched-count for the pushed filters WITHOUT fetching items — the
    * STAC `context.matched` field of a search response. Only meaningful
    * for providers whose filtering is exact; `None` = cannot count (Spark
    * falls back to scanning). */
  type CountFn = Seq[Filter] => Option[Long]

  /** A registered provider: the search, an optional matched-count call,
    * and — for count pushdown to be sound — which filter SHAPES the
    * provider applies EXACTLY (vs. over-returning approximations like a
    * bbox envelope or a >=-for-> date param). Filters outside `isExact`
    * stay residual in Spark, which automatically disables aggregate
    * pushdown for them (Catalyst never pushes an aggregate past a
    * post-scan filter). */
  final case class Provider(search: SearchFnLimited,
                            count: Option[CountFn] = None,
                            isExact: Filter => Boolean = _ => false)

  val schema: StructType = StructType(Seq(
    StructField("scene_id", StringType),
    StructField("dataset", StringType),
    StructField("cloud_cover", DoubleType),
    StructField("sensing_date", TimestampType),
    StructField("link", StringType)))

  private val registry = new ConcurrentHashMap[String, Provider]()
  def register(name: String, fn: SearchFn): Unit =
    registry.put(name, Provider((filters, _) => fn(filters)))
  def registerLimited(name: String, fn: SearchFnLimited): Unit =
    registry.put(name, Provider(fn))
  /** Register a provider whose filtering is exact for the shapes `isExact`
    * accepts, enabling COUNT(*) pushdown via `count` (the reference's
    * paginated search reports a total without shipping pages). */
  def registerExact(name: String, fn: SearchFnLimited, count: CountFn,
                    isExact: Filter => Boolean): Unit =
    registry.put(name, Provider(fn, Some(count), isExact))
  def lookup(name: String): Provider =
    Option(registry.get(name)).getOrElse(
      throw new IllegalArgumentException(s"no remote catalog provider registered as '$name'"))
}

class RemoteCatalogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "remote_catalog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RemoteCatalog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new RemoteCatalogTable(Option(properties.get("provider")).getOrElse(
      throw new IllegalArgumentException("remote_catalog requires option 'provider'")),
      Option(properties.get("partitionSize")).map(_.toInt).getOrElse(1000))
}

private class RemoteCatalogTable(provider: String, partitionSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"remote_catalog($provider)"
  override def schema(): StructType = RemoteCatalog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RemoteCatalogScanBuilder(provider, partitionSize)
}

private class RemoteCatalogScanBuilder(provider: String, partitionSize: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private val prov = RemoteCatalog.lookup(provider)
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RemoteCatalog.schema
  private var limit: Option[Int] = None
  private var pushedCount: Option[Long] = None

  /** LIMIT reaches the provider as its max-results parameter. Partial
    * pushdown (the default): Spark keeps its own Limit above the scan, so
    * a provider that ignores or over-satisfies the bound stays correct;
    * Catalyst only offers the limit here when no residual filter sits
    * between it and the scan. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** Hand every filter over searchable columns to the provider search.
    * Filters the provider applies EXACTLY (declared at registration) are
    * consumed here; everything else returns as residual — DSv2 treats
    * filters absent from the return value as exactly applied by the
    * source, and default providers are allowed to over-return (their
    * query APIs are approximate — bbox envelopes, date granularity), so
    * for them pushdown stays a pure transfer-volume optimization. The
    * exact subset is what makes aggregate pushdown reachable: Catalyst
    * never pushes an aggregate past a post-scan residual filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val searchable = Set("scene_id", "dataset", "cloud_cover", "sensing_date")
    pushed = filters.filter(_.references.forall(searchable.contains))
    filters.filterNot(f => pushed.contains(f) && prov.isExact(f))
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** COUNT(*) with no grouping pushes down as the provider's matched-count
    * call (the STAC `context.matched` field): the catalog answers "how
    * many scenes match" WITHOUT shipping a single record — the reference
    * reads the same total off its paginated search head page. Sound only
    * because (a) Catalyst offers aggregates only when no residual filter
    * remains, and (b) the provider declared those filters exact. The
    * count is fetched here (driver-side, planning time — the same place
    * the search runs) so a provider that cannot count this query simply
    * declines and Spark falls back to scanning. */
  override def pushAggregation(agg: Aggregation): Boolean =
    prov.count match {
      case Some(countFn) if agg.groupByExpressions.isEmpty &&
          agg.aggregateExpressions.length == 1 &&
          agg.aggregateExpressions()(0).isInstanceOf[CountStar] =>
        pushedCount = countFn(pushed.toSeq)
        pushedCount.isDefined
      case _ => false
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    // the provider's matched-count is the FINAL answer, not a partial
    prov.count.isDefined && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]

  override def build(): Scan =
    new RemoteCatalogScan(provider, partitionSize, pushed, required, limit,
      pushedCount)
}

private class RemoteCatalogScan(provider: String, partitionSize: Int,
                                pushed: Array[Filter], required: StructType,
                                limit: Option[Int], pushedCount: Option[Long])
    extends Scan with Batch {
  override def readSchema(): StructType = pushedCount match {
    case Some(_) => StructType(Seq(StructField("count(*)", LongType, nullable = false)))
    case None    => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"remote_catalog($provider) PushedFilters: [${pushed.mkString(", ")}]" +
      limit.map(l => s" PushedLimit: $l").getOrElse("") +
      pushedCount.map(_ => " PushedAggregates: [COUNT(*)]").getOrElse("")

  // driver-side search at planning time, grouped into partitions; the
  // limit re-applies locally in case the provider over-returns. A pushed
  // COUNT(*) skips the search entirely — one partition carrying the
  // provider's matched-count.
  override def planInputPartitions(): Array[InputPartition] =
    pushedCount match {
      case Some(n) => Array(CountPartition(n): InputPartition)
      case None =>
        val found = RemoteCatalog.lookup(provider).search(pushed.toSeq, limit)
        limit.fold(found)(found.take)
          .grouped(partitionSize)
          .map(g => ScenePartition(g.toArray): InputPartition)
          .toArray
    }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        partition match {
          case CountPartition(n) => new PartitionReader[InternalRow] {
            private var emitted = false
            override def next(): Boolean = { val h = !emitted; emitted = true; h }
            override def get(): InternalRow = InternalRow(n)
            override def close(): Unit = ()
          }
          case p: ScenePartition =>
            val rows = p.records.iterator
            new PartitionReader[InternalRow] {
              private var current: RemoteCatalog.SceneRecord = _
              override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
              override def get(): InternalRow =
                InternalRow.fromSeq(cols.toSeq.map {
                  case "scene_id" => UTF8String.fromString(current.scene_id)
                  case "dataset" => UTF8String.fromString(current.dataset)
                  case "cloud_cover" => current.cloud_cover
                  case "sensing_date" => current.sensing_micros
                  case "link" => UTF8String.fromString(current.link)
                })
              override def close(): Unit = ()
            }
        }
    }
  }
}

private case class ScenePartition(records: Array[RemoteCatalog.SceneRecord])
    extends InputPartition
private case class CountPartition(n: Long) extends InputPartition
