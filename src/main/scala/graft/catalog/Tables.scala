package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table layer over the parquet catalog.
  *
  * The reference keeps its catalog in PostgreSQL/PostGIS (SQLAlchemy models,
  * `bdc_collection_builder/celery/models.py`); this engine reads columnar
  * parquet directly so Catalyst can push filters/projections into the scan.
  */
object Tables {
  /** Read one table from a scale-factor directory (`TESTDATA.md` layout).
    *
    * Parquet TIMESTAMP(NANOS) columns (the `events.ts` physical type) are
    * unsupported by Spark's vectorized reader; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so they arrive as
    * nano-epoch longs, and this layer truncates them to microsecond
    * timestamps — the same truncation DuckDB applies, keeping oracle
    * comparisons exact.
    */
  // Schema cache: footer-based inference costs a driver-side file read per
  // spark.read.parquet call; a query surface that re-reads the same tables
  // hundreds of times should pay it once per path. (At cluster scale this
  // is the catalog's job — a metastore table carries its schema.)
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events" && schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer `div`, not `/`: double division loses sub-µs precision for
      // epoch-nanos beyond 2^53 and drifts ±1 µs from the oracle's
      // truncating nanos→micros conversion
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame    = table(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
