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
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
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
