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
    * Timestamp columns are normalized to TIMESTAMP (LTZ) regardless of the
    * writer's physical flavor — see [[normalizeTimestamps]].
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
    normalizeTimestamps(df, name)
  }

  /** Normalize the physical timestamp flavor of source columns so every
    * consumer sees TIMESTAMP (LTZ) event time, whatever the writer emitted.
    * Three flavors appear in the wild (the reference's tz-aware SQLAlchemy
    * columns vs naive literals, `models.py` / alembic
    * 06fab6583881_activities.py:34-35, are the same ambiguity on the
    * Postgres side):
    *
    *  - parquet `timestamp[ns]` — unsupported by Spark's vectorized reader;
    *    sessions set `spark.sql.legacy.parquet.nanosAsLong=true` so the
    *    column arrives as nano-epoch LONG and is truncated to µs here.
    *    Integer `div`, not `/`: double division loses sub-µs precision past
    *    2^53 and drifts ±1 µs from the oracle's truncating conversion.
    *  - parquet `timestamp[us]` without UTC adjustment → TIMESTAMP_NTZ.
    *    Cast to TIMESTAMP interprets the wall-clock in the session time
    *    zone; graft sessions pin `spark.sql.session.timeZone=UTC`, so the
    *    epoch value is bit-identical to the oracle's naive reading.
    *  - parquet `timestamp[us]` UTC-adjusted → TIMESTAMP already; no-op.
    *
    * Normalizing here — once, at the source layer — keeps `unix_micros`,
    * watermarks, and z-order quantile casts working unconditionally
    * downstream, and (at 100 TB) keeps the column a pushdown-eligible
    * native timestamp instead of a per-query CAST wall.
    */
  private[graft] def normalizeTimestamps(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val tsLong = name == "events" &&
      df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType)
    val ntzCols = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    val afterNanos =
      if (tsLong) df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    val out = ntzCols.foldLeft(afterNanos)((d, c) =>
      d.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType)))
    if (name == "events") requireEventTime(out, name, "ts") else out
  }

  /** Post-normalization gate: if a declared event-time column still isn't
    * TIMESTAMP, a fourth physical flavor has appeared — fail loudly with
    * the table and column named, instead of letting every downstream
    * `unix_micros`/watermark die with an anonymous analysis error.
    */
  private[graft] def requireEventTime(df: DataFrame, table: String, col: String): DataFrame = {
    val dt = df.schema.fields.find(_.name == col).map(_.dataType)
    dt match {
      case None | Some(org.apache.spark.sql.types.TimestampType) => df
      case Some(other) => throw new IllegalStateException(
        s"table '$table' column '$col' is event time but arrived as $other " +
          s"after normalization — a new physical timestamp flavor needs a " +
          s"branch in Tables.normalizeTimestamps")
    }
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
