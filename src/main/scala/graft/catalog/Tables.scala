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
    normalizePhysical(df, name)
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

  /** The DECLARED logical schema of each catalog table — the contract every
    * consumer (queries, oracles, encoders, streaming) is written against.
    * The reference gets this layer for free from SQLAlchemy's column types
    * (models.py:45-51 — Postgres coerces whatever the client sends to the
    * declared DDL type); a parquet lake has no such boundary, and the r8
    * NTZ episode proved one writer change can silently break queries, so
    * [[normalizePhysical]] re-creates the boundary here.
    */
  private[graft] val declared: Map[String, Seq[(String, org.apache.spark.sql.types.DataType)]] = {
    import org.apache.spark.sql.types._
    Map(
      "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                        "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
                        "p_brand" -> StringType, "p_type" -> StringType,
                        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                        "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
                        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                        "l_shipdate" -> TimestampType),
      "events"   -> Seq("event_id" -> LongType, "ts" -> TimestampType,
                        "user_id" -> LongType, "event_type" -> StringType,
                        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
                        "lang" -> StringType, "source" -> StringType,
                        "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
                          "embedding" -> ArrayType(FloatType),
                          "label" -> IntegerType)
    )
  }

  /** Coerce a frame's arrived physical flavor to the table's declared
    * logical schema ([[declared]]), generalizing [[normalizeTimestamps]]
    * from the one axis that has drifted in the wild (r8's timestamp[ns] →
    * timestamp[us]-NTZ) to every axis a plausible parquet writer can move
    * on: int width (int16/int32/int64 keys), float width (float32/float64
    * values and `embedding` elements), date32 vs timestamp, naive vs
    * UTC-adjusted timestamps, nano-long timestamps. Dictionary/plain string
    * encoding never reaches the logical schema (Spark reads both as
    * STRING) but is pinned by SchemaFlavorSpec anyway.
    *
    * Rules, per declared column:
    *  - arrived == declared → untouched (the normal path adds zero plan
    *    nodes, so a non-drifted read costs nothing);
    *  - a known-coercible pair → a single `cast` (integral↔integral,
    *    float↔double, date→timestamp, NTZ→LTZ under the pinned UTC session
    *    zone, nano-epoch LONG → timestamp via integer `div` — see the
    *    timestamp notes above). Narrowing integral casts run under ANSI, so
    *    a value that genuinely doesn't fit fails loudly at runtime instead
    *    of wrapping;
    *  - anything else (e.g. a numeric column arriving as STRING) → throw
    *    immediately, naming table+column+both types, so the failure is one
    *    named boundary error instead of dozens of downstream analysis
    *    errors — same contract as [[requireEventTime]];
    *  - a declared column MISSING from the file → throw, naming it;
    *  - an EXTRA column → passed through (additive drift is harmless),
    *    with NTZ timestamps still normalized to LTZ.
    */
  private[graft] def normalizePhysical(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.types._
    declared.get(name) match {
      case None => normalizeTimestamps(df, name) // unknown table: legacy ts-only pass
      case Some(cols) =>
        val arrived = df.schema.fields.map(f => f.name -> f.dataType).toMap
        val coerced = cols.foldLeft(df) { case (d, (c, want)) =>
          arrived.get(c) match {
            case None => throw new IllegalStateException(
              s"table '$name' is missing declared column '$c' — the writer " +
                s"dropped or renamed it; fix the fixture or update Tables.declared")
            case Some(got) if got == want => d
            case Some(got) =>
              coercion(got, want) match {
                case Some(fn) => d.withColumn(c, fn(col(c)))
                case None => throw new IllegalStateException(
                  s"table '$name' column '$c' arrived as $got but is declared " +
                    s"$want and no safe coercion exists — a new physical flavor " +
                    s"needs a branch in Tables.normalizePhysical")
              }
          }
        }
        // extra (undeclared) columns: still normalize NTZ so ad-hoc
        // consumers of additive drift get LTZ event time like everyone else
        val declaredNames = cols.map(_._1).toSet
        val extraNtz = coerced.schema.fields.collect {
          case f if !declaredNames.contains(f.name) && f.dataType == TimestampNTZType => f.name
        }
        val out = extraNtz.foldLeft(coerced)((d, c) =>
          d.withColumn(c, col(c).cast(TimestampType)))
        if (name == "events") requireEventTime(out, name, "ts") else out
    }
  }

  /** The safe physical→logical coercion table. Returns the column rewrite,
    * or None when the pair is not a flavor of the same logical type (which
    * [[normalizePhysical]] turns into a named boundary error).
    */
  private def coercion(got: org.apache.spark.sql.types.DataType,
                       want: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      // parquet UINT_64 (a pandas/pyarrow uint64 id column) arrives as
      // DECIMAL(20,0) — integral in all but name; the ANSI cast to the
      // declared type fails loudly on any value that genuinely overflows
      case d: DecimalType if d.scale == 0 => true
      case _ => false
    }
    def floating(t: DataType) = t == FloatType || t == DoubleType
    (got, want) match {
      // nano-epoch long under spark.sql.legacy.parquet.nanosAsLong=true —
      // the only way a LONG arrives for a declared-timestamp column.
      // Integer div, not double /: ±1 µs drift past 2^53 (r8 postmortem).
      case (LongType, TimestampType) =>
        Some(c => timestamp_micros(call_function("div", c, lit(1000L))))
      case (TimestampNTZType, TimestampType) => Some(_.cast(TimestampType))
      case (DateType, TimestampType)         => Some(_.cast(TimestampType))
      case (g, w) if integral(g) && integral(w) => Some(_.cast(w))
      case (g, w) if floating(g) && floating(w) => Some(_.cast(w))
      case (ArrayType(ge, _), ArrayType(we, wn))
          if (integral(ge) && integral(we)) || (floating(ge) && floating(we)) =>
        Some(_.cast(ArrayType(we, wn)))
      case _ => None
    }
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
