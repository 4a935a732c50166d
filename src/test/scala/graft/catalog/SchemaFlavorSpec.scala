package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-physical-schema robustness, generalizing TsFlavorSpec from the one
  * axis that has drifted in the wild (r8's timestamp flavor) to every axis a
  * plausible parquet writer can move on: int width, float width, date32 vs
  * timestamp, array element width, dictionary encoding.
  *
  * Method (TsFlavorSpec mold): rewrite the ENTIRE sf0.001 table set into a
  * `drift/` dir with many flavors changed at once — int32↔int64 keys
  * (both directions), int16 keys, date32 dates, float64 `embedding`
  * elements, int32 counts — then assert (a) the raw files really differ,
  * (b) [[Tables.normalizePhysical]] restores the declared logical schema,
  * (c) a battery of queries spanning every drifted table hash-agrees with
  * the undrifted baseline, and (d) an UN-coercible flavor fails loudly with
  * the table+column named, not with a downstream analysis error.
  *
  * Every chosen drift is value-preserving on this data by construction
  * (keys fit int32, dates are midnight-pure — asserted in the fixture,
  * float64 elements are float32-representable because they were float32
  * first), so any disagreement is an engine bug, not fixture lossiness.
  * The reference never faces this class: SQLAlchemy/Postgres coerce at the
  * DDL boundary (models.py:45-51); normalizePhysical is that boundary.
  */
class SchemaFlavorSpec extends SparkSpec {

  /** table -> column retype map applied to build the drift fixture. */
  private val drifts: Map[String, Map[String, DataType]] = Map(
    "region"   -> Map("r_regionkey" -> LongType),
    "nation"   -> Map("n_nationkey" -> LongType, "n_regionkey" -> ShortType),
    "customer" -> Map("c_custkey" -> IntegerType, "c_nationkey" -> LongType),
    "supplier" -> Map("s_nationkey" -> ShortType),
    "part"     -> Map("p_size" -> LongType),
    "orders"   -> Map("o_orderdate" -> DateType),
    "lineitem" -> Map("l_linenumber" -> LongType, "l_shipdate" -> DateType),
    "events"   -> Map("user_id" -> IntegerType),
    "documents" -> Map("n_chars" -> IntegerType),
    "embeddings" -> Map("embedding" -> ArrayType(DoubleType), "label" -> LongType)
  )

  private lazy val tmpRoot: String = {
    val p = java.nio.file.Files.createTempDirectory("schema_flavor").toString
    // fixture honesty: the date drifts are lossless only on midnight-pure
    // data — assert it, so a future regeneration can't make this spec lie
    val midnightImpure = Tables.lineitem(spark, sf0001)
      .filter(date_trunc("day", col("l_shipdate")) =!= col("l_shipdate")).count() +
      Tables.orders(spark, sf0001)
        .filter(date_trunc("day", col("o_orderdate")) =!= col("o_orderdate")).count()
    assert(midnightImpure == 0L, "date-drift fixture would be lossy: " +
      s"$midnightImpure non-midnight timestamps in lineitem/orders")
    for ((t, retypes) <- drifts) {
      val base = Tables.table(spark, sf0001, t)
      val drifted = retypes.foldLeft(base) { case (d, (c, to)) =>
        d.withColumn(c, col(c).cast(to))
      }
      drifted.coalesce(1).write.mode("overwrite")
        // dictionary-encoded strings: the flavor the brief names; it never
        // reaches the logical schema but writing it here pins that claim
        .option("parquet.enable.dictionary", "true")
        .parquet(s"$p/drift/$t.parquet")
    }
    p
  }
  private def driftDir = s"$tmpRoot/drift"

  test("raw drift fixture really differs from the declared schema (honest fixture)") {
    for ((t, retypes) <- drifts; (c, to) <- retypes) {
      val dt = spark.read.parquet(s"$driftDir/$t.parquet").schema(c).dataType
      assert(dt == to, s"$t.$c: fixture wrote $dt, wanted drift $to")
      val want = Tables.declared(t).toMap.apply(c)
      assert(dt != want, s"$t.$c: drift $to collapsed back to declared $want in parquet")
    }
  }

  test("normalizePhysical restores the declared logical schema for every table") {
    for ((t, cols) <- Tables.declared) {
      val got = Tables.table(spark, driftDir, t).schema
      for ((c, want) <- cols)
        assert(got(c).dataType == want, s"$t.$c arrived as ${got(c).dataType}, declared $want")
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  test("queries spanning every drifted table hash-agree with the undrifted baseline") {
    // battery covers: lineitem+dates (q01), part (q02 reads lineitem;
    // q14 part? keep simple), customer/orders/lineitem joins with int-drifted
    // keys on BOTH sides (q03), orders (q05), events int32 user_id (q48),
    // documents (q23), embeddings float64 elements via typed getSeq[Float]
    // (q28 — dies without element coercion), region/nation/supplier (q06?
    // use q10-style join) — q17 hits supplier/nation/region where present.
    val battery = Seq(
      "q01_pricing_summary", "q02_conj_filter", "q03_top_revenue",
      "q05_count_by_status", "q06_count_by_day_type", "q23_token_stats",
      "q28_ann_topk", "q48_sessionization",
      // r10 additions: KLL sketch over int-drifted n_chars, anomaly
      // z-scores over the timestamp-flavored events.ts
      "q128_quantile_sketch", "q134_event_anomaly")
    for (q <- battery) {
      val baseline = rows(graft.SparkEntry.queries(q)(spark, sf0001))
      assert(baseline.nonEmpty, s"$q produced no rows on the base fixture")
      val got = rows(graft.SparkEntry.queries(q)(spark, driftDir))
      assert(got == baseline, s"$q disagrees on the drift fixture")
    }
  }

  test("an un-coercible flavor fails loudly naming table+column") {
    val p = s"$tmpRoot/badval"
    Tables.events(spark, sf0001)
      .withColumn("value", format_number(col("value"), 3))
      .coalesce(1).write.mode("overwrite").parquet(s"$p/events.parquet")
    val ex = intercept[IllegalStateException] { Tables.events(spark, p) }
    assert(ex.getMessage.contains("events") && ex.getMessage.contains("'value'"),
      s"boundary error must name table+column, got: ${ex.getMessage}")
    assert(ex.getMessage.contains("StringType"), s"must name the arrived type: ${ex.getMessage}")
  }

  test("a missing declared column fails loudly naming it") {
    val p = s"$tmpRoot/dropped"
    Tables.part(spark, sf0001).drop("p_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/part.parquet")
    val ex = intercept[IllegalStateException] { Tables.part(spark, p) }
    assert(ex.getMessage.contains("part") && ex.getMessage.contains("p_size"))
  }

  test("an additive (extra) column passes through and NTZ-normalizes") {
    val p = s"$tmpRoot/extra"
    Tables.events(spark, sf0001)
      .withColumn("ingested_at", col("ts").cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(s"$p/events.parquet")
    val got = Tables.events(spark, p)
    assert(got.schema("ingested_at").dataType == TimestampType,
      "extra NTZ column should still be normalized to LTZ")
    assert(got.count() == Tables.events(spark, sf0001).count())
  }

  test("a filter on a narrower-arrived key still pushes down through the widening cast") {
    // the 100 TB property the coercion layer must not break: c_custkey
    // arrives int32, is widened to declared int64; Catalyst unwraps
    // cast(int as bigint) > lit (UnwrapCastInBinaryComparison) so the
    // predicate still reaches the parquet scan.
    val df = Tables.customer(spark, driftDir)
      .filter(col("c_custkey") > 100L).select("c_name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), GreaterThan(c_custkey"),
      s"widened key filter not pushed to the parquet scan:\n$plan")
  }

  // ---- flavors only a NON-Spark writer can emit (pyarrow/pandas — the
  // driver's own generator stack): committed fixtures, since Spark cannot
  // write unsigned ints or INT96 itself. scripts note: generated from the
  // sf0.001 tables with pyarrow (uint casts / use_deprecated_int96_timestamps).

  private def resourceDir(tables: (String, String)*): String = {
    val p = java.nio.file.Files.createTempDirectory("flavor_res").toString
    for ((res, name) <- tables) {
      val in = getClass.getResourceAsStream(s"/graft/flavors/$res")
      assert(in != null, s"missing fixture $res")
      try java.nio.file.Files.copy(in, java.nio.file.Paths.get(s"$p/$name.parquet"))
      finally in.close()
    }
    p
  }

  test("pyarrow uint flavors (uint8/16/32/64 — DECIMAL(20,0) arrival) normalize and agree") {
    val dir = resourceDir("events_uint.parquet" -> "events", "nation_uint.parquet" -> "nation")
    // raw arrivals really are the exotic types (uint64 -> decimal(20,0))
    val rawEv = spark.read.parquet(s"$dir/events.parquet").schema
    assert(rawEv("event_id").dataType == DecimalType(20, 0), rawEv("event_id").dataType.toString)
    assert(rawEv("user_id").dataType == LongType) // uint32 widens to long
    val rawNa = spark.read.parquet(s"$dir/nation.parquet").schema
    assert(rawNa("n_nationkey").dataType == ShortType) // uint8
    assert(rawNa("n_regionkey").dataType == IntegerType) // uint16
    // normalized to declared
    val ev = Tables.events(spark, dir)
    assert(ev.schema("event_id").dataType == LongType &&
      ev.schema("user_id").dataType == LongType)
    assert(Tables.nation(spark, dir).schema("n_nationkey").dataType == IntegerType)
    // and values survive bit-exactly
    val base = Tables.events(spark, sf0001)
      .selectExpr("sum(event_id)", "sum(user_id)").head()
    val got = ev.selectExpr("sum(event_id)", "sum(user_id)").head()
    assert(got == base, s"uint flavor drifted values: $got vs $base")
  }

  test("legacy INT96 timestamps normalize to TIMESTAMP and agree") {
    val dir = resourceDir("events_int96.parquet" -> "events")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val base = rows(graft.SparkEntry.queries("q48_sessionization")(spark, sf0001))
    val got = rows(graft.SparkEntry.queries("q48_sessionization")(spark, dir))
    assert(got == base, "q48 disagrees on the INT96 flavor")
  }
}
