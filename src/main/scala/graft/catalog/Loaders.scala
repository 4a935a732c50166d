package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{BandDef, CollectionDef, ProviderDef}

/** Collection/provider JSON loaders (SURVEY.md S13): the engine's
  * equivalent of `load_providers` (cli.py:68–117) and `create_collection`
  * (collections/utils.py:578–611), reading the examples/data JSON shape
  * into typed defs. Spark's multiLine JSON reader handles directories of
  * definition files; band `metadata.expression.value` strings are surfaced
  * as `BandDef.expression` ready for the [[graft.expr.BandExpressionCompiler]].
  */
object Loaders {

  /** Load collection definition JSON files (sentinel-2-l2a.json shape). */
  def loadCollections(spark: SparkSession, path: String): Seq[CollectionDef] = {
    val df = spark.read.option("multiLine", true).json(path)
    df.collect().toSeq.map { row =>
      def opt[T](name: String): Option[T] =
        if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
          Some(row.getAs[T](name)) else None
      val bands: Seq[BandDef] = opt[scala.collection.Seq[org.apache.spark.sql.Row]]("bands").getOrElse(Nil).toSeq.map { b =>
        def bopt[T](n: String): Option[T] =
          if (b.schema.fieldNames.contains(n) && !b.isNullAt(b.fieldIndex(n)))
            Some(b.getAs[T](n)) else None
        val expression = bopt[org.apache.spark.sql.Row]("metadata").flatMap { m =>
          if (m.schema.fieldNames.contains("expression") && !m.isNullAt(m.fieldIndex("expression")))
            Option(m.getAs[org.apache.spark.sql.Row]("expression").getAs[String]("value"))
          else None
        }
        BandDef(
          name = b.getAs[String]("name"),
          common_name = bopt[String]("common_name"),
          data_type = bopt[String]("data_type").getOrElse("int16"),
          nodata = bopt[Any]("nodata").map(toDouble).getOrElse(-9999.0),
          min_value = bopt[Any]("min_value").map(toDouble).getOrElse(Short.MinValue.toDouble),
          max_value = bopt[Any]("max_value").map(toDouble).getOrElse(Short.MaxValue.toDouble),
          scale = bopt[Any]("scale").map(toDouble),
          resolution_x = bopt[Any]("resolution_x").map(toDouble),
          resolution_y = bopt[Any]("resolution_y").map(toDouble),
          mime_type = bopt[String]("mime_type"),
          center_wavelength = bopt[Any]("center_wavelength").map(toDouble),
          expression = expression)
      }
      val processors: Seq[String] = opt[org.apache.spark.sql.Row]("metadata").toSeq.flatMap { m =>
        if (m.schema.fieldNames.contains("processors") && !m.isNullAt(m.fieldIndex("processors")))
          m.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("processors").toSeq.map(_.getAs[String]("name"))
        else Nil
      }
      CollectionDef(
        name = row.getAs[String]("name"),
        version = opt[Any]("version").map(v => toDouble(v).toInt).getOrElse(1),
        title = opt[String]("title"),
        collection_type = opt[String]("collection_type").getOrElse("collection"),
        grid_ref_sys = opt[String]("grid_ref_sys"),
        quicklook = opt[scala.collection.Seq[String]]("quicklook").getOrElse(Nil).toSeq,
        bands = bands,
        processors = processors)
    }
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: String => s.toDouble
    case bd: java.math.BigDecimal => bd.doubleValue()
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  /** Load provider definition JSON files (providers/nasa-usgs.json shape). */
  def loadProviders(spark: SparkSession, path: String): Seq[ProviderDef] = {
    val df = spark.read.option("multiLine", true).json(path)
    val hasCreds = df.schema.fieldNames.contains("credentials")
    val norm = df.select(col("name"), col("driver_name"),
      (if (df.schema.fieldNames.contains("url")) col("url") else lit(null)).as("url"),
      (if (df.schema.fieldNames.contains("description")) col("description") else lit(null)).as("description"),
      (if (hasCreds) to_json(col("credentials")) else lit(null)).as("credentials"))
    norm.collect().toSeq.map { r =>
      ProviderDef(r.getAs[String]("name"), r.getAs[String]("driver_name"),
        Option(r.getAs[String]("url")), Option(r.getAs[String]("description")),
        Option(r.getAs[String]("credentials")))
    }
  }

  /** Derived-band plan: for every expression band of a collection, the
    * compiled references + clamp bounds (what index_generator.py:93–149
    * does per scene, resolved once per collection here). */
  def derivedBands(c: CollectionDef): Seq[(BandDef, Set[String])] =
    c.bands.filter(_.expression.isDefined).map { b =>
      val ast = graft.expr.BandExpressionCompiler.parse(b.expression.get)
      (b, graft.expr.BandExpressionCompiler.references(ast))
    }
}
