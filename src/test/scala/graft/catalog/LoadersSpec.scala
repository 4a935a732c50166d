package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

class LoadersSpec extends SparkSpec {

  // FIXTURES.md §1/§2 shapes (sentinel-2-l2a.json / providers/*.json)
  private val collectionJson =
    """{
      |  "name": "S2_L2A", "title": "Sentinel-2 L2A", "version": 1,
      |  "grid_ref_sys": "MGRS", "collection_type": "collection",
      |  "quicklook": ["B04", "B03", "B02"],
      |  "metadata": {"processors": [{"name": "sen2cor"}]},
      |  "bands": [
      |    {"name": "B04", "common_name": "red", "data_type": "int16",
      |     "nodata": 0, "min_value": 0, "max_value": 10000, "scale": 0.0001,
      |     "mime_type": "image/jp2", "resolution_x": 10.0, "resolution_y": 10.0},
      |    {"name": "B08", "common_name": "nir", "data_type": "int16",
      |     "nodata": 0, "min_value": 0, "max_value": 10000},
      |    {"name": "NDVI", "common_name": "ndvi", "data_type": "int16",
      |     "nodata": -9999, "min_value": -10000, "max_value": 10000,
      |     "metadata": {"expression": {"value": "10000. * ((B08 - B04) / (B08 + B04))"}}}
      |  ]
      |}""".stripMargin

  private val providerJson =
    """{"name": "USGS", "description": "usgs provider", "url": "https://landsat.usgs.gov/",
      | "driver_name": "USGS", "credentials": {"username": "user", "password": "pass"}}""".stripMargin

  test("loadCollections parses bands incl. expression band (utils.py:578–611)") {
    val dir = Files.createTempDirectory("graft-coll")
    Files.writeString(dir.resolve("s2.json"), collectionJson)
    val cs = Loaders.loadCollections(spark, dir.toString)
    assert(cs.size == 1)
    val c = cs.head
    assert(c.name == "S2_L2A" && c.quicklook == Seq("B04", "B03", "B02"))
    assert(c.processors == Seq("sen2cor"))
    assert(c.bands.map(_.name) == Seq("B04", "B08", "NDVI"))
    val b04 = c.bands.find(_.name == "B04").get
    assert(b04.nodata == 0.0 && b04.scale.contains(1.0e-4) && b04.data_type == "int16")
    val ndvi = c.bands.find(_.name == "NDVI").get
    assert(ndvi.expression.contains("10000. * ((B08 - B04) / (B08 + B04))"))
    // derived-band discovery (index_generator.py:75–77)
    val derived = Loaders.derivedBands(c)
    assert(derived.map(_._1.name) == Seq("NDVI"))
    assert(derived.head._2 == Set("B08", "B04"))
  }

  test("loadProviders parses credentials as opaque JSON (cli.py:68–117)") {
    val dir = Files.createTempDirectory("graft-prov")
    Files.writeString(dir.resolve("usgs.json"), providerJson)
    val ps = Loaders.loadProviders(spark, dir.toString)
    assert(ps.size == 1)
    assert(ps.head.name == "USGS" && ps.head.driver_name == "USGS")
    assert(ps.head.credentials.exists(_.contains("\"username\":\"user\"")))
  }
}
