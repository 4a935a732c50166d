package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApiSpec extends SparkSpec {
  import spark.implicits._

  private def acts = Seq(
    ("s1", 1, "download", "FAILURE", 3),
    ("s2", 1, "download", "SUCCESS", 0),
    ("s3", 2, "download", "FAILURE", 3),
    ("s1", 1, "publish", "PENDING", 0))
    .toDF("sceneid", "collection_id", "activity_type", "status", "retry_count")

  test("restart resets failed activities and requires a restriction (controller.py:86–151)") {
    val out = Api.restartActivities(acts, collectionId = Some(1))
    val s1 = out.filter(col("sceneid") === "s1" && col("activity_type") === "download").head()
    assert(s1.getAs[String]("status") == "PENDING" && s1.getAs[Int]("retry_count") == 0)
    // other collection untouched; successful rows untouched
    assert(out.filter(col("sceneid") === "s3").head().getAs[String]("status") == "FAILURE")
    assert(out.filter(col("sceneid") === "s2").head().getAs[String]("status") == "SUCCESS")
    // unrestricted restart is rejected
    assertThrows[IllegalArgumentException](Api.restartActivities(acts))
    // errorsOnly=false resets any matching row
    val all = Api.restartActivities(acts, sceneIds = Seq("s2"), errorsOnly = false)
    assert(all.filter(col("sceneid") === "s2").head().getAs[String]("status") == "PENDING")
  }

  test("collections/grids/tiles listing routes (controller.py:623–690)") {
    val collections = Seq((2, "S2_L2A", "collection"), (1, "CB4", "cube"))
      .toDF("id", "name", "collection_type")
    assert(Api.listCollections(collections) ==
      """[{"id":1,"name":"CB4","collection_type":"cube"},{"id":2,"name":"S2_L2A","collection_type":"collection"}]""")
    val grids = Seq(("MGRS", "Sentinel-2 grid")).toDF("name", "description")
    assert(Api.listGrids(grids).contains("\"name\":\"MGRS\""))
    val tiles = Seq((10, "23LLF"), (11, "24XXX")).toDF("id", "tile")
    val items = Seq(("a", 1, 10), ("b", 1, 10), ("c", 2, 11)).toDF("name", "collection_id", "tile_id")
    assert(Api.listCollectionTiles(items, tiles, 1) == """[{"tile":"23LLF"}]""")
  }

  test("listActivities envelope + filters (views.py:33–49)") {
    val json = Api.listActivities(acts, collectionId = Some(1), activityTypeContains = Some("down"))
    assert(json.contains("\"total\":2"))
    assert(json.contains("\"sceneid\":\"s1\"") && json.contains("\"sceneid\":\"s2\""))
    assert(!json.contains("\"sceneid\":\"s3\""))
  }
}
