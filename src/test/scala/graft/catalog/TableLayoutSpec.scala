package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TableLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("month-partitioned items prune partitions on period queries") {
    val items = Seq(
      ("I1", "2020-01-10"), ("I2", "2020-02-10"), ("I3", "2020-03-10"))
      .toDF("name", "d")
      .withColumn("start_date", col("d").cast("timestamp")).drop("d")
    val path = Files.createTempDirectory("graft-items").toString
    TableLayout.writeItems(items, path)
    val q = TableLayout.readItemsForMonths(spark, path, Seq("2020-01", "2020-02"))
    assert(q.count() == 2)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("month"))
    // only the two selected month directories are actually read
    val files = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.forall(f => f.contains("month=2020-01") || f.contains("month=2020-02")))
  }

  test("writeShards: deterministic shard membership, even sizes, manifest adds up") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text")
    val p1 = Files.createTempDirectory("graft-shards1").toString
    val p2 = Files.createTempDirectory("graft-shards2").toString
    val m1 = TableLayout.writeShards(docs, "text", p1, shards = 8)
      .as[(Int, Long)].collect().toMap
    val m2 = TableLayout.writeShards(docs.repartition(13), "text", p2, shards = 8)
      .as[(Int, Long)].collect().toMap
    assert(m1 === m2, "shard membership must not depend on input partitioning")
    assert(m1.values.sum === docs.count())
    assert(m1.size === 8)
    // even-ish: no shard more than 3x the smallest (hash uniformity at n=500)
    assert(m1.values.max <= m1.values.min * 3)
    // re-reading a single shard prunes to its directory
    val one = spark.read.parquet(p1).filter(col("shard") === 3)
    val files = one.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("shard=3")))
  }
}
