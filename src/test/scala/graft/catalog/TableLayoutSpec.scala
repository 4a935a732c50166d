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
}
