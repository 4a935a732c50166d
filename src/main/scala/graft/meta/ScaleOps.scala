package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools the 100 TB deployment needs —
  * salting for skewed keys and bucketed co-located joins. (SURVEY.md §4:
  * the reference has no equivalents because Postgres/Celery hid them; at
  * Spark scale they are part of the engine surface.)
  */
object ScaleOps {

  /** Skew-safe aggregation: two-phase salted groupBy. Phase 1 aggregates on
    * (key, salt) spreading a hot key over `saltBuckets` reducers; phase 2
    * merges the partials per key. Use for algebraic aggregates (sum/count/
    * min/max) when one key dominates (e.g. one scene's tiles, one dup-text
    * digest). AQE's skew handling covers joins; this covers aggregations.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"),
      (pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
        .as("salt"))
    salted.groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("sum_v"), sum(col("pc")).as("n"))
  }

  /** Bucketed table writer: co-locates future joins on `key` — both sides
    * bucketed by the same key/count join with ZERO shuffle (the engine's
    * equivalent of pre-partitioned PostGIS indexes for the items/activities
    * tables that every metadata query joins). Requires a session with a
    * warehouse dir (any SparkSession has one). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories persist — clear any orphan location
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
