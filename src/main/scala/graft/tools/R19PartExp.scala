package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 experiment: does localCheckpoint preserve hash partitioning well
  * enough that a keyed self-join / groupBy over the checkpoint plans with
  * no Exchange? Decides the pageRank loop currency (checkpoint vs
  * persist). Not part of the library surface. */
object R19PartExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exchanges(df: org.apache.spark.sql.DataFrame): Unit = {
      df.count() // let AQE finalize
      val s = df.queryExecution.executedPlan.toString
      println("  exchanges=" + "Exchange".r.findAllIn(s).length +
        " sorts=" + "\\bSort\\b".r.findAllIn(s).length)
    }
    // A: checkpoint of an explicit repartition(8, k)
    val a = spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("x"))
      .repartition(8, col("k")).localCheckpoint(true)
    println("A ckpt(repartition(8,k)) logical: " + a.queryExecution.optimizedPlan.getClass.getSimpleName)
    println("A partitioning: " + a.queryExecution.executedPlan.outputPartitioning)
    println("A groupBy(k) after checkpoint:")
    exchanges(a.groupBy(col("k")).agg(sum(col("x"))))
    // B: join two checkpoints co-partitioned on k
    val b = spark.range(100000).select(col("id").as("k"), (col("id") * 3).as("y"))
      .repartition(8, col("k")).localCheckpoint(true)
    println("B join A on k (both ckpt hash(k,8)):")
    exchanges(a.join(b, "k"))
    // C: alias rename then join: hash(k) -> renamed k2
    println("C join after rename k->k2:")
    exchanges(a.select(col("k").as("k2"), col("x")).join(
      b.select(col("k").as("k2"), col("y")), "k2"))
    // D: checkpoint WITHOUT explicit repartition, after a groupBy (AQE shuffle)
    val d = spark.range(100000).select(pmod(col("id"), lit(1000)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c")).localCheckpoint(true)
    println("D ckpt(groupBy) partitioning: " + d.queryExecution.executedPlan.outputPartitioning)
    println("D groupBy(k) again:")
    exchanges(d.groupBy(col("k")).agg(sum(col("c"))))
    spark.stop()
  }
}
