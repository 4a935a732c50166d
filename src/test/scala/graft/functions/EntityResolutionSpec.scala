package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[EntityResolution.fuzzyPairs]] — blocking completeness: output must
  * equal brute force, and the candidate join must be an equi-join. */
class EntityResolutionSpec extends SparkSpec {
  import EntityResolution._

  private def parts = spark.read.parquet(s"$sf0001/part.parquet")
    .filter(col("p_partkey") % 7 === 0)

  private def brute(d: Int): Set[(Long, Long, Int)] = {
    val a = parts.select(col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = parts.select(col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def blocked(d: Int): Set[(Long, Long, Int)] =
    fuzzyPairs(parts, "p_name", "p_partkey", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("fuzzyPairs ≡ brute force at d = 1 and d = 2 (blocking is complete)") {
    for (d <- Seq(1, 2)) {
      val got = blocked(d)
      assert(got === brute(d), s"d=$d")
      assert(got.nonEmpty, s"d=$d: fixture should contain close names")
    }
  }

  test("maxDist = 0 degenerates to exact duplicate names") {
    val got = blocked(0)
    assert(got === brute(0))
    assert(got.forall(_._3 === 0))
  }

  test("candidate generation is an equi-join — no cartesian in the plan") {
    val plan = fuzzyPairs(parts, "p_name", "p_partkey", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "length-band blocking must plan as an equi-join")
  }
}
