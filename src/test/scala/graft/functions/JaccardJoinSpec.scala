package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DedupFunctions.jaccardJoinExact]] — prefix-filtered exact
  * set-similarity join. The invariant that defines it: output ≡ the
  * brute-force cross join at every threshold (the prefix filter prunes
  * CANDIDATES, never results). */
class JaccardJoinSpec extends SparkSpec {
  import DedupFunctions._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .filter(col("doc_id") % 5 === 0) // 100 docs — brute force stays cheap

  private def brute(tau: Double): Set[(Long, Long, Double)] = {
    val sets = docs
      .select(col("doc_id").as("id"),
        array_distinct(TextFunctions.tokens(lower(col("text")))).as("tk"))
      .filter(size(col("tk")) > 0)
    val a = sets.select(col("id").as("id_a"), col("tk").as("tk_a"))
    val b = sets.select(col("id").as("id_b"), col("tk").as("tk_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))).cast("double"))
      .withColumn("j", col("inter") / (size(col("tk_a")) + size(col("tk_b")) - col("inter")))
      .filter(col("j") >= tau)
      .select(col("id_a"), col("id_b"), round(col("j"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def prefixed(tau: Double): Set[(Long, Long, Double)] =
    jaccardJoinExact(docs, "text", "doc_id", tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("output ≡ brute force at τ = 0.5 / 0.7 / 0.9 — the filter loses nothing") {
    for (tau <- Seq(0.5, 0.7, 0.9)) {
      val p = prefixed(tau)
      val b = brute(tau)
      assert(p === b, s"tau=$tau: prefix join must equal brute force")
      assert(p.nonEmpty, s"tau=$tau: fixture should produce pairs")
    }
  }

  test("τ = 1.0 degenerates to exact set equality") {
    val p = prefixed(1.0)
    val b = brute(1.0)
    assert(p === b)
    assert(p.forall(_._3 === 1.0))
  }

  test("plan: the vocabulary rank broadcasts; candidates join on prefix terms only") {
    val plan = jaccardJoinExact(docs, "text", "doc_id", 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin [term"),
      "the rarest-first rank dictionary must broadcast into the scan")
  }
}
