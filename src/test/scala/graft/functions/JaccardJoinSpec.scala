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

  test("results are partitioning-invariant (distributed rank assignment is deterministic)") {
    def run() = jaccardJoinExact(docs, "text", "doc_id", 0.7)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSeq
    val at32 = run()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      assert(run() === at32,
        "the zipWithIndex vocabulary rank must not depend on partition boundaries")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(at32.nonEmpty)
  }

  test("plan: no single-partition stage, no cartesian — every join keyed on terms/ids") {
    val plan = jaccardJoinExact(docs, "text", "doc_id", 0.9)
      .queryExecution.executedPlan.toString
    // the r10 shape ranked the vocabulary through Exchange SinglePartition
    // + a partition-less window; the (df, term) prefix order and the
    // zipWithIndex rank assignment need neither
    assert(!plan.contains("Exchange SinglePartition"),
      s"no stage may converge on one partition:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "candidates must come from the prefix-term equi-join")
  }

  // ------------------------------------------------ containment (ordered)

  private def bruteContainment(tau: Double, n: Int): Set[(Long, Long, Double)] = {
    val sets = docs
      .select(col("doc_id").as("id"),
        graft.expr.NativeFunctions.word_ngrams(col("text"), n).as("tk"))
      .filter(size(col("tk")) > 0)
    val a = sets.select(col("id").as("id_a"), col("tk").as("tk_a"))
    val b = sets.select(col("id").as("id_b"), col("tk").as("tk_b"))
    a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
      .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))).cast("double"))
      .withColumn("c", col("inter") / size(col("tk_a")))
      .filter(col("c") >= tau)
      .select(col("id_a"), col("id_b"), round(col("c"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def prefixedContainment(tau: Double, n: Int): Set[(Long, Long, Double)] =
    containmentJoinExact(docs, "text", "doc_id", tau, n)
      .select(col("id_a"), col("id_b"), round(col("containment"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("containment ≡ brute force at τ = 0.3 / 0.5 / 1.0; ordered-pair semantics") {
    for (tau <- Seq(0.3, 0.5, 1.0)) {
      assert(prefixedContainment(tau, 1) === bruteContainment(tau, 1),
        s"tau=$tau shingle n=1")
    }
    // a planted quote: A's shingles all inside B, B's not all inside A —
    // the ordered pair (A,B) appears, (B,A) does not
    import spark.implicits._
    val quoted = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "prologue words alpha beta gamma delta epilogue words here"),
      (3L, "unrelated content entirely different tokens")).toDF("doc_id", "text")
    val out = containmentJoinExact(quoted, "text", "doc_id", 0.9, 2)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)),
      s"expected exactly the quote pair (1,2), got $out")
  }

  test("containment at shingle n=3 matches brute force on the real corpus") {
    val full = spark.read.parquet(s"$sf0001/documents.parquet")
    def bruteN3(tau: Double): Set[(Long, Long)] = {
      val sets = full
        .select(col("doc_id").as("id"),
          graft.expr.NativeFunctions.word_ngrams(col("text"), 3).as("tk"))
        .filter(size(col("tk")) > 0)
      sets.select(col("id").as("id_a"), col("tk").as("tk_a"))
        .crossJoin(sets.select(col("id").as("id_b"), col("tk").as("tk_b")))
        .filter(col("id_a") =!= col("id_b"))
        .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))).cast("double"))
        .filter(col("inter") / size(col("tk_a")) >= tau)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val got = containmentJoinExact(full, "text", "doc_id", 0.8, 3)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bruteN3(0.8))
    assert(got.nonEmpty, "fixture should contain planted near-superset pairs")
  }

  test("containment plan: every join is keyed — no cartesian anywhere") {
    // nothing in the pipeline may degrade to a nested-loop product; the
    // shingle-df attach carries no broadcast HINT (a corpus-sized shingle
    // dictionary must stay shuffle-joinable at scale; AQE may still
    // broadcast small test inputs, which is the adaptive behavior we want)
    val plan = containmentJoinExact(docs, "text", "doc_id", 0.8, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
