package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[SimilarityFunctions.topKPerDoc]] / [[SimilarityFunctions.pairSummaryPerDoc]]
  * and the capped/summary wrappers of the exact pairwise joins. The defining
  * invariant: topKPerDoc ≡ `row_number() OVER (PARTITION BY id_a ORDER BY
  * score [DESC|ASC], id_b) <= k` — the QUALIFY oracle — and every capped
  * output is the per-doc top-k SUBSET of its uncapped join. */
class TopKPerDocSpec extends SparkSpec {
  import spark.implicits._

  /** The QUALIFY replay: same total order as the bounded aggregator. */
  private def qualify(pairs: DataFrame, scoreCol: String, k: Int,
                      ascending: Boolean): Set[(Long, Long, Long)] = {
    val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    val w = Window.partitionBy(col("id_a")).orderBy(ord, col("id_b").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("id_a"), col("id_b"), col(scoreCol).cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
  }

  private def ranked(pairs: DataFrame, scoreCol: String, k: Int,
                     ascending: Boolean): Set[(Long, Long, Long)] =
    SimilarityFunctions.topKPerDoc(pairs, "id_a", "id_b", scoreCol, k, ascending)
      .select(col("id_a"), col("id_b"), col(scoreCol).cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet

  // deterministic pair stream WITH score ties (score = i % 7 gives many
  // equal scores per group, exercising the id_b tie-break) and group
  // sizes straddling k
  private def tiedPairs: DataFrame =
    (0 until 300).map { i =>
      (i % 20L, 1000L + i, (i % 7).toDouble / 4.0)
    }.toDF("id_a", "id_b", "score")

  test("≡ QUALIFY row_number, both directions, with score ties") {
    for (asc <- Seq(false, true); k <- Seq(1, 3, 17)) {
      val got = ranked(tiedPairs, "score", k, asc)
      val want = qualify(tiedPairs, "score", k, asc)
      assert(got === want, s"ascending=$asc k=$k")
      assert(want.nonEmpty)
    }
  }

  test("native aggregate ≡ the udaf specification twin on a tied stream") {
    val topkTwin = udaf(new SimilarityFunctions.TopKAggregator(5),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val twin = tiedPairs.groupBy(col("id_a"))
      .agg(topkTwin(col("score"), col("id_b")).as("nn"))
      .select(col("id_a"), explode(col("nn")).as("p"))
      .select(col("id_a"), col("p._2").as("id_b"), col("p._1").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val native = SimilarityFunctions.topKPerDoc(tiedPairs, "id_a", "id_b",
        "score", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native === twin)
    assert(native.nonEmpty)
  }

  test("≡ QUALIFY under few-partition shuffles and repeated merges") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      // > 2k rows per group per partition forces mid-stream buffer
      // compactions and real partial merges
      val many = (0 until 4000).map(i => (i % 3L, 1000L + i, (i % 11).toDouble))
        .toDF("id_a", "id_b", "score").repartition(13)
      assert(ranked(many, "score", 5, ascending = false) ===
        qualify(many, "score", 5, ascending = false))
      assert(ranked(many, "score", 5, ascending = true) ===
        qualify(many, "score", 5, ascending = true))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("the bounded buffer partial-aggregates BEFORE the exchange (the scale property)") {
    val plan = SimilarityFunctions.topKPerDoc(tiedPairs, "id_a", "id_b",
      "score", 3).queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_topk_pairs"),
      s"expected a partial topk_pairs phase before the exchange, got:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the object-hash aggregate for the bounded buffer, got:\n$plan")
  }

  test("ascending sign round-trip: a 0.0 score comes back +0.0, never -0.0") {
    val pairs = Seq((1L, 2L, 0.0), (1L, 3L, 1.0)).toDF("id_a", "id_b", "score")
    val out = SimilarityFunctions.topKPerDoc(pairs, "id_a", "id_b", "score", 2,
        ascending = true)
      .orderBy(col("id_b")).select(col("score")).as[Double].collect()
    assert(out.toSeq === Seq(0.0, 1.0))
    assert(java.lang.Double.doubleToLongBits(out(0)) ===
      java.lang.Double.doubleToLongBits(0.0), "-0.0 must not leak out")
  }

  test("NaN scores are dropped, not ranked best-or-worst") {
    val pairs = Seq((1L, 2L, Double.NaN), (1L, 3L, 0.5), (1L, 4L, 0.9))
      .toDF("id_a", "id_b", "score")
    for (asc <- Seq(false, true)) {
      val ids = SimilarityFunctions.topKPerDoc(pairs, "id_a", "id_b", "score",
          2, asc).select(col("id_b")).as[Long].collect().toSet
      assert(ids === Set(3L, 4L), s"ascending=$asc: NaN pair must be excluded")
    }
  }

  test("non-integral partner id fails loudly (no silent null-out)") {
    val pairs = Seq((1L, "x", 0.5)).toDF("id_a", "id_b", "score")
    val e = intercept[IllegalArgumentException] {
      SimilarityFunctions.topKPerDoc(pairs, "id_a", "id_b", "score", 1)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("pairSummaryPerDoc symmetric ≡ both-direction groupBy; ids keep their type") {
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.4), (2L, 3L, 0.7))
      .toDF("id_a", "id_b", "score")
    val got = SimilarityFunctions.pairSummaryPerDoc(pairs, "id_a", "id_b",
        "score", symmetric = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 0.9), (2L, 2L, 0.9), (3L, 2L, 0.7)))
    // ascending flips best to min
    val asc = SimilarityFunctions.pairSummaryPerDoc(pairs, "id_a", "id_b",
        "score", symmetric = true, ascending = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(asc === Set((1L, 2L, 0.4), (2L, 2L, 0.7), (3L, 2L, 0.4)))
  }

  test("pairSummaryPerDoc asymmetric works for STRING ids (no silent long cast)") {
    val pairs = Seq(("a", 1L, 0.9), ("a", 2L, 0.4), ("b", 3L, 0.7))
      .toDF("id_a", "id_b", "score")
    val got = SimilarityFunctions.pairSummaryPerDoc(pairs, "id_a", "id_b",
        "score", symmetric = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(("a", 2L, 0.9), ("b", 1L, 0.7)))
    // symmetric with mismatched id types must refuse, not coerce
    val e = intercept[IllegalArgumentException] {
      SimilarityFunctions.pairSummaryPerDoc(pairs, "id_a", "id_b", "score",
        symmetric = true)
    }
    assert(e.getMessage.contains("types must match"))
  }

  // ---- the capped/summary join wrappers against their uncapped joins ----

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .filter(col("doc_id") % 3 === 0)
  private def parts = spark.read.parquet(s"$sf0001/part.parquet")

  /** capped ⊆ uncapped, per-doc count = min(k, partners), and the kept
    * rows are exactly the QUALIFY top-k of the uncapped stream. */
  private def checkCapped(uncapped: DataFrame, capped: DataFrame,
                          scoreCol: String, k: Int, ascending: Boolean): Unit = {
    val want = qualify(
      uncapped.select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"), col(scoreCol).cast("double").as(scoreCol)),
      scoreCol, k, ascending)
    val got = capped
      .select(col("id_a").cast("long"), col("id_b").cast("long"),
        col(scoreCol).cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture must produce pairs")
    val all = uncapped.count()
    assert(got.size <= all)
  }

  test("jaccardJoinTopK ≡ QUALIFY top-k of jaccardJoinExact (cap binds)") {
    val tau = 0.5; val k = 2
    val uncapped = DedupFunctions.jaccardJoinExact(docs, "text", "doc_id", tau)
    val capped = DedupFunctions.jaccardJoinTopK(docs, "text", "doc_id", tau, k)
    checkCapped(uncapped, capped, "jaccard", k, ascending = false)
    assert(capped.count() < uncapped.count(),
      "fixture must have a doc with more than k partners or the test is vacuous")
  }

  test("containmentJoinTopK ≡ QUALIFY top-k of containmentJoinExact") {
    val tau = 0.3; val k = 1
    val uncapped = DedupFunctions.containmentJoinExact(docs, "text", "doc_id",
      tau, ngram = 2)
    val capped = DedupFunctions.containmentJoinTopK(docs, "text", "doc_id",
      tau, k, ngram = 2)
    checkCapped(uncapped, capped, "containment", k, ascending = false)
  }

  test("fuzzyPairsTopK ≡ QUALIFY top-k of fuzzyPairs (ascending: distance)") {
    val reg = parts
    val k = 2
    val uncapped = EntityResolution.fuzzyPairs(reg, "p_name", "p_partkey",
      maxDist = 1, blocking = "band")
    val capped = EntityResolution.fuzzyPairsTopK(reg, "p_name", "p_partkey",
      maxDist = 1, k = k, blocking = "band")
    checkCapped(uncapped, capped, "dist", k, ascending = true)
    assert(capped.schema("dist").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(capped.count() < uncapped.count(),
      "fixture must have a name with more than k partners or the test is vacuous")
  }

  test("jaccardJoinSummary / fuzzyPairsSummary ≡ symmetric per-doc rollup of the pair stream") {
    val tau = 0.5
    val pairs = DedupFunctions.jaccardJoinExact(docs, "text", "doc_id", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = (pairs.map(p => (p._1, p._3)) ++ pairs.map(p => (p._2, p._3)))
      .groupBy(_._1)
      .map { case (id, xs) => (id, xs.length.toLong, xs.map(_._2).max) }.toSet
    val got = DedupFunctions.jaccardJoinSummary(docs, "text", "doc_id", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)

    val reg = parts.filter(col("p_partkey") % 7 === 0)
    val fp = EntityResolution.fuzzyPairs(reg, "p_name", "p_partkey",
        maxDist = 1, blocking = "band")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val wantF = (fp.map(p => (p._1, p._3)) ++ fp.map(p => (p._2, p._3)))
      .groupBy(_._1)
      .map { case (id, xs) => (id, xs.length.toLong, xs.map(_._2).min) }.toSet
    val gotF = EntityResolution.fuzzyPairsSummary(reg, "p_name", "p_partkey",
        maxDist = 1, blocking = "band")
      .select(col("id"), col("n_partners"), col("best_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotF === wantF)
    assert(gotF.nonEmpty)
  }
}
