package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SearchFunctions]] — BM25 and inverted-index retrieval semantics. */
class SearchSpec extends SparkSpec {
  import SearchFunctions._
  import spark.implicits._

  // Corpus: d1 has "cat" twice (tf boost), d2 once in a longer doc
  // (length normalization), d3 lacks it, d4 has the rare term "zebu".
  private lazy val docs = Seq(
    (1L, "cat cat sat"),
    (2L, "cat dog dog dog dog dog"),
    (3L, "dog dog"),
    (4L, "zebu sat"))
    .toDF("doc_id", "text")

  test("BM25 matches the closed-form score (hand-computed)") {
    val got = bm25(docs, "text", "doc_id", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 4.0; val avgdl = (3 + 6 + 2 + 2) / 4.0; val df = 2.0
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert(got.keySet === Set(1L, 2L))
    assert(math.abs(got(1L) - s(2, 3)) < 1e-12)
    assert(math.abs(got(2L) - s(1, 6)) < 1e-12)
    // tf=2 in a short doc must outrank tf=1 in a long one
    assert(got(1L) > got(2L))
  }

  test("BM25: rare terms outweigh common ones at equal tf/dl") {
    val got = bm25(docs, "text", "doc_id", Seq("zebu", "sat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // d4 matches both; d1 matches only "sat" — and d4's zebu idf (df=1)
    // exceeds sat's (df=2)
    assert(got(4L) > got(1L))
  }

  test("bm25TopK plans as TakeOrderedAndProject (no global sort)") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = bm25TopK(real, "text", "doc_id", Seq("spark", "vector"), 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("conjunctive search over the index ≡ direct text scan") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    val idx = buildInvertedIndex(real, "text", "doc_id")
    val viaIndex = searchConjunctive(idx, Seq("spark", "hash"))
      .collect().map(_.getLong(0)).toSet
    val direct = real
      .filter(array_contains(split(trim(lower(col("text"))), "\\s+"), "spark") &&
        array_contains(split(trim(lower(col("text"))), "\\s+"), "hash"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty)
  }

  test("RRF fusion: hand-checked — consensus beats a single #1") {
    // list A ranks: d1=1, d2=2, d3=3;  list B ranks: d2=1, d3=2, d4=3
    val a = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("id", "score")
    val b = Seq((2L, 5.0), (3L, 4.0), (4L, 3.0)).toDF("id", "score")
    val got = rrfFuse(Seq(a, b), "id", "score", kRrf = 60, topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def rrf(rs: Double*) = rs.map(r => 1.0 / (60 + r)).sum
    // d2 appears high in BOTH lists → outranks d1's single #1
    val expected = Map(1L -> rrf(1), 2L -> rrf(2, 1), 3L -> rrf(3, 2), 4L -> rrf(3))
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 1L, 4L), "consensus ordering")
    for ((id, s) <- got) assert(math.abs(s - expected(id)) < 1e-15,
      s"rrf for $id must be the exact rational sum")
  }

  test("RRF: rank ties within a list break by id, missing entries contribute zero") {
    val a = Seq((7L, 5.0), (3L, 5.0)).toDF("id", "score") // tie → id 3 ranks 1
    val b = Seq((7L, 1.0)).toDF("id", "score")
    val got = rrfFuse(Seq(a, b), "id", "score", topK = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(got(3L) - 1.0 / 61) < 1e-15)
    assert(math.abs(got(7L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
  }

  test("query-time plan reads only the query terms' postings (pushed IN filter)") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString
    buildInvertedIndex(real, "text", "doc_id")
      .write.mode("overwrite").parquet(dir)
    val postings = spark.read.parquet(dir)
    val plan = searchConjunctive(postings, Seq("spark", "hash"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      "the term IN (...) filter must reach the posting scan")
  }

  test("MMR: first pick is argmax relevance; duplicates of it are deferred") {
    import spark.implicits._
    // candidate 1 is most relevant; 2 is its exact twin (sim 1.0); 3 is
    // orthogonal with lower relevance. At λ=0.5 the twin scores
    // 0.5·0.98 − 0.5·1.0 = −0.01 against 3's 0.5·0.50 = 0.25 — MMR must
    // pick 1 then 3, where a plain top-k returns (1, 2).
    val cands = Seq(
      (1L, 0.99, Array(1.0, 0.0, 0.0)),
      (2L, 0.98, Array(1.0, 0.0, 0.0)),
      (3L, 0.50, Array(0.0, 1.0, 0.0)),
      (4L, 0.40, Array(0.0, 0.9, 0.1))).toDF("id", "rel", "emb")
    val out = mmrRerank(cands, "id", "rel", "emb", lambda = 0.5, k = 3)
      .as[(Long, Int)].collect().sortBy(_._2).map(_._1).toSeq
    assert(out.head === 1L, "first pick must be the relevance argmax")
    assert(out(1) === 3L, s"the exact twin must be deferred, got $out")
    // λ = 1 degenerates to plain relevance order
    val pure = mmrRerank(cands, "id", "rel", "emb", lambda = 1.0, k = 3)
      .as[(Long, Int)].collect().sortBy(_._2).map(_._1).toSeq
    assert(pure === Seq(1L, 2L, 3L))
  }

  test("MMR on the real corpus: deterministic, k rows, and more diverse than top-k") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cands = SimilarityFunctions.topKCosine(emb, "embedding", "vec_id", qv, 50)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    def run() = mmrRerank(cands, "vec_id", "score", "embedding", 0.7, 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = run(); val b = run()
    assert(a === b, "selection must be reproducible")
    assert(a.size === 10)
    // diversity: mean pairwise cosine of the MMR set must not exceed the
    // plain top-10's (the objective directly penalizes it)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(vecs(ids(i)), vecs(ids(j)))
      ps.sum / ps.size
    }
    val top10 = cands.orderBy(col("score").desc, col("vec_id"))
      .limit(10).select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(meanPairSim(a.keys.toSeq) <= meanPairSim(top10) + 1e-12,
      "MMR must not be less diverse than plain top-k")
  }
}
