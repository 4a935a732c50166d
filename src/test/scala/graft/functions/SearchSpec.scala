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
}
