package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index ([[DedupFunctions.writeLshIndex]] /
  * probeLshIndex / appendToLshIndex) — incremental near-dup against an
  * already-signed corpus. The invariant that matters: probing the index
  * returns EXACTLY what re-running the two-sided join on raw text would,
  * so going incremental costs no recall. */
class LshIndexSpec extends SparkSpec {
  import DedupFunctions._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private val corpus = docs.filter(col("doc_id") % 2 === 0)
  private val batch = docs.filter(col("doc_id") % 2 === 1)

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    writeLshIndex(corpus, "text", "doc_id", dir, n = 3, bands = 4, rowsPerBand = 2)
    dir
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_new"), col("id_index"), round(col("jaccard"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("probe ≡ the non-indexed cross join on raw text — incremental costs no recall") {
    val probed = pairs(probeLshIndex(spark, indexDir, batch, "text", "doc_id",
      n = 3, bands = 4, rowsPerBand = 2, jaccardThreshold = 0.3))
    val direct = pairs(crossNeardupPairs(batch, corpus, "text", "doc_id", "doc_id",
        n = 3, bands = 4, rowsPerBand = 2, jaccardThreshold = 0.3)
      .withColumnRenamed("id_a", "id_new").withColumnRenamed("id_b", "id_index"))
    assert(probed === direct)
    assert(probed.nonEmpty) // the fixture corpus does contain cross-parity near-dups
  }

  test("append: an accepted batch doc becomes findable without rebuilding") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lshidx-app").toString
    writeLshIndex(corpus, "text", "doc_id", dir, n = 3, bands = 4, rowsPerBand = 2)
    val accepted = Seq((1000001L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    appendToLshIndex(accepted, "text", "doc_id", dir, n = 3, bands = 4, rowsPerBand = 2)
    val nextBatch = Seq((1000002L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    val hits = pairs(probeLshIndex(spark, dir, nextBatch, "text", "doc_id",
      n = 3, bands = 4, rowsPerBand = 2, jaccardThreshold = 0.5))
    assert(hits.exists { case (nw, ix, j) => nw == 1000002L && ix == 1000001L && j > 0.5 })
  }

  test("probe plan broadcasts the batch — the index side never exchanges") {
    val plan = probeLshIndex(spark, indexDir, batch, "text", "doc_id",
      n = 3, bands = 4, rowsPerBand = 2, jaccardThreshold = 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
