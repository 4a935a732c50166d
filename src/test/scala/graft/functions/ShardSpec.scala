package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SamplingFunctions.shardByTokenBudget]] — the deterministic seeded
  * shuffle + token-budget shard cut (training export). The invariants that
  * matter at scale: the bucketed two-phase prefix sum equals the global
  * single-window cumsum exactly, and the answer cannot depend on bucket
  * count or input partitioning (the knobs that change with cluster size).
  */
class ShardSpec extends SparkSpec {
  import SamplingFunctions.shardByTokenBudget

  private def docs = {
    import spark.implicits._
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
  }

  private def assignment(buckets: Int) =
    shardByTokenBudget(docs, col("doc_id"), col("n_tok"), "s42", 500L, buckets)
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bucketed shard cut equals the global single-window reference") {
    // reference: one partition, one plain running sum over the seeded order
    val ref = docs.coalesce(1)
      .withColumn("__h", md5(concat(lit("s42"), col("doc_id").cast("string"))))
      .sortWithinPartitions(col("__h"), col("doc_id"))
      .withColumn("shard", floor(
        coalesce(sum(col("n_tok")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__h"), col("doc_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)) / 500L))
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assignment(64) === ref)
  }

  test("assignment is invariant to bucket count and input partitioning") {
    val base = assignment(64)
    assert(assignment(1) === base)     // degenerate: one bucket = one slice
    assert(assignment(4096) === base)  // more buckets than rows is fine
    val scattered = shardByTokenBudget(docs.repartition(13),
        col("doc_id"), col("n_tok"), "s42", 500L, 64)
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scattered === base)
  }

  test("changing the seed permutes; keeping it reproduces") {
    val a = assignment(64)
    val b = shardByTokenBudget(docs, col("doc_id"), col("n_tok"), "other", 500L, 64)
      .select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === assignment(64))          // bit-identical rerun
    assert(a.keySet === b.keySet)
    assert(a != b) // new seed, new permutation
  }

  test("every non-final shard is filled: cum tokens through shard k >= (k+1)*budget") {
    val perShard = shardByTokenBudget(docs, col("doc_id"), col("n_tok"), "s42", 500L, 64)
      .groupBy(col("shard")).agg(sum(col("n_tok")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(perShard.map(_._1).toSeq === perShard.indices.map(_.toLong)) // dense ids
    var cum = 0L
    perShard.dropRight(1).foreach { case (k, t) =>
      cum += t
      assert(cum >= (k + 1) * 500L, s"shard $k under-filled: $cum")
    }
  }

  test("null or negative token counts fail loudly, not silently") {
    import spark.implicits._
    val bad = Seq((1L, 10L), (2L, -3L)).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      shardByTokenBudget(bad, col("doc_id"), col("n_tok"), "s", 100L, 4)
        .collect()
    }
    assert(e.getMessage.contains("negative token count") ||
      e.getCause != null && e.getCause.getMessage.contains("negative token count"))
  }

  test("writeShards: one file per shard, exact round-trip, seeded order inside each file") {
    val out = "/tmp/graft-shard-export"
    val sharded = shardByTokenBudget(docs, col("doc_id"), col("n_tok"),
      "s42", 500L, 64, keepKey = true)
    val manifest = SamplingFunctions.writeShards(sharded, out,
        orderCols = Seq(col("shuffle_key"), col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // one file per shard, nothing empty
    assert(manifest.nonEmpty)
    manifest.foreach { case (s, rows, files, bytes) =>
      assert(files === 1, s"shard $s has $files files")
      assert(rows > 0 && bytes > 0, s"shard $s empty")
    }
    // round-trip: same (doc_id -> shard) assignment as the in-memory frame
    val back = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = sharded.select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back === expect)
    assert(manifest.map(_._2).sum === expect.size.toLong)
    // rows inside each single-file shard arrive in the seeded order
    manifest.foreach { case (s, _, _, _) =>
      val keys = spark.read.parquet(s"$out/shard=$s")
        .select(col("shuffle_key")).collect().map(_.getString(0)).toSeq
      assert(keys === keys.sorted, s"shard $s not in seeded order")
    }
  }

  test("plan has no single-partition exchange — the cumsum is distributed") {
    val plan = shardByTokenBudget(docs, col("doc_id"), col("n_tok"), "s42", 500L, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
