package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 64-bit signature plane's bucketed machinery
  * ([[DedupFunctions.neardupPairsByHamming64]] and the persisted
  * writeHammingIndex / appendToHammingIndex / probeHammingIndex family).
  * The invariants: banding loses NOTHING against the brute O(n²) join at
  * any threshold < bands (pigeonhole), the plan is equi-join-shaped (no
  * cartesian, no nested-loop), partition columns scope pairing, the
  * oversized-bucket join path is lossless, and the index probe returns
  * exactly what the two-sided join on raw signatures would. */
class HammingLshSpec extends SparkSpec {
  import DedupFunctions._
  import spark.implicits._

  /** Deterministic signature battery: 40 base signatures from a bit-mix
    * formula, each with a planted near-twin (id+1000) within 4 flipped
    * bits, plus the twins' own neighbors occasionally colliding — truth
    * is whatever the brute join says. */
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    x ^= (x >>> 29); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 32); x
  }
  private def battery: DataFrame =
    ((0L until 40L).map(i => (i, mix(i))) ++
      (0L until 40L).map { i =>
        // flip (i % 5) bits of the base — distances 0..4
        val flipped = (0 until (i % 5).toInt)
          .foldLeft(mix(i))((s, b) => s ^ (1L << ((i * 7 + b * 13) % 64)))
        (i + 1000L, flipped)
      }).toDF("id", "sig")

  private def bruteSet(df: DataFrame, maxDist: Int): Set[(Long, Long, Long)] =
    df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        hamming64(col("a.sig"), col("b.sig")).cast("long").as("d"))
      .filter(col("d") <= maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def bandedSet(df: DataFrame, bands: Int, maxDist: Int,
                        maxBucket: Int = 10000): Set[(Long, Long, Long)] =
    neardupPairsByHamming64(df, "sig", "id", Nil, bands, maxDist, maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("banded pairs ≡ brute pairs at every threshold < bands (total recall)") {
    val df = battery
    for ((bands, maxDist) <- Seq((8, 4), (8, 7), (16, 4), (4, 3),
                                 (5, 4), (7, 6), (13, 4))) {
      val brute = bruteSet(df, maxDist)
      val banded = bandedSet(df, bands, maxDist)
      assert(banded === brute, s"bands=$bands maxDist=$maxDist")
      assert(brute.nonEmpty, "battery must contain planted near pairs")
    }
  }

  test("multi-probe pairs ≡ brute pairs up to bands·2−1 (wide keys, 1-bit probes)") {
    val df = battery
    // geometries spanning divisor and non-divisor band widths; every
    // threshold exercises the range the exact-key form would need twice
    // the bands (half the key bits) to reach
    for ((bands, maxDist) <- Seq((6, 11), (6, 7), (4, 7), (5, 9), (8, 4), (3, 5))) {
      val brute = bruteSet(df, maxDist)
      val probed = neardupPairsByHammingMultiProbe(df, "sig", "id", Nil, bands, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(probed === brute, s"bands=$bands maxDist=$maxDist")
      assert(brute.nonEmpty, "battery must contain planted near pairs")
    }
  }

  test("multi-probe partition scoping + recall-bound guard + equi-join plan") {
    val planes = Seq(("image", 1L, 42L), ("audio", 2L, 42L), ("image", 3L, 40L))
      .toDF("modality", "id", "sig")
    val pairs = neardupPairsByHammingMultiProbe(planes, "sig", "id",
        Seq("modality"), bands = 6, maxDistance = 11)
      .select("modality", "id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set(("image", 1L, 3L)))
    intercept[IllegalArgumentException] {
      neardupPairsByHammingMultiProbe(battery, "sig", "id", Nil,
        bands = 6, maxDistance = 12)
    }
    val plan = neardupPairsByHammingMultiProbe(battery, "sig", "id", Nil, 6, 11)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("oversized-bucket join path is lossless (maxBucket=1 forces it everywhere)") {
    val df = battery
    assert(bandedSet(df, 8, 4, maxBucket = 1) === bruteSet(df, 4))
  }

  test("partition columns scope pairing: identical sigs in different planes never pair") {
    val df = Seq(("image", 1L, 42L), ("audio", 2L, 42L), ("image", 3L, 42L))
      .toDF("modality", "id", "sig")
    val pairs = neardupPairsByHamming64(df, "sig", "id", Seq("modality"), 8, 4)
      .select("modality", "id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set(("image", 1L, 3L)))
  }

  test("the plan is equi-join-shaped: no cartesian, no nested loop, no single partition") {
    val plan = neardupPairsByHamming64(battery, "sig", "id", Nil, 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("maxDistance must stay below bands — silent recall loss is rejected loudly") {
    intercept[IllegalArgumentException] {
      neardupPairsByHamming64(battery, "sig", "id", Nil, bands = 4, maxDistance = 4)
    }
    intercept[IllegalArgumentException] {
      probeHammingIndex(spark, "/nonexistent", battery, "sig", "id",
        Nil, bands = 4, maxDistance = 4)
    }
  }

  // ---------------- persisted index family ----------------

  private def corpus = battery.filter(col("id") < 1000L)
  private def batch = battery.filter(col("id") >= 1000L)

  private def probeSet(dir: String): Set[(Long, Long, Long)] =
    probeHammingIndex(spark, dir, batch, "sig", "id", Nil, 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def directSet: Set[(Long, Long, Long)] =
    batch.as("a").join(corpus.as("b"), lit(true))
      .select(col("a.id"), col("b.id"),
        hamming64(col("a.sig"), col("b.sig")).cast("long").as("d"))
      .filter(col("d") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("index probe ≡ the two-sided join on raw signatures — incremental costs no recall") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString
    writeHammingIndex(corpus, "sig", "id", dir, Nil, bands = 8)
    val probed = probeSet(dir)
    assert(probed === directSet)
    assert(probed.nonEmpty)
  }

  test("multi-probe index probe ≡ two-sided join at dist ≤ 11 on a bands=6 index") {
    val dir = java.nio.file.Files.createTempDirectory("hidx-mp").toString
    writeHammingIndex(corpus, "sig", "id", dir, Nil, bands = 6)
    val probed = probeHammingIndexMultiProbe(spark, dir, batch, "sig", "id",
        Nil, bands = 6, maxDistance = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = batch.as("a").join(corpus.as("b"), lit(true))
      .select(col("a.id"), col("b.id"),
        hamming64(col("a.sig"), col("b.sig")).cast("long").as("d"))
      .filter(col("d") <= 11)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probed === direct)
    assert(probed.nonEmpty)
    // a planted mid-range pair (dist 9, invisible to exact-key dist<=4
    // probing at these widths) must be found by the 1-bit neighborhood
    val mid = Seq((7000L, mix(3L) ^ 0x1010101010101L)).toDF("id", "sig") // 7 flips of corpus id 3
    val midHits = probeHammingIndexMultiProbe(spark, dir, mid, "sig", "id",
        Nil, bands = 6, maxDistance = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(midHits.contains((7000L, 3L, 7L)), s"got $midHits")
    intercept[IllegalArgumentException] {
      probeHammingIndexMultiProbe(spark, dir, batch, "sig", "id",
        Nil, bands = 6, maxDistance = 12)
    }
  }

  test("append: an accepted item becomes findable without rebuilding") {
    val dir = java.nio.file.Files.createTempDirectory("hidx-app").toString
    writeHammingIndex(corpus, "sig", "id", dir, Nil, bands = 8)
    val accepted = Seq((5000L, mix(77L))).toDF("id", "sig")
    appendToHammingIndex(accepted, "sig", "id", dir, Nil, bands = 8)
    val next = Seq((5001L, mix(77L) ^ 3L)).toDF("id", "sig") // dist 2
    val hits = probeHammingIndex(spark, dir, next, "sig", "id", Nil, 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits === Set((5001L, 5000L, 2L)))
  }

  test("probe plan broadcasts the batch — the index side never exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("hidx-plan").toString
    writeHammingIndex(corpus, "sig", "id", dir, Nil, bands = 8)
    val plan = probeHammingIndex(spark, dir, batch, "sig", "id", Nil, 8, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("crash-consistency: a half-written file in the index dir is invisible to probes") {
    val dir = java.nio.file.Files.createTempDirectory("hidx-crash").toString
    writeHammingIndex(corpus, "sig", "id", dir, Nil, bands = 8)
    val before = probeSet(dir)
    // a crashed writer's leftovers: Spark's commit protocol stages under
    // _temporary/, and in-flight files are dot-prefixed — both are hidden
    // from readers by Hadoop's default path filter
    val tmp = java.nio.file.Paths.get(dir, "_temporary", "0")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-crashed.parquet"),
      Array.fill[Byte](64)(0x5A))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "band=0", ".part-inflight.parquet"),
      Array.fill[Byte](64)(0x5A))
    assert(probeSet(dir) === before,
      "probes must stay on committed files, not crashed leftovers")
  }
}
