package graft.tools

import graft.functions.{CrawlFunctions, DedupFunctions, SimilarityFunctions => Sim}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling datapoints for the r16 additions (SCALE.md r16):
  *
  *  1. embedding sign-sketch throughput — the native codegen'd
  *     [[graft.expr.RhpSketch64Expr]] vs the 64-when HOF twin over the
  *     same synthetic float[64] corpus (the claim: sketching is
  *     scan-speed arithmetic, 8-byte output, zero shuffle);
  *  2. the banded hamming join over those sketches at the q181 geometry
  *     (bands=12, dist ≤ 11) — join wall vs corpus size;
  *  3. incremental crawl economics — appendCrawlBatch(B) against a
  *     persisted state of C docs vs multimodalKeepers(C ∪ B) full
  *     rebuild, at growing C with B fixed (the claim: append cost is
  *     O(B + touched), flat-ish in C; rebuild re-pays the corpus).
  *
  * Usage: sbt "runMain graft.tools.SketchScale [nSmall:nLarge]"
  * (default "100000:400000" for sketches; crawl corpus sizes are
  * nSmall/20 and nLarge/20 docs with a fixed 500-doc batch)
  */
object SketchScale {

  /** Deterministic pseudo-random 64-dim embedding (same mixing family as
    * the sketch planes but over a disjoint index stream). */
  private def emb(id: Long): Array[Float] = {
    val out = new Array[Float](64)
    var j = 0
    while (j < 64) {
      val h = id * 64 + j
      val a = ((h + 0x9E37L) * 2654435761L) % 4294967296L
      val b = ((a ^ (a >> 16)) * 40503L) % 4294967296L
      out(j) = (((b >> 18) - 8192L).toFloat) / 8192.0f
      j += 1
    }
    out
  }

  private def docText(id: Long, vocab: Array[String]): String = {
    // ~48-token docs over a 4k vocab; every 10th doc is a near-dup of its
    // predecessor (suffix token added) so the pair graph is non-trivial.
    // Token selection takes the TOP bits of a two-multiply integer mix —
    // a low-bit `(a*c + b) % 4096` here makes every doc a rotation of one
    // cyclic word progression (arithmetic strides mod 2^12) and ~2% of
    // ALL doc pairs accidental near-dups: a 290k-edge giant component
    // from 5k docs. Same trap, same fix as the sketch planes.
    val base = if (id % 10 == 9) id - 1 else id
    val sb = new StringBuilder
    var t = 0
    while (t < 48) {
      val a = ((base * 1315423911L + t * 2654435761L + 17) % 4294967296L + 4294967296L) % 4294967296L
      val b = ((a ^ (a >> 16)) * 40503L) % 4294967296L
      sb.append(vocab(((b >> 20) & 4095L).toInt)).append(' ')
      t += 1
    }
    if (id % 10 == 9) sb.append("mutated").append(id) // breaks exact dup, keeps jaccard high
    sb.toString.trim
  }

  def main(args: Array[String]): Unit = {
    val Array(nSmall, nLarge) =
      (if (args.nonEmpty) args(0) else "100000:400000").split(":").map(_.trim.toInt)
    // all | sketch (throughput+joins+cliff) | cliff (cliff rows only) |
    // crawl (incremental economics only)
    val mode = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def best3(body: => Unit): Double = {
      body // warm
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    }

    // ---- 1+2: sketch throughput and the banded join ------------------
    for (n <- Seq(nSmall, nLarge) if mode != "crawl" && mode != "cliff") {
      val embs = spark.sparkContext.parallelize(0L until n.toLong, 32)
        .map(i => (i, emb(i))).toDF("id", "e").cache()
      embs.count()
      // fold signatures through a bounded consumer (ANSI mode: a raw
      // sum of random 64-bit values would overflow-throw)
      val tNat = best3 {
        embs.select(Sim.rhpSketch64(col("e"), 64).as("s"))
          .agg(sum(col("s") % 1000000L)).head()
      }
      val tHof = best3 {
        embs.select(Sim.rhpSketch64Hof(col("e"), 64).as("s"))
          .agg(sum(col("s") % 1000000L)).head()
      }
      val sigs = embs.select(col("id"), Sim.rhpSketch64(col("e"), 64).as("sig"))
        .cache()
      sigs.count()
      // the dedupSemanticSketch default geometry (8-bit keys, d<=7) and
      // the tight media geometry (13-bit keys, d<=4)
      for ((b, d) <- Seq((8, 7), (5, 4))) {
        val tJoin = best3 {
          DedupFunctions.neardupPairsByHamming64(sigs, "sig", "id",
            bands = b, maxDistance = d).count()
        }
        val nPairs = DedupFunctions.neardupPairsByHamming64(sigs, "sig", "id",
          bands = b, maxDistance = d).count()
        println(f"[sketch] n=$n%7d native=$tNat%6.2f s (${n / tNat / 1e3}%7.1fk vec/s) " +
          f"hof=$tHof%6.2f s (x${tHof / tNat}%4.2f) join(b=$b,d<=$d)=$tJoin%6.2f s pairs=$nPairs%d")
      }
      embs.unpersist(); sigs.unpersist()
    }

    // the wide-key cliff: bands=12 → 6-bit keys → candidate verification
    // grows as n²/2^6 — measured at a size where it is merely expensive
    if (mode != "crawl" && mode != "sketchonly") {
      val n = 20000
      val sigs = spark.sparkContext.parallelize(0L until n.toLong, 32)
        .map(i => (i, emb(i))).toDF("id", "e")
        .select(col("id"), Sim.rhpSketch64(col("e"), 64).as("sig")).cache()
      sigs.count()
      val tWide = best3 {
        DedupFunctions.neardupPairsByHamming64(sigs, "sig", "id",
          bands = 12, maxDistance = 11).count()
      }
      val tTight = best3 {
        DedupFunctions.neardupPairsByHamming64(sigs, "sig", "id",
          bands = 8, maxDistance = 7).count()
      }
      // the multi-probe answer to the same dist<=11 budget: 11-bit keys,
      // 1-bit probe neighborhoods — total recall without the key cliff
      val tProbe = best3 {
        DedupFunctions.neardupPairsByHammingMultiProbe(sigs, "sig", "id",
          bands = 6, maxDistance = 11).count()
      }
      println(f"[sketch] n=$n%7d cliff: join(b=12,d<=11)=$tWide%6.2f s vs join(b=8,d<=7)=$tTight%6.2f s " +
        f"(x${tWide / tTight}%5.1f — 6-bit vs 8-bit band keys) " +
        f"multiprobe(b=6,p=1,d<=11)=$tProbe%6.2f s (x${tWide / tProbe}%5.1f vs exact-key d<=11)")
      sigs.unpersist()
    }

    // ---- 3: incremental crawl append vs full rebuild -----------------
    val vocab = Array.tabulate(4096)(i => f"w$i%04x")
    def warcFrame(ids: Range): org.apache.spark.sql.DataFrame =
      spark.sparkContext.parallelize(ids, 32)
        .map { i =>
          (i.toLong, s"http://scale.example/d$i",
            s"<html><body><p>${docText(i.toLong, vocab)}</p></body></html>".getBytes("UTF-8"))
        }.toDF("record_index", "target_uri", "payload")
        .select(col("record_index"), col("target_uri"),
          lit(200).as("http_status"), lit("text/html").as("http_content_type"),
          col("payload"))
    val batchSize = 500
    for (c <- Seq(nSmall / 20, nLarge / 20) if mode == "all" || mode == "crawl") {
      val corpus = warcFrame(0 until c).localCheckpoint(true)
      val batch = warcFrame(c until (c + batchSize)).localCheckpoint(true)
      val p = CrawlFunctions.CrawlParams()
      val state = java.nio.file.Files.createTempDirectory("sketch-scale-state").toString
      val t0 = System.nanoTime()
      CrawlFunctions.initCrawlState(spark, state, corpus, p)
      val tInit = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      CrawlFunctions.appendCrawlBatch(spark, state, batch, p)
      val tAppend = (System.nanoTime() - t1) / 1e9
      val nKeep = CrawlFunctions.crawlKeepers(spark, state).count()
      val t2 = System.nanoTime()
      val nFull = CrawlFunctions.multimodalKeepers(corpus.unionByName(batch)).count()
      val tFull = (System.nanoTime() - t2) / 1e9
      require(nKeep == nFull, s"incremental $nKeep != rebuild $nFull")
      println(f"[crawl] corpus=$c%6d batch=$batchSize init=$tInit%6.2f s " +
        f"append=$tAppend%6.2f s rebuild=$tFull%6.2f s (append/rebuild=${tAppend / tFull}%4.2f) keepers=$nKeep%d")
    }
    spark.stop()
  }
}
