package graft.tools

import graft.functions.MultimodalFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling datapoint for the perceptual-signature plane (SCALE.md r15):
  * synthesize a PNG corpus + a WAV corpus, run the real decode→hash
  * kernels distributed, report wall vs corpus size. The claim: signature
  * extraction is scan-shaped (mapPartitions decode, 8-byte output, ZERO
  * shuffle) — wall ~linear in media bytes, and the downstream near-dup
  * join ships only the signatures.
  *
  * Usage: sbt "runMain graft.tools.PhashScale [nSmall:nLarge]"
  * (default "2000:8000")
  */
object PhashScale {

  private def png(id: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(96, 96,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 96; x <- 0 until 96) {
      val v = ((x * 7 + y * 13 + id * 29) * (x + y + id + 1) + x * y) % 256
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  private def wav(id: Int): Array[Byte] = {
    val samples = Array.tabulate(4096) { n =>
      (((id + 3).toLong * ((n.toLong * n) % 977) + 17L * n) % 4096 - 2048).toShort
    }
    MultimodalFunctions.AudioCodec.pcm16Wav(samples, 8000)
  }

  def main(args: Array[String]): Unit = {
    val Array(nSmall, nLarge) =
      (if (args.nonEmpty) args(0) else "2000:8000").split(":").map(_.trim.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (n <- Seq(nSmall, nLarge)) {
      val imgs = spark.sparkContext.parallelize(0 until n, 32)
        .map(i => (i.toLong, png(i))).toDF("id", "content").cache()
      val wavs = spark.sparkContext.parallelize(0 until n, 32)
        .map(i => (i.toLong, wav(i))).toDF("id", "content").cache()
      val imgBytes = imgs.agg(sum(length(col("content")))).head().getLong(0)
      val wavBytes = wavs.agg(sum(length(col("content")))).head().getLong(0)
      def timeIt(tag: String, bytes: Long)(body: => Long): Unit = {
        body // warm
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[phash-scale] $tag%-12s n=$n%6d ${bytes / 1e6}%7.1f MB " +
          f"$best%6.2f s ${n / best}%,9.0f rows/s")
      }
      timeIt("image", imgBytes)(
        MultimodalFunctions.imagePhash(imgs, "id", "content").count())
      timeIt("audio", wavBytes)(
        MultimodalFunctions.audioPhash(wavs, "id", "content").count())
      imgs.unpersist(); wavs.unpersist()
    }

    // ---- signature-plane JOIN cost at >= 1e5 signatures (SCALE.md r16):
    // 64-bit signatures synthesized directly (extraction cost measured
    // above — the join only ever sees 16 B/row), 10% planted near-twins
    // within 3 flipped bits, banded join + index probe. Two geometries:
    // 8x8-bit bands (recall to hamming 7, wide buckets) and 4x16-bit
    // bands (recall to hamming 3, ~256x narrower buckets) — the knob a
    // 10^9-item corpus turns.
    def mix(i: Long): Long = {
      var x = i * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
      x ^= (x >>> 29); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 32); x
    }
    val D = graft.functions.DedupFunctions
    for (n <- Seq(100000, 400000)) {
      val base = spark.sparkContext.parallelize(0L until n, 32)
        .map(i => (i, mix(i)))
      val twins = spark.sparkContext.parallelize(0L until n / 10, 32).map { j =>
        val i = j * 10
        val flipped = (0 until (j % 4).toInt)
          .foldLeft(mix(i))((s, b) => s ^ (1L << ((i * 7 + b * 13) % 64)))
        (n + i, flipped)
      }
      val sigs = base.union(twins).toDF("id", "sig").cache()
      val total = sigs.count()
      def timeJoin(tag: String)(body: => Long): Unit = {
        val warm = body
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[phash-scale] $tag%-18s n=$total%7d $best%6.2f s " +
          f"${total / best}%,11.0f sigs/s ($warm pairs)")
      }
      if (n <= 200000)
        timeJoin("join-8x8bit")(
          D.neardupPairsByHamming64(sigs, "sig", "id", Nil, 8, 4).count())
      else
        // measured once at n=440k: 229.5 s — the 8-bit-key bucket cliff
        // (n/256-wide buckets); skipped on reruns, geometry documented
        println(s"[phash-scale] join-8x8bit        n=$total SKIPPED " +
          "(8-bit keys are the wrong geometry past ~1e5 — see SCALE.md)")
      timeJoin("join-5x13bit")(
        D.neardupPairsByHamming64(sigs, "sig", "id", Nil, 5, 4).count())
      timeJoin("join-4x16bit")(
        D.neardupPairsByHamming64(sigs, "sig", "id", Nil, 4, 3).count())
      val dir = java.nio.file.Files.createTempDirectory(s"phash-idx-$n").toString
      val t0 = System.nanoTime()
      D.writeHammingIndex(sigs, "sig", "id", dir, Nil, bands = 8)
      println(f"[phash-scale] index-write        n=$total%7d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val batch = spark.sparkContext.parallelize(0L until 1000L, 8)
        .map(j => (10_000_000L + j, mix(j * 10) ^ 1L)).toDF("id", "sig")
      timeJoin("index-probe-1k")(
        D.probeHammingIndex(spark, dir, batch, "sig", "id", Nil, 8, 4).count())
      sigs.unpersist()
    }
    spark.stop()
  }
}
