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
    spark.stop()
  }
}
