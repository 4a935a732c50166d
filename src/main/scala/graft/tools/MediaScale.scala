package graft.tools

import graft.functions.{MultimodalFunctions => M}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling datapoint for the distributed media-decode path (SCALE.md):
  * replicate the committed avc1 corpus clips (IDR + 3 P each — the REAL
  * H.264 decode, not a stub) and synthesized WAV tones across N files,
  * binaryFile-scan + decode, and report wall vs N. The claim under test:
  * file = task, no shuffle, decode wall ~linear in clips — the shape that
  * holds at 100 TB where the corpus is tens of millions of clips.
  *
  * Usage: sbt "runMain graft.tools.MediaScale [Ns]"  (default 512,2048,8192)
  */
object MediaScale {
  def main(args: Array[String]): Unit = {
    val ns = (if (args.nonEmpty) args(0) else "512,2048,8192")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val clipBytes = (0 until 8).map { c =>
      val in = getClass.getResourceAsStream(f"/graft/h264/corpus/clip_$c%02d.mp4")
      try in.readAllBytes() finally in.close()
    }
    def toneBytes(id: Int): Array[Byte] = {
      val samples = Array.tabulate(65536) { n =>
        (((id + 3).toLong * ((n.toLong * n) % 977) + 17L * n) % 4096 - 2048).toShort
      }
      M.AudioCodec.pcm16Wav(samples, 8000)
    }

    for (n <- ns) {
      val dir = java.nio.file.Files.createTempDirectory(s"media-scale-$n")
      for (i <- 0 until n) {
        java.nio.file.Files.write(dir.resolve(f"clip_$i%06d.mp4"),
          clipBytes(i % 8))
        java.nio.file.Files.write(dir.resolve(f"tone_$i%06d.wav"),
          toneBytes(i % 16))
      }
      def timeIt(tag: String)(f: => Long): Unit = {
        f // warm (scan planning, codec classloading)
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val rows = f
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val best = runs.map(_._1).min
        println(f"[media-scale] $tag%-14s n=$n%5d ${best}%7.2f s " +
          f"${runs.head._2}%,10d rows ${n / best}%,9.0f files/s")
      }
      val vids = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mp4").load(dir.toString)
        .select(col("path"), col("content")).as[(String, Array[Byte])]
        .map { case (p, b) =>
          M.MediaRow(p.hashCode.toLong, "video", b, M.videoMeta(b).get)
        }
      timeIt("h264_decode") {
        M.decodeVideoFrames(vids, everyNth = 1, maxFrames = 8)(spark)
          .toDF().agg(count(lit(1))).head().getLong(0)
      }
      val auds = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav").load(dir.toString)
        .select(col("path"), col("content")).as[(String, Array[Byte])]
        .map { case (p, b) =>
          M.MediaRow(p.hashCode.toLong, "audio", b,
            M.AudioCodec.decodeMeta(b).get)
        }
      timeIt("wav_spectral") {
        M.audioSpectral(auds, frameSize = 64, nBands = 4)(spark)
          .toDF().agg(count(lit(1))).head().getLong(0)
      }
      // clean up the generated corpus
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
    spark.stop()
  }
}
