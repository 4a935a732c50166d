package graft.tools

import graft.functions.HtmlFunctions
import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling datapoint for the WARC front door (SCALE.md): synthesize
  * Common-Crawl-shaped `.warc.gz` segments (per-record gzip members, HTML
  * response records with realistic page structure), scan + explode +
  * extract distributed, report wall vs corpus size. The claim: file =
  * task, zero shuffle, wall ~linear in archived bytes — the shape that
  * holds when the corpus is 90k 1-GB segments.
  *
  * Usage: sbt "runMain graft.tools.WarcScale [files,recordsPerFile:...]"
  * (default "8,200:32,200:128,200")
  */
object WarcScale {

  private def page(id: Int): String = {
    val rnd = new scala.util.Random(id * 2654435761L)
    val words = Array("data", "corpus", "model", "pipeline", "quality",
      "archive", "filter", "token", "signal", "training", "measure",
      "scale", "sample", "crawl", "index", "decode", "extract", "dedup")
    def para(n: Int): String =
      (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val navLinks = (1 to 6).map(i => s"""<a href="/$i">section $i</a>""")
      .mkString(" | ")
    val paras = (0 until 4 + rnd.nextInt(6))
      .map(_ => s"<p>${para(40 + rnd.nextInt(80))}.</p>").mkString("\n")
    s"""<!DOCTYPE html><html><head><title>Doc $id</title>
       |<style>body { margin: 0 }</style><script>var t = $id;</script>
       |</head><body><nav>$navLinks</nav>
       |<div class="main"><h1>Document number $id</h1>
       |$paras
       |</div><footer><a href="/terms">Terms</a></footer></body></html>
       |""".stripMargin
  }

  private def record(idx: Int, body: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$idx>\r\n" +
      s"WARC-Target-URI: http://synth.example/doc/$idx\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2)
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  private def mediaRecord(idx: Int, ctype: String, body: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:m$idx>\r\n" +
      s"WARC-Target-URI: http://synth.example/media/$idx\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def png(id: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = ((x * 7 + y * 13 + id * 29) * (x + y + id + 1) + x * y) % 256
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  private def wav(id: Int): Array[Byte] = {
    val samples = Array.tabulate(2048) { n =>
      (((id + 3).toLong * ((n.toLong * n) % 977) + 17L * n) % 4096 - 2048).toShort
    }
    graft.functions.MultimodalFunctions.AudioCodec.pcm16Wav(samples, 8000)
  }

  private lazy val clips: IndexedSeq[Array[Byte]] = (0 until 8).map { c =>
    val in = getClass.getResourceAsStream(f"/graft/h264/corpus/clip_$c%02d.mp4")
    try in.readAllBytes() finally in.close()
  }

  def main(args: Array[String]): Unit = {
    val configs = (if (args.nonEmpty) args(0) else "8,200:32,200:128,200")
      .split(":").map { c =>
        val Array(f, r) = c.split(",").map(_.trim.toInt); (f, r)
      }.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for ((nFiles, perFile) <- configs) {
      val dir = java.nio.file.Files.createTempDirectory(s"warc-scale-$nFiles")
      var rawBytes = 0L
      var mediaRecs = 0L
      for (f <- 0 until nFiles) {
        val bos = new java.io.ByteArrayOutputStream()
        for (r <- 0 until perFile) {
          val rec = record(f * perFile + r,
            page(f * perFile + r).getBytes("ISO-8859-1"))
          rawBytes += rec.length
          bos.write(gz(rec)) // per-record gzip member, the CC layout
        }
        // mixed-in media records — the multimodal crawl shape (q175):
        // perFile/4 PNGs, perFile/8 WAVs, perFile/16 avc1 clips per segment
        for (r <- 0 until perFile / 4) {
          val id = f * perFile + r
          val rec = mediaRecord(id, "image/png", png(id))
          rawBytes += rec.length; mediaRecs += 1; bos.write(gz(rec))
        }
        for (r <- 0 until perFile / 8) {
          val id = f * perFile + r
          val rec = mediaRecord(1000000 + id, "audio/x-wav", wav(id))
          rawBytes += rec.length; mediaRecs += 1; bos.write(gz(rec))
        }
        for (r <- 0 until perFile / 16) {
          val id = f * perFile + r
          val rec = mediaRecord(2000000 + id, "video/mp4", clips(id % clips.length))
          rawBytes += rec.length; mediaRecs += 1; bos.write(gz(rec))
        }
        java.nio.file.Files.write(dir.resolve(f"seg_$f%05d.warc.gz"),
          bos.toByteArray)
      }
      def timeIt(tag: String)(body: => Long): Unit = {
        body // warm
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val v = body
          ((System.nanoTime() - t0) / 1e9, v)
        }
        val best = runs.map(_._1).min
        val recs = nFiles.toLong * perFile
        println(f"[warc-scale] $tag%-12s files=$nFiles%4d recs=$recs%,8d " +
          f"raw=${rawBytes / 1e6}%6.1f MB ${best}%6.2f s " +
          f"${recs / best}%,9.0f recs/s")
      }
      val scan = Warc.readWarc(spark, dir.toString)
      timeIt("scan")(scan.agg(count(lit(1))).head().getLong(0))
      timeIt("extract") {
        scan.filter(col("http_status") === 200)
          .select(HtmlFunctions.htmlToText(col("payload").cast("string"))
            .as("text"),
            HtmlFunctions.mainText(col("payload").cast("string")).as("mt"))
          .agg(sum(length(col("text"))) + sum(length(col("mt"))))
          .head().getLong(0)
      }
      // the fused-density-rule claim: native mainText vs the regex/HOF
      // specification twin, identical output (bit-parity-tested), the
      // throughput delta is pure expression cost
      timeIt("maintext") {
        scan.filter(col("http_status") === 200)
          .select(HtmlFunctions.mainText(col("payload").cast("string")).as("mt"))
          .agg(sum(length(col("mt")))).head().getLong(0)
      }
      timeIt("maintext-hof") {
        scan.filter(col("http_status") === 200)
          .select(HtmlFunctions.mainTextSpec(col("payload").cast("string")).as("mt"))
          .agg(sum(length(col("mt")))).head().getLong(0)
      }
      // the multimodal route: non-text records through the unified
      // signature kernel (PNG decode → pHash, WAV → afp, MP4 demux →
      // keyframe H.264 decode → pHash) — still file = task, zero shuffle
      locally {
        val media = scan.filter(col("http_status") === 200 &&
            !col("http_content_type").startsWith("text/"))
          .select(col("record_index").cast("long").as("id"),
            when(col("http_content_type").startsWith("image/"), "image")
              .when(col("http_content_type").startsWith("audio/"), "audio")
              .otherwise("video").as("modality"),
            col("payload"))
        def body: Long = graft.functions.MultimodalFunctions
          .mediaSignatures(media, "id", "modality", "payload")
          .agg(count(lit(1))).head().getLong(0)
        val sigCount = body // warm + sanity
        require(sigCount == nFiles.toLong * (perFile / 4 + perFile / 8 + perFile / 16),
          s"every synthesized media payload must decode, got $sigCount of $mediaRecs")
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[warc-scale] media-sig    files=$nFiles%4d recs=$mediaRecs%,8d " +
          f"raw=${rawBytes / 1e6}%6.1f MB ${best}%6.2f s " +
          f"${mediaRecs / best}%,9.0f recs/s")
      }
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
    spark.stop()
  }
}
