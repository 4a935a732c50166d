package graft.tools

import graft.raster.SceneIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput of the JPEG 2000 ingest edge (not driver-run; documents the
  * SCALE.md numbers): single-thread decode MP/s on worst-case (hash noise,
  * every bitplane coded) and smooth (terrain-like, the Sentinel-2 shape)
  * content, plus the distributed readJp2Scenes path. Fixtures are encoded
  * at tool runtime by the independent Python codec (scripts/jp2codec.py),
  * so nothing large is checked in — python3 is a TOOL dependency only,
  * never a library/test one.
  *
  * Usage: sbt "runMain graft.tools.Jp2Bench [side] [copies]"
  */
object Jp2Bench {
  private def gen(side: Int, kind: String, out: String): Unit = {
    val code =
      s"""import sys
         |sys.path.insert(0, 'scripts')
         |import jp2codec as jc
         |n = $side
         |mask = (1 << 12) - 1
         |if "$kind" == "noise":
         |    px = [((i * 2654435761) >> 13) & mask for i in range(n * n)]
         |else:
         |    import math
         |    px = [int(2000 + 1500 * math.sin((i % n) * 0.01) *
         |              math.cos((i // n) * 0.013)) for i in range(n * n)]
         |s = jc.encode_j2k(px, n, n, 12, 5, cb_exp=6)
         |open("$out", "wb").write(s)
         |""".stripMargin
    val p = new ProcessBuilder("python3", "-c", code)
      .directory(new java.io.File(".")).inheritIO().start()
    require(p.waitFor() == 0, s"fixture generation failed for $kind")
  }

  private def timeDecode(bytes: Array[Byte], reps: Int): (Double, Long) = {
    for (_ <- 0 until 2) graft.sources.Jp2Decode.decode(bytes) // JIT warmup
    var px = 0L
    val t0 = System.nanoTime()
    for (_ <- 0 until reps) {
      px += graft.sources.Jp2Decode.decode(bytes).pixels.length
    }
    ((System.nanoTime() - t0) / 1e9, px)
  }

  /** Production-shaped ROI datapoint (SCALE.md): a pre-generated single-tile
    * RPCL codestream with real 256² precincts at ≥8192² (see
    * scripts/gen_jp2_prod.py), full decode vs one 256² windowed block read.
    * The r8 probe win (2.2–2.5×) was measured on a 1024² single-precinct
    * probe; this mode measures the claim at the scene size where it matters.
    */
  private def prodMode(path: String, reps: Int): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // warm + full decode
    val w0 = graft.sources.Jp2Decode.decode(bytes)
    val side = w0.width
    var px = 0L
    val tF = System.nanoTime()
    for (_ <- 0 until reps) px += graft.sources.Jp2Decode.decode(bytes).pixels.length
    val fullSec = (System.nanoTime() - tF) / 1e9 / reps
    println(f"prod full decode ${side}x${w0.height} (${bytes.length / 1e6}%.1f MB): " +
      f"$fullSec%.2f s -> ${px / reps / 1e6 / fullSec}%.1f MP/s single-thread")
    // overview read (rasterio overview-level shape): discard levels so the
    // LL at that level is the output — with PLT, the dropped resolutions'
    // packets seek-skip instead of header-parsing
    for (k <- Seq(3, 5)) {
      graft.sources.Jp2Decode.decode(bytes, discardLevels = k) // warm
      val t0 = System.nanoTime()
      for (_ <- 0 until reps) graft.sources.Jp2Decode.decode(bytes, discardLevels = k)
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"prod overview discard=$k (${side >> k}x${side >> k}): " +
        f"${sec * 1000}%.1f ms vs full ${fullSec * 1000}%.0f ms -> ${fullSec / sec}%.1fx")
    }
    for ((label, wx, wy) <- Seq(("center", side / 2, side / 2), ("corner", 0, 0))) {
      graft.sources.Jp2Decode.decodeWindow(bytes, wx, wy, 256, 256) // warm
      val t0 = System.nanoTime()
      for (_ <- 0 until reps)
        graft.sources.Jp2Decode.decodeWindow(bytes, wx, wy, 256, 256)
      val winSec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"prod window 256x256 @$label: ${winSec * 1000}%.1f ms vs full " +
        f"${fullSec * 1000}%.0f ms -> ${fullSec / winSec}%.1fx " +
        f"(${winSec * 1000}%.1f ms probe at ${side.toLong * w0.height / 1e6}%.0f MP)")
    }
    // ranged IO (Jp2Ranged): fetch only header + PLT + needed packet
    // ranges through positional reads — the object-store bill for the
    // same probes, measured as bytes fetched + GET-range request count
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val read = (ofs: Long, n: Int) => {
        val b = new Array[Byte](n); raf.seek(ofs); raf.readFully(b); b
      }
      for ((label, wx, wy) <- Seq(("center", side / 2, side / 2), ("corner", 0, 0))) {
        graft.sources.Jp2Ranged.decodeWindow(read, bytes.length, wx, wy, 256, 256) // warm
        var io: graft.sources.Jp2Ranged.Io = null
        val t0 = System.nanoTime()
        for (_ <- 0 until reps)
          io = graft.sources.Jp2Ranged.decodeWindow(read, bytes.length, wx, wy, 256, 256)._2
        val sec = (System.nanoTime() - t0) / 1e9 / reps
        println(f"prod RANGED window 256x256 @$label: ${sec * 1000}%.1f ms, " +
          f"${io.bytesRead / 1e3}%.0f KB of ${bytes.length / 1e6}%.1f MB " +
          f"(${io.bytesRead * 100.0 / bytes.length}%.2f%%) in ${io.requests} requests")
      }
      for (k <- Seq(3, 5)) {
        graft.sources.Jp2Ranged.decodeLevel(read, bytes.length, k) // warm
        var io: graft.sources.Jp2Ranged.Io = null
        val t0 = System.nanoTime()
        for (_ <- 0 until reps)
          io = graft.sources.Jp2Ranged.decodeLevel(read, bytes.length, k)._2
        val sec = (System.nanoTime() - t0) / 1e9 / reps
        println(f"prod RANGED overview discard=$k: ${sec * 1000}%.1f ms, " +
          f"${io.bytesRead / 1e3}%.0f KB (${io.bytesRead * 100.0 / bytes.length}%.2f%%) " +
          f"in ${io.requests} requests")
      }
    } finally raf.close()
  }

  def main(args: Array[String]): Unit = {
    if (args.length > 0 && args(0) == "prod") {
      prodMode(
        if (args.length > 1) args(1) else "/tmp/jp2prod/scene8192.j2k",
        if (args.length > 2) args(2).toInt else 3)
      return
    }
    val side = if (args.length > 0) args(0).toInt else 1024
    val copies = if (args.length > 1) args(1).toInt else 16
    val dir = java.nio.file.Files.createTempDirectory("jp2bench")
    val noiseF = dir.resolve("noise.j2k").toString
    val smoothF = dir.resolve("smooth.j2k").toString
    gen(side, "noise", noiseF)
    gen(side, "smooth", smoothF)
    val noise = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(noiseF))
    val smooth = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(smoothF))

    val (nSec, nPx) = timeDecode(noise, 5)
    val (sSec, sPx) = timeDecode(smooth, 5)
    println(f"decode ${side}x$side noise  (${noise.length / 1e3}%.0f KB): ${nPx / 1e6 / nSec}%.1f MP/s single-thread")
    println(f"decode ${side}x$side smooth (${smooth.length / 1e3}%.0f KB): ${sPx / 1e6 / sSec}%.1f MP/s single-thread")

    // windowed (ROI) probe: one 256² block read vs the full decode — the
    // reference's S5 windowed read (index_generator.py:123). The win is
    // EBCOT pruning: only code-blocks whose 5/3 support reaches the
    // window entropy-decode
    val ws = math.min(256, side / 2)
    def timeWindow(bytes: Array[Byte], reps: Int): Double = {
      for (_ <- 0 until 2)
        graft.sources.Jp2Decode.decodeWindow(bytes, side / 2, side / 2, ws, ws)
      val t0 = System.nanoTime()
      for (_ <- 0 until reps)
        graft.sources.Jp2Decode.decodeWindow(bytes, side / 2, side / 2, ws, ws)
      (System.nanoTime() - t0) / 1e9 / reps
    }
    val nWin = timeWindow(noise, 5)
    val sWin = timeWindow(smooth, 5)
    println(f"window ${ws}x$ws probe noise : ${nWin * 1000}%.0f ms vs full ${nSec / 5 * 1000}%.0f ms -> ${nSec / 5 / nWin}%.1fx")
    println(f"window ${ws}x$ws probe smooth: ${sWin * 1000}%.0f ms vs full ${sSec / 5 * 1000}%.0f ms -> ${sSec / 5 / sWin}%.1fx")

    // distributed: `copies` files through the binaryFile -> executor path
    val sparkDir = java.nio.file.Files.createTempDirectory("jp2benchdist")
    for (i <- 0 until copies)
      java.nio.file.Files.write(sparkDir.resolve(f"scene$i%03d__B02.jp2"), smooth)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val total = SceneIO.readJp2Scenes(spark, sparkDir.toString)
      .agg(sum(element_at(col("pixels"), 1))).head().getDouble(0)
    val dSec = (System.nanoTime() - t0) / 1e9
    val mp = copies.toLong * side * side / 1e6
    println(f"readJp2Scenes: $copies files (${mp}%.0f MP) in $dSec%.1f s -> ${mp / dSec}%.1f MP/s on local[8] (checksum $total)")
    spark.stop()
  }
}
