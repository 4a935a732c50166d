package graft.expr

import graft.SparkSpec
import graft.functions.MultimodalFunctions.ImageCodec
import graft.functions.DedupFunctions
import org.apache.spark.sql.functions._

/** Pins the DCT perceptual-hash contract ([[PHash64Expr]]): the battery
  * round-trips PNG→decode→grid exactly, the native separable evaluation
  * matches the direct-sum spec twin bit-for-bit, hashes are invariant to
  * the edits pHash exists to survive (brightness shift, re-encode, small
  * perturbations, resize) while distinct images stay ≥20 bits apart, and
  * the battery's coefficient-median margins are wide enough that float
  * summation order (Spark separable vs DuckDB single SUM) cannot flip a
  * bit. */
class PHashSpec extends SparkSpec {
  import spark.implicits._

  private def pix(img: Int, x: Int, y: Int): Int =
    ((x * 7 + y * 13 + img * 29) * (x + y + img + 1) + x * y) % 256

  private def grid(img: Int): Array[Double] =
    Array.tabulate(32 * 32)(i => pix(img, i % 32, i / 32).toDouble)

  private def png(img: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = pix(img, x, y)
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("PNG round-trip: decoded 32x32 luma grid IS the pixel formula") {
    for (img <- 0 until 12) {
      val g = ImageCodec.lumaGrid(png(img), 32).get
      assert(g.sameElements(grid(img)), s"img $img grid != formula")
    }
  }

  test("separable evaluation == direct-sum spec twin, battery + fuzz") {
    for (img <- 0 until 12) {
      val g = grid(img)
      assert(PHash64.hash(g) === PHash64.hashDirect(g), s"img $img twin split")
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20) {
      val g = Array.fill(1024)(rnd.nextInt(256).toDouble)
      assert(PHash64.hash(g) === PHash64.hashDirect(g))
    }
  }

  test("battery margins: no coefficient within 1e-3 of the median") {
    for (img <- 0 until 12) {
      val m = PHash64.medianMargin(grid(img))
      assert(m > 1e-3, s"img $img margin $m too small for float-order safety")
    }
  }

  test("invariances: brightness shift and PNG re-encode leave the hash unchanged") {
    val h0 = PHash64.hash(grid(0))
    // +10 on every pixel moves only the DC coefficient; the AC median and
    // every AC sign are untouched
    assert(PHash64.hash(grid(0).map(_ + 10)) === h0)
    // decode → re-encode → decode is lossless for PNG
    val reenc = ImageCodec.resize(png(0), 32, 32).get
    assert(PHash64.hash(ImageCodec.lumaGrid(reenc, 32).get) === h0)
  }

  test("perturbed images collide, distinct images don't") {
    val hashes = (0 until 12).map(i => PHash64.hash(grid(i)))
    // +1 noise on a fifth of the pixels: zero flipped bits on this battery
    val noisy = grid(0).zipWithIndex.map { case (v, i) =>
      if ((i % 32 + i / 32) % 5 == 0) v + 1 else v
    }
    assert(ham(PHash64.hash(noisy), hashes(0)) <= 4)
    // 2x bilinear upscale then re-pool: a true near-duplicate
    val up = ImageCodec.resize(png(0), 64, 64).get
    val hUp = PHash64.hash(ImageCodec.lumaGrid(up, 32).get)
    assert(ham(hUp, hashes(0)) <= 12, s"resize moved ${ham(hUp, hashes(0))} bits")
    // every distinct battery pair stays far apart
    for (i <- 0 until 12; j <- i + 1 until 12)
      assert(ham(hashes(i), hashes(j)) >= 20, s"pair ($i,$j) too close")
  }

  test("imagePhash kernel: distributed, non-images dropped, feeds hamming64") {
    val rows = (0 until 12).map(i => (i.toLong, png(i))) :+
      (99L, "not an image".getBytes("UTF-8"))
    val df = graft.functions.MultimodalFunctions.imagePhash(
      rows.toDF("img_id", "content").repartition(4), "img_id", "content")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 12 && !got.contains(99L)) // non-image dropped
    for (i <- 0 until 12) assert(got(i.toLong) === PHash64.hash(grid(i)))
    // hamming64 over the phash column — the near-dup join key path
    val pairs = df.as("a").join(df.as("b"), col("a.img_id") < col("b.img_id"))
      .select(DedupFunctions.hamming64(col("a.phash"), col("b.phash"))
        .cast("long").as("d"))
      .agg(min(col("d"))).head().getLong(0)
    assert(pairs >= 20)
  }

  test("phash64 expression: wrong-length grid is null, wrong type rejected") {
    val out = Seq((1L, Array(1.0, 2.0)), (2L, Array.fill(1024)(7.0)))
      .toDF("id", "g")
      .select(col("id"), NativeFunctions.phash64(col("g")).as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).isEmpty) // 2-element grid → null, not a crash
    assert(out(2L).nonEmpty)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("id", "g")
        .select(NativeFunctions.phash64(col("g"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("phash64") ||
      e.getMessage.toLowerCase.contains("array"))
  }
}
