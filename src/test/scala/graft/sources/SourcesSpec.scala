package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream, GZIPOutputStream}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def zipOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (n, b) =>
      z.putNextEntry(new ZipEntry(n)); z.write(b); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  test("zip validity + kind sniff + corruption detection (S3, utils.py:404–436)") {
    val good = zipOf("S2A_SAFE/manifest.xml" -> "hello".getBytes,
      "S2A_SAFE/B04.jp2" -> Array.fill[Byte](1000)(7))
    // flip a byte just before the central directory (inside the last
    // entry's data/descriptor) so the corruption is in data ZipInputStream
    // actually reads, not in the central directory it ignores
    val cdPos = good.indices.find(i => i + 3 < good.length && good(i) == 'P' &&
      good(i + 1) == 'K' && good(i + 2) == 1 && good(i + 3) == 2).get
    val corrupt = good.clone(); corrupt(cdPos - 6) = (corrupt(cdPos - 6) ^ 0xFF).toByte
    assert(ArchiveFunctions.archiveKind(good) == "zip")
    assert(ArchiveFunctions.isValidZip(good))
    assert(!ArchiveFunctions.isValidZip(corrupt))
    assert(!ArchiveFunctions.isValidZip("not a zip".getBytes))
    val gz = { val b = new ByteArrayOutputStream(); val g = new GZIPOutputStream(b)
      g.write("data".getBytes); g.close(); b.toByteArray }
    assert(ArchiveFunctions.archiveKind(gz) == "gzip")
    assert(ArchiveFunctions.isValidGzip(gz))
  }

  test("zip extraction + internal SAFE name as DataFrame ops (S4)") {
    val payload = zipOf("SCENE.SAFE/a.xml" -> "x".getBytes, "SCENE.SAFE/b.jp2" -> "y".getBytes)
    val df = Seq(("s1", payload)).toDF("scene_id", "content")
    val entries = df.select(col("scene_id"),
        ArchiveFunctions.explodeArchive(col("content")).as("e"))
      .select(col("scene_id"), col("e._1").as("name"), col("e._2").as("bytes"))
    val got = entries.collect().map(r => r.getString(1)).toSet
    assert(got == Set("SCENE.SAFE/a.xml", "SCENE.SAFE/b.jp2"))
    assert(ArchiveFunctions.internalName(got.toSeq) == Some("SCENE.SAFE"))
    assert(ArchiveFunctions.internalName(Seq("a/x", "b/y")).isEmpty)
  }

  test("catalog search: three modes with pushable predicates (S1)") {
    val snap = Seq(
      ("SC_A", "23LLF", "2020-01-05", 10.0, 0.0, 0.0, 1.0, 1.0),
      ("SC_B", "23LLF", "2020-02-05", 60.0, 0.0, 0.0, 1.0, 1.0),
      ("SC_C", "24LLF", "2020-01-10", 5.0, 10.0, 10.0, 11.0, 11.0))
      .toDF("scene_id", "tile", "d", "cloud_cover", "x0", "y0", "x1", "y1")
      .select(col("scene_id"), col("tile"), col("d").cast("timestamp").as("sensing_date"),
        col("cloud_cover"),
        struct(col("x0").as("xmin"), col("y0").as("ymin"),
          col("x1").as("xmax"), col("y1").as("ymax")).as("bbox"))
    assert(CatalogSearch.searchScenes(snap, Seq("SC_A", "SC_A", "SC_C"))
      .count() == 2)
    assert(CatalogSearch.searchTiles(snap, Seq("23LLF"), "2020-01-01", "2020-01-31")
      .select("scene_id").head().getString(0) == "SC_A")
    assert(CatalogSearch.searchBbox(snap, 9.5, 9.5, 12.0, 12.0, "2020-01-01", "2020-12-31")
      .select("scene_id").head().getString(0) == "SC_C")
    assert(CatalogSearch.searchTiles(snap, Seq("23LLF"), "2020-01-01", "2020-12-31",
      cloudCover = 50.0).count() == 1)
  }

  test("tar / tar.gz validity + extraction (Landsat products, utils.py:408–436)") {
    // hand-assembled ustar archive — independent of the parser under test
    def tarOf(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      entries.foreach { case (name, data) =>
        val h = new Array[Byte](512)
        name.getBytes("US-ASCII").copyToArray(h, 0)
        def oct(v: Long, o: Int, len: Int): Unit =
          ("%0" + (len - 1) + "o").format(v).getBytes.copyToArray(h, o)
        oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
        oct(data.length, 124, 12); oct(0, 136, 12)
        h(156) = '0'
        "ustar".getBytes.copyToArray(h, 257)
        h(263) = '0'; h(264) = '0'
        for (i <- 148 until 156) h(i) = ' '
        val sum = h.map(_ & 0xFF).sum
        "%06o".format(sum).getBytes.copyToArray(h, 148); h(154) = 0; h(155) = ' '
        out.write(h); out.write(data)
        out.write(new Array[Byte]((512 - data.length % 512) % 512))
      }
      out.write(new Array[Byte](1024))
      out.toByteArray
    }
    val entries = Seq(
      "LC08_L1TP/LC08_B4.TIF" -> Array.tabulate[Byte](700)(_.toByte),
      "LC08_L1TP/MTL.txt" -> "GROUP = L1_METADATA_FILE".getBytes,
      "LC08_L1TP/read me.txt" -> "names may contain spaces".getBytes)
    val tar = tarOf(entries)
    assert(ArchiveFunctions.archiveKind(tar) == "tar")
    assert(ArchiveFunctions.isValidTar(tar))
    val got = ArchiveFunctions.extractTar(tar)
    assert(got.map(_._1) == entries.map(_._1))
    assert(got.head._2.toSeq == entries.head._2.toSeq)
    // one flipped header byte breaks the checksum walk
    val bad = tar.clone(); bad(60) = 'X'
    assert(!ArchiveFunctions.isValidTar(bad))

    val gzOut = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(gzOut)
    gz.write(tar); gz.close()
    val tgz = gzOut.toByteArray
    assert(ArchiveFunctions.isValidTarGz(tgz))
    // explodeArchive handles zip, tar and tar.gz uniformly
    val rows = Seq(("sc", tgz)).toDF("scene_id", "content")
      .select(col("scene_id"), ArchiveFunctions.explodeArchive(col("content")).as("e"))
      .select(col("e._1").as("name")).collect().map(_.getString(0)).toSeq
    assert(rows == entries.map(_._1))
  }

  test("property: tar extract(write(entries)) == entries for random archives") {
    import org.scalacheck.Gen
    def tarOf(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      entries.foreach { case (name, data) =>
        val h = new Array[Byte](512)
        name.getBytes("US-ASCII").copyToArray(h, 0)
        def oct(v: Long, o: Int, len: Int): Unit =
          ("%0" + (len - 1) + "o").format(v).getBytes.copyToArray(h, o)
        oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
        oct(data.length, 124, 12); oct(0, 136, 12)
        h(156) = '0'
        "ustar".getBytes.copyToArray(h, 257); h(263) = '0'; h(264) = '0'
        for (i <- 148 until 156) h(i) = ' '
        "%06o".format(h.map(_ & 0xFF).sum).getBytes.copyToArray(h, 148)
        h(154) = 0; h(155) = ' '
        out.write(h); out.write(data)
        out.write(new Array[Byte]((512 - data.length % 512) % 512))
      }
      out.write(new Array[Byte](1024))
      out.toByteArray
    }
    val nameGen = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '),
      Gen.const('.'), Gen.const('-'))).map(_.mkString.take(80))
    val entryGen = for {
      name <- nameGen
      // 0-byte files and exactly-512-aligned payloads are the edge cases
      size <- Gen.oneOf(Gen.const(0), Gen.const(512), Gen.const(1024), Gen.choose(1, 2000))
      seed <- Gen.choose(0, Int.MaxValue)
    } yield name -> { val r = new scala.util.Random(seed)
      Array.fill[Byte](size)(r.nextInt().toByte) }
    val archiveGen = Gen.listOfN(5, entryGen).map(_.distinctBy(_._1))
    val cases = Iterator.continually(archiveGen.sample).flatten.take(20).toSeq
    for (entries <- cases) {
      val tar = tarOf(entries)
      assert(ArchiveFunctions.isValidTar(tar))
      val got = ArchiveFunctions.extractTar(tar)
      assert(got.map(_._1) == entries.map(_._1), "names round-trip in order")
      got.zip(entries).foreach { case ((_, g), (_, e)) =>
        assert(java.util.Arrays.equals(g, e), "payload bytes round-trip")
      }
    }
  }

  test("JP2/J2K header metadata parse (Sentinel asset headers, publish.py:407,484)") {
    import java.nio.ByteBuffer
    // hand-assembled JP2 container: signature + ftyp + jp2h{ihdr} — layout
    // per ISO 15444-1, independent of the parser under test
    val jp2 = ByteBuffer.allocate(12 + 20 + 8 + 22)
    jp2.put(Array[Byte](0, 0, 0, 12, 'j', 'P', ' ', ' ', 0x0D, 0x0A, 0x87.toByte, 0x0A))
    jp2.putInt(20).put("ftyp".getBytes).put("jp2 ".getBytes).putInt(0).put("jp2 ".getBytes)
    jp2.putInt(8 + 22).put("jp2h".getBytes)
    jp2.putInt(22).put("ihdr".getBytes)
      .putInt(10980).putInt(10980).putShort(1).put(0x0F.toByte) // 10980², 1 comp, 16-bit unsigned
      .put(7.toByte).put(0.toByte).put(0.toByte)
    val cBytes = jp2.array()
    assert(ArchiveFunctions.archiveKind(cBytes) == "jp2")
    assert(Jp2.parse(cBytes) == Jp2.Jp2Meta(10980, 10980, 1, 16, signed = false))

    // raw J2K codestream: SOC + SIZ with grid offsets and 3 components
    val j2k = ByteBuffer.allocate(4 + 2 + 47)
    j2k.put(Array[Byte](0xFF.toByte, 0x4F, 0xFF.toByte, 0x51))
    j2k.putShort(47) // Lsiz for 3 components
    j2k.putShort(0).putInt(5000).putInt(3000).putInt(1000).putInt(500)
    j2k.putInt(1024).putInt(1024).putInt(0).putInt(0)
    j2k.putShort(3).put(0x87.toByte).put(1.toByte).put(1.toByte) // 8-bit signed
    val sBytes = j2k.array()
    assert(ArchiveFunctions.archiveKind(sBytes) == "j2k")
    assert(Jp2.parse(sBytes) == Jp2.Jp2Meta(2500, 4000, 3, 8, signed = true))
    assert(!Jp2.isValid("not jp2".getBytes))
  }

  test("fuzz: corrupt/truncated HDF4 fails cleanly — no hang, no wild allocation") {
    val base = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/tiny_modis.hdf").toURI))
    val rng = new scala.util.Random(43)
    for (trial <- 0 until 200) {
      val bytes = base.clone()
      if (trial % 3 == 0) {
        val t = bytes.take(8 + rng.nextInt(bytes.length - 8))
        try Hdf4.parse(t) catch { case _: Exception => () }
      } else {
        for (_ <- 0 to rng.nextInt(4))
          bytes(rng.nextInt(bytes.length)) = rng.nextInt(256).toByte
        try Hdf4.parse(bytes) catch { case _: Exception => () }
      }
    }
    // a cyclic DD-block chain must fail with the guard, not spin
    val cyclic = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    cyclic.putInt(0x0e031301) // HDF4 magic
    cyclic.putShort(0.toShort) // 0 entries
    cyclic.putInt(4) // next block -> itself
    val e = intercept[IllegalArgumentException](Hdf4.parse(cyclic.array()))
    assert(e.getMessage.contains("cyclic"))
  }

  test("memoized search: uncached (tile, period) cells (ST7)") {
    val snapshot = Seq(("23LLF", "2020-01"), ("23LLF", "2020-02")).toDF("tile", "period")
    val needed = Seq(("23LLF", "2020-01"), ("23LLF", "2020-03"), ("24LLF", "2020-01"))
      .toDF("tile", "period")
    val miss = CatalogSearch.uncachedCells(needed, snapshot)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(miss == Set(("23LLF", "2020-03"), ("24LLF", "2020-01")))
  }
}
