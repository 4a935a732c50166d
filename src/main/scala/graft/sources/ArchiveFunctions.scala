package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, GZIPInputStream}

/** Archive handling (SURVEY.md S3/S4): the engine's equivalent of
  * `is_valid_compressed_file` (collections/utils.py:404–436) and
  * `extract_and_get_internal_name` (utils.py:172–187) — executed as UDFs
  * over binary payload columns so validation/extraction runs where the
  * bytes are (executor-local), exactly like the reference's per-worker
  * scratch-dir handling, but data-parallel.
  */
object ArchiveFunctions {

  private def readAll(in: java.io.InputStream,
                      max: Int = Int.MaxValue - 16): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    var total = 0L
    while (n >= 0) {
      total += n
      // THROW at the cap rather than truncate silently: a truncated
      // archive downstream would mis-validate or mis-extract; callers'
      // try/catch turns this into invalid/empty, which is honest
      require(total <= max, s"stream exceeds in-memory cap of $max bytes")
      out.write(buf, 0, n); n = in.read(buf)
    }
    out.toByteArray
  }

  /** Zip integrity: walk every entry and decompress fully (CRC verified by
    * ZipInputStream on close of each entry) — utils.py:404–418 semantics. */
  def isValidZip(bytes: Array[Byte]): Boolean =
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      var e = zin.getNextEntry
      var any = false
      while (e != null) { any = true; readAll(zin); e = zin.getNextEntry }
      zin.close(); any
    } catch { case _: Exception => false }

  /** GZip integrity (tar.gz outer layer — utils.py:421–427). */
  def isValidGzip(bytes: Array[Byte]): Boolean =
    try { readAll(new GZIPInputStream(new ByteArrayInputStream(bytes))); true }
    catch { case _: Exception => false }

  // ---- tar / tar.gz (the Landsat product container; is_valid_tar at
  // utils.py:408–436, tarfile extraction in celery/publish.py:234) -------

  /** One ustar header block: name, octal size, checksum, typeflag. The
    * header checksum (sum of bytes with the chksum field as spaces) is
    * verified per entry — the same integrity walk `tarfile.getmembers`
    * performs. */
  private def tarEntries(bytes: Array[Byte]): Iterator[(String, Int, Int, Byte)] =
    new Iterator[(String, Int, Int, Byte)] {
      private var p = 0
      private def zeroBlock(o: Int) =
        o + 512 <= bytes.length && (o until o + 512).forall(bytes(_) == 0)
      override def hasNext: Boolean =
        p + 512 <= bytes.length && !zeroBlock(p)
      override def next(): (String, Int, Int, Byte) = {
        // names terminate at NUL only (spaces are legal in entry names);
        // octal numeric fields may be space- OR nul-padded on either side
        def str(o: Int, len: Int) = new String(bytes, p + o, len, "US-ASCII")
          .takeWhile(_ != 0)
        def octal(o: Int, len: Int): Long = {
          val s = str(o, len).trim
          if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
        }
        val stored = octal(148, 8)
        val actual = (0 until 512).map { i =>
          if (i >= 148 && i < 156) ' '.toInt else bytes(p + i) & 0xFF
        }.sum
        require(stored == actual, s"tar header checksum mismatch at offset $p")
        val prefix = if (bytes.length >= p + 500 && str(257, 5) == "ustar") str(345, 155) else ""
        val name = (if (prefix.nonEmpty) prefix + "/" else "") + str(0, 100)
        val size = octal(124, 12).toInt
        val (dataOfs, typ) = (p + 512, bytes(p + 156))
        p = dataOfs + ((size + 511) / 512) * 512
        (name, dataOfs, size, typ)
      }
    }

  /** Tar integrity: every header checksum verifies and entry sizes stay in
    * bounds (utils.py:418–426). */
  def isValidTar(bytes: Array[Byte]): Boolean =
    try {
      var any = false
      tarEntries(bytes).foreach { case (_, o, sz, _) =>
        require(o + sz <= bytes.length, "tar entry runs past EOF"); any = true
      }
      any
    } catch { case _: Exception => false }

  def isValidTarGz(bytes: Array[Byte]): Boolean =
    try isValidTar(readAll(new GZIPInputStream(new ByteArrayInputStream(bytes))))
    catch { case _: Exception => false }

  /** Tar extraction to (name, content) — regular files only. */
  def extractTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    try tarEntries(bytes).collect {
      case (name, o, sz, typ) if (typ == '0' || typ == 0) && o + sz <= bytes.length =>
        name -> java.util.Arrays.copyOfRange(bytes, o, o + sz)
    }.toSeq
    catch { case _: Exception => Seq.empty }

  /** Auto-dispatching extraction: zip, tar, tar.gz, or a bare gzip member
    * (named by its kind) — the `is_compressed` fan-in of publish.py:234. */
  def extractArchive(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    archiveKind(bytes) match {
      case "zip" => extractZip(bytes)
      case "tar" => extractTar(bytes)
      case "gzip" =>
        try {
          val inner = readAll(new GZIPInputStream(new ByteArrayInputStream(bytes)))
          if (isValidTar(inner)) extractTar(inner) else Seq("member" -> inner)
        } catch { case _: Exception => Seq.empty }
      case _ => Seq.empty
    }

  /** Archive kind sniff by magic bytes. */
  def archiveKind(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4) "zip"
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) "gzip"
    else if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x0E && (bytes(1) & 0xFF) == 0x03 &&
      (bytes(2) & 0xFF) == 0x13 && (bytes(3) & 0xFF) == 0x01) "hdf4"
    else if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'H' &&
      bytes(2) == 'D' && bytes(3) == 'F') "hdf5"
    else if (Jp2.isContainer(bytes)) "jp2"
    else if (Jp2.isCodestream(bytes)) "j2k"
    // tar last: it has no leading magic (ustar sits at offset 257, and
    // pre-POSIX archives lack even that), so the probe is costlier
    else if (bytes.length >= 512 &&
      (new String(bytes, 257, 5, "US-ASCII") == "ustar" || isValidTar(bytes))) "tar"
    else "unknown"

  /** Zip extraction to (name, content) entries — the explode side of
    * utils.py:94–101/172–187; the "internal SAFE folder" is the common
    * prefix of entry names. */
  def extractZip(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      val out = Seq.newBuilder[(String, Array[Byte])]
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += ((e.getName, readAll(zin)))
        e = zin.getNextEntry
      }
      zin.close(); out.result()
    } catch { case _: Exception => Seq.empty }

  /** Internal root folder name (`extract_and_get_internal_name`). */
  def internalName(entries: Seq[String]): Option[String] =
    entries.flatMap(_.split('/').headOption).distinct match {
      case Seq(single) => Some(single)
      case _ => None
    }

  // ---- Column API ----------------------------------------------------------
  val isValidZipUdf = udf(isValidZip _)
  val isValidGzipUdf = udf(isValidGzip _)
  val isValidTarUdf = udf(isValidTar _)
  val isValidTarGzUdf = udf(isValidTarGz _)
  val archiveKindUdf = udf(archiveKind _)
  val extractZipUdf = udf(extractZip _)
  val extractArchiveUdf = udf(extractArchive _)

  /** Explode an archive column into one row per entry — zip, tar or
    * tar.gz alike. */
  def explodeArchive(content: Column): Column =
    explode(extractArchiveUdf(content))
}
