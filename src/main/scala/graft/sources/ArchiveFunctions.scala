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

  private def readAll(in: java.io.InputStream, max: Int = 1 << 28): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    var total = 0
    while (n >= 0 && total < max) {
      out.write(buf, 0, n); total += n; n = in.read(buf)
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
  val archiveKindUdf = udf(archiveKind _)
  val extractZipUdf = udf(extractZip _)

  /** Explode an archive column into one row per entry. */
  def explodeArchive(content: Column): Column =
    explode(extractZipUdf(content))
}
