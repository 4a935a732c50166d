package graft.sources

import java.nio.ByteBuffer

/** JP2/J2K header metadata parser (pure JVM, big-endian byte walk — the
  * same class of work as [[graft.functions.Mp4Demux]]).
  *
  * Sentinel-2 ships its bands as JPEG2000 (the `B02_10m.jp2` glob asset
  * patterns in reference examples/data/sentinel-2-l2a.json; the reference
  * routes every `.jp2` through GDAL's COG translate,
  * celery/publish.py:407,484). Full JPEG2000 pixel decode (wavelets +
  * MQ arithmetic coding) has no JDK implementation and stays out of
  * scope — the GeoTIFF path carries pixel work. What asset routing,
  * validity checks and STAC metadata need from a JP2 is its HEADER:
  * image dimensions, component count and bit depth, which live in the
  * jp2h/ihdr box (ISO 15444-1 §I.5.3) or, for a raw codestream, in the
  * SIZ marker segment (§A.5.1). Both are fixed-layout big-endian
  * records a few dozen bytes in.
  */
object Jp2 {

  final case class Jp2Meta(height: Int, width: Int, components: Int,
                           bitDepth: Int, signed: Boolean)

  private val Jp2Signature = Array[Byte](0x00, 0x00, 0x00, 0x0C,
    'j', 'P', ' ', ' ', 0x0D, 0x0A, 0x87.toByte, 0x0A)

  /** True for a JP2 container (signature box) or raw J2K codestream
    * (SOC marker). */
  def isValid(bytes: Array[Byte]): Boolean =
    isContainer(bytes) || isCodestream(bytes)

  def isContainer(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes.take(12).sameElements(Jp2Signature)

  def isCodestream(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0x4F &&
      (bytes(2) & 0xFF) == 0xFF && (bytes(3) & 0xFF) == 0x51

  /** Parse the header metadata of a JP2 container or raw J2K codestream. */
  def parse(bytes: Array[Byte]): Jp2Meta = {
    val buf = ByteBuffer.wrap(bytes) // JP2 is big-endian throughout
    if (isContainer(bytes)) parseBoxes(buf, 12, bytes.length)
    else if (isCodestream(bytes)) parseSiz(buf, 2) // SIZ follows the 2-byte SOC
    else throw new IllegalArgumentException("not a JP2 container or J2K codestream")
  }

  /** Walk ISO boxes for jp2h → ihdr (same box grammar as ISO-BMFF). */
  private def parseBoxes(buf: ByteBuffer, from: Int, until: Int): Jp2Meta = {
    var p = from
    while (p + 8 <= until) {
      val size32 = buf.getInt(p).toLong & 0xffffffffL
      val typ = new String(Array(buf.get(p + 4), buf.get(p + 5),
        buf.get(p + 6), buf.get(p + 7)), "US-ASCII")
      val (size, hdr) =
        if (size32 == 1) (buf.getLong(p + 8), 16)
        else if (size32 == 0) ((until - p).toLong, 8)
        else (size32, 8)
      require(size >= hdr && p + size <= until, s"malformed JP2 box '$typ' at $p")
      typ match {
        case "jp2h" => return parseBoxes(buf, p + hdr, p + size.toInt)
        case "ihdr" =>
          // ihdr: HEIGHT(4) WIDTH(4) NC(2) BPC(1) C(1) UnkC(1) IPR(1)
          val o = p + hdr
          val bpc = buf.get(o + 10) & 0xFF
          require(bpc != 0xFF,
            "per-component bit depths (ihdr BPC=255, bpcc box) unsupported")
          return Jp2Meta(buf.getInt(o), buf.getInt(o + 4),
            buf.getShort(o + 8) & 0xffff, (bpc & 0x7F) + 1, (bpc & 0x80) != 0)
        case _ => ()
      }
      p += size.toInt
    }
    throw new IllegalArgumentException("JP2 has no jp2h/ihdr box")
  }

  /** SIZ marker segment of a raw codestream: grid minus offsets = image
    * size; Ssiz carries per-component precision. */
  private def parseSiz(buf: ByteBuffer, from: Int): Jp2Meta = {
    require((buf.get(from) & 0xFF) == 0xFF && (buf.get(from + 1) & 0xFF) == 0x51,
      "J2K codestream missing SIZ marker after SOC")
    val o = from + 4 // skip marker + Lsiz
    val xsiz = buf.getInt(o + 2); val ysiz = buf.getInt(o + 6)
    val xosiz = buf.getInt(o + 10); val yosiz = buf.getInt(o + 14)
    val csiz = buf.getShort(o + 34) & 0xffff
    val ssiz = buf.get(o + 36) & 0xFF
    Jp2Meta(ysiz - yosiz, xsiz - xosiz, csiz, (ssiz & 0x7F) + 1, (ssiz & 0x80) != 0)
  }
}
