package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** HDF4 header / metadata parser (SURVEY.md S6 physical layer).
  *
  * The reference converts HDF4 scenes with GDAL
  * (bdc_collection_builder/collections/hdf.py:38–108: `gdal.Open` →
  * `GetMetadata()['QAPERCENTCLOUDCOVER.1']` → `GetSubDatasets()` → band
  * names); without GDAL in this environment, the container structure is
  * parsed directly from the public HDF4 specification: the magic number,
  * the chained data-descriptor (DD) blocks, Vgroup (tag 1965) /
  * Vdata-header (1962) / Vdata (1963) records, and the scientific-data
  * dimension records (tag 701).
  *
  * Scope, stated honestly: this parses the METADATA side — subdataset
  * enumeration (name + dims via the SD convention of `Var0.0`-class
  * Vgroups), file attributes (`Attr0.0`-class Vdata, which is where
  * HDF-EOS stores the ODL `CoreMetadata.0` text), and the
  * QAPERCENTCLOUDCOVER extraction the reference's ingest needs. Pixel
  * decode of SDS payloads stays on the GeoTIFF path
  * ([[graft.raster.GeoTiff]]) once scenes are converted; raw SDS decode
  * is out of scope for the engine.
  */
object Hdf4 {

  final case class SubDataset(name: String, bandName: String, dims: Seq[Int])
  final case class HdfMeta(subdatasets: Seq[SubDataset],
                           attributes: Map[String, String]) {
    /** hdf.py:66 — `float(metadata.get('QAPERCENTCLOUDCOVER.1') or 0)`.
      * Looks for a direct attribute first, then inside ODL metadata text. */
    def cloudCover: Double =
      attributes.get("QAPERCENTCLOUDCOVER")
        .orElse(attributes.collectFirst {
          case (k, v) if k.startsWith("CoreMetadata") =>
            odlValue(v, "QAPERCENTCLOUDCOVER")
        }.flatten)
        .flatMap(_.trim.toDoubleOption).getOrElse(0.0)
  }

  private val Magic = Array[Byte](0x0e, 0x03, 0x13, 0x01)

  /** hdf.py:113–116 `is_valid` — here: magic + a walkable DD chain. */
  def isValid(bytes: Array[Byte]): Boolean =
    try { parse(bytes); true } catch { case _: Exception => false }

  def parse(bytes: Array[Byte]): HdfMeta = {
    require(bytes.length >= 8 && bytes.take(4).sameElements(Magic),
      "not an HDF4 file (bad magic)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)

    // 1. walk the chained DD blocks: (tag, ref) -> (offset, length)
    val dds = ArrayBuffer.empty[(Int, Int, Int, Int)]
    var block = 4
    while (block != 0) {
      val n = buf.getShort(block) & 0xffff
      val next = buf.getInt(block + 2)
      (0 until n).foreach { i =>
        val e = block + 6 + 12 * i
        val tag = buf.getShort(e) & 0xffff
        if (tag != 0) // DFTAG_NULL padding entries
          dds += ((tag, buf.getShort(e + 2) & 0xffff, buf.getInt(e + 4),
            buf.getInt(e + 8)))
      }
      block = next
    }
    def find(tag: Int, ref: Int): Option[(Int, Int)] =
      dds.collectFirst { case (t, r, o, l) if t == tag && r == ref => (o, l) }

    def pascal(pos: Int): (String, Int) = {
      val len = buf.getShort(pos) & 0xffff
      val b = new Array[Byte](len)
      val dup = buf.duplicate(); dup.position(pos + 2); dup.get(b)
      (new String(b, "US-ASCII").takeWhile(_ != 0), pos + 2 + len)
    }

    // 2. Vdata headers (tag 1962): attributes live in class "Attr0.0";
    // the value text is the Vdata (tag 1963) with the same ref
    val attributes = dds.collect { case (1962, ref, ofs, _) =>
      val nfields = buf.getShort(ofs + 8) & 0xffff
      // skip per-field type/isize/offset/order arrays then field names
      var p = ofs + 10 + 8 * nfields
      (0 until nfields).foreach { _ => p = pascal(p)._2 }
      val (name, p2) = pascal(p)
      val (klass, _) = pascal(p2)
      (name, klass, ref)
    }.collect { case (name, klass, ref) if klass.startsWith("Attr") =>
      find(1963, ref).map { case (o, l) =>
        val b = new Array[Byte](l)
        val dup = buf.duplicate(); dup.position(o); dup.get(b)
        name -> new String(b, "US-ASCII").takeWhile(_ != 0)
      }
    }.flatten.toMap

    // 3. subdatasets: Vgroups (tag 1965) of class "Var0.0" (the SD-API
    // convention); dims come from the SDD (tag 701) reachable through the
    // member NDG (tag 720) group list
    val subdatasets = dds.collect { case (1965, _, ofs, _) =>
      val nelt = buf.getShort(ofs) & 0xffff
      val tags = (0 until nelt).map(i => buf.getShort(ofs + 2 + 2 * i) & 0xffff)
      val refs = (0 until nelt).map(i =>
        buf.getShort(ofs + 2 + 2 * nelt + 2 * i) & 0xffff)
      val (name, p2) = pascal(ofs + 2 + 4 * nelt)
      val (klass, _) = pascal(p2)
      (name, klass, tags.zip(refs))
    }.collect { case (name, klass, members) if klass.startsWith("Var") =>
      val dims = members.collectFirst { case (720, ndgRef) =>
        find(720, ndgRef).toSeq.flatMap { case (o, l) =>
          (0 until l / 4).map(i =>
            (buf.getShort(o + 4 * i) & 0xffff, buf.getShort(o + 4 * i + 2) & 0xffff))
        }.collectFirst { case (701, sddRef) =>
          find(701, sddRef).map { case (o, _) =>
            val rank = buf.getShort(o) & 0xffff
            (0 until rank).map(i => buf.getInt(o + 2 + 4 * i))
          }
        }.flatten
      }.flatten.getOrElse(Seq.empty)
      SubDataset(name, bandName(name), dims.toSeq)
    }.toSeq

    HdfMeta(subdatasets, attributes)
  }

  /** hdf.py:72–76 — band name: words 4+ of the formal subdataset name
    * joined by '_' (`"MODIS Grid 500m Surface Reflectance Band 1"` →
    * `"Surface_Reflectance_Band_1"`); a short name falls back to the
    * formal name itself (the MOD/MYD branch). */
  def bandName(formal: String): String = {
    val derived = formal.split(' ').drop(3).mkString("_")
    if (derived.nonEmpty) derived else formal
  }

  /** Extract `OBJECT = <key> ... VALUE = <v>` from ODL metadata text (the
    * flattening GDAL performs when it surfaces `QAPERCENTCLOUDCOVER.1`). */
  def odlValue(odl: String, key: String): Option[String] = {
    val obj = s"(?s)OBJECT\\s*=\\s*$key\\b(.*?)END_OBJECT".r
    val value = "VALUE\\s*=\\s*\"?([^\"\\n]+)\"?".r
    obj.findFirstMatchIn(odl)
      .flatMap(m => value.findFirstMatchIn(m.group(1)).map(_.group(1).trim))
  }
}
