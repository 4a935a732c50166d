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
  * Scope, stated honestly: this parses the metadata side — subdataset
  * enumeration (name + dims + number type via the SD convention of
  * `Var0.0`-class Vgroups), file attributes (`Attr0.0`-class Vdata, which
  * is where HDF-EOS stores the ODL `CoreMetadata.0` text), the
  * QAPERCENTCLOUDCOVER extraction the reference's ingest needs — and
  * decodes UNCOMPRESSED, contiguous SDS pixel payloads ([[decodeSds]]),
  * which [[toGeoTiff]] re-containers per band exactly like the
  * reference's `to_geotiff` (hdf.py:38–108). Chunked/compressed SDS
  * storage (DFTAG_CHUNK) is not handled: such files convert upstream.
  */
object Hdf4 {

  final case class SubDataset(name: String, bandName: String, dims: Seq[Int],
                              ntType: Int, dataOffset: Long, dataLength: Int)
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
    var walked = 0
    while (block != 0) {
      // a corrupt next-block pointer can form a cycle; fail instead of spin
      require(walked < 4096, "implausible HDF4: more than 4096 DD blocks (cyclic pointer?)")
      walked += 1
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
      val ndgMembers: Seq[(Int, Int)] = members.collectFirst { case (720, ndgRef) =>
        find(720, ndgRef).toSeq.flatMap { case (o, l) =>
          (0 until l / 4).map(i =>
            (buf.getShort(o + 4 * i) & 0xffff, buf.getShort(o + 4 * i + 2) & 0xffff))
        }
      }.getOrElse(Seq.empty)
      val (dims, ntType) = ndgMembers.collectFirst { case (701, sddRef) =>
        find(701, sddRef).map { case (o, _) =>
          val rank = buf.getShort(o) & 0xffff
          val ds = (0 until rank).map(i => buf.getInt(o + 2 + 4 * i))
          // after the dims: (DFTAG_NT=106, ref) of the data's number type;
          // the NT record is [version, DFNT type code, bits, class]
          val ntRef = buf.getShort(o + 2 + 4 * rank + 2) & 0xffff
          val nt = find(106, ntRef).map { case (no, _) => buf.get(no + 1) & 0xff }
            .getOrElse(0)
          (ds, nt)
        }
      }.flatten.getOrElse((Seq.empty[Int], 0))
      val (dataOfs, dataLen) = ndgMembers.collectFirst { case (702, sdRef) =>
        find(702, sdRef).map { case (o, l) => (o.toLong, l) }
      }.flatten.getOrElse((-1L, 0))
      SubDataset(name, bandName(name), dims.toSeq, ntType, dataOfs, dataLen)
    }.toSeq

    HdfMeta(subdatasets, attributes)
  }

  /** Decode an uncompressed, contiguous SDS payload to float pixels
    * (row-major, the rasterio `ReadAsArray` shape at hdf.py:83). DFNT
    * number-type codes are from the public HDF4 spec. */
  def decodeSds(bytes: Array[Byte], sd: SubDataset): Array[Float] = {
    require(sd.dataOffset >= 0 && sd.dims.nonEmpty,
      s"subdataset '${sd.name}' has no contiguous data payload")
    // compute the product in Long with a per-step saturation cap: a plain
    // Long product of 3+ corrupt dims (each up to Int.MaxValue) could wrap
    // 64 bits back into the allowed range and slip the guard
    val nL = sd.dims.foldLeft(1L) { (acc, d) =>
      if (acc > (1L << 28)) acc else acc * d.toLong
    }
    // corrupt dims must not drive allocation (2^28 samples = 1 GiB of float32
    // is far above real SDS)
    require(sd.dims.forall(_ > 0) && nL > 0 && nL <= (1L << 28),
      s"implausible subdataset '${sd.name}' dims ${sd.dims.mkString("x")}")
    val n = nL.toInt
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val o = sd.dataOffset.toInt
    val width = sd.ntType match {
      case 3 | 4 | 20 | 21 => 1 // uchar8/char8/int8/uint8
      case 22 | 23         => 2 // int16/uint16
      case 5 | 24 | 25     => 4 // float32/int32/uint32
      case 6               => 8 // float64
      case t => throw new IllegalArgumentException(s"unsupported DFNT type $t")
    }
    require(sd.dataLength >= n * width,
      s"subdataset '${sd.name}' data shorter than dims (chunked/compressed storage?)")
    Array.tabulate(n) { i =>
      val p = o + i * width
      sd.ntType match {
        case 3 | 21 => (buf.get(p) & 0xff).toFloat
        case 4 | 20 => buf.get(p).toFloat
        case 22     => buf.getShort(p).toFloat
        case 23     => (buf.getShort(p) & 0xffff).toFloat
        case 24     => buf.getInt(p).toFloat
        case 25     => (buf.getInt(p).toLong & 0xffffffffL).toFloat
        case 5      => buf.getFloat(p)
        case 6      => buf.getDouble(p).toFloat
      }
    }
  }

  /** The reference's `to_geotiff` (hdf.py:38–108) end-to-end: every 2-D
    * subdataset becomes a `<baseName>_<bandName>.tif` tiled GeoTIFF
    * ([[graft.raster.GeoTiff.encode]]), nodata from `bandMap` (the
    * reference's fallback when the band carries none), plus the file-level
    * cloud cover. Returns (band → tiff bytes, cloud_cover). */
  def toGeoTiff(bytes: Array[Byte], baseName: String,
                bandMap: Map[String, Double] = Map.empty,
                tileSize: Int = 256): (Seq[(String, Array[Byte])], Double) = {
    val meta = parse(bytes)
    val files = meta.subdatasets.filter(_.dims.length == 2).map { sd =>
      val px = decodeSds(bytes, sd)
      val tiff = graft.raster.GeoTiff.encode(sd.dims(0), sd.dims(1), px,
        graft.raster.GeoTiff.GeoMeta(nodata = bandMap.get(sd.bandName)),
        tileSize)
      // "__" separator: bandName carries underscores, and the GeoTIFF
      // directory scanner splits scene/band on the double underscore
      s"${baseName}__${sd.bandName}.tif" -> tiff
    }
    (files, meta.cloudCover)
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
