package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Ranged (positional-read) JPEG 2000 decode — the object-store story for
  * the reference's PRIMARY format (Sentinel-2 L1C band files are JP2;
  * publish.py:263–270 reads them through rasterio, which gets GET-Range
  * behavior from GDAL /vsicurl). The in-memory path already prunes the
  * DECODE to a window's precincts via PLT seek-skips (Jp2Decode); this
  * lifts the same pruning to an IO contract: fetch only
  *
  *   1. the main header (SOC..first SOT — a few KB),
  *   2. every tile-part HEADER (SOT..SOD, including the PLT packet-length
  *      tables — the index Kakadu emits precisely so readers can do this),
  *   3. the needed precincts' packet byte ranges, computed from the PLT
  *      by the SAME geometry the decoder skips with
  *      ([[Jp2Decode.TileGeom.neededBodyRanges]]), coalesced (gap ≤ one
  *      block) so a window probe is a handful of GETs,
  *
  * then assemble a sparse codestream (unfetched bytes stay zero — the
  * walk seek-skips them by PLT length and never reads them; the spec
  * proves it by garbage-filling) and hand it to the one validated decode
  * path. A needed tile WITHOUT a complete PLT falls back to fetching its
  * whole body — correct, just not thrifty, exactly like the in-memory
  * walk's header-parse fallback.
  *
  * Overview reads ride the same planner free of charge: with
  * `discardLevels` > 0 and no window, the needed-precinct predicate keeps
  * only the low-resolution packets, so a preview fetches ~4^-k of the
  * body.
  */
object Jp2Ranged {

  /** IO accounting: bytes actually fetched and read requests issued (both
    * object-store cost axes — same contract as GeoTiff.RangedIo), plus
    * `fallbackWholeBody`: how many NEEDED tiles had no complete PLT and
    * fetched their whole body instead of PLT-pruned packet ranges. In
    * production this is the thrifty-vs-fallback signal — a producer that
    * stopped emitting PLTs silently turns window probes into full-tile
    * reads, and only this counter makes that visible. */
  final case class Io(bytesRead: Long, requests: Long,
                      fallbackWholeBody: Long = 0L)

  /** Windowed ranged decode; window in full-resolution pixel coords. */
  def decodeWindow(read: (Long, Int) => Array[Byte], fileLen: Long,
                   x0: Int, y0: Int, winW: Int, winH: Int,
                   discardLevels: Int = 0,
                   blockSize: Int = 64 << 10): (Jp2Decode.Jp2MultiPixels, Io) = {
    require(x0 >= 0 && y0 >= 0 && winW > 0 && winH > 0,
      s"bad window ${winW}x$winH @ ($x0,$y0)")
    decodeImpl(read, fileLen, Jp2Decode.Rect(x0, y0, x0 + winW, y0 + winH),
      discardLevels, blockSize)
  }

  /** Full-canvas ranged decode at a reduced resolution (the rasterio
    * overview-level read): only the kept resolutions' packets fetch. */
  def decodeLevel(read: (Long, Int) => Array[Byte], fileLen: Long,
                  discardLevels: Int,
                  blockSize: Int = 64 << 10): (Jp2Decode.Jp2MultiPixels, Io) =
    decodeImpl(read, fileLen, null, discardLevels, blockSize)

  // ------------------------------------------------------------------ IO

  /** Block-cached positional reader: header traffic fetches 64 KB blocks
    * once; bulk body ranges bypass the cache (each is read exactly once). */
  private final class Blocks(read: (Long, Int) => Array[Byte], fileLen: Long,
                             val blockSize: Int = 64 << 10) {
    private val cache = scala.collection.mutable.LongMap.empty[Array[Byte]]
    var bytesRead = 0L
    var requests = 0L
    private def blockAt(bi: Long): Array[Byte] = cache.getOrElseUpdate(bi, {
      val ofs = bi * blockSize
      val n = math.min(blockSize.toLong, fileLen - ofs).toInt
      require(n > 0, s"read past EOF: block $bi of $fileLen-byte stream")
      requests += 1
      bytesRead += n
      val b = read(ofs, n)
      require(b.length == n, s"ranged read returned ${b.length} of $n bytes")
      b
    })
    def u8(p: Long): Int = blockAt(p / blockSize)((p % blockSize).toInt) & 0xFF
    def u16(p: Long): Int = (u8(p) << 8) | u8(p + 1)
    def u32(p: Long): Long =
      (u16(p).toLong << 16) | u16(p + 2)
    /** Copy [srcOfs, srcOfs+len) into dst (through the block cache). */
    def copyTo(dst: Array[Byte], dstOfs: Int, srcOfs: Long, len: Int): Unit = {
      var i = 0
      while (i < len) {
        val b = blockAt((srcOfs + i) / blockSize)
        val off = ((srcOfs + i) % blockSize).toInt
        val take = math.min(len - i, b.length - off)
        System.arraycopy(b, off, dst, dstOfs + i, take)
        i += take
      }
    }
    /** One uncached bulk fetch (a coalesced packet range). */
    def fetch(ofs: Long, len: Long): Array[Byte] = {
      require(ofs >= 0 && ofs + len <= fileLen, "body range outside stream")
      requests += 1
      bytesRead += len
      val b = read(ofs, len.toInt)
      require(b.length == len.toInt, s"ranged read returned ${b.length} of $len bytes")
      b
    }
  }

  // ------------------------------------------------------------ the plan

  private final case class TilePartHdr(isot: Int, sotOfs: Long,
                                       headerEnd: Long, tileEnd: Long)

  private def decodeImpl(read: (Long, Int) => Array[Byte], fileLen: Long,
                         win: Jp2Decode.Rect, discardLevels: Int,
                         blockSize: Int): (Jp2Decode.Jp2MultiPixels, Io) = {
    require(discardLevels >= 0, s"discardLevels must be >= 0, got $discardLevels")
    val blk = new Blocks(read, fileLen, blockSize)

    // container: JP2 signature box → walk boxes to jp2c; else raw SOC
    val (csOff, csLen): (Long, Long) =
      if (blk.u8(0) == 0xFF && blk.u8(1) == 0x4F) (0L, fileLen)
      else {
        require(blk.u32(0) == 12L && blk.u32(4) == 0x6A502020L,
          "neither a J2K codestream (SOC) nor a JP2 container (signature box)")
        var p = 12L
        var found = (-1L, -1L)
        while (found._1 < 0 && p + 8 <= fileLen) {
          val size0 = blk.u32(p)
          val typ = blk.u32(p + 4)
          val (size, hdr) =
            if (size0 == 1L) ((blk.u32(p + 8) << 32) | blk.u32(p + 12), 16)
            else if (size0 == 0L) (fileLen - p, 8)
            else (size0, 8)
          require(size >= hdr && p + size <= fileLen, "malformed JP2 box")
          if (typ == 0x6A703263L) found = (p + hdr, size - hdr) // 'jp2c'
          p += size
        }
        require(found._1 >= 0, "JP2 container has no jp2c codestream box")
        found
      }
    require(csLen <= Int.MaxValue, "codestream over 2 GiB outside subset")
    require(blk.u8(csOff) == 0xFF && blk.u8(csOff + 1) == 0x4F,
      "jp2c payload missing SOC")

    // marker walk: SIZ geometry + COD for the planner, tile-part layout +
    // PLT tables. Lenient by design — the assembled stream goes through
    // the one validating decode path afterward.
    var xs, ys, xo, yo, xt, yt, xto, yto = 0
    var ncomp = 1
    var cod: Jp2Decode.Cod = null
    var mainHdrEnd = -1L
    val tps = ArrayBuffer.empty[TilePartHdr]
    val pltLens = scala.collection.mutable.Map.empty[Int, ArrayBuffer[Int]]
    var pos = csOff + 2
    var done = false
    while (!done && pos + 2 <= csOff + csLen) {
      val m = blk.u16(pos)
      if (m == 0xFFD9) done = true
      else {
        val len = blk.u16(pos + 2)
        val o = pos + 4
        m match {
          case 0xFF51 => // SIZ
            xs = blk.u32(o + 2).toInt; ys = blk.u32(o + 6).toInt
            xo = blk.u32(o + 10).toInt; yo = blk.u32(o + 14).toInt
            xt = blk.u32(o + 18).toInt; yt = blk.u32(o + 22).toInt
            xto = blk.u32(o + 26).toInt; yto = blk.u32(o + 30).toInt
            ncomp = blk.u16(o + 34)
            pos += 2 + len
          case 0xFF52 => // COD → the planner's Cod (same fields as decode)
            val scod = blk.u8(o)
            val prog = blk.u8(o + 1)
            val layers = blk.u16(o + 2)
            val mct = blk.u8(o + 4)
            val levels = blk.u8(o + 5)
            val cbw = (blk.u8(o + 6) & 0x0F) + 2
            val cbh = (blk.u8(o + 7) & 0x0F) + 2
            val transform = blk.u8(o + 9)
            val (ppx, ppy) =
              if ((scod & 0x01) != 0) {
                val px = new Array[Int](levels + 1)
                val py = new Array[Int](levels + 1)
                var i = 0
                while (i <= levels) {
                  val b = blk.u8(o + 10 + i)
                  px(i) = b & 0x0F; py(i) = b >>> 4
                  i += 1
                }
                (px, py)
              } else (Array.fill(levels + 1)(15), Array.fill(levels + 1)(15))
            cod = Jp2Decode.Cod(levels, cbw, cbh, layers, prog, mct == 1,
              (scod & 0x02) != 0, (scod & 0x04) != 0, transform == 1, ppx, ppy)
            pos += 2 + len
          case 0xFF90 => // SOT: hop tile-parts without touching bodies
            if (mainHdrEnd < 0) mainHdrEnd = pos
            val isot = blk.u16(pos + 4)
            val psot = blk.u32(pos + 6)
            val tileEnd = if (psot == 0L) csOff + csLen - 2 else pos + psot
            require(tileEnd > pos && tileEnd <= csOff + csLen,
              "SOT Psot overruns stream")
            var q = pos + 2 + len
            var pltAcc = 0
            while (!(blk.u8(q) == 0xFF && blk.u8(q + 1) == 0x93)) {
              val sm = blk.u16(q)
              val segLen = blk.u16(q + 2)
              if (sm == 0xFF58) { // PLT
                val lens = pltLens.getOrElseUpdate(isot, ArrayBuffer.empty)
                var pp = q + 5
                val segEnd = q + 2 + segLen
                while (pp < segEnd) {
                  val byt = blk.u8(pp)
                  pltAcc = (pltAcc << 7) | (byt & 0x7F)
                  if ((byt & 0x80) == 0) { lens += pltAcc; pltAcc = 0 }
                  pp += 1
                }
              }
              q += 2 + segLen
            }
            tps += TilePartHdr(isot, pos, q + 2, tileEnd)
            pos = tileEnd
          case _ =>
            pos += 2 + len
        }
      }
    }
    require(cod != null && xs > 0 && tps.nonEmpty && mainHdrEnd > 0,
      "codestream missing SIZ/COD/tile-parts")
    val w = xs - xo; val h = ys - yo
    if (win != null)
      require(win.x1 <= w && win.y1 <= h,
        s"window (${win.x0},${win.y0})..(${win.x1},${win.y1}) outside ${w}x$h")
    val discard = math.min(discardLevels, cod.levels)

    // tile grid + per-tile body segments (tile-part bodies concatenate in
    // arrival order — the same order the decoder appends them)
    val ntx = ceilDiv(xs - xto, xt)
    val nty = ceilDiv(ys - yto, yt)
    val segsByTile = scala.collection.mutable.Map
      .empty[Int, ArrayBuffer[(Long, Long)]] // (fileOfs, len)
    tps.foreach { tp =>
      segsByTile.getOrElseUpdate(tp.isot, ArrayBuffer.empty) +=
        ((tp.headerEnd, tp.tileEnd - tp.headerEnd))
    }

    // plan fetch ranges (file-absolute)
    val bodyRanges = ArrayBuffer.empty[(Long, Long)]
    var wholeBodyTiles = 0L
    for (ty <- 0 until nty; tx <- 0 until ntx) {
      val isot = ty * ntx + tx
      segsByTile.get(isot).foreach { segs =>
        val x0 = math.max(xto + tx * xt, xo)
        val x1 = math.min(xto + (tx + 1).toLong * xt, xs.toLong).toInt
        val y0 = math.max(yto + ty * yt, yo)
        val y1 = math.min(yto + (ty + 1).toLong * yt, ys.toLong).toInt
        val needed = win == null ||
          !(x1 <= win.x0 || x0 >= win.x1 || y1 <= win.y0 || y0 >= win.y1)
        if (needed) {
          val winLocal =
            if (win == null) null
            else Jp2Decode.Rect(math.max(win.x0, x0) - x0, math.max(win.y0, y0) - y0,
              math.min(win.x1, x1) - x0, math.min(win.y1, y1) - y0)
          val geom = new Jp2Decode.TileGeom(y1 - y0, x1 - x0, x0, y0, ncomp,
            cod, discard, winLocal)
          geom.neededBodyRanges(
            pltLens.get(isot).map(_.toArray).orNull) match {
            case Some(ranges) =>
              // body-relative → file-absolute across the tile-part segments
              ranges.foreach { case (bOfs, bLen) =>
                var rem = bLen
                var at = bOfs
                var si = 0
                var segBase = 0L
                while (rem > 0 && si < segs.length) {
                  val (fo, sl) = segs(si)
                  if (at < segBase + sl) {
                    val inSeg = at - segBase
                    val take = math.min(rem, sl - inSeg)
                    bodyRanges += ((fo + inSeg, take))
                    rem -= take
                    at += take
                  }
                  segBase += sl
                  si += 1
                }
                require(rem == 0, "PLT packet range overruns tile body")
              }
            case None =>
              // no complete PLT: fetch the tile's whole body
              wholeBodyTiles += 1
              segs.foreach(bodyRanges += _)
          }
        }
      }
    }

    // assemble the sparse codestream: headers through the block cache,
    // packet ranges as coalesced bulk fetches, everything else zero (the
    // walk seek-skips those bytes by PLT length and never reads them)
    val cs = new Array[Byte](csLen.toInt)
    blk.copyTo(cs, 0, csOff, (mainHdrEnd - csOff).toInt)
    tps.foreach { tp =>
      blk.copyTo(cs, (tp.sotOfs - csOff).toInt, tp.sotOfs,
        (tp.headerEnd - tp.sotOfs).toInt)
    }
    blk.copyTo(cs, csLen.toInt - 2, csOff + csLen - 2, 2) // EOC
    // coalesce (gap ≤ one block): neighbouring precinct rows collapse into
    // one GET — request count is its own object-store cost axis
    val sorted = bodyRanges.filter(_._2 > 0).sortBy(_._1)
    if (sorted.nonEmpty) {
      val merged = ArrayBuffer.empty[(Long, Long)]
      var (s, e) = (sorted.head._1, sorted.head._1 + sorted.head._2)
      for ((o2, l2) <- sorted.tail) {
        if (o2 - e <= blk.blockSize) e = math.max(e, o2 + l2)
        else { merged += ((s, e - s)); s = o2; e = o2 + l2 }
      }
      merged += ((s, e - s))
      merged.foreach { case (o2, l2) =>
        val b = blk.fetch(o2, l2)
        System.arraycopy(b, 0, cs, (o2 - csOff).toInt, l2.toInt)
      }
    }

    val px = Jp2Decode.decodeCs(cs, discard, win)
    (px, Io(blk.bytesRead, blk.requests, wholeBodyTiles))
  }

  @inline private def ceilDiv(n: Int, d: Int): Int = ((n.toLong + d - 1) / d).toInt
}
