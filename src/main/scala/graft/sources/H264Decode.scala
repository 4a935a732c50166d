package graft.sources

/** H.264 (ITU-T Rec. H.264 / MPEG-4 AVC) baseline-profile decoder for
  * I and P pictures — pure JVM, no native codec. Closes the last
  * multimodal pass-through: the reference pipeline's video assets
  * (collections store MP4 quicklooks and the LLM-pipeline's media rows
  * carry avc1 tracks) previously demuxed but did not decode.
  *
  * Supported subset:
  *  - IDR/I slices, one slice per picture, CAVLC entropy coding
  *    (`entropy_coding_mode_flag` = 0 — the baseline profile's only mode),
  *    `frame_mbs_only`, 4:2:0, 8-bit.
  *  - Intra macroblocks: I_4x4 (all nine prediction modes), I_16x16 (all
  *    four modes, every CBP class), I_PCM — in I and P slices.
  *  - P slices with a MULTI-PICTURE DPB (sliding window,
  *    max_num_ref_frames deep; ref_idx_l0 te(v)-coded per partition in
  *    the spec's two-loop mb_pred order, refIdx-aware MV prediction),
  *    EXPLICIT WEIGHTED PREDICTION (per-slice pred_weight_table, the
  *    fade story — 8.4.2.3.2), and ALL P partition shapes —
  *    P_L0_16x16, P_L0_L0_16x8, P_L0_L0_8x16, and P_8x8/P_8x8ref0 with
  *    every sub_mb_type (8x8/8x4/4x8/4x4) — quarter-pel motion
  *    compensation at any block size
  *    (6-tap half-pel, unclipped-intermediate centre position, bilinear
  *    eighth-pel chroma — 8.4.2.2), motion stored at 4x4-block
  *    granularity, median motion-vector prediction with the
  *    B/C-unavailable and single-matching-neighbour special cases plus
  *    the 16x8/8x16 directional shortcuts (8.4.1.3), P_Skip with its
  *    zero-motion edge conditions (8.4.1.1), mb_skip_run coding, inter
  *    CBP (Table 9-4 Inter column), one reference picture (the previous
  *    decoded frame).
  *  - Frame cropping, per-MB QP deltas, chroma QP offset, multi-frame
  *    streams; Annex B and avcC/length-prefixed NAL framing.
  * Rejected loudly (never silently wrong): CABAC, B slices, reference
  * list reordering, implicit weighted prediction / weighted_bipred
  * (EXPLICIT per-ref weights via pred_weight_table are supported),
  * interlace, slice groups, scaling
  * matrices, constrained intra, multi-slice frames, and — deliberately —
  * streams that ENABLE the in-loop deblocking filter
  * (`disable_deblocking_filter_idc` != 1): decoding those without the
  * filter would be approximately-right, and approximately-right pixels
  * poison oracle-pinned pipelines. Key-frame fixtures and archival
  * quicklook encoders can and do disable it.
  *
  * Verification: the CAVLC tables ([[H264Tables]]) are generated from the
  * structurally-validated table source (prefix-free, pinned Kraft sums —
  * the committee's deliberately-unused illegal codewords included); the
  * inter CBP column is recalled as the committee's (intra, inter) pair
  * table whose intra half reproduces the independently validated intra
  * column entry-for-entry, and is asserted a bijection. H264DecodeSpec
  * pins this decoder bit-exact against the reconstruction of an
  * independent pure-python encoder (scripts/h264codec.py) across mixed MB
  * types, QPs, crop, chroma offsets, dense low-QP residuals, every
  * quarter-pel phase (a 16-frame pan whose reconstruction IS the
  * interpolator output), skip-run layouts, and diverse inter CBPs, plus
  * corrupt-stream fuzz (every failure is an exception, never a hang or a
  * giant allocation).
  *
  * Scale shape: one VIDEO decodes in one task (P chains are sequential by
  * construction, so the video — not the frame — is the parallel unit;
  * `mapPartitions` over media rows, same as the MJPEG and JP2 kernels);
  * memory is bounded by the declared dimensions, which are validated
  * against `maxDim` BEFORE any allocation, plus a sliding-window DPB
  * whose TOTAL footprint (declared frame size × max_num_ref_frames) is
  * capped at two maxDim-sized frames' worth of macroblocks — also
  * enforced at SPS parse, before any allocation.
  */
object H264Decode {

  /** One decoded frame: row-major 8-bit planes, chroma at half resolution. */
  final case class H264Frame(width: Int, height: Int,
                             y: Array[Byte], cb: Array[Byte], cr: Array[Byte])

  final case class Sps(profile: Int, levelIdc: Int, log2MaxFrameNum: Int,
                       pocType: Int, log2MaxPocLsb: Int,
                       mbW: Int, mbH: Int,
                       cropL: Int, cropR: Int, cropT: Int, cropB: Int,
                       maxRefFrames: Int = 1) {
    def width: Int = mbW * 16 - 2 * (cropL + cropR)
    def height: Int = mbH * 16 - 2 * (cropT + cropB)
  }
  final case class Pps(initQp: Int, chromaQpOffset: Int,
                       deblockControl: Boolean, weightedPred: Boolean,
                       numRefL0Default: Int = 1)

  /** Decode every picture of an Annex B elementary stream (I/IDR and
    * single-ref P; P slices reference the previous decoded picture). */
  def decodeAnnexB(data: Array[Byte], maxDim: Int = 8192): Seq[H264Frame] = {
    var sps: Sps = null
    var pps: Pps = null
    var dpb: List[MbState] = Nil
    val out = Seq.newBuilder[H264Frame]
    for (nal <- splitAnnexB(data)) {
      val ntype = nal(0) & 0x1F
      val refIdc = (nal(0) >> 5) & 3
      ntype match {
        case 7 => sps = parseSps(unescape(nal), maxDim)
        case 8 => pps = parsePps(unescape(nal))
        case 1 | 5 =>
          require(sps != null && pps != null, "slice before SPS/PPS")
          if (ntype == 5) dpb = Nil // IDR resets the DPB
          val (frame, st) =
            decodeSlice(unescape(nal), sps, pps, idr = ntype == 5, refIdc, dpb)
          if (refIdc != 0) dpb = (st :: dpb).take(sps.maxRefFrames)
          out += frame
        case _ => () // SEI / AUD / filler: skipped
      }
    }
    out.result()
  }

  /** Stateful avc1 sample decoder: parses the avcC config once and keeps
    * the single-reference DPB across [[decodeSample]] calls, so P samples
    * decode against the preceding samples of the SAME instance. A sample
    * that throws invalidates the reference — subsequent P samples fail
    * (loudly) until the next IDR re-establishes it, exactly a player's
    * recover-at-keyframe behaviour. */
  final class AvccStreamDecoder(avcc: Array[Byte], maxDim: Int = 8192) {
    require(avcc.length >= 7, "avcC too short")
    require((avcc(0) & 0xFF) == 1, "avcC configurationVersion != 1")
    private val nalLenSize = (avcc(4) & 0x03) + 1
    private var sps: Sps = null
    private var pps: Pps = null
    private var dpb: List[MbState] = Nil
    locally {
      var pos = 5
      val nSps = avcc(pos) & 0x1F; pos += 1
      for (_ <- 0 until nSps) {
        val len = ((avcc(pos) & 0xFF) << 8) | (avcc(pos + 1) & 0xFF); pos += 2
        sps = parseSps(unescape(java.util.Arrays.copyOfRange(avcc, pos, pos + len)), maxDim)
        pos += len
      }
      val nPps = avcc(pos) & 0xFF; pos += 1
      for (_ <- 0 until nPps) {
        val len = ((avcc(pos) & 0xFF) << 8) | (avcc(pos + 1) & 0xFF); pos += 2
        pps = parsePps(unescape(java.util.Arrays.copyOfRange(avcc, pos, pos + len)))
        pos += len
      }
      require(sps != null && pps != null, "avcC carries no SPS/PPS")
    }

    /** Decode one length-prefixed sample; throws on malformed/unsupported
      * content (after invalidating the reference state). */
    def decodeSample(sample: Array[Byte]): Seq[H264Frame] = {
      var p = 0
      val frames = Seq.newBuilder[H264Frame]
      try {
        while (p + nalLenSize <= sample.length) {
          var len = 0
          for (i <- 0 until nalLenSize) len = (len << 8) | (sample(p + i) & 0xFF)
          p += nalLenSize
          require(len > 0 && p + len <= sample.length,
            s"NAL length $len overruns sample (${sample.length} B)")
          val nal = java.util.Arrays.copyOfRange(sample, p, p + len)
          p += len
          val ntype = nal(0) & 0x1F
          val refIdc = (nal(0) >> 5) & 3
          if (ntype == 1 || ntype == 5) {
            if (ntype == 5) dpb = Nil // IDR resets the DPB
            val (frame, st) =
              decodeSlice(unescape(nal), sps, pps, idr = ntype == 5, refIdc, dpb)
            if (refIdc != 0) dpb = (st :: dpb).take(sps.maxRefFrames)
            frames += frame
          }
        }
      } catch {
        case e: Throwable => dpb = Nil; throw e
      }
      frames.result()
    }
  }

  /** Decode length-prefixed samples against an avcC decoder configuration
    * (ISO 14496-15 AVCDecoderConfigurationRecord — the MP4 'avc1' story).
    * Samples decode IN ORDER against one [[AvccStreamDecoder]], so
    * P-sample chains work when the caller passes the preceding samples. */
  def decodeAvccSamples(avcc: Array[Byte], samples: Seq[Array[Byte]],
                        maxDim: Int = 8192): Seq[H264Frame] = {
    val dec = new AvccStreamDecoder(avcc, maxDim)
    samples.flatMap(dec.decodeSample)
  }

  // -------------------------------------------------------------- framing

  private[sources] def splitAnnexB(data: Array[Byte]): Seq[Array[Byte]] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    val n = data.length
    while (i + 3 <= n) {
      if (data(i) == 0 && data(i + 1) == 0 && data(i + 2) == 1) {
        starts += ((i, i + 3)); i += 3
      } else if (i + 4 <= n && data(i) == 0 && data(i + 1) == 0 &&
          data(i + 2) == 0 && data(i + 3) == 1) {
        starts += ((i, i + 4)); i += 4
      } else i += 1
    }
    starts.toSeq.zipWithIndex.map { case ((_, p), k) =>
      val end = if (k + 1 < starts.length) starts(k + 1)._1 else n
      java.util.Arrays.copyOfRange(data, p, end)
    }
  }

  /** RBSP: strip emulation_prevention_three_byte (after the NAL header). */
  private[sources] def unescape(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var zeros = 0
    var i = 1
    while (i < nal.length) {
      val b = nal(i)
      if (zeros >= 2 && b == 3) zeros = 0
      else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ bitreader

  private final class Bits(data: Array[Byte]) {
    var pos = 0
    def bit(): Int = {
      require(pos >> 3 < data.length, "bitstream exhausted")
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) {
        zeros += 1
        require(zeros < 32, "ue(v) runaway")
      }
      (1 << zeros) - 1 + (if (zeros > 0) u(zeros) else 0)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    /** Truncated exp-Golomb: one inverted bit when cMax == 1, else ue. */
    def te(cMax: Int): Int = if (cMax == 1) 1 - bit() else ue()
    def byteAlign(): Unit = while (pos % 8 != 0) pos += 1
    /** VLC decode against a (len << 20 | value) -> symbol map. */
    def vlc(table: Map[Int, Int], what: String): Int = {
      var len = 0
      var v = 0
      while (len < 17) {
        v = (v << 1) | bit()
        len += 1
        table.get(len << 20 | v) match {
          case Some(sym) => return sym
          case None => ()
        }
      }
      throw new IllegalArgumentException(s"illegal $what codeword")
    }
  }

  // ------------------------------------------------------- SPS/PPS/slice

  private[sources] def parseSps(rbsp: Array[Byte], maxDim: Int): Sps = {
    val r = new Bits(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    r.ue() // sps_id
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128).contains(profile)) {
      require(r.ue() == 1, "only 4:2:0 chroma")
      r.ue(); r.ue(); r.u(1)
      require(r.u(1) == 0, "seq scaling matrices unsupported")
    }
    // spec-bounded syntax elements: a corrupt ue(v) can decode to ~2^31,
    // and feeding that to u(n)/loops would spin for minutes — bound every
    // count BEFORE using it (log2 fields ≤ 16 per 7.4.2.1.1, cycle list
    // ≤ 255)
    val log2Fn = r.ue() + 4
    require(log2Fn <= 16, s"log2_max_frame_num $log2Fn out of range")
    val pocType = r.ue()
    var log2Poc = 0
    if (pocType == 0) {
      log2Poc = r.ue() + 4
      require(log2Poc <= 16, s"log2_max_pic_order_cnt_lsb $log2Poc out of range")
    } else if (pocType == 1) {
      r.u(1); r.se(); r.se()
      val n = r.ue()
      require(n <= 255, s"num_ref_frames_in_pic_order_cnt_cycle $n out of range")
      var i = 0
      while (i < n) { r.se(); i += 1 }
    }
    val maxRef = r.ue()
    require(maxRef <= 16, s"max_num_ref_frames $maxRef out of range")
    r.u(1) // gaps allowed
    val mbW = r.ue() + 1
    val mbH = r.ue() + 1
    require(mbW.toLong * 16 <= maxDim && mbH.toLong * 16 <= maxDim,
      s"declared ${mbW * 16}x${mbH * 16} exceeds maxDim $maxDim")
    // DPB footprint guard: each retained reference costs a full MbState
    // (~1.9 KB/macroblock), so a few-KB crafted stream declaring max-dim
    // frames AND max_num_ref_frames=16 would pin ~8 GB live on an
    // executor. Budget = two maxDim-sized frames' worth of macroblocks —
    // generous for real streams (1080p fits 16 refs ~60x over) while
    // capping a decode task's DPB near 1 GB at the default maxDim.
    val budgetMbs = 2L * (maxDim / 16) * (maxDim / 16)
    require(mbW.toLong * mbH * math.max(1, maxRef) <= budgetMbs,
      s"DPB of $maxRef ${mbW * 16}x${mbH * 16} references exceeds the " +
        s"$budgetMbs-macroblock decode budget")
    require(r.u(1) == 1, "interlaced (frame_mbs_only=0) unsupported")
    r.u(1) // direct_8x8_inference
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u(1) == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    require(2 * (cl + cr) < mbW * 16 && 2 * (ct + cb) < mbH * 16,
      "cropping consumes the whole frame")
    Sps(profile, level, log2Fn, pocType, log2Poc, mbW, mbH, cl, cr, ct, cb,
      math.max(1, maxRef))
  }

  private[sources] def parsePps(rbsp: Array[Byte]): Pps = {
    val r = new Bits(rbsp)
    r.ue(); r.ue() // pps_id, sps_id
    require(r.u(1) == 0, "CABAC unsupported (baseline is CAVLC)")
    r.u(1)
    require(r.ue() == 0, "slice groups unsupported")
    val numRefL0Default = r.ue() + 1
    require(numRefL0Default <= 16, "num_ref_idx_l0_default out of range")
    r.ue() // num_ref_idx_l1_default_active_minus1 (B only)
    val weightedPred = r.u(1) == 1
    r.u(2) // weighted_bipred_idc (B only)
    val initQp = 26 + r.se()
    r.se() // qs
    val cqo = r.se()
    val deblock = r.u(1) == 1
    require(r.u(1) == 0, "constrained_intra_pred unsupported")
    r.u(1)
    Pps(initQp, cqo, deblock, weightedPred, numRefL0Default)
  }

  // ------------------------------------------------- constants & helpers

  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val Zscan4 = Array(0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15)
  private val RasterToZ = {
    val a = new Array[Int](16)
    for (z <- 0 until 16) a(Zscan4(z)) = z
    a
  }
  // dequant V by qP%6 and position class (0: corners, 1: odd-odd, 2: rest)
  private val DequantV = Array(Array(10, 16, 13), Array(11, 18, 14),
    Array(13, 20, 16), Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
  private val PosClass = Array.tabulate(16) { i =>
    val (r, c) = (i >> 2, i & 3)
    if ((r & 1) == 0 && (c & 1) == 0) 0 else if ((r & 1) == 1 && (c & 1) == 1) 1 else 2
  }
  private val ChromaQpTab =
    Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
      38, 38, 38, 39, 39, 39, 39)
  private def chromaQp(qpY: Int, offset: Int): Int = {
    val qpi = math.max(0, math.min(51, qpY + offset))
    if (qpi < 30) qpi else ChromaQpTab(qpi - 30)
  }
  // Table 9-4, Intra_4x4 column: codeNum -> coded_block_pattern
  private val CbpIntra = Array(47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14,
    39, 43, 45, 46, 16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2,
    4, 8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  // Table 9-4, Inter column. Recalled as the committee's (intra, inter)
  // PAIR table; the intra halves reproduce CbpIntra above entry-for-entry
  // (cross-anchor), bijection asserted in H264DecodeSpec and below.
  private[sources] val CbpInter = Array(0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12,
    15, 47, 7, 11, 13, 14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43,
    45, 46, 17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
  require(CbpInter.sorted.sameElements(0 until 48) &&
    CbpIntra.sorted.sameElements(0 until 48), "Table 9-4 must be bijective")

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def dequantAc(level: Int, qp: Int, i: Int): Int =
    level * DequantV(qp % 6)(PosClass(i)) << (qp / 6)

  private def dequantLumaDc(f: Int, qp: Int): Int = {
    val v = DequantV(qp % 6)(0)
    if (qp >= 36) (f * v) << (qp / 6 - 6)
    else (f * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  private def dequantChromaDc(f: Int, qp: Int): Int =
    ((f * DequantV(qp % 6)(0)) << (qp / 6)) >> 5

  /** Inverse 4x4 core transform with the final (x+32)>>6 (8.5.12.2). */
  private def inv4x4(c: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = c(4 * i); val d1 = c(4 * i + 1); val d2 = c(4 * i + 2); val d3 = c(4 * i + 3)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      t(4 * i) = e0 + e3; t(4 * i + 1) = e1 + e2
      t(4 * i + 2) = e1 - e2; t(4 * i + 3) = e0 - e3
      i += 1
    }
    val o = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val d0 = t(j); val d1 = t(4 + j); val d2 = t(8 + j); val d3 = t(12 + j)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      o(j) = (e0 + e3 + 32) >> 6; o(4 + j) = (e1 + e2 + 32) >> 6
      o(8 + j) = (e1 - e2 + 32) >> 6; o(12 + j) = (e0 - e3 + 32) >> 6
      j += 1
    }
    o
  }

  /** 4x4 Hadamard (I_16x16 luma DC, 8.5.10). */
  private def hadamard4(c: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = c(4 * i); val b = c(4 * i + 1); val cc = c(4 * i + 2); val d = c(4 * i + 3)
      val s0 = a + d; val s3 = a - d; val s1 = b + cc; val s2 = b - cc
      t(4 * i) = s0 + s1; t(4 * i + 1) = s3 + s2
      t(4 * i + 2) = s0 - s1; t(4 * i + 3) = s3 - s2
      i += 1
    }
    val o = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val a = t(j); val b = t(4 + j); val cc = t(8 + j); val d = t(12 + j)
      val s0 = a + d; val s3 = a - d; val s1 = b + cc; val s2 = b - cc
      o(j) = s0 + s1; o(4 + j) = s3 + s2; o(8 + j) = s0 - s1; o(12 + j) = s3 - s2
      j += 1
    }
    o
  }

  // ------------------------------------------------------------- CAVLC

  private def ctTable(nc: Int): Map[Int, Int] =
    if (nc == -1) H264Tables.coeffTokenChromaDc
    else if (nc < 2) H264Tables.coeffTokenNc0
    else if (nc < 4) H264Tables.coeffTokenNc2
    else if (nc < 8) H264Tables.coeffTokenNc4
    else H264Tables.coeffTokenNc8

  /** Decode one residual block (9.2); returns (coeffs in scan order,
    * TotalCoeff for neighbour context). */
  private def cavlcBlock(r: Bits, nc: Int, maxCoeff: Int): (Array[Int], Int) = {
    val sym = r.vlc(ctTable(nc), "coeff_token")
    val t1 = sym / 32
    val total = sym % 32
    val coeffs = new Array[Int](maxCoeff)
    if (total == 0) return (coeffs, 0)
    require(total <= maxCoeff, s"TotalCoeff $total > $maxCoeff")
    val levels = new Array[Int](total)
    var k = 0
    while (k < t1) { levels(k) = if (r.bit() == 1) -1 else 1; k += 1 }
    var suffixLen = if (total > 10 && t1 < 3) 1 else 0
    while (k < total) {
      var prefix = 0
      while (r.bit() == 0) {
        prefix += 1
        require(prefix < 32, "level_prefix runaway")
      }
      val size =
        if (suffixLen == 0 && prefix == 14) 4
        else if (prefix >= 15) prefix - 3
        else suffixLen
      var code = (math.min(15, prefix) << suffixLen) + (if (size > 0) r.u(size) else 0)
      if (prefix >= 15 && suffixLen == 0) code += 15
      if (prefix >= 16) code += (1 << (prefix - 3)) - 4096
      if (k == t1 && t1 < 3) code += 2
      levels(k) = if (code % 2 == 0) (code + 2) >> 1 else -((code + 1) >> 1)
      if (suffixLen == 0) suffixLen = 1
      if (math.abs(levels(k)) > (3 << (suffixLen - 1)) && suffixLen < 6)
        suffixLen += 1
      k += 1
    }
    val totalZeros =
      if (total < maxCoeff) {
        if (maxCoeff == 4) r.vlc(H264Tables.totalZerosChromaDc(total), "total_zeros")
        else r.vlc(H264Tables.totalZeros4x4(total), "total_zeros")
      } else 0
    val runs = new Array[Int](math.max(0, total - 1))
    var zerosLeft = totalZeros
    k = 0
    while (k < total - 1) {
      if (zerosLeft > 0) {
        val run =
          if (zerosLeft < 7) r.vlc(H264Tables.runBefore(zerosLeft), "run_before")
          else {
            // zerosLeft >= 7: table row 7 plus the unary run>=7 extension
            var len = 0
            var v = 0
            var res = -1
            while (res < 0) {
              v = (v << 1) | r.bit()
              len += 1
              H264Tables.runBefore(7).get(len << 20 | v) match {
                case Some(x) => res = x
                case None =>
                  if (v == 1 && len >= 4) res = len - 1 + 4 // 0^(n)1 -> n+3? see below
                  else require(len < 18, "run_before runaway")
              }
            }
            res
          }
        require(run <= zerosLeft, "run_before exceeds zerosLeft")
        runs(k) = run
        zerosLeft -= run
      }
      k += 1
    }
    var pos = total + totalZeros - 1
    require(pos < maxCoeff, "coefficients overflow the block")
    k = 0
    while (k < total) {
      coeffs(pos) = levels(k)
      if (k < total - 1) pos -= runs(k) + 1
      k += 1
    }
    (coeffs, total)
  }

  // --------------------------------------------------- prediction helpers

  private[sources] final class Plane(val w: Int, val h: Int) {
    val px = new Array[Int](w * h)
    @inline def apply(x: Int, y: Int): Int = px(y * w + x)
    @inline def set(x: Int, y: Int, v: Int): Unit = px(y * w + x) = v
    def toBytes(x0: Int, y0: Int, ww: Int, hh: Int): Array[Byte] = {
      val out = new Array[Byte](ww * hh)
      var y = 0
      while (y < hh) {
        var x = 0
        while (x < ww) { out(y * ww + x) = px((y0 + y) * w + x0 + x).toByte; x += 1 }
        y += 1
      }
      out
    }
  }

  /** Is the above-right 4x4 neighbour decoded when block (bx, by) (frame
    * 4-px luma units) decodes? Raster MB + z-scan block order. */
  private def aboveRightAvailable(bx: Int, by: Int, mbW: Int): Boolean = {
    if (by == 0) return false
    val sx = (bx + 1) * 4
    if (sx >= mbW * 16) return false
    val mbx = bx >> 2; val mby = by >> 2
    val smbx = sx >> 4; val smby = (by * 4 - 1) >> 4
    if (smby < mby) return true
    if (smbx < mbx) return true
    if (smbx > mbx) return false
    val cur = RasterToZ((by & 3) * 4 + (bx & 3))
    val nb = RasterToZ((((by * 4 - 1) >> 2) & 3) * 4 + ((sx >> 2) & 3))
    nb < cur
  }

  /** 4x4 intra prediction (8.3.1.2); clipped-index DDL/HU forms fold the
    * spec's edge cases. Returns 16 samples row-major. */
  private def pred4x4(mode: Int, rec: Plane, x0: Int, y0: Int,
                      aboveRightOk: Boolean): Array[Int] = {
    val leftOk = x0 > 0
    val aboveOk = y0 > 0
    val cornerOk = leftOk && aboveOk
    val l = if (leftOk) Array.tabulate(4)(i => rec(x0 - 1, y0 + i)) else null
    val a = if (aboveOk) {
      val base = Array.tabulate(4)(i => rec(x0 + i, y0 - 1))
      if (aboveRightOk) base ++ Array.tabulate(4)(i => rec(x0 + 4 + i, y0 - 1))
      else base ++ Array.fill(4)(base(3))
    } else null
    val c = if (cornerOk) rec(x0 - 1, y0 - 1) else 0
    @inline def A(i: Int): Int = if (i == -1) c else a(math.min(i, 7))
    @inline def L(i: Int): Int = if (i == -1) c else l(math.min(i, 3))
    val p = new Array[Int](16)
    @inline def setAll(f: (Int, Int) => Int): Unit = {
      var y = 0
      while (y < 4) { var x = 0; while (x < 4) { p(y * 4 + x) = f(x, y); x += 1 }; y += 1 }
    }
    mode match {
      case 0 =>
        require(aboveOk, "vertical prediction needs the row above")
        setAll((x, _) => a(x))
      case 1 =>
        require(leftOk, "horizontal prediction needs the column left")
        setAll((_, y) => l(y))
      case 2 =>
        val dc =
          if (leftOk && aboveOk) (a(0) + a(1) + a(2) + a(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (leftOk) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else if (aboveOk) (a(0) + a(1) + a(2) + a(3) + 2) >> 2
          else 128
        setAll((_, _) => dc)
      case 3 =>
        require(aboveOk, "diag-down-left needs the row above")
        setAll((x, y) => (A(x + y) + 2 * A(x + y + 1) + A(x + y + 2) + 2) >> 2)
      case 4 =>
        require(cornerOk, "diag-down-right needs left+above")
        setAll { (x, y) =>
          if (x > y) (A(x - y - 2) + 2 * A(x - y - 1) + A(x - y) + 2) >> 2
          else if (x < y) (L(y - x - 2) + 2 * L(y - x - 1) + L(y - x) + 2) >> 2
          else (a(0) + 2 * c + l(0) + 2) >> 2
        }
      case 5 =>
        require(cornerOk, "vertical-right needs left+above")
        setAll { (x, y) =>
          val z = 2 * x - y
          if (z >= 0 && z % 2 == 0) (A(x - (y >> 1) - 1) + A(x - (y >> 1)) + 1) >> 1
          else if (z >= 0) (A(x - (y >> 1) - 2) + 2 * A(x - (y >> 1) - 1) + A(x - (y >> 1)) + 2) >> 2
          else if (z == -1) (l(0) + 2 * c + a(0) + 2) >> 2
          else (L(y - 1) + 2 * L(y - 2) + L(y - 3) + 2) >> 2
        }
      case 6 =>
        require(cornerOk, "horizontal-down needs left+above")
        setAll { (x, y) =>
          val z = 2 * y - x
          if (z >= 0 && z % 2 == 0) (L(y - (x >> 1) - 1) + L(y - (x >> 1)) + 1) >> 1
          else if (z >= 0) (L(y - (x >> 1) - 2) + 2 * L(y - (x >> 1) - 1) + L(y - (x >> 1)) + 2) >> 2
          else if (z == -1) (l(0) + 2 * c + a(0) + 2) >> 2
          else (A(x - 1) + 2 * A(x - 2) + A(x - 3) + 2) >> 2
        }
      case 7 =>
        require(aboveOk, "vertical-left needs the row above")
        setAll { (x, y) =>
          val i = x + (y >> 1)
          if (y % 2 == 0) (a(i) + a(i + 1) + 1) >> 1
          else (a(i) + 2 * a(i + 1) + a(i + 2) + 2) >> 2
        }
      case 8 =>
        require(leftOk, "horizontal-up needs the column left")
        setAll { (x, y) =>
          val z = x + 2 * y
          val i = z >> 1
          if (z % 2 == 0) (L(i) + L(i + 1) + 1) >> 1
          else (L(i) + 2 * L(i + 1) + L(i + 2) + 2) >> 2
        }
      case m => throw new IllegalArgumentException(s"bad intra4x4 mode $m")
    }
    p
  }

  private def pred16x16(mode: Int, rec: Plane, x0: Int, y0: Int): Array[Int] = {
    val leftOk = x0 > 0
    val aboveOk = y0 > 0
    val p = new Array[Int](256)
    mode match {
      case 0 =>
        require(aboveOk, "I16 vertical needs the row above")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { p(y * 16 + x) = rec(x0 + x, y0 - 1); x += 1 }; y += 1 }
      case 1 =>
        require(leftOk, "I16 horizontal needs the column left")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { p(y * 16 + x) = rec(x0 - 1, y0 + y); x += 1 }; y += 1 }
      case 2 =>
        var dc = 128
        if (leftOk && aboveOk) {
          var s = 16
          for (i <- 0 until 16) s += rec(x0 + i, y0 - 1) + rec(x0 - 1, y0 + i)
          dc = s >> 5
        } else if (aboveOk) {
          var s = 8
          for (i <- 0 until 16) s += rec(x0 + i, y0 - 1)
          dc = s >> 4
        } else if (leftOk) {
          var s = 8
          for (i <- 0 until 16) s += rec(x0 - 1, y0 + i)
          dc = s >> 4
        }
        java.util.Arrays.fill(p, dc)
      case 3 =>
        require(leftOk && aboveOk, "I16 plane needs left+above")
        var hs = 0; var vs = 0
        for (i <- 0 until 8) {
          hs += (i + 1) * (rec(x0 + 8 + i, y0 - 1) - rec(x0 + 6 - i, y0 - 1))
          vs += (i + 1) * (rec(x0 - 1, y0 + 8 + i) - rec(x0 - 1, y0 + 6 - i))
        }
        val aa = 16 * (rec(x0 - 1, y0 + 15) + rec(x0 + 15, y0 - 1))
        val b = (5 * hs + 32) >> 6
        val cc = (5 * vs + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            p(y * 16 + x) = clip255((aa + b * (x - 7) + cc * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"bad intra16x16 mode $m")
    }
    p
  }

  /** 8x8 chroma prediction (8.3.4): 0=DC (per 4x4 sub-block), 1=H, 2=V,
    * 3=Plane. */
  private def predChroma(mode: Int, rec: Plane, x0: Int, y0: Int): Array[Int] = {
    val leftOk = x0 > 0
    val aboveOk = y0 > 0
    val p = new Array[Int](64)
    mode match {
      case 0 =>
        var sy = 0
        while (sy < 2) {
          var sx = 0
          while (sx < 2) {
            val sa = if (aboveOk) {
              var s = 0; for (i <- 0 until 4) s += rec(x0 + 4 * sx + i, y0 - 1); s
            } else -1
            val sl = if (leftOk) {
              var s = 0; for (i <- 0 until 4) s += rec(x0 - 1, y0 + 4 * sy + i); s
            } else -1
            val dc =
              if (sx == sy) {
                if (sa >= 0 && sl >= 0) (sa + sl + 4) >> 3
                else if (sa >= 0) (sa + 2) >> 2
                else if (sl >= 0) (sl + 2) >> 2
                else 128
              } else if (sx == 1) {
                if (sa >= 0) (sa + 2) >> 2
                else if (sl >= 0) (sl + 2) >> 2
                else 128
              } else {
                if (sl >= 0) (sl + 2) >> 2
                else if (sa >= 0) (sa + 2) >> 2
                else 128
              }
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 4) { p((4 * sy + y) * 8 + 4 * sx + x) = dc; x += 1 }
              y += 1
            }
            sx += 1
          }
          sy += 1
        }
      case 1 =>
        require(leftOk, "chroma horizontal needs the column left")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { p(y * 8 + x) = rec(x0 - 1, y0 + y); x += 1 }; y += 1 }
      case 2 =>
        require(aboveOk, "chroma vertical needs the row above")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { p(y * 8 + x) = rec(x0 + x, y0 - 1); x += 1 }; y += 1 }
      case 3 =>
        require(leftOk && aboveOk, "chroma plane needs left+above")
        var hs = 0; var vs = 0
        for (i <- 0 until 4) {
          hs += (i + 1) * (rec(x0 + 4 + i, y0 - 1) - rec(x0 + 2 - i, y0 - 1))
          vs += (i + 1) * (rec(x0 - 1, y0 + 4 + i) - rec(x0 - 1, y0 + 2 - i))
        }
        val aa = 16 * (rec(x0 - 1, y0 + 7) + rec(x0 + 7, y0 - 1))
        val b = (17 * hs + 16) >> 5
        val cc = (17 * vs + 16) >> 5
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            p(y * 8 + x) = clip255((aa + b * (x - 3) + cc * (y - 3) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"bad chroma mode $m")
    }
    p
  }

  // ----------------------------------------------------------- the slice

  private[sources] final class MbState(val mbW: Int, val mbH: Int) {
    val y = new Plane(mbW * 16, mbH * 16)
    val cb = new Plane(mbW * 8, mbH * 8)
    val cr = new Plane(mbW * 8, mbH * 8)
    val nnzY = new Array[Int](mbW * 4 * mbH * 4)
    val nnzCb = new Array[Int](mbW * 2 * mbH * 2)
    val nnzCr = new Array[Int](mbW * 2 * mbH * 2)
    val i4Modes = new Array[Int](mbW * 4 * mbH * 4)
    val mbIsI4 = new Array[Boolean](mbW * mbH)
    // motion at 4x4-BLOCK granularity (partitioned neighbours resolve to
    // the specific block the spec names): refIdx -2 = not yet decoded,
    // -1 = intra, 0 = inter against the single reference
    val bRef = Array.fill(mbW * 4 * mbH * 4)(-2)
    val bMvX = new Array[Int](mbW * 4 * mbH * 4)
    val bMvY = new Array[Int](mbW * 4 * mbH * 4)
    val bw4 = mbW * 4
    val bw2 = mbW * 2
    def ncY(bx: Int, by: Int): Int = nc(nnzY, bw4, bx, by)
    def ncC(m: Array[Int], cx: Int, cy: Int): Int = nc(m, bw2, cx, cy)
    private def nc(m: Array[Int], w: Int, bx: Int, by: Int): Int = {
      val hasA = bx > 0
      val hasB = by > 0
      if (hasA && hasB) (m(by * w + bx - 1) + m((by - 1) * w + bx) + 1) >> 1
      else if (hasA) m(by * w + bx - 1)
      else if (hasB) m((by - 1) * w + bx)
      else 0
    }
    def predI4Mode(mbW: Int, bx: Int, by: Int): Int = {
      def mode(nbx: Int, nby: Int): Int =
        if (nbx < 0 || nby < 0) 2
        else if (!mbIsI4((nby >> 2) * mbW + (nbx >> 2))) 2
        else i4Modes(nby * bw4 + nbx)
      math.min(mode(bx - 1, by), mode(bx, by - 1))
    }
  }

  // ------------------------------------- inter prediction (MC, 8.4.2.2)

  @inline private def tap6(a: Int, b: Int, c: Int, d: Int, e: Int, f: Int): Int =
    a - 5 * b + 20 * c + 20 * d - 5 * e + f

  /** Luma MC at quarter-pel, any block size (8.4.2.2.1/.2, Figure 8-4):
    * 6-tap half-pel, centre j from UNCLIPPED intermediates
    * ((j1+512)>>10), quarter positions as rounding averages.
    * Edge-clamped reads; output is bw×bh row-major. */
  private def mcLuma(ref: Plane, x0: Int, y0: Int, mvx: Int, mvy: Int,
                     bw: Int = 16, bh: Int = 16): Array[Int] = {
    val ix = x0 + (mvx >> 2); val iy = y0 + (mvy >> 2)
    val fx = mvx & 3; val fy = mvy & 3
    val W = ref.w; val H = ref.h
    @inline def p(x: Int, y: Int): Int =
      ref.px(math.min(math.max(y, 0), H - 1) * W + math.min(math.max(x, 0), W - 1))
    @inline def halfH(x: Int, y: Int): Int =
      clip255((tap6(p(x - 2, y), p(x - 1, y), p(x, y), p(x + 1, y),
        p(x + 2, y), p(x + 3, y)) + 16) >> 5)
    @inline def halfV(x: Int, y: Int): Int =
      clip255((tap6(p(x, y - 2), p(x, y - 1), p(x, y), p(x, y + 1),
        p(x, y + 2), p(x, y + 3)) + 16) >> 5)
    @inline def hsum(x: Int, y: Int): Int =
      tap6(p(x - 2, y), p(x - 1, y), p(x, y), p(x + 1, y), p(x + 2, y), p(x + 3, y))
    @inline def halfHV(x: Int, y: Int): Int =
      clip255((tap6(hsum(x, y - 2), hsum(x, y - 1), hsum(x, y),
        hsum(x, y + 1), hsum(x, y + 2), hsum(x, y + 3)) + 512) >> 10)
    def sample(x: Int, y: Int): Int = {
      if (fx == 0 && fy == 0) p(x, y)
      else if (fy == 0) {
        val b = halfH(x, y)
        if (fx == 2) b
        else (p(x + (if (fx == 1) 0 else 1), y) + b + 1) >> 1
      } else if (fx == 0) {
        val h = halfV(x, y)
        if (fy == 2) h
        else (p(x, y + (if (fy == 1) 0 else 1)) + h + 1) >> 1
      } else if (fx == 2 && fy == 2) halfHV(x, y)
      else if (fx == 2) // f/q: between b (above or below) and j
        (halfH(x, if (fy == 1) y else y + 1) + halfHV(x, y) + 1) >> 1
      else if (fy == 2) // i/k: between h (left or right) and j
        (halfV(if (fx == 1) x else x + 1, y) + halfHV(x, y) + 1) >> 1
      else { // e/g/p/r: nearest horizontal + nearest vertical half-pel
        val b = halfH(x, if (fy == 1) y else y + 1)
        val h = halfV(if (fx == 1) x else x + 1, y)
        (b + h + 1) >> 1
      }
    }
    val out = new Array[Int](bw * bh)
    var i = 0
    while (i < bh) {
      var j = 0
      while (j < bw) { out(i * bw + j) = sample(ix + j, iy + i); j += 1 }
      i += 1
    }
    out
  }

  /** Chroma MC, any block size (8.4.2.2.2): eighth-pel bilinear from the
    * quarter-pel LUMA vector on the half-resolution plane. Edge-clamped. */
  private def mcChroma(ref: Plane, x0: Int, y0: Int, mvx: Int, mvy: Int,
                       bw: Int = 8, bh: Int = 8): Array[Int] = {
    val ix = x0 + (mvx >> 3); val iy = y0 + (mvy >> 3)
    val xf = mvx & 7; val yf = mvy & 7
    val W = ref.w; val H = ref.h
    @inline def p(x: Int, y: Int): Int =
      ref.px(math.min(math.max(y, 0), H - 1) * W + math.min(math.max(x, 0), W - 1))
    val out = new Array[Int](bw * bh)
    var i = 0
    while (i < bh) {
      var j = 0
      while (j < bw) {
        out(i * bw + j) = ((8 - xf) * (8 - yf) * p(ix + j, iy + i) +
          xf * (8 - yf) * p(ix + j + 1, iy + i) +
          (8 - xf) * yf * p(ix + j, iy + i + 1) +
          xf * yf * p(ix + j + 1, iy + i + 1) + 32) >> 6
        j += 1
      }
      i += 1
    }
    out
  }

  // ------------------------------- MV prediction (8.4.1.1 / 8.4.1.3)

  /** (refIdx, mvx, mvy) of a 4x4 luma block, or null if outside / not
    * yet decoded. Motion is stored at block granularity so partitioned
    * neighbours (16x8/8x16) resolve to the SPECIFIC block the spec names.
    * Intra blocks are available with refIdx -1, mv (0,0). */
  private def blkMotion(st: MbState, bx: Int, by: Int): Array[Int] = {
    if (bx < 0 || by < 0 || bx >= st.mbW * 4 || by >= st.mbH * 4) return null
    val i = by * st.mbW * 4 + bx
    val ref = st.bRef(i)
    if (ref == -2) return null
    if (ref < 0) Array(-1, 0, 0) else Array(ref, st.bMvX(i), st.bMvY(i))
  }

  /** Write a partition's motion into the block-granular maps. */
  private def recordBlocks(st: MbState, x0b: Int, y0b: Int, wb: Int,
                           hb: Int, ref: Int, mvx: Int, mvy: Int): Unit = {
    var by = y0b
    while (by < y0b + hb) {
      var bx = x0b
      while (bx < x0b + wb) {
        val i = by * st.mbW * 4 + bx
        st.bRef(i) = ref
        st.bMvX(i) = mvx; st.bMvY(i) = mvy
        bx += 1
      }
      by += 1
    }
  }

  /** Generic median MV predictor (8.4.1.3.1) for a partition with
    * top-left 4x4 block (x0b, y0b) and width wb blocks: A left, B above,
    * C above-right with D above-left substitution; B&C-unavailable ->
    * mvA; exactly-one-matching-refIdx -> that mv; else the median. */
  private def mvpPart(st: MbState, x0b: Int, y0b: Int, wb: Int,
                      refIdx: Int = 0): (Int, Int) = {
    val a = blkMotion(st, x0b - 1, y0b)
    val b = blkMotion(st, x0b, y0b - 1)
    var c = blkMotion(st, x0b + wb, y0b - 1)
    if (c == null) c = blkMotion(st, x0b - 1, y0b - 1)
    if (b == null && c == null && a != null) return (a(1), a(2))
    val ns = Array(a, b, c)
    var matching = -1; var nMatch = 0
    var i = 0
    while (i < 3) {
      if (ns(i) != null && ns(i)(0) == refIdx) { matching = i; nMatch += 1 }
      i += 1
    }
    if (nMatch == 1) return (ns(matching)(1), ns(matching)(2))
    @inline def med(v0: Int, v1: Int, v2: Int): Int =
      math.max(math.min(v0, v1), math.min(math.max(v0, v1), v2))
    @inline def mv(n: Array[Int], k: Int): Int = if (n == null) 0 else n(k)
    (med(mv(a, 1), mv(b, 1), mv(c, 1)), med(mv(a, 2), mv(b, 2), mv(c, 2)))
  }

  private def mvp16x16(st: MbState, mbx: Int, mby: Int): (Int, Int) =
    mvpPart(st, mbx * 4, mby * 4, 4)

  /** 16x8 directional shortcut (8.4.1.3.2): top partition takes mvB,
    * bottom takes mvA, when that neighbour references this picture;
    * else the generic median for the partition. */
  private def mvp16x8(st: MbState, mbx: Int, mby: Int, part: Int,
                      refIdx: Int = 0): (Int, Int) = {
    val x0b = mbx * 4; val y0b = mby * 4 + 2 * part
    val n = if (part == 0) blkMotion(st, x0b, y0b - 1)
            else blkMotion(st, x0b - 1, y0b)
    if (n != null && n(0) == refIdx) (n(1), n(2))
    else mvpPart(st, x0b, y0b, 4, refIdx)
  }

  /** 8x16 directional shortcut: left partition takes mvA, right takes
    * mvC (with D substitution), when same-picture; else the median. */
  private def mvp8x16(st: MbState, mbx: Int, mby: Int, part: Int,
                      refIdx: Int = 0): (Int, Int) = {
    val x0b = mbx * 4 + 2 * part; val y0b = mby * 4
    var n: Array[Int] = null
    if (part == 0) n = blkMotion(st, x0b - 1, y0b)
    else {
      n = blkMotion(st, x0b + 2, y0b - 1)
      if (n == null) n = blkMotion(st, x0b - 1, y0b - 1)
    }
    if (n != null && n(0) == refIdx) (n(1), n(2))
    else mvpPart(st, x0b, y0b, 2, refIdx)
  }

  /** Explicit weighted prediction (8.4.2.3.2): per-slice
    * pred_weight_table state. perRef(i) = [lumaW, lumaO, cbW, cbO, crW,
    * crO]; null Wp = weighting off. */
  private final case class Wp(lwdY: Int, lwdC: Int, perRef: Array[Array[Int]])

  /** Clip1(((p*w + 2^(lwd-1)) >> lwd) + o) when lwd >= 1, else
    * Clip1(p*w + o) — in place. */
  private def applyWp(block: Array[Int], w: Int, o: Int, lwd: Int): Array[Int] = {
    var i = 0
    if (lwd >= 1) {
      val r = 1 << (lwd - 1)
      while (i < block.length) {
        block(i) = clip255(((block(i) * w + r) >> lwd) + o); i += 1
      }
    } else {
      while (i < block.length) { block(i) = clip255(block(i) * w + o); i += 1 }
    }
    block
  }

  @inline private def wpY(wp: Wp, b: Array[Int], refI: Int): Array[Int] =
    if (wp == null) b
    else applyWp(b, wp.perRef(refI)(0), wp.perRef(refI)(1), wp.lwdY)

  @inline private def wpC(wp: Wp, b: Array[Int], refI: Int, comp: Int): Array[Int] =
    if (wp == null) b
    else applyWp(b, wp.perRef(refI)(2 + 2 * comp), wp.perRef(refI)(3 + 2 * comp), wp.lwdC)

  /** Sub-partitions of one 8x8 (P sub_mb_type 0..3): (dx, dy, w, h) in
    * pixels within the 8x8, decode order. */
  private def subParts(subType: Int): Array[(Int, Int, Int, Int)] =
    subType match {
      case 0 => Array((0, 0, 8, 8))
      case 1 => Array((0, 0, 8, 4), (0, 4, 8, 4))
      case 2 => Array((0, 0, 4, 8), (4, 0, 4, 8))
      case _ => Array((0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4))
    }

  /** P_Skip motion (8.4.1.1): zero when the left or above neighbour
    * block is unavailable or is a zero-motion refIdx-0 block, else the
    * 16x16 mvp. */
  private def skipMv(st: MbState, mbx: Int, mby: Int): (Int, Int) = {
    val a = blkMotion(st, mbx * 4 - 1, mby * 4)
    val b = blkMotion(st, mbx * 4, mby * 4 - 1)
    if (a == null || b == null) return (0, 0)
    if (a(0) == 0 && a(1) == 0 && a(2) == 0) return (0, 0)
    if (b(0) == 0 && b(1) == 0 && b(2) == 0) return (0, 0)
    mvp16x16(st, mbx, mby)
  }

  private[sources] def decodeSlice(rbsp: Array[Byte], sps: Sps, pps: Pps,
                                   idr: Boolean, nalRefIdc: Int,
                                   refs: List[MbState]): (H264Frame, MbState) = {
    val r = new Bits(rbsp)
    require(r.ue() == 0, "multi-slice frames unsupported")
    val sliceType = r.ue()
    require(sliceType == 0 || sliceType == 2 || sliceType == 5 || sliceType == 7,
      s"only I/P slices supported, got slice_type $sliceType")
    val isP = sliceType == 0 || sliceType == 5
    r.ue() // pps_id
    r.u(sps.log2MaxFrameNum)
    if (idr) r.ue() // idr_pic_id
    if (sps.pocType == 0) r.u(sps.log2MaxPocLsb)
    var nActive = pps.numRefL0Default
    if (isP) {
      require(refs.nonEmpty && refs.forall(f =>
          f.mbW == sps.mbW && f.mbH == sps.mbH),
        "P slice without a matching reference picture")
      if (r.u(1) == 1) // num_ref_idx_active_override_flag
        nActive = r.ue() + 1
      require(nActive >= 1 && nActive <= refs.size,
        s"num_ref_idx_l0_active $nActive exceeds the DPB (${refs.size})")
      require(r.u(1) == 0, "ref_pic_list_modification unsupported")
    }
    var wp: Wp = null
    if (isP && pps.weightedPred) {
      val lwdY = r.ue()
      val lwdC = r.ue()
      require(lwdY <= 7 && lwdC <= 7, "log2_weight_denom out of range")
      val per = Array.tabulate(nActive) { _ =>
        val e = Array(1 << lwdY, 0, 1 << lwdC, 0, 1 << lwdC, 0)
        if (r.u(1) == 1) { e(0) = r.se(); e(1) = r.se() }
        if (r.u(1) == 1) { e(2) = r.se(); e(3) = r.se()
                           e(4) = r.se(); e(5) = r.se() }
        e
      }
      wp = Wp(lwdY, lwdC, per)
    }
    if (nalRefIdc != 0) {
      if (idr) { r.u(1); r.u(1) }
      else require(r.u(1) == 0, "adaptive ref-pic marking unsupported")
    }
    var qp = pps.initQp + r.se()
    require(qp >= 0 && qp <= 51, s"slice QP $qp out of range")
    if (pps.deblockControl) {
      val idc = r.ue()
      require(idc == 1, "deblocking-enabled streams unsupported " +
        "(decode without the in-loop filter would be approximately wrong)")
    } else {
      throw new IllegalArgumentException(
        "deblocking-enabled streams unsupported (PPS carries no control flag)")
    }
    val st = new MbState(sps.mbW, sps.mbH)
    if (isP) {
      val total = sps.mbW * sps.mbH
      var count = 0
      while (count < total) {
        val run = r.ue()
        require(count + run <= total, "mb_skip_run overruns the picture")
        var k = 0
        while (k < run) {
          decodeSkipMb(st, refs.head, count % sps.mbW, count / sps.mbW, wp)
          count += 1; k += 1
        }
        if (count < total) {
          qp = decodePMb(r, st, refs, nActive, sps, pps,
            count % sps.mbW, count / sps.mbW, qp, wp)
          count += 1
        }
      }
    } else {
      var mby = 0
      while (mby < sps.mbH) {
        var mbx = 0
        while (mbx < sps.mbW) {
          qp = decodeMb(r, st, sps, pps, mbx, mby, qp, r.ue())
          mbx += 1
        }
        mby += 1
      }
    }
    (H264Frame(sps.width, sps.height,
      st.y.toBytes(2 * sps.cropL, 2 * sps.cropT, sps.width, sps.height),
      st.cb.toBytes(sps.cropL, sps.cropT, sps.width / 2, sps.height / 2),
      st.cr.toBytes(sps.cropL, sps.cropT, sps.width / 2, sps.height / 2)), st)
  }

  /** P_Skip: motion from [[skipMv]], zero residual, recon = MC against
    * refIdx 0 (weighted when the slice weights). */
  private def decodeSkipMb(st: MbState, ref: MbState, mbx: Int, mby: Int,
                           wp: Wp = null): Unit = {
    val (mvx, mvy) = skipMv(st, mbx, mby)
    val x0 = mbx * 16; val y0 = mby * 16
    val pred = wpY(wp, mcLuma(ref.y, x0, y0, mvx, mvy), 0)
    var i = 0
    while (i < 16) {
      var j = 0
      while (j < 16) { st.y.set(x0 + j, y0 + i, pred(i * 16 + j)); j += 1 }
      i += 1
    }
    for ((comp, plane, refp) <- Seq((0, st.cb, ref.cb), (1, st.cr, ref.cr))) {
      val pr = wpC(wp, mcChroma(refp, mbx * 8, mby * 8, mvx, mvy), 0, comp)
      var ci = 0
      while (ci < 8) {
        var cj = 0
        while (cj < 8) { plane.set(mbx * 8 + cj, mby * 8 + ci, pr(ci * 8 + cj)); cj += 1 }
        ci += 1
      }
    }
    for (by <- 0 until 4; bx <- 0 until 4)
      st.nnzY((mby * 4 + by) * st.bw4 + mbx * 4 + bx) = 0
    for (by <- 0 until 2; bx <- 0 until 2) {
      st.nnzCb((mby * 2 + by) * st.bw2 + mbx * 2 + bx) = 0
      st.nnzCr((mby * 2 + by) * st.bw2 + mbx * 2 + bx) = 0
    }
    st.mbIsI4(mby * st.mbW + mbx) = false
    recordBlocks(st, mbx * 4, mby * 4, 4, 4, 0, mvx, mvy)
  }

  /** Coded MB of a P slice: P_L0_16x16 (0), P_L0_L0_16x8 (1),
    * P_L0_L0_8x16 (2), P_8x8/P_8x8ref0 (3/4), or intra (>= 5). */
  private def decodePMb(r: Bits, st: MbState, refs: List[MbState],
                        nActive: Int, sps: Sps,
                        pps: Pps, mbx: Int, mby: Int, curQp: Int,
                        wp: Wp = null): Int = {
    val mbType = r.ue()
    if (mbType >= 5) // intra in a P slice
      return decodeMb(r, st, sps, pps, mbx, mby, curQp, mbType - 5)
    require(mbType <= 4, s"P mb_type $mbType unsupported")
    val x0 = mbx * 16; val y0 = mby * 16
    val mi = mby * st.mbW + mbx
    st.mbIsI4(mi) = false
    val pred = new Array[Int](256)
    val predCb = new Array[Int](64)
    val predCr = new Array[Int](64)
    if (mbType == 0) {
      val refI = if (nActive > 1) r.te(nActive - 1) else 0
      require(refI < refs.size, s"ref_idx $refI outside the DPB")
      val ref = refs(refI)
      val mvp = mvpPart(st, mbx * 4, mby * 4, 4, refI)
      val mvx = mvp._1 + r.se()
      val mvy = mvp._2 + r.se()
      recordBlocks(st, mbx * 4, mby * 4, 4, 4, refI, mvx, mvy)
      System.arraycopy(wpY(wp, mcLuma(ref.y, x0, y0, mvx, mvy), refI),
        0, pred, 0, 256)
      System.arraycopy(wpC(wp, mcChroma(ref.cb, mbx * 8, mby * 8, mvx, mvy),
        refI, 0), 0, predCb, 0, 64)
      System.arraycopy(wpC(wp, mcChroma(ref.cr, mbx * 8, mby * 8, mvx, mvy),
        refI, 1), 0, predCr, 0, 64)
    } else if (mbType >= 3) { // P_8x8 / P_8x8ref0 (ref_idx inferred 0)
      val subs = Array.fill(4)(r.ue())
      subs.foreach(t => require(t <= 3, s"bad sub_mb_type $t"))
      val eRefs =
        if (mbType == 3 && nActive > 1) Array.fill(4)(r.te(nActive - 1))
        else Array.fill(4)(0)
      eRefs.foreach(ri => require(ri < refs.size, s"ref_idx $ri outside DPB"))
      var e = 0
      while (e < 4) {
        val x8 = 8 * (e & 1); val y8 = 8 * (e >> 1)
        val refI = eRefs(e)
        val ref = refs(refI)
        for ((dx, dy, pw, ph) <- subParts(subs(e))) {
          val x0b = mbx * 4 + (x8 + dx) / 4
          val y0b = mby * 4 + (y8 + dy) / 4
          val mvp = mvpPart(st, x0b, y0b, pw / 4, refI)
          val mvx = mvp._1 + r.se()
          val mvy = mvp._2 + r.se()
          recordBlocks(st, x0b, y0b, pw / 4, ph / 4, refI, mvx, mvy)
          val pl = wpY(wp,
            mcLuma(ref.y, x0 + x8 + dx, y0 + y8 + dy, mvx, mvy, pw, ph), refI)
          var i = 0
          while (i < ph) {
            var j = 0
            while (j < pw) {
              pred((y8 + dy + i) * 16 + x8 + dx + j) = pl(i * pw + j)
              j += 1
            }
            i += 1
          }
          val pc = wpC(wp, mcChroma(ref.cb, (x0 + x8 + dx) / 2,
            (y0 + y8 + dy) / 2, mvx, mvy, pw / 2, ph / 2), refI, 0)
          val pr2 = wpC(wp, mcChroma(ref.cr, (x0 + x8 + dx) / 2,
            (y0 + y8 + dy) / 2, mvx, mvy, pw / 2, ph / 2), refI, 1)
          i = 0
          while (i < ph / 2) {
            var j = 0
            while (j < pw / 2) {
              val di = ((y8 + dy) / 2 + i) * 8 + (x8 + dx) / 2 + j
              predCb(di) = pc(i * (pw / 2) + j)
              predCr(di) = pr2(i * (pw / 2) + j)
              j += 1
            }
            i += 1
          }
        }
        e += 1
      }
    } else {
      val vertical = mbType == 2
      // mb_pred order (7.3.5.1): ALL ref_idx fields, then ALL mvds
      val partRefs =
        if (nActive > 1) Array.fill(2)(r.te(nActive - 1))
        else Array.fill(2)(0)
      partRefs.foreach(ri => require(ri < refs.size, s"ref_idx $ri outside DPB"))
      var part = 0
      while (part < 2) {
        val refI = partRefs(part)
        val ref = refs(refI)
        val (px0, py0, bw, bh, x0b, y0b, wb, hb, mvp) =
          if (vertical)
            (x0 + 8 * part, y0, 8, 16, mbx * 4 + 2 * part, mby * 4, 2, 4,
              mvp8x16(st, mbx, mby, part, refI))
          else
            (x0, y0 + 8 * part, 16, 8, mbx * 4, mby * 4 + 2 * part, 4, 2,
              mvp16x8(st, mbx, mby, part, refI))
        val mvx = mvp._1 + r.se()
        val mvy = mvp._2 + r.se()
        // record BEFORE the next partition predicts (it is a neighbour)
        recordBlocks(st, x0b, y0b, wb, hb, refI, mvx, mvy)
        val pl = wpY(wp, mcLuma(ref.y, px0, py0, mvx, mvy, bw, bh), refI)
        var i = 0
        while (i < bh) {
          var j = 0
          while (j < bw) {
            pred((py0 - y0 + i) * 16 + (px0 - x0 + j)) = pl(i * bw + j)
            j += 1
          }
          i += 1
        }
        val pc = wpC(wp, mcChroma(ref.cb, px0 / 2, py0 / 2, mvx, mvy,
          bw / 2, bh / 2), refI, 0)
        val pr2 = wpC(wp, mcChroma(ref.cr, px0 / 2, py0 / 2, mvx, mvy,
          bw / 2, bh / 2), refI, 1)
        i = 0
        while (i < bh / 2) {
          var j = 0
          while (j < bw / 2) {
            val di = ((py0 - y0) / 2 + i) * 8 + (px0 - x0) / 2 + j
            predCb(di) = pc(i * (bw / 2) + j)
            predCr(di) = pr2(i * (bw / 2) + j)
            j += 1
          }
          i += 1
        }
        part += 1
      }
    }
    val cbpCode = r.ue()
    require(cbpCode < 48, s"bad coded_block_pattern code $cbpCode")
    val cbp = CbpInter(cbpCode)
    val cbpLuma = cbp & 15
    val cbpChroma = cbp >> 4
    var newQp = curQp
    if (cbp != 0) {
      newQp = curQp + r.se()
      require(newQp >= 0 && newQp <= 51, s"MB QP $newQp out of range")
    }
    val qpc = chromaQp(newQp, pps.chromaQpOffset)
    val acs = Array.fill(16)(new Array[Int](16))
    var z = 0
    while (z < 16) {
      val rr = Zscan4(z)
      val fbx = mbx * 4 + (rr & 3)
      val fby = mby * 4 + (rr >> 2)
      if ((cbpLuma & (1 << (z / 4))) != 0) {
        val (lv, tc) = cavlcBlock(r, st.ncY(fbx, fby), 16)
        acs(rr) = lv
        st.nnzY(fby * st.bw4 + fbx) = tc
      } else st.nnzY(fby * st.bw4 + fbx) = 0
      z += 1
    }
    var by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 4) {
        val coef = new Array[Int](16)
        val lv = acs(by * 4 + bx)
        var k = 0
        while (k < 16) { coef(Zigzag(k)) = lv(k); k += 1 }
        k = 0
        while (k < 16) { coef(k) = dequantAc(coef(k), newQp, k); k += 1 }
        val r4 = inv4x4(coef)
        k = 0
        while (k < 16) {
          st.y.set(x0 + bx * 4 + (k & 3), y0 + by * 4 + (k >> 2),
            clip255(pred((by * 4 + (k >> 2)) * 16 + bx * 4 + (k & 3)) + r4(k)))
          k += 1
        }
        bx += 1
      }
      by += 1
    }
    decodeChroma(r, st, pps, mbx, mby, cmode = 0, cbpChroma, qpc,
      preds = Array(predCb, predCr))
    newQp
  }

  private def decodeMb(r: Bits, st: MbState, sps: Sps, pps: Pps,
                       mbx: Int, mby: Int, curQp: Int, mbType: Int): Int = {
    recordBlocks(st, mbx * 4, mby * 4, 4, 4, -1, 0, 0) // intra
    val x0 = mbx * 16
    val y0 = mby * 16
    if (mbType == 25) { // I_PCM
      r.byteAlign()
      var yy = 0
      while (yy < 16) {
        var xx = 0
        while (xx < 16) { st.y.set(x0 + xx, y0 + yy, r.u(8)); xx += 1 }
        yy += 1
      }
      for (plane <- Seq(st.cb, st.cr)) {
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) { plane.set(mbx * 8 + cx, mby * 8 + cy, r.u(8)); cx += 1 }
          cy += 1
        }
      }
      for (by <- 0 until 4; bx <- 0 until 4)
        st.nnzY((mby * 4 + by) * st.bw4 + mbx * 4 + bx) = 16
      for (by <- 0 until 2; bx <- 0 until 2) {
        st.nnzCb((mby * 2 + by) * st.bw2 + mbx * 2 + bx) = 16
        st.nnzCr((mby * 2 + by) * st.bw2 + mbx * 2 + bx) = 16
      }
      st.mbIsI4(mby * (st.bw4 / 4) + mbx) = false
      return curQp
    }
    require(mbType <= 24, s"non-intra mb_type $mbType in an I slice")

    if (mbType == 0) { // I_4x4
      st.mbIsI4(mby * (st.bw4 / 4) + mbx) = true
      val modes = new Array[Int](16)
      var z = 0
      while (z < 16) {
        val rr = Zscan4(z)
        val fbx = mbx * 4 + (rr & 3)
        val fby = mby * 4 + (rr >> 2)
        val pm = st.predI4Mode(st.bw4 / 4, fbx, fby)
        modes(rr) =
          if (r.bit() == 1) pm
          else {
            val rem = r.u(3)
            rem + (if (rem >= pm) 1 else 0)
          }
        st.i4Modes(fby * st.bw4 + fbx) = modes(rr)
        z += 1
      }
      val cmode = r.ue()
      require(cmode <= 3, s"bad intra_chroma_pred_mode $cmode")
      val cbpCode = r.ue()
      require(cbpCode < 48, s"bad coded_block_pattern code $cbpCode")
      val cbp = CbpIntra(cbpCode)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      var newQp = curQp
      if (cbp != 0) {
        newQp = curQp + r.se()
        require(newQp >= 0 && newQp <= 51, s"MB QP $newQp out of range")
      }
      val qpc = chromaQp(newQp, pps.chromaQpOffset)
      z = 0
      while (z < 16) {
        val rr = Zscan4(z)
        val fbx = mbx * 4 + (rr & 3)
        val fby = mby * 4 + (rr >> 2)
        val px = fbx * 4
        val py = fby * 4
        var lv = new Array[Int](16)
        if ((cbpLuma & (1 << (z / 4))) != 0) {
          val (l2, tc) = cavlcBlock(r, st.ncY(fbx, fby), 16)
          lv = l2
          st.nnzY(fby * st.bw4 + fbx) = tc
        } else st.nnzY(fby * st.bw4 + fbx) = 0
        val pr = pred4x4(modes(rr), st.y, px, py,
          aboveRightAvailable(fbx, fby, st.bw4 / 4))
        val coef = new Array[Int](16)
        var i = 0
        while (i < 16) { coef(Zigzag(i)) = lv(i); i += 1 }
        i = 0
        while (i < 16) { coef(i) = dequantAc(coef(i), newQp, i); i += 1 }
        val r4 = inv4x4(coef)
        i = 0
        while (i < 16) {
          st.y.set(px + (i & 3), py + (i >> 2), clip255(pr(i) + r4(i)))
          i += 1
        }
        z += 1
      }
      decodeChroma(r, st, pps, mbx, mby, cmode, cbpChroma, qpc)
      return newQp
    }

    // I_16x16
    st.mbIsI4(mby * (st.bw4 / 4) + mbx) = false
    val pmode = (mbType - 1) % 4
    val cbpChroma = ((mbType - 1) / 4) % 3
    val cbpLuma15 = (mbType - 1) >= 12
    val cmode = r.ue()
    require(cmode <= 3, s"bad intra_chroma_pred_mode $cmode")
    val newQp = curQp + r.se()
    require(newQp >= 0 && newQp <= 51, s"MB QP $newQp out of range")
    val qpc = chromaQp(newQp, pps.chromaQpOffset)
    val pred = pred16x16(pmode, st.y, x0, y0)
    val (dlev, _) = cavlcBlock(r, st.ncY(mbx * 4, mby * 4), 16)
    val dmat = new Array[Int](16)
    var i = 0
    while (i < 16) { dmat(Zigzag(i)) = dlev(i); i += 1 }
    val dcrec = hadamard4(dmat)
    val dcval = dcrec.map(dequantLumaDc(_, newQp))
    val acs = Array.fill(16)(new Array[Int](15))
    if (cbpLuma15) {
      var z = 0
      while (z < 16) {
        val rr = Zscan4(z)
        val fbx = mbx * 4 + (rr & 3)
        val fby = mby * 4 + (rr >> 2)
        val (lv, tc) = cavlcBlock(r, st.ncY(fbx, fby), 15)
        acs(rr) = lv
        st.nnzY(fby * st.bw4 + fbx) = tc
        z += 1
      }
    } else {
      var rr = 0
      while (rr < 16) {
        st.nnzY((mby * 4 + (rr >> 2)) * st.bw4 + mbx * 4 + (rr & 3)) = 0
        rr += 1
      }
    }
    var by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 4) {
        val coef = new Array[Int](16)
        val lv = acs(by * 4 + bx)
        var k = 0
        while (k < 15) { coef(Zigzag(k + 1)) = lv(k); k += 1 }
        k = 1
        while (k < 16) { coef(k) = dequantAc(coef(k), newQp, k); k += 1 }
        coef(0) = dcval(by * 4 + bx)
        val r4 = inv4x4(coef)
        k = 0
        while (k < 16) {
          st.y.set(x0 + bx * 4 + (k & 3), y0 + by * 4 + (k >> 2),
            clip255(pred((by * 4 + (k >> 2)) * 16 + bx * 4 + (k & 3)) + r4(k)))
          k += 1
        }
        bx += 1
      }
      by += 1
    }
    decodeChroma(r, st, pps, mbx, mby, cmode, cbpChroma, qpc)
    newQp
  }

  /** Chroma residual decode + recon; `preds` (Cb, Cr 8x8 row-major)
    * overrides intra prediction for inter MBs. */
  private def decodeChroma(r: Bits, st: MbState, pps: Pps, mbx: Int, mby: Int,
                           cmode: Int, cbpChroma: Int, qpc: Int,
                           preds: Array[Array[Int]] = null): Unit = {
    val dcl = Array.fill(2)(new Array[Int](4))
    if (cbpChroma >= 1) {
      var comp = 0
      while (comp < 2) {
        dcl(comp) = cavlcBlock(r, -1, 4)._1
        comp += 1
      }
    }
    val acl = Array.fill(2, 4)(new Array[Int](15))
    if (cbpChroma == 2) {
      for ((comp, m) <- Seq((0, st.nnzCb), (1, st.nnzCr))) {
        var sy = 0
        while (sy < 2) {
          var sx = 0
          while (sx < 2) {
            val cx = mbx * 2 + sx
            val cy = mby * 2 + sy
            val (lv, tc) = cavlcBlock(r, st.ncC(m, cx, cy), 15)
            acl(comp)(sy * 2 + sx) = lv
            m(cy * st.bw2 + cx) = tc
            sx += 1
          }
          sy += 1
        }
      }
    } else {
      for (m <- Seq(st.nnzCb, st.nnzCr); sy <- 0 until 2; sx <- 0 until 2)
        m((mby * 2 + sy) * st.bw2 + mbx * 2 + sx) = 0
    }
    for ((comp, plane) <- Seq((0, st.cb), (1, st.cr))) {
      val x0 = mbx * 8
      val y0 = mby * 8
      val pr = if (preds != null) preds(comp)
               else predChroma(cmode, plane, x0, y0)
      val d = dcl(comp)
      // 2x2 Hadamard
      val dcr = Array(d(0) + d(1) + d(2) + d(3), d(0) - d(1) + d(2) - d(3),
        d(0) + d(1) - d(2) - d(3), d(0) - d(1) - d(2) + d(3))
      var sy = 0
      while (sy < 2) {
        var sx = 0
        while (sx < 2) {
          val coef = new Array[Int](16)
          if (cbpChroma == 2) {
            val lv = acl(comp)(sy * 2 + sx)
            var k = 0
            while (k < 15) { coef(Zigzag(k + 1)) = lv(k); k += 1 }
            k = 1
            while (k < 16) { coef(k) = dequantAc(coef(k), qpc, k); k += 1 }
          }
          if (cbpChroma >= 1)
            coef(0) = dequantChromaDc(dcr(sy * 2 + sx), qpc)
          val r4 = inv4x4(coef)
          var k = 0
          while (k < 16) {
            plane.set(x0 + sx * 4 + (k & 3), y0 + sy * 4 + (k >> 2),
              clip255(pr((sy * 4 + (k >> 2)) * 8 + sx * 4 + (k & 3)) + r4(k)))
            k += 1
          }
          sx += 1
        }
        sy += 1
      }
    }
  }
}
