#!/usr/bin/env python3
"""H.264 baseline I-frame fixture generator (pure stdlib + h264codec.py).

Writes to src/main/resources/graft/h264/:
  - <name>.264      Annex B elementary stream
  - <name>.yuv      the ENCODER'S RECONSTRUCTION (I420 planar, frames
                    concatenated) — the bit-exact oracle any conformant
                    decoder must reproduce (the encoder reconstructs each
                    macroblock exactly as a decoder must: prediction from
                    reconstructed neighbours, quantize -> dequantize ->
                    inverse transform)
and src/main/resources/graft/tiny_h264.mp4: an ISO-BMFF container whose
video track is 'avc1' with an avcC decoder configuration and
length-prefixed sample payloads (+ tiny_h264.yuv oracle next to the .264s).

The python codec is an INDEPENDENT implementation from the Scala decoder
under test (graft.sources.H264Decode): they share only the CAVLC table
constants (scripts/h264_tables.py, structurally validated and generated
into H264Tables.scala). Every stream is round-tripped through the python
Decoder before it is written, so a fixture that any conformant decoder
would reject never lands in resources.

Regenerating H264Tables.scala: see the generator block in the git history
of this file or re-run the table emitter in scripts/h264_tables.py docs.
"""
import os
import random
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import h264codec as H  # noqa: E402
import h264_tables  # noqa: E402

h264_tables.validate_all()

OUT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                   "src/main/resources/graft/h264"))
RES = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                   "src/main/resources/graft"))


def make_planes(w, h, seed, noise=40):
    rng = random.Random(seed)
    y = [[H.clip255((x * 3 + yy * 2 + rng.randint(-noise, noise)) % 256)
          for x in range(w)] for yy in range(h)]
    cb = [[H.clip255((128 + x - yy + rng.randint(-noise // 2, noise // 2)) % 256)
           for x in range(w // 2)] for yy in range(h // 2)]
    cr = [[H.clip255((128 - x + yy + rng.randint(-noise // 2, noise // 2)) % 256)
           for x in range(w // 2)] for yy in range(h // 2)]
    return y, cb, cr


def pad(plane, W, Hh):
    rows = [row + [row[-1]] * (W - len(row)) for row in plane]
    while len(rows) < Hh:
        rows.append(rows[-1][:])
    return rows


def mixed_policy(mbx, mby, f):
    i = mbx + mby * 7 + f
    if i % 7 == 3:
        return ("PCM",)
    if i % 2 == 0:
        return ("I16", [i % 4, 2], [(i // 2) % 4, 0], 24 + (i % 5))
    return ("I4", (lambda z: [(z + i) % 9, 2]), [(i // 3) % 4, 0],
            22 + (i % 7))


def yuv_bytes(y, cb, cr):
    out = bytearray()
    for plane in (y, cb, cr):
        for row in plane:
            out += bytes(row)
    return bytes(out)


def crop(st, w, h):
    return ([row[:w] for row in st.y[:h]],
            [row[:w // 2] for row in st.cb[:h // 2]],
            [row[:w // 2] for row in st.cr[:h // 2]])


def build_stream(name, w, h, qp, frames, policy, seed, noise=40, cqo=0):
    mbW, mbH = (w + 15) // 16, (h + 15) // 16
    enc = H.Encoder(w, h, qp_init=qp, chroma_qp_offset=cqo)
    nals = [enc.sps(), enc.pps()]
    oracle = bytearray()
    recons = []
    for f in range(frames):
        y, cb, cr = make_planes(w, h, seed * 100 + f, noise)
        nal, st = enc.encode_frame(pad(y, mbW * 16, mbH * 16),
                                   pad(cb, mbW * 8, mbH * 8),
                                   pad(cr, mbW * 8, mbH * 8),
                                   policy, frame_idx=f, qp=qp + f)
        nals.append(nal)
        rec = crop(st, w, h)
        recons.append(rec)
        oracle += yuv_bytes(*rec)
    stream = H.annexb(nals)
    # round-trip through the INDEPENDENT python decoder before writing
    dec = H.Decoder()
    got = dec.feed_annexb(stream)
    assert len(got) == frames, (name, len(got))
    for f in range(frames):
        assert got[f] == recons[f], f"{name}: frame {f} decode != recon"
    with open(os.path.join(OUT, f"{name}.264"), "wb") as fh:
        fh.write(stream)
    with open(os.path.join(OUT, f"{name}.yuv"), "wb") as fh:
        fh.write(bytes(oracle))
    print(f"{name}: {w}x{h} x{frames} qp{qp} -> {len(stream)} B "
          f"(oracle {len(oracle)} B)")
    return nals, recons


def mc_source(ref_st, w, h, mv_of_mb, bump):
    """Build a P source frame as the EXACT motion-compensated prediction
    of the reference reconstruction plus per-MB residual bumps — the knob
    that steers quantized CBP values (bump=0 -> cbp 0 even with mvd!=0)."""
    mbW, mbH = (w + 15) // 16, (h + 15) // 16
    W, H = mbW * 16, mbH * 16
    y = [[0] * W for _ in range(H)]
    cb = [[0] * (W // 2) for _ in range(H // 2)]
    cr = [[0] * (W // 2) for _ in range(H // 2)]
    for mby in range(mbH):
        for mbx in range(mbW):
            mv = mv_of_mb(mbx, mby)
            py = H264.mc_luma(ref_st.y, W, H, mbx * 16, mby * 16, *mv)
            pcb = H264.mc_chroma(ref_st.cb, W // 2, H // 2, mbx * 8,
                                 mby * 8, *mv)
            pcr = H264.mc_chroma(ref_st.cr, W // 2, H // 2, mbx * 8,
                                 mby * 8, *mv)
            by, bcb, bcr = bump(mbx, mby)
            for i in range(16):
                for j in range(16):
                    y[mby * 16 + i][mbx * 16 + j] = H264.clip255(
                        py[i][j] + by(i, j))
            for i in range(8):
                for j in range(8):
                    cb[mby * 8 + i][mbx * 8 + j] = H264.clip255(
                        pcb[i][j] + bcb(i, j))
                    cr[mby * 8 + i][mbx * 8 + j] = H264.clip255(
                        pcr[i][j] + bcr(i, j))
    return y, cb, cr


def build_p_stream(name, w, h, qp, ipolicy, p_frames, seed, noise=40,
                   cqo=0):
    """IDR + P frames. p_frames is a list of (policy, source) pairs where
    source(ref_st, f) -> (y, cb, cr) full-MB-padded planes."""
    mbW, mbH = (w + 15) // 16, (h + 15) // 16
    enc = H.Encoder(w, h, qp_init=qp, chroma_qp_offset=cqo,
                    num_ref_frames=1)
    nals = [enc.sps(), enc.pps()]
    oracle = bytearray()
    recons = []
    y, cb, cr = make_planes(w, h, seed * 100, noise)
    nal, st = enc.encode_frame(pad(y, mbW * 16, mbH * 16),
                               pad(cb, mbW * 8, mbH * 8),
                               pad(cr, mbW * 8, mbH * 8),
                               ipolicy, frame_idx=0, qp=qp)
    nals.append(nal)
    recons.append(crop(st, w, h))
    oracle += yuv_bytes(*recons[-1])
    ref = st
    for f, (policy, source) in enumerate(p_frames, start=1):
        ys, cbs, crs = source(ref, f)
        nal, st = enc.encode_frame_p(pad(ys, mbW * 16, mbH * 16),
                                     pad(cbs, mbW * 8, mbH * 8),
                                     pad(crs, mbW * 8, mbH * 8),
                                     ref, policy, frame_idx=f)
        nals.append(nal)
        recons.append(crop(st, w, h))
        oracle += yuv_bytes(*recons[-1])
        ref = st
    stream = H.annexb(nals)
    dec = H.Decoder()
    got = dec.feed_annexb(stream)
    assert len(got) == len(recons), (name, len(got))
    for f in range(len(recons)):
        assert got[f] == recons[f], f"{name}: frame {f} decode != recon"
    with open(os.path.join(OUT, f"{name}.264"), "wb") as fh:
        fh.write(stream)
    with open(os.path.join(OUT, f"{name}.yuv"), "wb") as fh:
        fh.write(bytes(oracle))
    print(f"{name}: {w}x{h} IDR+{len(p_frames)}P qp{qp} -> "
          f"{len(stream)} B (oracle {len(oracle)} B)")
    return nals, recons, enc


H264 = H  # alias for mc_source


# ------------------------------------------------------------------- MP4

def box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(typ, version, flags, payload):
    return box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def avcc_box(sps_nal, pps_nal):
    # AVCDecoderConfigurationRecord (ISO 14496-15): version, profile,
    # compat, level, lengthSizeMinusOne=3, 1 SPS, 1 PPS
    cfg = bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFF,
                 0xE1]) + struct.pack(">H", len(sps_nal)) + sps_nal + \
        bytes([1]) + struct.pack(">H", len(pps_nal)) + pps_nal
    return box(b"avcC", cfg)


def mux_avc1(w, h, slice_nals, sps_nal, pps_nal, timescale=1000, delta=100,
             sync=None):
    frames = [struct.pack(">I", len(n)) + n for n in slice_nals]
    nf = len(frames)
    dur = nf * delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2avc1mp41")

    def build_moov(chunk_offset):
        mvhd = full(b"mvhd", 0, 0, struct.pack(
            ">IIIII", 0, 0, timescale, dur, 0x00010000) +
            struct.pack(">HHII", 0x0100, 0, 0, 0) +
            struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) +
            struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2))
        tkhd = full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, dur) +
                    struct.pack(">IIHHHH", 0, 0, 0, 0, 0, 0) +
                    struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                0x40000000) +
                    struct.pack(">II", w << 16, h << 16))
        mdhd = full(b"mdhd", 0, 0,
                    struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))
        hdlr = full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" +
                    struct.pack(">III", 0, 0, 0) + b"AVC Video Handler\x00")
        vmhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dinf = box(b"dinf", full(b"dref", 0, 0, struct.pack(">I", 1) +
                                 full(b"url ", 0, 1, b"")))
        entry = (struct.pack(">6xH", 1) +
                 struct.pack(">HH", 0, 0) +
                 struct.pack(">3I", 0, 0, 0) +
                 struct.pack(">HH", w, h) +
                 struct.pack(">II", 0x00480000, 0x00480000) +
                 struct.pack(">I", 0) +
                 struct.pack(">H", 1) +
                 b"\x04h264" + b"\x00" * 27 +
                 struct.pack(">Hh", 24, -1)) + avcc_box(sps_nal, pps_nal)
        stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + box(b"avc1", entry))
        stts = full(b"stts", 0, 0, struct.pack(">III", 1, nf, delta))
        sync_list = sync if sync is not None else list(range(1, nf + 1))
        stss = full(b"stss", 0, 0, struct.pack(">I", len(sync_list)) +
                    b"".join(struct.pack(">I", i) for i in sync_list))
        stsc = full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, nf, 1))
        stsz = full(b"stsz", 0, 0, struct.pack(">II", 0, nf) +
                    b"".join(struct.pack(">I", len(f)) for f in frames))
        stco = full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
        stbl = box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
        minf = box(b"minf", vmhd + dinf + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        return box(b"moov", mvhd + trak)

    moov_len = len(build_moov(0))
    chunk_offset = len(ftyp) + moov_len + 8
    moov = build_moov(chunk_offset)
    assert len(moov) == moov_len
    return ftyp + moov + box(b"mdat", b"".join(frames))


def main():
    os.makedirs(OUT, exist_ok=True)
    # 1. mixed MB types + per-MB QP deltas across two frames
    build_stream("mix_48x32", 48, 32, 28, 2, mixed_policy, seed=1)
    # 2. frame cropping (44x28 inside 48x32 MBs)
    build_stream("crop_44x28", 44, 28, 24, 1,
                 lambda mx, my, f: ("I4", (lambda z: [(z + mx + my) % 9, 2]),
                                    [0], 24), seed=2)
    # 3. dense low-QP residuals: TotalCoeff up to 16, high nC classes
    build_stream("dense_qp3_32x32", 32, 32, 3, 1,
                 lambda mx, my, f: ("I4", (lambda z: [2]), [0],
                                    2 + ((mx + my) % 6)),
                 seed=3, noise=120)
    # 4. chroma_qp_index_offset + all-I16 frame
    build_stream("cqo2_64x48", 64, 48, 30, 1,
                 lambda mx, my, f: ("I16", [(mx + my) % 4, 2],
                                    [(mx * my) % 4, 0], 26 + ((mx + my) % 8)),
                 seed=4, cqo=2)
    # 5. QCIF (176x144, 99 MBs/frame): the classic video dimension, two
    #    frames rotating through every policy — breadth at a real size
    build_stream("qcif_176x144", 176, 144, 27, 2, mixed_policy, seed=5)
    # 6. non-VCL NAL units interleaved (SEI before each slice, AUD at the
    #    start): decoders must skip them — real encoders emit both
    name = "sei_48x32"
    enc6 = H.Encoder(48, 32, qp_init=26)
    y, cb, cr = make_planes(48, 32, 600)
    nal6, st6 = enc6.encode_frame(y, cb, cr, mixed_policy, frame_idx=0)
    sei = H.rbsp_to_nal(bytes([5, 4, 0xDE, 0xAD, 0xBE, 0xEF, 0x80]), 0, 6)
    aud = H.rbsp_to_nal(bytes([0x10]), 0, 9)
    stream6 = H.annexb([aud, enc6.sps(), enc6.pps(), sei, nal6])
    got6 = H.Decoder().feed_annexb(stream6)
    rec6 = crop(st6, 48, 32)
    assert len(got6) == 1 and got6[0] == rec6, "SEI/AUD skipping broke decode"
    with open(os.path.join(OUT, f"{name}.264"), "wb") as fh:
        fh.write(stream6)
    with open(os.path.join(OUT, f"{name}.yuv"), "wb") as fh:
        fh.write(yuv_bytes(*rec6))
    print(f"{name}: SEI+AUD interleaved -> {len(stream6)} B")
    # 7. the avc1 MP4: 3 frames of the mixed policy at 48x32
    w, h = 48, 32
    enc = H.Encoder(w, h, qp_init=26)
    slice_nals = []
    oracle = bytearray()
    for f in range(3):
        y, cb, cr = make_planes(w, h, 900 + f)
        nal, st = enc.encode_frame(y, cb, cr, mixed_policy, frame_idx=f,
                                   qp=26 + f)
        slice_nals.append(nal)
        oracle += yuv_bytes(*crop(st, w, h))
    # python round trip (Annex B view of the same NALs)
    dec = H.Decoder()
    got = dec.feed_annexb(H.annexb([enc.sps(), enc.pps()] + slice_nals))
    assert len(got) == 3
    mp4 = mux_avc1(w, h, slice_nals, enc.sps(), enc.pps())
    with open(os.path.join(RES, "tiny_h264.mp4"), "wb") as fh:
        fh.write(mp4)
    with open(os.path.join(OUT, "tiny_h264.yuv"), "wb") as fh:
        fh.write(bytes(oracle))
    print(f"tiny_h264.mp4: {w}x{h} x3 -> {len(mp4)} B "
          f"(oracle {len(oracle)} B)")

    # ---------------- P-frame fixtures (single-ref 16x16 regime) --------
    nobump = lambda mbx, mby: ((lambda r, c: 0),) * 3  # noqa: E731

    # 8. mixed P stream: inter with dense residuals + quarter-pel MVs in
    #    every phase, P_Skip, intra-in-P (I4/I16), per-MB QP deltas
    def p_mixed(mbx, mby, f):
        i = mbx + mby * 5 + f * 3
        if i % 5 == 0:
            return ("SKIP",)
        if i % 7 == 2:
            return ("I4", (lambda z: [(z + i) % 9, 2]), [i % 4, 0],
                    24 + (i % 5))
        if i % 7 == 5:
            return ("I16", [i % 4, 2], [i % 4, 0], 26)
        return ("P16", (((i * 7) % 29) - 14, ((i * 11) % 23) - 11),
                24 + (i % 6))

    def fresh64(ref, f):
        return make_planes(64, 48, 4000 + f)

    build_p_stream("pmix_64x48", 64, 48, 26, mixed_policy,
                   [(p_mixed, fresh64)] * 3, seed=40)

    # 9. CBP-diverse P frames: source = EXACT MC of the reference plus
    #    targeted bumps -> inter cbp 0 (with nonzero MVD), each single
    #    luma 8x8, chroma-DC-only, chroma-AC, and mixed patterns
    def mv_of(f):
        def g(mbx, mby):
            i = mbx + mby * 4 + f
            return (((i * 5) % 13) - 6, ((i * 3) % 9) - 4)
        return g

    def bump_of(f):
        z = lambda r, c: 0  # noqa: E731

        def lum8(e):
            return lambda r, c: 20 if (r // 8) * 2 + (c // 8) == e else 0

        def g(mbx, mby):
            i = (mbx + mby * 4 + f * 3) % 8
            if i == 0:
                return z, z, z                                  # cbp 0
            if i <= 4:
                return lum8(i - 1), z, z                        # cbp 1/2/4/8
            if i == 5:
                return z, (lambda r, c: 12), z                  # cbp 16
            if i == 6:
                return z, (lambda r, c: 10 if (r + c) % 2 else -10), z  # 32
            return ((lambda r, c: 15 if (r + c) % 3 == 0 else 0),
                    (lambda r, c: 8), (lambda r, c: -8))        # mixed
        return g

    def cbp_src(f):
        return lambda ref, _f: mc_source(ref, 64, 48, mv_of(f), bump_of(f))

    def cbp_pol(f):
        mv = mv_of(f)
        return lambda mbx, mby, _f: ("P16", mv(mbx, mby), None)

    build_p_stream("pcbp_64x48", 64, 48, 26,
                   lambda mx, my, f: ("I16", [(mx + my) % 4, 2], [0], 26),
                   [(cbp_pol(f), cbp_src(f)) for f in (1, 2)], seed=41)

    # 10. global pan: one P frame per quarter-pel phase (all 16 (fx,fy)
    #     combos, negative x / positive y integer parts, edge clamping);
    #     source = exact MC so recon IS the interpolator output
    pan_frames = []
    for k in range(16):
        mv = ((k % 4) - 8, (k // 4) + 4)
        pan_frames.append((
            (lambda m: lambda mbx, mby, _f: ("P16", m, None))(mv),
            (lambda m: lambda ref, _f: mc_source(
                ref, 48, 32, lambda a, b: m, nobump))(mv)))
    build_p_stream("pan_48x32", 48, 32, 24, mixed_policy, pan_frames,
                   seed=42)

    # 11. skip-heavy: an ALL-skip frame (trailing mb_skip_run), a sparse
    #     frame (runs around coded MBs), and a frame whose skip MBs take
    #     the NONZERO median-mvp motion (neighbours all moving (6,4))
    def skip_all(mbx, mby, f):
        return ("SKIP",)

    def skip_sparse(mbx, mby, f):
        if (mbx, mby) == (1, 0):
            return ("P16", (9, -5), 22)
        if (mbx, mby) == (0, 1):
            return ("I16", [2], [0], 24)
        return ("SKIP",)

    def skip_ctx(mbx, mby, f):
        if mby == 0 or (mbx, mby) == (0, 1):
            return ("P16", (6, 4), None)
        return ("SKIP",)

    def fresh48(ref, f):
        return make_planes(48, 32, 4300 + f)

    build_p_stream("pskip_48x32", 48, 32, 24, mixed_policy,
                   [(skip_all, fresh48), (skip_sparse, fresh48),
                    (skip_ctx, fresh48)], seed=43)

    # 11b. partitioned P stream: 16x8/8x16 partitions with DISTINCT
    #      per-partition motion (partition 1's MVP sees partition 0 as a
    #      neighbour), the directional MVP shortcuts (top->B, bottom->A,
    #      left->A, right->C) AND their median fallbacks (frame 1 puts an
    #      intra row ABOVE a 16x8 row, so the top partitions' designated
    #      neighbour B is intra -> fallback), mixed with skip/P16/intra
    def p_part(mbx, mby, f):
        i = mbx + mby * 5 + f * 3
        mv0 = (((i * 7) % 29) - 14, ((i * 11) % 23) - 11)
        mv1 = (((i * 5) % 27) - 13, ((i * 13) % 19) - 9)
        if f == 1 and mby == 0:
            return ("I16", [i % 4, 2], [0], 26)
        if i % 6 == 0:
            return ("SKIP",)
        if i % 3 == 0:
            return ("P16x8", (mv0, mv1), 24 + (i % 5))
        if i % 3 == 1:
            return ("P8x16", (mv0, mv1), 25)
        if i % 11 == 4:
            return ("I4", (lambda z: [(z + i) % 9, 2]), [i % 4, 0], 24)
        return ("P16", mv0, 24 + (i % 6))

    def fresh64b(ref, f):
        return make_planes(64, 48, 4600 + f)

    _, _, encpart = build_p_stream("ppart_64x48", 64, 48, 26, mixed_policy,
                                   [(p_part, fresh64b)] * 3, seed=46)
    got_types = sorted(x[1] for x in encpart.coverage if x[0] == "mbtype")
    assert "P16x8" in got_types and "P8x16" in got_types, got_types

    # 11c. P_8x8 sub-partitioned stream: every sub_mb_type (8x8/8x4/4x8/
    #      4x4), each sub-partition with its own motion — down to 4x4 MC
    #      with 2x2 chroma blocks — mixed with skip/P16/intra
    def mk_sub(i, e):
        st_ = (i + e) % 4
        n = [1, 2, 2, 4][st_]
        mvs = [((((i * 7 + e * 3 + k * 5) % 25) - 12),
                (((i * 11 + e + k * 7) % 21) - 10)) for k in range(n)]
        return (st_, mvs)

    def p_8x8(mbx, mby, f):
        i = mbx + mby * 5 + f * 3
        if i % 7 == 0:
            return ("SKIP",)
        if i % 7 == 3:
            return ("P16", (((i * 7) % 29) - 14, ((i * 11) % 23) - 11), 25)
        if i % 13 == 5:
            return ("I16", [i % 4, 2], [0], 26)
        return ("P8x8", [mk_sub(i, e) for e in range(4)], 24 + (i % 5))

    def fresh64c(ref, f):
        return make_planes(64, 48, 4700 + f)

    _, _, enc8 = build_p_stream("p8x8_64x48", 64, 48, 26, mixed_policy,
                                [(p_8x8, fresh64c)] * 3, seed=47)
    assert {("sub", t) for t in range(4)} <= enc8.coverage, "sub coverage"

    # 11d. multi-reference stream: a 2-picture DPB, ref_idx_l0 te(v) per
    #      partition (all shapes), refIdx-aware MVP (a neighbour that
    #      references the OTHER picture is not a "match" for the
    #      single-matching-neighbour rule or the directional shortcuts)
    wm, hm = 64, 48
    encm = H.Encoder(wm, hm, qp_init=26, num_ref_frames=2)

    def mref_pol(mbx, mby, f):
        i = mbx + mby * 5 + f * 3
        if i % 9 == 0:
            return ("SKIP",)
        if i % 9 == 1:
            return ("I16", [i % 4, 2], [0], 26)
        mv0 = (((i * 7) % 29) - 14, ((i * 11) % 23) - 11)
        mv1 = (((i * 5) % 27) - 13, ((i * 13) % 19) - 9)
        if i % 4 == 0:
            return ("P16", mv0, 25, i % 2)
        if i % 4 == 1:
            return ("P16x8", (mv0, mv1), 25, (i % 2, (i + 1) % 2))
        if i % 4 == 2:
            return ("P8x16", (mv0, mv1), 24, ((i >> 1) % 2, i % 2))
        return ("P8x8", [mk_sub(i, e) for e in range(4)], 25,
                tuple((i + e) % 2 for e in range(4)))

    nals_m = [encm.sps(), encm.pps()]
    y, cb, cr = make_planes(wm, hm, 4800)
    nal, st = encm.encode_frame(y, cb, cr, mixed_policy, frame_idx=0)
    nals_m.append(nal)
    recons_m = [crop(st, wm, hm)]
    dpb = [st]
    for f in range(1, 4):
        ys, cbs, crs = make_planes(wm, hm, 4800 + f)
        n_act = 1 if f == 1 else 2
        nal, st = encm.encode_frame_p(ys, cbs, crs, dpb[:n_act],
                                      mref_pol if f > 1 else p_mixed,
                                      frame_idx=f, qp=25, n_active=n_act)
        nals_m.append(nal)
        recons_m.append(crop(st, wm, hm))
        dpb = ([st] + dpb)[:2]
    stream_m = H.annexb(nals_m)
    got_m = H.Decoder().feed_annexb(stream_m)
    assert len(got_m) == 4 and all(got_m[f] == recons_m[f]
                                   for f in range(4)), "pmref"
    assert ("ref", 1) in encm.coverage, "ref 1 never used"
    with open(os.path.join(OUT, "pmref_64x48.264"), "wb") as fh:
        fh.write(stream_m)
    with open(os.path.join(OUT, "pmref_64x48.yuv"), "wb") as fh:
        oo = bytearray()
        for rec in recons_m:
            oo += yuv_bytes(*rec)
        fh.write(bytes(oo))
    print(f"pmref_64x48: {wm}x{hm} IDR+3P 2-ref -> {len(stream_m)} B")

    # 11e. explicit weighted prediction (the fade story): PPS
    #      weighted_pred_flag = 1, per-slice pred_weight_table — ref 0
    #      dimmed luma (w=3, o=10 at lwd 2) with chroma offsets, ref 1 at
    #      defaults; applied across every partition shape and P_Skip
    wm, hm = 64, 48
    encw = H.Encoder(wm, hm, qp_init=26, num_ref_frames=2,
                     weighted_pred=True)
    wp2 = (2, 3, [(3, 10, 8, -4, 8, 4), None])
    nals_w = [encw.sps(), encw.pps()]
    y, cb, cr = make_planes(wm, hm, 4900)
    nal, st = encw.encode_frame(y, cb, cr, mixed_policy, frame_idx=0)
    nals_w.append(nal)
    recons_w = [crop(st, wm, hm)]
    dpb = [st]
    for f in range(1, 4):
        ys, cbs, crs = make_planes(wm, hm, 4900 + f)
        n_act = 1 if f == 1 else 2
        wts = (2, 3, [(3, 10, 8, -4, 8, 4)]) if n_act == 1 else wp2
        nal, st = encw.encode_frame_p(ys, cbs, crs, dpb[:n_act],
                                      mref_pol if f > 1 else p_mixed,
                                      frame_idx=f, qp=25, n_active=n_act,
                                      weights=wts)
        nals_w.append(nal)
        recons_w.append(crop(st, wm, hm))
        dpb = ([st] + dpb)[:2]
    stream_w = H.annexb(nals_w)
    got_w = H.Decoder().feed_annexb(stream_w)
    assert len(got_w) == 4 and all(got_w[f] == recons_w[f]
                                   for f in range(4)), "pwp"
    with open(os.path.join(OUT, "pwp_64x48.264"), "wb") as fh:
        fh.write(stream_w)
    with open(os.path.join(OUT, "pwp_64x48.yuv"), "wb") as fh:
        oo = bytearray()
        for rec in recons_w:
            oo += yuv_bytes(*rec)
        fh.write(bytes(oo))
    print(f"pwp_64x48: {wm}x{hm} IDR+3P weighted-pred -> {len(stream_w)} B")

    # 12. the P-frame avc1 MP4 (q166): IDR + 3 P, stss marks only frame 1
    w, h = 48, 32
    encp = H.Encoder(w, h, qp_init=26, num_ref_frames=1)
    nals_p = []
    oracle_p = bytearray()
    y, cb, cr = make_planes(w, h, 950)
    nal, st = encp.encode_frame(y, cb, cr, mixed_policy, frame_idx=0)
    nals_p.append(nal)
    recons_p = [crop(st, w, h)]
    oracle_p += yuv_bytes(*recons_p[-1])
    ref = st
    for f in range(1, 4):
        ys, cbs, crs = make_planes(w, h, 950 + f)
        nal, st = encp.encode_frame_p(ys, cbs, crs, ref, p_mixed,
                                      frame_idx=f, qp=25)
        nals_p.append(nal)
        recons_p.append(crop(st, w, h))
        oracle_p += yuv_bytes(*recons_p[-1])
        ref = st
    got = H.Decoder().feed_annexb(
        H.annexb([encp.sps(), encp.pps()] + nals_p))
    assert len(got) == 4 and all(got[f] == recons_p[f] for f in range(4))
    mp4p = mux_avc1(w, h, nals_p, encp.sps(), encp.pps(), sync=[1])
    with open(os.path.join(RES, "tiny_h264p.mp4"), "wb") as fh:
        fh.write(mp4p)
    with open(os.path.join(OUT, "tiny_h264p.yuv"), "wb") as fh:
        fh.write(bytes(oracle_p))
    print(f"tiny_h264p.mp4: {w}x{h} IDR+3P -> {len(mp4p)} B")
    print("-- q166 oracle VALUES (frame_index, sync, h, w, sum_y) --")
    for f, rec in enumerate(recons_p):
        sum_y = sum(sum(row) for row in rec[0])
        sync_f = "TRUE" if f == 0 else "FALSE"
        print(f"  (CAST({f} AS BIGINT), {sync_f}, CAST({h} AS BIGINT), "
              f"CAST({w} AS BIGINT), CAST({sum_y} AS BIGINT)),")
    cov = sorted(str(x) for x in encp.coverage if x[0] != "ct")
    print("p-coverage:", cov)

    # 13. media-corpus clips (q167): 8 DISTINCT IDR+3P avc1 MP4s for the
    #     distributed binaryFile->decode scale path, together exercising
    #     the FULL decoder surface: clips 0-2 mixed 16x16 P, clips 3-4
    #     16x8/8x16 + P_8x8 partitions, clips 5-6 a 2-picture DPB with
    #     mixed ref indices, clip 7 explicit weighted prediction.
    #     Per-frame luma sums printed as the oracle literals.
    corpus_dir = os.path.join(OUT, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    keyframe_recons = []
    print("-- q167 video oracle VALUES (clip, frame, sum_y) --")
    for clip in range(8):
        w, h = 48, 32
        wp_on = clip == 7
        n_ref = 2 if clip >= 5 else 1
        encc = H.Encoder(w, h, qp_init=24 + clip % 4, num_ref_frames=n_ref,
                         weighted_pred=wp_on)
        if clip <= 2:
            pol = p_mixed
        elif clip == 3:
            pol = p_part
        elif clip == 4:
            pol = p_8x8
        else:
            pol = mref_pol
        nals_c = []
        y, cb, cr = make_planes(w, h, 7000 + clip * 13)
        nal, st = encc.encode_frame(y, cb, cr, mixed_policy, frame_idx=0)
        nals_c.append(nal)
        recons_c = [crop(st, w, h)]
        dpb = [st]
        for f in range(1, 4):
            ys, cbs, crs = make_planes(w, h, 7000 + clip * 13 + f)
            n_act = min(n_ref, len(dpb))
            wts = (2, 3, [(3, 10, 8, -4, 8, 4)] +
                   [None] * (n_act - 1)) if wp_on else None
            fpol = pol if (n_act == n_ref or clip < 5) else p_mixed
            nal, st = encc.encode_frame_p(ys, cbs, crs, dpb[:n_act], fpol,
                                          frame_idx=f, n_active=n_act,
                                          weights=wts)
            nals_c.append(nal)
            recons_c.append(crop(st, w, h))
            dpb = ([st] + dpb)[:max(1, n_ref)]
        got = H.Decoder().feed_annexb(
            H.annexb([encc.sps(), encc.pps()] + nals_c))
        assert len(got) == 4 and all(got[f] == recons_c[f]
                                     for f in range(4)), f"clip {clip}"
        mp4c = mux_avc1(w, h, nals_c, encc.sps(), encc.pps(), sync=[1])
        with open(os.path.join(corpus_dir, f"clip_{clip:02d}.mp4"),
                  "wb") as fh:
            fh.write(mp4c)
        for f, rec in enumerate(recons_c):
            sy = sum(sum(row) for row in rec[0])
            print(f"  (CAST({clip} AS BIGINT), CAST({f} AS BIGINT), "
                  f"CAST({sy} AS BIGINT)),")
        keyframe_recons.append((clip, recons_c[0]))

    # 14. q173: per-clip keyframe perceptual hash — the video member of
    #     the near-dup signature plane. Replays the FULL Scala pipeline
    #     independently: frame-0 reconstruction Y plane -> 32x32
    #     mean-pooled luma grid (cell = (min(y*32//h,31), min(x*32//w,31)),
    #     mean as an exact binary double: h=32 gives 1 row/cell, w=48
    #     gives 1-2 px/cell so means are v or (v1+v2)/2) -> plain-cosine
    #     8x8 DCT -> 63-AC-median sign bits (the PHash64Expr contract).
    #     Margins are asserted so float summation order cannot flip a bit.
    import math as _math

    def recon_phash(rec, signed=True):
        """PHash64Expr replay over a reconstruction's Y plane: 32x32
        mean-pooled luma grid -> plain-cosine 8x8 DCT -> 63-AC-median sign
        bits; margin asserted so float order can't flip a bit."""
        ybuf = rec[0]
        h, w = len(ybuf), len(ybuf[0])
        sums = [[0.0] * 32 for _ in range(32)]
        cnts = [[0] * 32 for _ in range(32)]
        for yy in range(h):
            for x in range(w):
                cy, cx = min(yy * 32 // h, 31), min(x * 32 // w, 31)
                sums[cy][cx] += ybuf[yy][x]
                cnts[cy][cx] += 1
        g = [[sums[cy][cx] / cnts[cy][cx] if cnts[cy][cx] else 0.0
              for cx in range(32)] for cy in range(32)]
        c = [0.0] * 64
        for u in range(8):
            for v in range(8):
                s = 0.0
                for yy in range(32):
                    for x in range(32):
                        s += (g[yy][x] *
                              _math.cos((2 * x + 1) * u * _math.pi / 64) *
                              _math.cos((2 * yy + 1) * v * _math.pi / 64))
                c[u * 8 + v] = s
        med = sorted(c[1:])[31]
        margin = min(abs(x - med) for x in c if abs(x - med) > 0)
        assert margin > 1e-3, f"phash margin {margin} too small"
        hsh = 0
        for k in range(64):
            if c[k] > med:
                hsh |= 1 << k
        if signed and hsh >= 1 << 63:
            hsh -= 1 << 64
        return hsh

    print("-- q173 oracle VALUES (clip, phash) --")
    for clip, rec in keyframe_recons:
        print(f"  (CAST({clip} AS BIGINT), CAST({recon_phash(rec)} AS BIGINT)),")

    # 15. q178: multi-keyframe video signatures + a planted RE-CUT twin.
    #     gop_00.mp4 = TWO GOPs (IDR_A + P, IDR_B + P; stss marks both
    #     IDRs); gop_01.mp4 = the re-cut: GOP B alone. Their FIRST
    #     keyframes differ (hamming > 4 asserted — a first-keyframe-only
    #     hash misses the pair), but gop_00's SECOND keyframe is byte-
    #     identical to gop_01's first, so the k-keyframe signature sets
    #     pair at min-hamming 0. Encoders share identical SPS/PPS so one
    #     avcC config decodes every GOP.
    wg, hg = 48, 32

    def gop(seed):
        enc = H.Encoder(wg, hg, qp_init=24, num_ref_frames=1)
        y, cb, cr = make_planes(wg, hg, seed)
        nal_i, st = enc.encode_frame(y, cb, cr, mixed_policy, frame_idx=0)
        rec_i = crop(st, wg, hg)
        ys, cbs, crs = make_planes(wg, hg, seed + 1)
        nal_p, stp = enc.encode_frame_p(ys, cbs, crs, [st], p_mixed,
                                        frame_idx=1)
        got = H.Decoder().feed_annexb(
            H.annexb([enc.sps(), enc.pps(), nal_i, nal_p]))
        assert len(got) == 2 and got[0] == rec_i and got[1] == crop(stp, wg, hg)
        return enc, nal_i, nal_p, rec_i
    enc_a, nal_ai, nal_ap, rec_ai = gop(9100)
    enc_b, nal_bi, nal_bp, rec_bi = gop(9200)
    assert enc_a.sps() == enc_b.sps() and enc_a.pps() == enc_b.pps()
    mp4_gop0 = mux_avc1(wg, hg, [nal_ai, nal_ap, nal_bi, nal_bp],
                        enc_a.sps(), enc_a.pps(), sync=[1, 3])
    mp4_gop1 = mux_avc1(wg, hg, [nal_bi, nal_bp],
                        enc_a.sps(), enc_a.pps(), sync=[1])
    with open(os.path.join(corpus_dir, "gop_00.mp4"), "wb") as fh:
        fh.write(mp4_gop0)
    with open(os.path.join(corpus_dir, "gop_01.mp4"), "wb") as fh:
        fh.write(mp4_gop1)
    h_a, h_b = recon_phash(rec_ai, signed=False), recon_phash(rec_bi, signed=False)
    d_first = bin(h_a ^ h_b).count("1")
    assert d_first > 4, f"re-cut must ESCAPE a first-keyframe hash (d={d_first})"
    print(f"gop_00/gop_01: first-keyframe hamming {d_first} (> 4: escapes "
          "single-keyframe), shared-keyframe hamming 0")
    # min-hamming pairs over {clips 0-7: 1 keyframe, gop_00 (id 8): 2,
    # gop_01 (id 9): 1} at threshold 4
    ksigs = {clip: [recon_phash(rec, signed=False)]
             for clip, rec in keyframe_recons}
    ksigs[8] = [h_a, h_b]
    ksigs[9] = [h_b]
    print("-- q178 oracle VALUES (id_a, id_b, dist) --")
    ids = sorted(ksigs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            d = min(bin(x ^ y).count("1") for x in ksigs[a] for y in ksigs[b])
            if d <= 4:
                print(f"  (CAST({a} AS BIGINT), CAST({b} AS BIGINT), "
                      f"CAST({d} AS BIGINT)),")

    # q179: every keyframe signature pinned individually (id, keyframe
    # ordinal, signed pHash) — the multi-keyframe EXTRACTION oracle
    print("-- q179 oracle VALUES (media_id, k, phash) --")
    for a in ids:
        for k, h in enumerate(ksigs[a]):
            signed = h - (1 << 64) if h >= 1 << 63 else h
            print(f"  (CAST({a} AS BIGINT), CAST({k} AS BIGINT), "
                  f"CAST({signed} AS BIGINT)),")


if __name__ == "__main__":
    main()
