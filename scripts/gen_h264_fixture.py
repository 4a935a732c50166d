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


def mux_avc1(w, h, slice_nals, sps_nal, pps_nal, timescale=1000, delta=100):
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
        stss = full(b"stss", 0, 0, struct.pack(">I", nf) +
                    b"".join(struct.pack(">I", i + 1) for i in range(nf)))
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


if __name__ == "__main__":
    main()
