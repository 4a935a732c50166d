#!/usr/bin/env python3
"""Independent MJPEG-in-MP4 fixture generator (pure stdlib).

Writes src/main/resources/graft/tiny_mjpeg.mp4: an ISO-BMFF container whose
video track carries Motion-JPEG — the QuickTime/ISO 'jpeg' sample entry,
where every sample is a complete baseline ITU-T T.81 JPEG image. This is
the one real video codec family a JDK-only engine can decode end to end
(Mp4Demux cuts the frames, javax.imageio decodes them), so the fixture
exercises the full coded-frame path: demux -> per-frame entropy decode ->
pixel plane.

The frames are built for EXACT closed-form verification, independent of
any decoder implementation:
  - grayscale, one component, no chroma subsampling and no color transform;
  - every 8x8 block is CONSTANT, so the DCT has only a DC coefficient;
  - the quantization table is all ones, so the DC is stored losslessly;
  - block values are multiples of 8 plus 4, so DC = 8*(v-128) is divisible
    by 8 and any conformant IDCT reproduces v exactly (integer result, no
    rounding ambiguity).

Pixel formula (frame f, block row br, block col bc, 48x32 px = 6x4 blocks):
    v(f, br, bc) = ((f*53 + br*17 + bc*29) % 32) * 8 + 4

The encoder below is written from the T.81 spec (Annex F baseline
procedure) with minimal custom Huffman tables — it shares no code with the
JVM decode path under test.
"""
import os
import struct

W, H = 48, 32          # 6 x 4 blocks of 8x8
FRAMES = 6
FPS_DELTA, TIMESCALE = 100, 1000   # 10 fps


def block_value(f: int, br: int, bc: int) -> int:
    return ((f * 53 + br * 17 + bc * 29) % 32) * 8 + 4


class BitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.put(1, 1)  # pad with 1s per F.1.2.3
        return bytes(self.out)


def encode_jpeg(frame: int) -> bytes:
    """Baseline grayscale JPEG of the frame's block-constant image."""
    o = bytearray()
    o += b"\xff\xd8"  # SOI
    # DQT: table 0, 8-bit, all ones (zigzag order is irrelevant for 1s)
    o += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    # SOF0: 8-bit precision, H x W, one component, 1x1 sampling, table 0
    o += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, H, W, 1) + b"\x01\x11\x00"
    # DHT DC table 0: 12 symbols (categories 0..11), all 4-bit codes —
    # canonical codes 0000..1011; spec-legal (no all-ones code)
    o += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 12) + b"\x00"
    o += bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
    # DHT AC table 0: single symbol 0x00 (EOB) with the 2-bit code 00
    o += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x10"
    o += bytes([0, 1] + [0] * 14) + b"\x00"
    # SOS: one component, DC/AC table 0, full spectral selection
    o += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00" + b"\x00\x3f\x00"

    bw = BitWriter()
    pred = 0
    for br in range(H // 8):
        for bc in range(W // 8):
            dc = 8 * (block_value(frame, br, bc) - 128)
            diff = dc - pred
            pred = dc
            cat = 0 if diff == 0 else max(1, diff.bit_length() if diff > 0
                                          else (-diff).bit_length())
            bw.put(cat, 4)  # DC Huffman: category c -> 4-bit code c
            if cat:
                bits = diff if diff > 0 else diff + (1 << cat) - 1
                bw.put(bits & ((1 << cat) - 1), cat)
            bw.put(0b00, 2)  # AC: EOB — every AC coefficient is zero
    o += bw.flush()
    o += b"\xff\xd9"  # EOI
    return bytes(o)


def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def mux_mp4(frames: list) -> bytes:
    dur = FRAMES * FPS_DELTA
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")

    # moov is assembled first with a placeholder chunk offset, then the
    # real mdat start is patched into stco (single chunk holds all frames)
    def build_moov(chunk_offset: int) -> bytes:
        mvhd = full(b"mvhd", 0, 0, struct.pack(
            ">IIIII", 0, 0, TIMESCALE, dur, 0x00010000) +
            struct.pack(">HHII", 0x0100, 0, 0, 0) +
            struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) +
            struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2))
        tkhd = full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, dur) +
                    struct.pack(">IIHHHH", 0, 0, 0, 0, 0, 0) +
                    struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                0x40000000) +
                    struct.pack(">II", W << 16, H << 16))
        mdhd = full(b"mdhd", 0, 0,
                    struct.pack(">IIIIHH", 0, 0, TIMESCALE, dur, 0x55C4, 0))
        hdlr = full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" +
                    struct.pack(">III", 0, 0, 0) + b"MJPEG Video Handler\x00")
        vmhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = full(b"dref", 0, 0, struct.pack(">I", 1) +
                    full(b"url ", 0, 1, b""))
        dinf = box(b"dinf", dref)
        # VisualSampleEntry 'jpeg' (ISO 14496-12 §12.1.3 layout)
        entry = (struct.pack(">6xH", 1) +              # reserved, dref idx
                 struct.pack(">HH", 0, 0) +            # pre_defined/reserved
                 struct.pack(">3I", 0, 0, 0) +         # pre_defined[3]
                 struct.pack(">HH", W, H) +
                 struct.pack(">II", 0x00480000, 0x00480000) +  # 72 dpi
                 struct.pack(">I", 0) +                # reserved
                 struct.pack(">H", 1) +                # frame_count
                 b"\x05MJPEG" + b"\x00" * 26 +         # compressorname
                 struct.pack(">Hh", 24, -1))           # depth, pre_defined
        stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + box(b"jpeg", entry))
        stts = full(b"stts", 0, 0, struct.pack(">III", 1, FRAMES, FPS_DELTA))
        stsc = full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, FRAMES, 1))
        stsz = full(b"stsz", 0, 0, struct.pack(">II", 0, FRAMES) +
                    b"".join(struct.pack(">I", len(f)) for f in frames))
        stco = full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
        # no stss box: every MJPEG frame is intra-coded, i.e. all sync
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", vmhd + dinf + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        return box(b"moov", mvhd + trak)

    moov_len = len(build_moov(0))
    mdat_payload = b"".join(frames)
    chunk_offset = len(ftyp) + moov_len + 8  # first frame byte inside mdat
    moov = build_moov(chunk_offset)
    assert len(moov) == moov_len
    mdat = box(b"mdat", mdat_payload)
    return ftyp + moov + mdat


def main():
    frames = [encode_jpeg(f) for f in range(FRAMES)]
    out = mux_mp4(frames)
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src/main/resources/graft/tiny_mjpeg.mp4")
    with open(os.path.abspath(dest), "wb") as fh:
        fh.write(out)
    print(f"wrote {os.path.abspath(dest)}: {len(out)} bytes, "
          f"{FRAMES} frames of {W}x{H}")
    # expected per-frame pixel sums (closed form, for the spec/oracle)
    for f in range(FRAMES):
        s = sum(64 * block_value(f, br, bc)
                for br in range(H // 8) for bc in range(W // 8))
        print(f"frame {f}: sum_px={s}")


if __name__ == "__main__":
    main()
