"""Pure-python H.264 baseline-profile I-frame codec (encoder + reference
decoder) for fixture generation — the independent implementation the Scala
decoder (graft.sources.H264Decode) is verified against.

Scope (the fixture contract):
  - IDR frames only, one slice per frame, CAVLC entropy coding
    (entropy_coding_mode_flag = 0), frame_mbs_only, 4:2:0, 8-bit.
  - Macroblock types: I_4x4 (all nine 4x4 intra modes), I_16x16 (all four
    modes, all CBP classes), I_PCM.
  - Deblocking DISABLED via disable_deblocking_filter_idc = 1 (the slice
    carries the syntax; the loop filter itself is out of scope on both
    sides, so streams that require it are rejected by the Scala decoder).

The ENCODER reconstructs every macroblock exactly as a decoder must
(prediction from reconstructed neighbours, quantize -> dequantize ->
inverse transform), so the .yuv it emits IS the bit-exact oracle for any
conformant decode of the stream.

Syntax per ITU-T Rec. H.264: NAL/RBSP (7.3.1, 7.4.1.1 emulation
prevention), SPS/PPS (7.3.2.1/2), slice header (7.3.3), macroblock layer
(7.3.5), residual CAVLC (7.3.5.3.2 / 9.2), intra prediction (8.3),
transform/scaling (8.5). CAVLC code tables live in h264_tables.py with
structural validation.
"""
import h264_tables as T

# ----------------------------------------------------------------- bits

class BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, n, v):
        assert 0 <= v < (1 << n), (n, v)
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put(self, bitstr):
        for c in bitstr:
            self.bits.append(1 if c == "1" else 0)

    def ue(self, v):
        assert v >= 0
        code = v + 1
        n = code.bit_length()
        self.put("0" * (n - 1))
        self.u(n, code)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def te(self, v, cmax):
        """Truncated exp-Golomb: 1 inverted bit when cmax == 1, else ue."""
        if cmax == 1:
            self.u(1, 1 - v)
        else:
            self.ue(v)

    def rbsp_trailing(self):
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def byte_align_zero(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


class BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0  # bit position

    def bit(self):
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def u(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self):
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            assert zeros < 32, "ue(v) runaway"
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self):
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def te(self, cmax):
        """Truncated exp-Golomb: 1 inverted bit when cmax == 1, else ue."""
        if cmax == 1:
            return 1 - self.bit()
        return self.ue()

    def byte_align(self):
        while self.pos % 8:
            self.pos += 1

    def vlc(self, table):
        """Decode one code from {bitstring: value}."""
        s = ""
        for _ in range(32):
            s += "1" if self.bit() else "0"
            if s in table:
                return table[s]
        raise ValueError(f"illegal VLC codeword {s}")


def rbsp_to_nal(rbsp, nal_ref_idc, nal_unit_type):
    """Insert emulation-prevention bytes, prepend the NAL header."""
    out = bytearray([(nal_ref_idc << 5) | nal_unit_type])
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal_to_rbsp(nal):
    """Strip the emulation-prevention bytes (payload after the 1-byte header)."""
    out = bytearray()
    zeros = 0
    i = 1
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def annexb(nals):
    out = bytearray()
    for n in nals:
        out += b"\x00\x00\x00\x01" + n
    return bytes(out)


def split_annexb(data):
    """Split an Annex B stream into NAL units."""
    nals = []
    i = 0
    n = len(data)
    starts = []
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 4 <= n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (s, p) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        nals.append(data[p:end])
    return nals


# ------------------------------------------------------- tables/constants

ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
# dequant scale V (rows qP%6; cols: class0 = positions (0,0),(0,2),(2,0),(2,2);
# class1 = (1,1),(1,3),(3,1),(3,3); class2 = the rest)
DEQUANT_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
             (14, 23, 18), (16, 25, 20), (18, 29, 23)]
# forward quant multipliers MF (same classes)
QUANT_MF = [(13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
            (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559)]


def pos_class(i):
    r, c = i >> 2, i & 3
    if (r, c) in ((0, 0), (0, 2), (2, 0), (2, 2)):
        return 0
    if (r, c) in ((1, 1), (1, 3), (3, 1), (3, 3)):
        return 1
    return 2

CHROMA_QP = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
             38, 38, 38, 39, 39, 39, 39]


def chroma_qp(qp_y, offset=0):
    qpi = max(0, min(51, qp_y + offset))
    return qpi if qpi < 30 else CHROMA_QP[qpi - 30]


# Table 9-4: codeNum <-> coded_block_pattern, Intra_4x4 column. Validated
# as a bijection on 0..47; anchors: cbp 47->0, 31->1, 15->2, 0->3.
CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
             16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4, 8,
             17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
assert sorted(CBP_INTRA) == list(range(48)), "Table 9-4 must be a bijection"
CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(CBP_INTRA)}

# Table 9-4, Inter column. Epistemic status: recalled as the committee's
# (intra, inter) PAIR table; the intra halves of those pairs reproduce
# CBP_INTRA above entry-for-entry (independently validated there), which
# cross-anchors the inter halves. Asserted a bijection on 0..47; the
# most-probable prefix (0,16,1,2,4,8,32,3 = "nothing coded" first, single
# 8x8s and chroma-only next) also matches the table's documented design.
CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
             14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
             17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41]
assert sorted(CBP_INTER) == list(range(48)), "Table 9-4 must be a bijection"
CBP_INTER_INV = {cbp: i for i, cbp in enumerate(CBP_INTER)}

# z-scan order of 4x4 luma blocks: decode order -> raster index in the MB
ZSCAN4 = [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15]
RASTER_TO_Z = {r: z for z, r in enumerate(ZSCAN4)}


def clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


# ------------------------------------------------------------ transforms

def fwd4x4(block):
    """H.264 forward core transform Cf X Cf^T (integer butterflies)."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a, b, c, d = block[i]
        s0, s3 = a + d, a - d
        s1, s2 = b + c, b - c
        t[i] = [s0 + s1, 2 * s3 + s2, s0 - s1, s3 - 2 * s2]
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a, b, c, d = t[0][j], t[1][j], t[2][j], t[3][j]
        s0, s3 = a + d, a - d
        s1, s2 = b + c, b - c
        out[0][j] = s0 + s1
        out[1][j] = 2 * s3 + s2
        out[2][j] = s0 - s1
        out[3][j] = s3 - 2 * s2
    return out


def inv4x4(coef):
    """H.264 inverse core transform with the final (x+32)>>6."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        d0, d1, d2, d3 = coef[i]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        t[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        d0, d1, d2, d3 = t[0][j], t[1][j], t[2][j], t[3][j]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        out[0][j] = (e0 + e3 + 32) >> 6
        out[1][j] = (e1 + e2 + 32) >> 6
        out[2][j] = (e1 - e2 + 32) >> 6
        out[3][j] = (e0 - e3 + 32) >> 6
    return out


def hadamard4(m):
    """4x4 Hadamard (self-inverse up to scale), used for I_16x16 luma DC."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a, b, c, d = m[i]
        s0, s3 = a + d, a - d
        s1, s2 = b + c, b - c
        t[i] = [s0 + s1, s3 + s2, s0 - s1, s3 - s2]
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a, b, c, d = t[0][j], t[1][j], t[2][j], t[3][j]
        s0, s3 = a + d, a - d
        s1, s2 = b + c, b - c
        out[0][j] = s0 + s1
        out[1][j] = s3 + s2
        out[2][j] = s0 - s1
        out[3][j] = s3 - s2
    return out


def hadamard2(m):
    a, b, c, d = m[0][0], m[0][1], m[1][0], m[1][1]
    return [[a + b + c + d, a - b + c - d], [a + b - c - d, a - b - c + d]]


def quant_level(w, qp, cls, dc=False):
    """Forward quantization (encoder side, intra rounding f = 2^qbits/3)."""
    mf = QUANT_MF[qp % 6][cls]
    qbits = 15 + qp // 6
    if dc:
        f = 2 * ((1 << qbits) // 3)
        lv = (abs(w) * mf + f) >> (qbits + 1)
    else:
        f = (1 << qbits) // 3
        lv = (abs(w) * mf + f) >> qbits
    return -lv if w < 0 else lv


def dequant_ac(level, qp, i):
    return level * DEQUANT_V[qp % 6][pos_class(i)] << (qp // 6)


def dequant_luma_dc(f, qp):
    v = DEQUANT_V[qp % 6][0]
    if qp >= 36:
        return (f * v) << (qp // 6 - 6)
    return (f * v + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def dequant_chroma_dc(f, qp):
    return ((f * v_dc(qp)) << (qp // 6)) >> 5


def v_dc(qp):
    return DEQUANT_V[qp % 6][0]


# ---------------------------------------------------------------- CAVLC

def _inv(table):
    return {bits: key for key, bits in table.items()}

COEFF_TOKEN_DEC = {
    0: _inv(T.COEFF_TOKEN_NC0),
    2: _inv(T.COEFF_TOKEN_NC2),
    4: _inv(T.COEFF_TOKEN_NC4),
    8: _inv(T.COEFF_TOKEN_NC8),
    -1: _inv(T.COEFF_TOKEN_CHROMA_DC),
}
TOTAL_ZEROS_DEC = {tc: {b: i for i, b in enumerate(codes)}
                   for tc, codes in T.TOTAL_ZEROS_4x4.items()}
TOTAL_ZEROS_CDC_DEC = {tc: {b: i for i, b in enumerate(codes)}
                       for tc, codes in T.TOTAL_ZEROS_CHROMA_DC.items()}
RUN_BEFORE_DEC = {zl: {b: i for i, b in enumerate(codes)}
                  for zl, codes in T.RUN_BEFORE.items()}


def nc_class(nc):
    if nc == -1:
        return -1
    if nc < 2:
        return 0
    if nc < 4:
        return 2
    if nc < 8:
        return 4
    return 8


def cavlc_encode_block(w, coeffs, nc, max_coeff):
    """Encode `coeffs` (scan order, len == max_coeff) per 9.2. Returns
    TotalCoeff (the nnz the caller stores for neighbour context)."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total = len(nz)
    # trailing ones: consecutive |c|==1 from the high-frequency end, max 3
    t1 = 0
    while t1 < min(3, total) and abs(nz[total - 1 - t1][1]) == 1:
        t1 += 1
    cls = nc_class(nc)
    tab = {-1: T.COEFF_TOKEN_CHROMA_DC, 0: T.COEFF_TOKEN_NC0,
           2: T.COEFF_TOKEN_NC2, 4: T.COEFF_TOKEN_NC4,
           8: T.COEFF_TOKEN_NC8}[cls]
    w.put(tab[(t1, total)])
    if total == 0:
        return 0
    # trailing-one signs, high-frequency first
    for k in range(t1):
        w.u(1, 1 if nz[total - 1 - k][1] < 0 else 0)
    # levels, high-frequency first, suffixLength adaptation (9.2.2)
    suffix_len = 1 if (total > 10 and t1 < 3) else 0
    for k in range(t1, total):
        level = nz[total - 1 - k][1]
        code = 2 * level - 2 if level > 0 else -2 * level - 1
        if k == t1 and t1 < 3:
            code -= 2
        if suffix_len == 0:
            if code < 14:
                w.put("0" * code + "1")
            elif code < 30:
                w.put("0" * 14 + "1")
                w.u(4, code - 14)
            else:
                assert code - 30 < 4096, "level escape beyond prefix-15"
                w.put("0" * 15 + "1")
                w.u(12, code - 30)
        else:
            if code < (15 << suffix_len):
                w.put("0" * (code >> suffix_len) + "1")
                w.u(suffix_len, code & ((1 << suffix_len) - 1))
            else:
                rem = code - (15 << suffix_len)
                assert rem < 4096, "level escape beyond prefix-15"
                w.put("0" * 15 + "1")
                w.u(12, rem)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    last_pos = nz[-1][0]
    total_zeros = last_pos + 1 - total
    if total < max_coeff:
        if max_coeff == 4:
            w.put(T.TOTAL_ZEROS_CHROMA_DC[total][total_zeros])
        else:
            w.put(T.TOTAL_ZEROS_4x4[total][total_zeros])
    else:
        assert total_zeros == 0
    # run_before, high-frequency first, not for the last (lowest) coeff
    zeros_left = total_zeros
    for k in range(total - 1):
        if zeros_left == 0:
            break
        idx = total - 1 - k
        run = nz[idx][0] - nz[idx - 1][0] - 1
        if zeros_left < 7:
            w.put(T.RUN_BEFORE[zeros_left][run])
        else:
            if run < 7:
                w.put(T.RUN_BEFORE[7][run])
            else:
                w.put("0" * (run - 4) + "1")
        zeros_left -= run
    return total


def cavlc_decode_block(r, nc, max_coeff):
    """Decode one residual block; returns (coeffs in scan order, TotalCoeff)."""
    cls = nc_class(nc)
    t1, total = r.vlc(COEFF_TOKEN_DEC[cls])
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs, 0
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.bit() else 1)
    suffix_len = 1 if (total > 10 and t1 < 3) else 0
    for k in range(t1, total):
        prefix = 0
        while r.bit() == 0:
            prefix += 1
            assert prefix < 32, "level_prefix runaway"
        if suffix_len == 0 and prefix == 14:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        else:
            size = suffix_len
        code = (min(15, prefix) << suffix_len) + (r.u(size) if size else 0)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if k == t1 and t1 < 3:
            code += 2
        levels.append((code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1))
        if suffix_len == 0:
            suffix_len = 1
        if abs(levels[-1]) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeff:
        if max_coeff == 4:
            total_zeros = r.vlc(TOTAL_ZEROS_CDC_DEC[total])
        else:
            total_zeros = r.vlc(TOTAL_ZEROS_DEC[total])
    else:
        total_zeros = 0
    runs = []
    zeros_left = total_zeros
    for k in range(total - 1):
        if zeros_left == 0:
            runs.append(0)
            continue
        if zeros_left < 7:
            run = r.vlc(RUN_BEFORE_DEC[zeros_left])
        else:
            s = ""
            for _ in range(32):
                s += "1" if r.bit() else "0"
                if s in RUN_BEFORE_DEC[7]:
                    run = RUN_BEFORE_DEC[7][s]
                    break
                if s.endswith("1") and len(s) >= 4 and set(s[:-1]) == {"0"}:
                    run = len(s) - 1 + 4
                    break
            else:
                raise ValueError("run_before runaway")
        assert run <= zeros_left, "run_before exceeds zerosLeft"
        runs.append(run)
        zeros_left -= run
    # place from the highest-frequency nonzero downward
    pos = total + total_zeros - 1
    assert pos < max_coeff, "coefficients overflow the block"
    for k in range(total):
        coeffs[pos] = levels[k]
        if k < total - 1:
            pos -= runs[k] + 1
    return coeffs, total


# ------------------------------------------------------ intra prediction

def pred4x4(mode, rec, W, H, x0, y0, above_right_ok):
    """4x4 intra prediction from reconstructed neighbours (8.3.1.2).
    Clipped-index forms of DDL/HU fold the spec's edge special-cases."""
    left_ok = x0 > 0
    above_ok = y0 > 0
    corner_ok = left_ok and above_ok
    l = [rec[y0 + i][x0 - 1] for i in range(4)] if left_ok else None
    a = None
    if above_ok:
        a = [rec[y0 - 1][x0 + i] for i in range(4)]
        if above_right_ok:
            a += [rec[y0 - 1][x0 + 4 + i] for i in range(4)]
        else:
            a += [a[3]] * 4  # substitution rule 8.3.1.2 note
    c = rec[y0 - 1][x0 - 1] if corner_ok else None
    p = [[0] * 4 for _ in range(4)]

    def A(i):  # above with corner at -1
        return c if i == -1 else a[min(i, 7)]

    def L(i):
        return c if i == -1 else l[min(i, 3)]

    if mode == 0:  # Vertical
        assert above_ok
        for y in range(4):
            for x in range(4):
                p[y][x] = a[x]
    elif mode == 1:  # Horizontal
        assert left_ok
        for y in range(4):
            for x in range(4):
                p[y][x] = l[y]
    elif mode == 2:  # DC
        if left_ok and above_ok:
            dc = (sum(a[:4]) + sum(l) + 4) >> 3
        elif left_ok:
            dc = (sum(l) + 2) >> 2
        elif above_ok:
            dc = (sum(a[:4]) + 2) >> 2
        else:
            dc = 128
        for y in range(4):
            for x in range(4):
                p[y][x] = dc
    elif mode == 3:  # Diagonal down-left
        assert above_ok
        for y in range(4):
            for x in range(4):
                i = x + y
                p[y][x] = (A(i) + 2 * A(i + 1) + A(i + 2) + 2) >> 2
    elif mode == 4:  # Diagonal down-right
        assert corner_ok
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y][x] = (A(x - y - 2) + 2 * A(x - y - 1) + A(x - y) + 2) >> 2
                elif x < y:
                    p[y][x] = (L(y - x - 2) + 2 * L(y - x - 1) + L(y - x) + 2) >> 2
                else:
                    p[y][x] = (a[0] + 2 * c + l[0] + 2) >> 2
    elif mode == 5:  # Vertical-right
        assert corner_ok
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    p[y][x] = (A(x - (y >> 1) - 1) + A(x - (y >> 1)) + 1) >> 1
                elif z >= 0:
                    p[y][x] = (A(x - (y >> 1) - 2) + 2 * A(x - (y >> 1) - 1)
                               + A(x - (y >> 1)) + 2) >> 2
                elif z == -1:
                    p[y][x] = (l[0] + 2 * c + a[0] + 2) >> 2
                else:
                    p[y][x] = (L(y - 1) + 2 * L(y - 2) + L(y - 3) + 2) >> 2
    elif mode == 6:  # Horizontal-down
        assert corner_ok
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    p[y][x] = (L(y - (x >> 1) - 1) + L(y - (x >> 1)) + 1) >> 1
                elif z >= 0:
                    p[y][x] = (L(y - (x >> 1) - 2) + 2 * L(y - (x >> 1) - 1)
                               + L(y - (x >> 1)) + 2) >> 2
                elif z == -1:
                    p[y][x] = (l[0] + 2 * c + a[0] + 2) >> 2
                else:
                    p[y][x] = (A(x - 1) + 2 * A(x - 2) + A(x - 3) + 2) >> 2
    elif mode == 7:  # Vertical-left
        assert above_ok
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y][x] = (a[i] + a[i + 1] + 1) >> 1
                else:
                    p[y][x] = (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2
    elif mode == 8:  # Horizontal-up
        assert left_ok
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                i = z >> 1
                if z % 2 == 0:
                    p[y][x] = (L(i) + L(i + 1) + 1) >> 1
                else:
                    p[y][x] = (L(i) + 2 * L(i + 1) + L(i + 2) + 2) >> 2
    else:
        raise ValueError(f"bad intra4x4 mode {mode}")
    return p


def pred16x16(mode, rec, W, H, x0, y0):
    left_ok, above_ok = x0 > 0, y0 > 0
    p = [[0] * 16 for _ in range(16)]
    if mode == 0:  # V
        assert above_ok
        for y in range(16):
            for x in range(16):
                p[y][x] = rec[y0 - 1][x0 + x]
    elif mode == 1:  # H
        assert left_ok
        for y in range(16):
            for x in range(16):
                p[y][x] = rec[y0 + y][x0 - 1]
    elif mode == 2:  # DC
        if left_ok and above_ok:
            dc = (sum(rec[y0 - 1][x0 + i] for i in range(16)) +
                  sum(rec[y0 + i][x0 - 1] for i in range(16)) + 16) >> 5
        elif above_ok:
            dc = (sum(rec[y0 - 1][x0 + i] for i in range(16)) + 8) >> 4
        elif left_ok:
            dc = (sum(rec[y0 + i][x0 - 1] for i in range(16)) + 8) >> 4
        else:
            dc = 128
        for y in range(16):
            for x in range(16):
                p[y][x] = dc
    elif mode == 3:  # Plane
        assert left_ok and above_ok and rec[y0 - 1][x0 - 1] is not None
        Hs = sum((i + 1) * (rec[y0 - 1][x0 + 8 + i] -
                            rec[y0 - 1][x0 + 6 - i]) for i in range(8))
        Vs = sum((i + 1) * (rec[y0 + 8 + i][x0 - 1] -
                            rec[y0 + 6 - i][x0 - 1]) for i in range(8))
        # the x'=7 terms reach p[-1,-1]
        a = 16 * (rec[y0 + 15][x0 - 1] + rec[y0 - 1][x0 + 15])
        b = (5 * Hs + 32) >> 6
        cc = (5 * Vs + 32) >> 6
        for y in range(16):
            for x in range(16):
                p[y][x] = clip255((a + b * (x - 7) + cc * (y - 7) + 16) >> 5)
    else:
        raise ValueError(f"bad intra16x16 mode {mode}")
    return p


def pred_chroma(mode, rec, W, H, x0, y0):
    """8x8 chroma prediction (8.3.4): 0=DC, 1=H, 2=V, 3=Plane."""
    left_ok, above_ok = x0 > 0, y0 > 0
    p = [[0] * 8 for _ in range(8)]
    if mode == 0:  # DC per 4x4 sub-block
        for sy in (0, 1):
            for sx in (0, 1):
                sa = sum(rec[y0 - 1][x0 + 4 * sx + i] for i in range(4)) \
                    if above_ok else None
                sl = sum(rec[y0 + 4 * sy + i][x0 - 1] for i in range(4)) \
                    if left_ok else None
                if sx == sy:  # corner blocks average both when available
                    if sa is not None and sl is not None:
                        dc = (sa + sl + 4) >> 3
                    elif sa is not None:
                        dc = (sa + 2) >> 2
                    elif sl is not None:
                        dc = (sl + 2) >> 2
                    else:
                        dc = 128
                elif sx == 1:  # (1,0) prefers above
                    if sa is not None:
                        dc = (sa + 2) >> 2
                    elif sl is not None:
                        dc = (sl + 2) >> 2
                    else:
                        dc = 128
                else:  # (0,1) prefers left
                    if sl is not None:
                        dc = (sl + 2) >> 2
                    elif sa is not None:
                        dc = (sa + 2) >> 2
                    else:
                        dc = 128
                for y in range(4):
                    for x in range(4):
                        p[4 * sy + y][4 * sx + x] = dc
    elif mode == 1:  # Horizontal
        assert left_ok
        for y in range(8):
            for x in range(8):
                p[y][x] = rec[y0 + y][x0 - 1]
    elif mode == 2:  # Vertical
        assert above_ok
        for y in range(8):
            for x in range(8):
                p[y][x] = rec[y0 - 1][x0 + x]
    elif mode == 3:  # Plane
        assert left_ok and above_ok
        Hs = sum((i + 1) * (rec[y0 - 1][x0 + 4 + i] -
                            rec[y0 - 1][x0 + 2 - i]) for i in range(4))
        Vs = sum((i + 1) * (rec[y0 + 4 + i][x0 - 1] -
                            rec[y0 + 2 - i][x0 - 1]) for i in range(4))
        a = 16 * (rec[y0 + 7][x0 - 1] + rec[y0 - 1][x0 + 7])
        b = (17 * Hs + 16) >> 5
        cc = (17 * Vs + 16) >> 5
        for y in range(8):
            for x in range(8):
                p[y][x] = clip255((a + b * (x - 3) + cc * (y - 3) + 16) >> 5)
    else:
        raise ValueError(f"bad chroma mode {mode}")
    return p


def above_right_available(bx, by, mb_w):
    """Is the above-right 4x4 neighbour's sample row decoded when block
    (bx, by) (4-px luma units, frame coords) decodes? Raster MB order +
    z-scan block order inside the MB."""
    if by == 0:
        return False  # outside the frame
    sx = (bx + 1) * 4  # x of the above-right sample run
    if sx >= mb_w * 16:
        return False
    mbx, mby = bx >> 2, by >> 2
    smbx, smby = sx >> 4, (by * 4 - 1) >> 4
    if smby < mby:
        return True  # previous MB row: decoded (raster)
    if smbx < mbx:
        return True  # same row, left MB
    if smbx > mbx:
        return False  # same row, right MB: not yet decoded
    # same MB: compare z-scan positions
    cur = RASTER_TO_Z[(by & 3) * 4 + (bx & 3)]
    nb = RASTER_TO_Z[(((by * 4 - 1) >> 2) & 3) * 4 + ((sx >> 2) & 3)]
    return nb < cur


# --------------------------------------- inter prediction (MC, 8.4.2.2)

def _tap6(a, b, c, d, e, f):
    return a - 5 * b + 20 * c + 20 * d - 5 * e + f


def mc_luma(ref, W, H, x0, y0, mvx, mvy, bw=16, bh=16):
    """Luma motion compensation at quarter-pel precision (any block size)
    (8.4.2.2.1/.2, the Figure 8-4 a..s positions): 6-tap half-pel
    [1,-5,20,20,-5,1], centre position j from UNCLIPPED intermediate sums
    ((j1+512)>>10), quarter positions by rounding averages of the two
    nearest integer/half samples. Reference reads clamp to the frame edge
    (8.4.2.2.1 sample clipping). mv in quarter-pel units."""
    ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3

    def p(x, y):
        return ref[min(max(y, 0), H - 1)][min(max(x, 0), W - 1)]

    def half_h(x, y):  # b: half-pel between (x,y) and (x+1,y)
        return clip255((_tap6(p(x - 2, y), p(x - 1, y), p(x, y),
                              p(x + 1, y), p(x + 2, y), p(x + 3, y)) + 16) >> 5)

    def half_v(x, y):  # h: half-pel between (x,y) and (x,y+1)
        return clip255((_tap6(p(x, y - 2), p(x, y - 1), p(x, y),
                              p(x, y + 1), p(x, y + 2), p(x, y + 3)) + 16) >> 5)

    def hsum(x, y):    # unclipped horizontal 6-tap sum (j intermediates)
        return _tap6(p(x - 2, y), p(x - 1, y), p(x, y),
                     p(x + 1, y), p(x + 2, y), p(x + 3, y))

    def half_hv(x, y):  # j: centre half-pel
        j1 = _tap6(hsum(x, y - 2), hsum(x, y - 1), hsum(x, y),
                   hsum(x, y + 1), hsum(x, y + 2), hsum(x, y + 3))
        return clip255((j1 + 512) >> 10)

    def sample(x, y):
        if fx == 0 and fy == 0:
            return p(x, y)
        if fy == 0:  # a, b, c
            b = half_h(x, y)
            if fx == 2:
                return b
            return (p(x + (0 if fx == 1 else 1), y) + b + 1) >> 1
        if fx == 0:  # d, h, n
            h = half_v(x, y)
            if fy == 2:
                return h
            return (p(x, y + (0 if fy == 1 else 1)) + h + 1) >> 1
        if fx == 2 and fy == 2:
            return half_hv(x, y)
        if fx == 2:  # f (fy=1) / q (fy=3): between b and j
            return (half_h(x, y if fy == 1 else y + 1) + half_hv(x, y) + 1) >> 1
        if fy == 2:  # i (fx=1) / k (fx=3): between h and j
            return (half_v(x if fx == 1 else x + 1, y) + half_hv(x, y) + 1) >> 1
        # e/g/p/r: nearest horizontal half-pel + nearest vertical half-pel
        b = half_h(x, y if fy == 1 else y + 1)
        h = half_v(x if fx == 1 else x + 1, y)
        return (b + h + 1) >> 1

    return [[sample(ix + j, iy + i) for j in range(bw)] for i in range(bh)]


def mc_chroma(ref, W, H, x0, y0, mvx, mvy, bw=8, bh=8):
    """Chroma MC (8.4.2.2.2, any block size): the quarter-pel LUMA vector addresses
    the half-resolution chroma plane at eighth-pel; bilinear weights
    ((8-dx)(8-dy)A + ... + 32) >> 6. Edge-clamped like luma."""
    ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
    xf, yf = mvx & 7, mvy & 7

    def p(x, y):
        return ref[min(max(y, 0), H - 1)][min(max(x, 0), W - 1)]

    return [[((8 - xf) * (8 - yf) * p(ix + j, iy + i) +
              xf * (8 - yf) * p(ix + j + 1, iy + i) +
              (8 - xf) * yf * p(ix + j, iy + i + 1) +
              xf * yf * p(ix + j + 1, iy + i + 1) + 32) >> 6
             for j in range(bw)] for i in range(bh)]


def apply_wp(block, w, o, lwd):
    """Explicit weighted prediction (8.4.2.3.2): per sample
    Clip1(((p*w + 2^(lwd-1)) >> lwd) + o) when lwd >= 1, else
    Clip1(p*w + o)."""
    if lwd >= 1:
        r = 1 << (lwd - 1)
        return [[clip255(((v * w + r) >> lwd) + o) for v in row]
                for row in block]
    return [[clip255(v * w + o) for v in row] for row in block]


def wp_luma(wp, ref_i):
    """(w, o, lwd) for the luma component of reference ref_i."""
    lwd_y, _, per = wp
    e = per[ref_i]
    return (e[0], e[1], lwd_y)


def wp_chroma(wp, ref_i, comp):
    _, lwd_c, per = wp
    e = per[ref_i]
    return (e[2], e[3], lwd_c) if comp == 0 else (e[4], e[5], lwd_c)


# ------------------------------------ MV prediction (8.4.1.1 / 8.4.1.3)

def blk_motion(st, bx, by):
    """(refIdx, mv) of a 4x4 luma block for prediction, or None if the
    block is outside the picture / not yet decoded. Motion is stored at
    4x4 granularity so partitioned neighbours (16x8/8x16) resolve to the
    SPECIFIC neighbouring block the spec names. Intra blocks are
    available with refIdx -1, mv (0,0)."""
    if bx < 0 or by < 0 or bx >= st.mb_w * 4 or by >= st.mb_h * 4:
        return None
    r = st.bref.get((bx, by))
    if r is None:
        return None  # not yet decoded
    if r < 0:
        return (-1, (0, 0))
    return (r, st.bmv[(bx, by)])


def record_blocks(st, x0b, y0b, wb, hb, ref, mv):
    """Write a partition's motion into the 4x4-granular maps."""
    for by in range(y0b, y0b + hb):
        for bx in range(x0b, x0b + wb):
            st.bref[(bx, by)] = ref
            if ref >= 0:
                st.bmv[(bx, by)] = mv


def mvp_part(st, x0b, y0b, wb, ref_idx=0):
    """Generic median MV predictor (8.4.1.3.1) for a partition with
    top-left 4x4 block (x0b, y0b) and width wb blocks: neighbours
    A (left), B (above), C (above-right of the partition; D above-left
    substitutes); B&C-unavailable -> mvA; exactly one neighbour with the
    partition's OWN refIdx -> that mv; else componentwise median."""
    A = blk_motion(st, x0b - 1, y0b)
    B = blk_motion(st, x0b, y0b - 1)
    C = blk_motion(st, x0b + wb, y0b - 1)
    if C is None:
        C = blk_motion(st, x0b - 1, y0b - 1)
    if B is None and C is None and A is not None:
        return A[1]
    matches = [n for n in (A, B, C) if n is not None and n[0] == ref_idx]
    if len(matches) == 1:
        return matches[0][1]
    xs = sorted((n[1][0] if n is not None else 0) for n in (A, B, C))
    ys = sorted((n[1][1] if n is not None else 0) for n in (A, B, C))
    return (xs[1], ys[1])


def mvp_16x16(st, mbx, mby):
    return mvp_part(st, mbx * 4, mby * 4, 4)


def mvp_16x8(st, mbx, mby, part, ref_idx=0):
    """16x8 directional shortcut (8.4.1.3.2): top partition takes mvB,
    bottom takes mvA, when that neighbour references the partition's OWN
    picture; else the generic median for the partition."""
    x0b, y0b = mbx * 4, mby * 4 + 2 * part
    n = blk_motion(st, x0b, y0b - 1) if part == 0 \
        else blk_motion(st, x0b - 1, y0b)
    if n is not None and n[0] == ref_idx:
        return n[1]
    return mvp_part(st, x0b, y0b, 4, ref_idx)


def mvp_8x16(st, mbx, mby, part, ref_idx=0):
    """8x16 directional shortcut: left partition takes mvA, right takes
    mvC (with D substitution), when it references the partition's OWN
    picture; else the median."""
    x0b, y0b = mbx * 4 + 2 * part, mby * 4
    if part == 0:
        n = blk_motion(st, x0b - 1, y0b)
    else:
        n = blk_motion(st, x0b + 2, y0b - 1)
        if n is None:
            n = blk_motion(st, x0b - 1, y0b - 1)
    if n is not None and n[0] == ref_idx:
        return n[1]
    return mvp_part(st, x0b, y0b, 2, ref_idx)


def sub_parts(sub_type):
    """Sub-partitions of one 8x8 (P sub_mb_type 0..3): (dx, dy, w, h) in
    pixels within the 8x8, in decode order."""
    if sub_type == 0:
        return [(0, 0, 8, 8)]
    if sub_type == 1:
        return [(0, 0, 8, 4), (0, 4, 8, 4)]
    if sub_type == 2:
        return [(0, 0, 4, 8), (4, 0, 4, 8)]
    return [(0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)]


def skip_mv(st, mbx, mby):
    """P_Skip motion (8.4.1.1): zero if the left or above neighbour block
    is unavailable or is a zero-motion refIdx-0 block; else the 16x16
    mvp."""
    A = blk_motion(st, mbx * 4 - 1, mby * 4)
    B = blk_motion(st, mbx * 4, mby * 4 - 1)
    if A is None or B is None:
        return (0, 0)
    if A[0] == 0 and A[1] == (0, 0):
        return (0, 0)
    if B[0] == 0 and B[1] == (0, 0):
        return (0, 0)
    return mvp_16x16(st, mbx, mby)


# ------------------------------------------------------------ frame state

class FrameState:
    """Reconstruction planes + the CAVLC neighbour-context maps. The
    encoder and decoder both drive one of these; identical updates are
    what makes the encoder's reconstruction the decoder's oracle."""

    def __init__(self, mb_w, mb_h):
        self.mb_w, self.mb_h = mb_w, mb_h
        W, H = mb_w * 16, mb_h * 16
        self.y = [[0] * W for _ in range(H)]
        self.cb = [[0] * (W // 2) for _ in range(H // 2)]
        self.cr = [[0] * (W // 2) for _ in range(H // 2)]
        self.nnz_y = {}     # (bx, by) 4-px luma units -> TotalCoeff
        self.nnz_cb = {}
        self.nnz_cr = {}
        self.i4_modes = {}  # (bx, by) -> intra4x4 mode (I_4x4 MBs only)
        self.mb_is_i4 = {}  # (mbx, mby) -> bool
        self.bmv = {}       # (bx, by) 4x4 units -> (mvx, mvy) quarter-pel
        self.bref = {}      # (bx, by) -> refIdx (0) or -1 for intra

    def nc(self, m, bx, by):
        a = m.get((bx - 1, by)) if bx > 0 else None
        b = m.get((bx, by - 1)) if by > 0 else None
        if a is not None and b is not None:
            return (a + b + 1) >> 1
        if a is not None:
            return a
        if b is not None:
            return b
        return 0

    def pred_i4_mode(self, bx, by):
        def neighbour(nbx, nby):
            if nbx < 0 or nby < 0:
                return 2
            if not self.mb_is_i4.get((nbx >> 2, nby >> 2), False):
                return 2
            return self.i4_modes.get((nbx, nby), 2)
        return min(neighbour(bx - 1, by), neighbour(bx, by - 1))


def zigzag_of(block):
    flat = [block[i >> 2][i & 3] for i in range(16)]
    return [flat[ZIGZAG[i]] for i in range(16)]


def unzigzag_to(block, scan):
    for i, v in enumerate(scan):
        block[ZIGZAG[i] >> 2][ZIGZAG[i] & 3] = v


# --------------------------------------------------------------- encoder

class Encoder:
    """Baseline I-frame encoder. `policy(mbx, mby, frame_idx)` returns
    ("I4", [mode prefs], chroma_prefs) | ("I16", [mode prefs], chroma_prefs)
    | ("PCM",); preference lists are filtered by availability, first
    available wins (no RD — fixtures want MODE COVERAGE, not quality)."""

    def __init__(self, width, height, qp_init=28, chroma_qp_offset=0,
                 num_ref_frames=0, weighted_pred=False):
        assert width % 2 == 0 and height % 2 == 0
        self.w, self.h = width, height
        self.num_ref_frames = num_ref_frames
        self.weighted_pred = weighted_pred
        self.mb_w = (width + 15) // 16
        self.mb_h = (height + 15) // 16
        self.qp_init = qp_init
        self.cqo = chroma_qp_offset
        self.coverage = set()  # (table, key) pairs the stream exercised

    def sps(self):
        w = BitWriter()
        w.u(8, 66)      # profile_idc: baseline
        w.u(8, 0xC0)    # constraint_set0/1, reserved zeros
        w.u(8, 20)      # level_idc 2.0
        w.ue(0)         # sps_id
        w.ue(0)         # log2_max_frame_num_minus4
        w.ue(2)         # pic_order_cnt_type
        w.ue(self.num_ref_frames)  # max_num_ref_frames
        w.u(1, 0)       # gaps_in_frame_num_value_allowed
        w.ue(self.mb_w - 1)
        w.ue(self.mb_h - 1)
        w.u(1, 1)       # frame_mbs_only
        w.u(1, 1)       # direct_8x8_inference
        crop_r = (self.mb_w * 16 - self.w) // 2
        crop_b = (self.mb_h * 16 - self.h) // 2
        if crop_r or crop_b:
            w.u(1, 1)
            w.ue(0); w.ue(crop_r); w.ue(0); w.ue(crop_b)
        else:
            w.u(1, 0)
        w.u(1, 0)       # vui_parameters_present
        w.rbsp_trailing()
        return rbsp_to_nal(w.to_bytes(), 3, 7)

    def pps(self):
        w = BitWriter()
        w.ue(0)         # pps_id
        w.ue(0)         # sps_id
        w.u(1, 0)       # entropy_coding_mode: CAVLC
        w.u(1, 0)       # bottom_field_pic_order_in_frame_present
        w.ue(0)         # num_slice_groups_minus1
        w.ue(0)         # num_ref_idx_l0_default_active_minus1
        w.ue(0)         # num_ref_idx_l1_default_active_minus1
        w.u(1, 1 if self.weighted_pred else 0)  # weighted_pred_flag
        w.u(2, 0)       # weighted_bipred_idc
        w.se(self.qp_init - 26)  # pic_init_qp_minus26
        w.se(0)         # pic_init_qs_minus26
        w.se(self.cqo)  # chroma_qp_index_offset
        w.u(1, 1)       # deblocking_filter_control_present
        w.u(1, 0)       # constrained_intra_pred
        w.u(1, 0)       # redundant_pic_cnt_present
        w.rbsp_trailing()
        return rbsp_to_nal(w.to_bytes(), 3, 8)

    def encode_frame(self, ysrc, cbsrc, crsrc, policy, frame_idx=0, qp=None):
        """Encode one IDR frame; returns (slice NAL, reconstructed
        FrameState). Sources are full-MB-padded planes (lists of rows)."""
        qp = self.qp_init if qp is None else qp
        st = FrameState(self.mb_w, self.mb_h)
        w = BitWriter()
        w.ue(0)                    # first_mb_in_slice
        w.ue(7)                    # slice_type: I (all)
        w.ue(0)                    # pps_id
        w.u(4, 0)                  # frame_num (log2_max_frame_num = 4)
        w.ue(frame_idx & 0xFFFF)   # idr_pic_id
        w.u(1, 0)                  # no_output_of_prior_pics
        w.u(1, 0)                  # long_term_reference_flag
        w.se(qp - self.qp_init)    # slice_qp_delta
        w.ue(1)                    # disable_deblocking_filter_idc
        cur_qp = qp
        for mby in range(self.mb_h):
            for mbx in range(self.mb_w):
                cur_qp = self._encode_mb(w, st, ysrc, cbsrc, crsrc,
                                         mbx, mby, policy, frame_idx, cur_qp)
        w.rbsp_trailing()
        return rbsp_to_nal(w.to_bytes(), 3, 5), st

    # ---- helpers

    def _first_available(self, prefs, avail):
        for m in prefs:
            if m in avail:
                return m
        return 2  # DC is always available

    def _encode_mb(self, w, st, ysrc, cbsrc, crsrc, mbx, mby, policy,
                   frame_idx, cur_qp, mb_type_offset=0):
        kind = policy(mbx, mby, frame_idx)
        x0, y0 = mbx * 16, mby * 16
        left_ok, above_ok = mbx > 0, mby > 0
        record_blocks(st, mbx * 4, mby * 4, 4, 4, -1, None)  # intra
        if kind[0] == "PCM":
            w.ue(25 + mb_type_offset)
            w.byte_align_zero()
            for yy in range(16):
                for xx in range(16):
                    v = ysrc[y0 + yy][x0 + xx]
                    w.u(8, v)
                    st.y[y0 + yy][x0 + xx] = v
            for plane, src in ((st.cb, cbsrc), (st.cr, crsrc)):
                for yy in range(8):
                    for xx in range(8):
                        v = src[mby * 8 + yy][mbx * 8 + xx]
                        w.u(8, v)
                        plane[mby * 8 + yy][mbx * 8 + xx] = v
            for by in range(4):
                for bx in range(4):
                    st.nnz_y[(mbx * 4 + bx, mby * 4 + by)] = 16
            for by in range(2):
                for bx in range(2):
                    st.nnz_cb[(mbx * 2 + bx, mby * 2 + by)] = 16
                    st.nnz_cr[(mbx * 2 + bx, mby * 2 + by)] = 16
            st.mb_is_i4[(mbx, mby)] = False
            self.coverage.add(("mbtype", "PCM"))
            return cur_qp  # QP tracking unchanged across PCM

        desired_qp = kind[3] if len(kind) > 3 and kind[3] is not None else cur_qp
        qpc = chroma_qp(desired_qp, self.cqo)

        # chroma prediction mode (shared by I4/I16 paths)
        cavail = {0}
        if left_ok:
            cavail.add(1)
        if above_ok:
            cavail.add(2)
        if left_ok and above_ok:
            cavail.add(3)
        cmode = self._first_available(kind[2], cavail)

        if kind[0] == "I16":
            avail = {2}
            if above_ok:
                avail.add(0)
            if left_ok:
                avail.add(1)
            if left_ok and above_ok:
                avail.add(3)
            pmode = self._first_available(kind[1], avail)
            pred = pred16x16(pmode, st.y, self.mb_w * 16, self.mb_h * 16, x0, y0)
            # transform: per-4x4 DCT, Hadamard over the DC matrix
            acs = [None] * 16   # zigzag[1..15] levels per block (raster idx)
            dcm = [[0] * 4 for _ in range(4)]
            for by in range(4):
                for bx in range(4):
                    resid = [[ysrc[y0 + by * 4 + i][x0 + bx * 4 + j] -
                              pred[by * 4 + i][bx * 4 + j]
                              for j in range(4)] for i in range(4)]
                    cf = fwd4x4(resid)
                    dcm[by][bx] = cf[0][0]
                    scan = zigzag_of(cf)[1:]
                    acs[by * 4 + bx] = [
                        quant_level(v, desired_qp, pos_class(ZIGZAG[i + 1]))
                        for i, v in enumerate(scan)]
            dch = hadamard4(dcm)
            dclv = [[quant_level(dch[i][j] >> 1, desired_qp, 0, dc=False)
                     for j in range(4)] for i in range(4)]
            # DC quant: spec encoders use (|W|MF00 + 2f) >> (qbits+1) on the
            # unscaled Hadamard output; halving first + normal quant is NOT
            # identical — use the proper form:
            dclv = [[quant_level(dch[i][j], desired_qp, 0, dc=True)
                     for j in range(4)] for i in range(4)]
            cbp_luma15 = any(any(v for v in b) for b in acs)
            cdc, cac, cbp_chroma = self._chroma_levels(
                st, cbsrc, crsrc, mbx, mby, cmode, qpc)
            mb_type = 1 + pmode + 4 * cbp_chroma + 12 * (1 if cbp_luma15 else 0)
            w.ue(mb_type + mb_type_offset)
            w.ue(cmode)
            w.se(desired_qp - cur_qp)
            new_qp = desired_qp
            # Intra16x16DCLevel: nC as for luma 4x4 block 0
            dscan = zigzag_of(dch)  # positions only; re-map levels below
            dlev = zigzag_of([[dclv[i][j] for j in range(4)] for i in range(4)])
            nc = st.nc(st.nnz_y, mbx * 4, mby * 4)
            self.coverage.add(("ct", nc_class(nc)))
            cavlc_encode_block(w, dlev, nc, 16)
            # reconstruct DC chain
            dcrec = hadamard4([[dclv[i][j] for j in range(4)] for i in range(4)])
            dcval = [[dequant_luma_dc(dcrec[i][j], desired_qp) for j in range(4)]
                     for i in range(4)]
            nnz_store = {}
            if cbp_luma15:
                for z in range(16):
                    r = ZSCAN4[z]
                    bx, by = r & 3, r >> 2
                    nc = st.nc(st.nnz_y, mbx * 4 + bx, mby * 4 + by)
                    self.coverage.add(("ct", nc_class(nc)))
                    tc = cavlc_encode_block(w, acs[r], nc, 15)
                    st.nnz_y[(mbx * 4 + bx, mby * 4 + by)] = tc
            else:
                for r in range(16):
                    st.nnz_y[(mbx * 4 + (r & 3), mby * 4 + (r >> 2))] = 0
            # reconstruct luma
            for by in range(4):
                for bx in range(4):
                    coef = [[0] * 4 for _ in range(4)]
                    unzigzag_to(coef, [0] + (acs[by * 4 + bx] if cbp_luma15
                                             else [0] * 15))
                    for i in range(4):
                        for j in range(4):
                            if i == 0 and j == 0:
                                continue
                            coef[i][j] = dequant_ac(coef[i][j], desired_qp,
                                                    i * 4 + j)
                    coef[0][0] = dcval[by][bx]
                    r4 = inv4x4(coef)
                    for i in range(4):
                        for j in range(4):
                            st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = clip255(
                                pred[by * 4 + i][bx * 4 + j] + r4[i][j])
            st.mb_is_i4[(mbx, mby)] = False
            self.coverage.add(("mbtype", f"I16_{pmode}_{cbp_chroma}_{cbp_luma15}"))
            self._write_chroma(w, st, mbx, mby, cdc, cac, cbp_chroma, qpc,
                               cmode)
            return new_qp

        # ---- I_4x4
        assert kind[0] == "I4"
        modes = [0] * 16
        levels = [None] * 16
        preds = [None] * 16
        # per-block pipeline in z-scan order (prediction needs recon)
        mbW = self.mb_w
        for z in range(16):
            r = ZSCAN4[z]
            bx, by = r & 3, r >> 2
            fbx, fby = mbx * 4 + bx, mby * 4 + by
            px, py = fbx * 4, fby * 4
            avail = {2}
            if py > 0:
                avail.update((0, 3, 7))
            if px > 0:
                avail.update((1, 8))
            if px > 0 and py > 0:
                avail.update((4, 5, 6))
            mode = self._first_available(kind[1](z) if callable(kind[1])
                                         else kind[1], avail)
            ar = above_right_available(fbx, fby, mbW)
            pr = pred4x4(mode, st.y, mbW * 16, self.mb_h * 16, px, py, ar)
            resid = [[ysrc[py + i][px + j] - pr[i][j] for j in range(4)]
                     for i in range(4)]
            cf = fwd4x4(resid)
            scan = zigzag_of(cf)
            lv = [quant_level(v, desired_qp, pos_class(ZIGZAG[i]))
                  for i, v in enumerate(scan)]
            modes[r], levels[r], preds[r] = mode, lv, pr
            # reconstruct NOW (later blocks in this MB predict from it)
            coef = [[0] * 4 for _ in range(4)]
            unzigzag_to(coef, lv)
            for i in range(4):
                for j in range(4):
                    coef[i][j] = dequant_ac(coef[i][j], desired_qp, i * 4 + j)
            r4 = inv4x4(coef)
            for i in range(4):
                for j in range(4):
                    st.y[py + i][px + j] = clip255(pr[i][j] + r4[i][j])
            st.i4_modes[(fbx, fby)] = mode
        st.mb_is_i4[(mbx, mby)] = True  # set BEFORE mode prediction? no:
        # mode prediction looks at NEIGHBOUR blocks only, and blocks of
        # this MB consult i4_modes directly during the syntax pass below.

        cbp_luma = 0
        for e in range(4):
            blocks = [levels[r] for r in (ZSCAN4[4 * e + k] for k in range(4))]
            if any(any(b) for b in blocks):
                cbp_luma |= 1 << e
        cdc, cac, cbp_chroma = self._chroma_levels(
            st, cbsrc, crsrc, mbx, mby, cmode, qpc)
        cbp = cbp_luma | (cbp_chroma << 4)
        w.ue(mb_type_offset)  # mb_type I_NxN
        # prediction-mode signalling needs mb_is_i4 of THIS MB True already
        for z in range(16):
            r = ZSCAN4[z]
            fbx, fby = mbx * 4 + (r & 3), mby * 4 + (r >> 2)
            pm = st.pred_i4_mode(fbx, fby)
            if modes[r] == pm:
                w.u(1, 1)
            else:
                w.u(1, 0)
                w.u(3, modes[r] - (1 if modes[r] > pm else 0))
        w.ue(cmode)
        w.ue(CBP_INTRA_INV[cbp])
        self.coverage.add(("cbp", cbp))
        new_qp = cur_qp
        if cbp != 0:
            w.se(desired_qp - cur_qp)
            new_qp = desired_qp
        # residuals: luma z-scan for coded 8x8s; nnz bookkeeping either way
        for z in range(16):
            r = ZSCAN4[z]
            fbx, fby = mbx * 4 + (r & 3), mby * 4 + (r >> 2)
            if cbp_luma & (1 << (z // 4)):
                nc = st.nc(st.nnz_y, fbx, fby)
                self.coverage.add(("ct", nc_class(nc)))
                tc = cavlc_encode_block(w, levels[r], nc, 16)
                st.nnz_y[(fbx, fby)] = tc
            else:
                st.nnz_y[(fbx, fby)] = 0
                # skipped residual: recon above already added zero resid?
                # levels[r] may be nonzero ONLY in coded 8x8s: enforce
                assert not any(levels[r]), "cbp excludes a nonzero block"
        self.coverage.add(("mbtype", "I4"))
        self._write_chroma(w, st, mbx, mby, cdc, cac, cbp_chroma, qpc, cmode)
        return new_qp

    # ---- P slices (single-ref 16x16 regime: P_L0_16x16 + P_Skip +
    # intra-in-P; no 16x8/8x16/8x8 partitions, no weighted prediction)

    def encode_frame_p(self, ysrc, cbsrc, crsrc, ref, policy, frame_idx,
                       qp=None, n_active=None, weights=None):
        """Encode one P frame against `ref`: a FrameState (single-ref) or
        a LIST of FrameStates, list0 order (most recent first — the DPB).
        With n_active > 1 every inter kind may carry a trailing ref index.
        policy(mbx, mby, frame_idx) returns ("SKIP",) |
        ("P16", mv, qp|None[, ref]) | ("P16x8"/"P8x16", (mv0, mv1),
        qp|None[, (r0, r1)]) | ("P8x8", subs, qp|None[, (r0..r3)]) | the
        intra kinds of encode_frame. Returns (slice NAL, FrameState)."""
        refs = ref if isinstance(ref, list) else [ref]
        n_active = 1 if n_active is None else n_active
        assert 1 <= n_active <= len(refs)
        self._refs = refs
        self._n_active = n_active
        qp = self.qp_init if qp is None else qp
        st = FrameState(self.mb_w, self.mb_h)
        w = BitWriter()
        w.ue(0)                  # first_mb_in_slice
        w.ue(5)                  # slice_type: P (all slices of picture)
        w.ue(0)                  # pps_id
        w.u(4, frame_idx & 15)   # frame_num (log2_max_frame_num = 4)
        if n_active == 1:
            w.u(1, 0)            # num_ref_idx_active_override_flag
        else:
            w.u(1, 1)            # override: more than the PPS default (1)
            w.ue(n_active - 1)
        w.u(1, 0)                # ref_pic_list_modification_flag_l0
        if self.weighted_pred:
            # pred_weight_table: weights = (lwd_y, lwd_c, [per-ref entry])
            # entry = None (defaults) or (lw, lo, cwb, cob, cwr, cor)
            lwd_y, lwd_c, per_ref = weights
            self._wp = (lwd_y, lwd_c, [
                e if e is not None else
                (1 << lwd_y, 0, 1 << lwd_c, 0, 1 << lwd_c, 0)
                for e in per_ref])
            w.ue(lwd_y)
            w.ue(lwd_c)
            for e in per_ref[:n_active]:
                if e is None:
                    w.u(1, 0)  # luma_weight_l0_flag
                    w.u(1, 0)  # chroma_weight_l0_flag
                else:
                    lw, lo, cwb, cob, cwr, cor = e
                    w.u(1, 1)
                    w.se(lw)
                    w.se(lo)
                    w.u(1, 1)
                    w.se(cwb); w.se(cob)
                    w.se(cwr); w.se(cor)
        else:
            self._wp = None
        w.u(1, 0)                # adaptive_ref_pic_marking_mode_flag
        w.se(qp - self.qp_init)  # slice_qp_delta
        w.ue(1)                  # disable_deblocking_filter_idc
        cur_qp = qp
        run = 0
        for mby in range(self.mb_h):
            for mbx in range(self.mb_w):
                kind = policy(mbx, mby, frame_idx)
                if kind[0] == "SKIP":
                    self._recon_skip(st, ref, mbx, mby)
                    run += 1
                    self.coverage.add(("mbtype", "P_Skip"))
                    continue
                w.ue(run)        # mb_skip_run before each coded MB
                run = 0
                if kind[0] == "P16":
                    cur_qp = self._encode_mb_p16(w, st, ref, ysrc, cbsrc,
                                                 crsrc, mbx, mby, kind,
                                                 cur_qp)
                elif kind[0] in ("P16x8", "P8x16"):
                    cur_qp = self._encode_mb_part(w, st, ref, ysrc, cbsrc,
                                                  crsrc, mbx, mby, kind,
                                                  cur_qp)
                elif kind[0] == "P8x8":
                    cur_qp = self._encode_mb_p8x8(w, st, ref, ysrc, cbsrc,
                                                  crsrc, mbx, mby, kind,
                                                  cur_qp)
                else:            # intra in a P slice: mb_type offset +5
                    cur_qp = self._encode_mb(w, st, ysrc, cbsrc, crsrc,
                                             mbx, mby, lambda *a: kind,
                                             frame_idx, cur_qp,
                                             mb_type_offset=5)
        if run:
            w.ue(run)            # trailing skip run
        w.rbsp_trailing()
        return rbsp_to_nal(w.to_bytes(), 2, 1), st

    def _recon_skip(self, st, ref, mbx, mby):
        """P_Skip: motion from skip_mv, zero residual, recon = MC against
        refIdx 0 (the most recent reference)."""
        ref = self._refs[0]
        mv = skip_mv(st, mbx, mby)
        x0, y0 = mbx * 16, mby * 16
        W, H = self.mb_w * 16, self.mb_h * 16
        pred = mc_luma(ref.y, W, H, x0, y0, mv[0], mv[1])
        if self._wp is not None:
            pred = apply_wp(pred, *wp_luma(self._wp, 0))
        for i in range(16):
            for j in range(16):
                st.y[y0 + i][x0 + j] = pred[i][j]
        for comp, (plane, refp) in enumerate(((st.cb, ref.cb),
                                              (st.cr, ref.cr))):
            pr = mc_chroma(refp, W // 2, H // 2, mbx * 8, mby * 8,
                           mv[0], mv[1])
            if self._wp is not None:
                pr = apply_wp(pr, *wp_chroma(self._wp, 0, comp))
            for i in range(8):
                for j in range(8):
                    plane[mby * 8 + i][mbx * 8 + j] = pr[i][j]
        for by in range(4):
            for bx in range(4):
                st.nnz_y[(mbx * 4 + bx, mby * 4 + by)] = 0
        for by in range(2):
            for bx in range(2):
                st.nnz_cb[(mbx * 2 + bx, mby * 2 + by)] = 0
                st.nnz_cr[(mbx * 2 + bx, mby * 2 + by)] = 0
        st.mb_is_i4[(mbx, mby)] = False
        record_blocks(st, mbx * 4, mby * 4, 4, 4, 0, mv)

    def _encode_mb_p16(self, w, st, ref, ysrc, cbsrc, crsrc, mbx, mby,
                       kind, cur_qp):
        mvx, mvy = kind[1]
        desired_qp = kind[2] if len(kind) > 2 and kind[2] is not None \
            else cur_qp
        ref_i = kind[3] if len(kind) > 3 else 0
        ref = self._refs[ref_i]
        x0, y0 = mbx * 16, mby * 16
        W, H = self.mb_w * 16, self.mb_h * 16
        w.ue(0)  # mb_type P_L0_16x16
        if self._n_active > 1:
            w.te(ref_i, self._n_active - 1)
        mvp = mvp_part(st, mbx * 4, mby * 4, 4, ref_i)
        record_blocks(st, mbx * 4, mby * 4, 4, 4, ref_i, (mvx, mvy))
        w.se(mvx - mvp[0])
        w.se(mvy - mvp[1])
        pred = mc_luma(ref.y, W, H, x0, y0, mvx, mvy)
        pred_cb = mc_chroma(ref.cb, W // 2, H // 2, mbx * 8, mby * 8,
                            mvx, mvy)
        pred_cr = mc_chroma(ref.cr, W // 2, H // 2, mbx * 8, mby * 8,
                            mvx, mvy)
        if self._wp is not None:
            pred = apply_wp(pred, *wp_luma(self._wp, ref_i))
            pred_cb = apply_wp(pred_cb, *wp_chroma(self._wp, ref_i, 0))
            pred_cr = apply_wp(pred_cr, *wp_chroma(self._wp, ref_i, 1))
        self.coverage.add(("mbtype", "P16"))
        if ref_i > 0:
            self.coverage.add(("ref", ref_i))
        return self._inter_tail(w, st, ysrc, cbsrc, crsrc, mbx, mby,
                                pred, pred_cb, pred_cr, desired_qp, cur_qp)

    def _encode_mb_part(self, w, st, ref, ysrc, cbsrc, crsrc, mbx, mby,
                        kind, cur_qp):
        """P_L0_L0_16x8 (mb_type 1) / P_L0_L0_8x16 (mb_type 2): two
        partitions with their own motion (directional MVP shortcuts);
        residual coding stays MB-level."""
        vertical = kind[0] == "P8x16"
        mvs = kind[1]  # ((mvx0, mvy0), (mvx1, mvy1))
        desired_qp = kind[2] if len(kind) > 2 and kind[2] is not None \
            else cur_qp
        part_refs = kind[3] if len(kind) > 3 else (0, 0)
        x0, y0 = mbx * 16, mby * 16
        W, H = self.mb_w * 16, self.mb_h * 16
        w.ue(2 if vertical else 1)  # mb_type
        # mb_pred order (7.3.5.1): ALL ref_idx fields, then ALL mvds
        if self._n_active > 1:
            for part in (0, 1):
                w.te(part_refs[part], self._n_active - 1)
        pred = [[0] * 16 for _ in range(16)]
        pred_cb = [[0] * 8 for _ in range(8)]
        pred_cr = [[0] * 8 for _ in range(8)]
        for part in (0, 1):
            mv = mvs[part]
            ref_i = part_refs[part]
            ref = self._refs[ref_i]
            if ref_i > 0:
                self.coverage.add(("ref", ref_i))
            if vertical:
                px0, py0, bw, bh = x0 + 8 * part, y0, 8, 16
                x0b, y0b, wb, hb = mbx * 4 + 2 * part, mby * 4, 2, 4
                mvp = mvp_8x16(st, mbx, mby, part, ref_i)
            else:
                px0, py0, bw, bh = x0, y0 + 8 * part, 16, 8
                x0b, y0b, wb, hb = mbx * 4, mby * 4 + 2 * part, 4, 2
                mvp = mvp_16x8(st, mbx, mby, part, ref_i)
            w.se(mv[0] - mvp[0])
            w.se(mv[1] - mvp[1])
            # record BEFORE the next partition predicts (it is a neighbour)
            record_blocks(st, x0b, y0b, wb, hb, ref_i, mv)
            pl = mc_luma(ref.y, W, H, px0, py0, mv[0], mv[1], bw, bh)
            if self._wp is not None:
                pl = apply_wp(pl, *wp_luma(self._wp, ref_i))
            for i in range(bh):
                for j in range(bw):
                    pred[py0 - y0 + i][px0 - x0 + j] = pl[i][j]
            pc = mc_chroma(ref.cb, W // 2, H // 2, px0 // 2, py0 // 2,
                           mv[0], mv[1], bw // 2, bh // 2)
            pr_ = mc_chroma(ref.cr, W // 2, H // 2, px0 // 2, py0 // 2,
                            mv[0], mv[1], bw // 2, bh // 2)
            if self._wp is not None:
                pc = apply_wp(pc, *wp_chroma(self._wp, ref_i, 0))
                pr_ = apply_wp(pr_, *wp_chroma(self._wp, ref_i, 1))
            for i in range(bh // 2):
                for j in range(bw // 2):
                    pred_cb[(py0 - y0) // 2 + i][(px0 - x0) // 2 + j] = pc[i][j]
                    pred_cr[(py0 - y0) // 2 + i][(px0 - x0) // 2 + j] = pr_[i][j]
        self.coverage.add(("mbtype", kind[0]))
        return self._inter_tail(w, st, ysrc, cbsrc, crsrc, mbx, mby,
                                pred, pred_cb, pred_cr, desired_qp, cur_qp)

    def _encode_mb_p8x8(self, w, st, ref, ysrc, cbsrc, crsrc, mbx, mby,
                        kind, cur_qp):
        """P_8x8 (mb_type 3): per-8x8 sub_mb_type in {8x8, 8x4, 4x8, 4x4},
        every sub-partition with its own motion. Syntax order: all four
        sub_mb_types FIRST, then the mvds in 8x8 z-order / sub-part
        order. MVP is the generic per-partition median (no directional
        shortcuts below 16x8). kind = ("P8x8", [(sub_type, [mvs...])]*4,
        qp|None)."""
        subs = kind[1]
        desired_qp = kind[2] if len(kind) > 2 and kind[2] is not None \
            else cur_qp
        e_refs = kind[3] if len(kind) > 3 else (0, 0, 0, 0)
        x0, y0 = mbx * 16, mby * 16
        W, H = self.mb_w * 16, self.mb_h * 16
        w.ue(3)  # mb_type P_8x8
        for e in range(4):
            w.ue(subs[e][0])
        # sub_mb_pred order: all sub types, then all ref_idx, then mvds
        if self._n_active > 1:
            for e in range(4):
                w.te(e_refs[e], self._n_active - 1)
        pred = [[0] * 16 for _ in range(16)]
        pred_cb = [[0] * 8 for _ in range(8)]
        pred_cr = [[0] * 8 for _ in range(8)]
        for e in range(4):
            x8, y8 = 8 * (e & 1), 8 * (e >> 1)
            ref_i = e_refs[e]
            ref = self._refs[ref_i]
            if ref_i > 0:
                self.coverage.add(("ref", ref_i))
            for k, (dx, dy, pw, ph) in enumerate(sub_parts(subs[e][0])):
                mv = subs[e][1][k]
                x0b = mbx * 4 + (x8 + dx) // 4
                y0b = mby * 4 + (y8 + dy) // 4
                wb, hb = pw // 4, ph // 4
                mvp = mvp_part(st, x0b, y0b, wb, ref_i)
                w.se(mv[0] - mvp[0])
                w.se(mv[1] - mvp[1])
                record_blocks(st, x0b, y0b, wb, hb, ref_i, mv)
                pl = mc_luma(ref.y, W, H, x0 + x8 + dx, y0 + y8 + dy,
                             mv[0], mv[1], pw, ph)
                if self._wp is not None:
                    pl = apply_wp(pl, *wp_luma(self._wp, ref_i))
                for i in range(ph):
                    for j in range(pw):
                        pred[y8 + dy + i][x8 + dx + j] = pl[i][j]
                pc = mc_chroma(ref.cb, W // 2, H // 2, (x0 + x8 + dx) // 2,
                               (y0 + y8 + dy) // 2, mv[0], mv[1],
                               pw // 2, ph // 2)
                pr_ = mc_chroma(ref.cr, W // 2, H // 2, (x0 + x8 + dx) // 2,
                                (y0 + y8 + dy) // 2, mv[0], mv[1],
                                pw // 2, ph // 2)
                if self._wp is not None:
                    pc = apply_wp(pc, *wp_chroma(self._wp, ref_i, 0))
                    pr_ = apply_wp(pr_, *wp_chroma(self._wp, ref_i, 1))
                for i in range(ph // 2):
                    for j in range(pw // 2):
                        pred_cb[(y8 + dy) // 2 + i][(x8 + dx) // 2 + j] = pc[i][j]
                        pred_cr[(y8 + dy) // 2 + i][(x8 + dx) // 2 + j] = pr_[i][j]
        self.coverage.add(("mbtype", "P8x8"))
        for e in range(4):
            self.coverage.add(("sub", subs[e][0]))
        return self._inter_tail(w, st, ysrc, cbsrc, crsrc, mbx, mby,
                                pred, pred_cb, pred_cr, desired_qp, cur_qp)

    def _inter_tail(self, w, st, ysrc, cbsrc, crsrc, mbx, mby, pred,
                    pred_cb, pred_cr, desired_qp, cur_qp):
        """Shared inter-MB residual pipeline: quantize luma against `pred`
        and chroma against pred_cb/pred_cr, emit cbp + qp delta +
        residuals, reconstruct. Caller already wrote mb_type + mvds and
        recorded the partition motion."""
        qpc = chroma_qp(desired_qp, self.cqo)
        x0, y0 = mbx * 16, mby * 16
        levels = [None] * 16  # raster index
        for by in range(4):
            for bx in range(4):
                resid = [[ysrc[y0 + by * 4 + i][x0 + bx * 4 + j] -
                          pred[by * 4 + i][bx * 4 + j] for j in range(4)]
                         for i in range(4)]
                cf = fwd4x4(resid)
                scan = zigzag_of(cf)
                levels[by * 4 + bx] = [
                    quant_level(v, desired_qp, pos_class(ZIGZAG[i]))
                    for i, v in enumerate(scan)]
        cbp_luma = 0
        for e in range(4):
            if any(any(levels[r]) for r in (ZSCAN4[4 * e + k]
                                            for k in range(4))):
                cbp_luma |= 1 << e
        cdc, cac, cbp_chroma = self._chroma_levels_pred(
            st, cbsrc, crsrc, mbx, mby, pred_cb, pred_cr, qpc)
        cbp = cbp_luma | (cbp_chroma << 4)
        w.ue(CBP_INTER_INV[cbp])
        self.coverage.add(("cbp_inter", cbp))
        new_qp = cur_qp
        if cbp != 0:
            w.se(desired_qp - cur_qp)
            new_qp = desired_qp
        for z in range(16):
            r = ZSCAN4[z]
            fbx, fby = mbx * 4 + (r & 3), mby * 4 + (r >> 2)
            if cbp_luma & (1 << (z // 4)):
                nc = st.nc(st.nnz_y, fbx, fby)
                self.coverage.add(("ct", nc_class(nc)))
                tc = cavlc_encode_block(w, levels[r], nc, 16)
                st.nnz_y[(fbx, fby)] = tc
            else:
                st.nnz_y[(fbx, fby)] = 0
                assert not any(levels[r])
        for by in range(4):
            for bx in range(4):
                coef = [[0] * 4 for _ in range(4)]
                unzigzag_to(coef, levels[by * 4 + bx])
                for i in range(4):
                    for j in range(4):
                        coef[i][j] = dequant_ac(coef[i][j], new_qp,
                                                i * 4 + j)
                r4 = inv4x4(coef)
                for i in range(4):
                    for j in range(4):
                        st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = clip255(
                            pred[by * 4 + i][bx * 4 + j] + r4[i][j])
        st.mb_is_i4[(mbx, mby)] = False
        self._write_chroma(w, st, mbx, mby, cdc, cac, cbp_chroma, qpc,
                           None)
        return new_qp

    def _chroma_levels_pred(self, st, cbsrc, crsrc, mbx, mby, pcb, pcr,
                            qpc):
        """_chroma_levels with an EXPLICIT prediction (inter MC) instead
        of intra mode prediction; transform/quant/recon identical."""
        cdc, cac = [], []
        for comp, (plane, src, pr) in enumerate(
                ((st.cb, cbsrc, pcb), (st.cr, crsrc, pcr))):
            x0, y0 = mbx * 8, mby * 8
            dcm = [[0, 0], [0, 0]]
            acl = []
            for sy in (0, 1):
                for sx in (0, 1):
                    resid = [[src[y0 + sy * 4 + i][x0 + sx * 4 + j] -
                              pr[sy * 4 + i][sx * 4 + j] for j in range(4)]
                             for i in range(4)]
                    cf = fwd4x4(resid)
                    dcm[sy][sx] = cf[0][0]
                    scan = zigzag_of(cf)[1:]
                    acl.append([quant_level(v, qpc, pos_class(ZIGZAG[i + 1]))
                                for i, v in enumerate(scan)])
            dch = hadamard2(dcm)
            cdc.append([quant_level(dch[0][0], qpc, 0, dc=True),
                        quant_level(dch[0][1], qpc, 0, dc=True),
                        quant_level(dch[1][0], qpc, 0, dc=True),
                        quant_level(dch[1][1], qpc, 0, dc=True)])
            cac.append(acl)
        any_ac = any(any(b) for comp in cac for b in comp)
        any_dc = any(v for comp in cdc for v in comp)
        cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
        for comp, (plane, pr) in enumerate(((st.cb, pcb), (st.cr, pcr))):
            x0, y0 = mbx * 8, mby * 8
            dcl = cdc[comp]
            dcr = hadamard2([[dcl[0], dcl[1]], [dcl[2], dcl[3]]])
            for sy in (0, 1):
                for sx in (0, 1):
                    coef = [[0] * 4 for _ in range(4)]
                    if cbp_chroma == 2:
                        unzigzag_to(coef, [0] + cac[comp][sy * 2 + sx])
                        for i in range(4):
                            for j in range(4):
                                if i or j:
                                    coef[i][j] = dequant_ac(
                                        coef[i][j], qpc, i * 4 + j)
                    if cbp_chroma >= 1:
                        coef[0][0] = dequant_chroma_dc(dcr[sy][sx], qpc)
                    r4 = inv4x4(coef)
                    for i in range(4):
                        for j in range(4):
                            plane[y0 + sy * 4 + i][x0 + sx * 4 + j] = \
                                clip255(pr[sy * 4 + i][sx * 4 + j] +
                                        r4[i][j])
        return cdc, cac, cbp_chroma

    def _chroma_levels(self, st, cbsrc, crsrc, mbx, mby, cmode, qpc):
        """Predict + transform chroma; returns (dc levels per comp, ac
        levels per comp, cbp_chroma). Also reconstructs into st."""
        cdc, cac = [], []
        for comp, (plane, src) in enumerate(((st.cb, cbsrc), (st.cr, crsrc))):
            x0, y0 = mbx * 8, mby * 8
            pr = pred_chroma(cmode, plane, self.mb_w * 8, self.mb_h * 8, x0, y0)
            dcm = [[0, 0], [0, 0]]
            acl = []
            cfs = []
            for sy in (0, 1):
                for sx in (0, 1):
                    resid = [[src[y0 + sy * 4 + i][x0 + sx * 4 + j] -
                              pr[sy * 4 + i][sx * 4 + j] for j in range(4)]
                             for i in range(4)]
                    cf = fwd4x4(resid)
                    dcm[sy][sx] = cf[0][0]
                    cfs.append(cf)
                    scan = zigzag_of(cf)[1:]
                    acl.append([quant_level(v, qpc, pos_class(ZIGZAG[i + 1]))
                                for i, v in enumerate(scan)])
            dch = hadamard2(dcm)
            dcl = [quant_level(dch[0][0], qpc, 0, dc=True),
                   quant_level(dch[0][1], qpc, 0, dc=True),
                   quant_level(dch[1][0], qpc, 0, dc=True),
                   quant_level(dch[1][1], qpc, 0, dc=True)]
            cdc.append(dcl)
            cac.append(acl)
        any_ac = any(any(b) for comp in cac for b in comp)
        any_dc = any(v for comp in cdc for v in comp)
        cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
        # reconstruct chroma with exactly what a decoder will see
        for comp, (plane, src) in enumerate(((st.cb, cbsrc), (st.cr, crsrc))):
            x0, y0 = mbx * 8, mby * 8
            pr = pred_chroma(cmode, plane, self.mb_w * 8, self.mb_h * 8, x0, y0)
            dcl = cdc[comp]
            dcr = hadamard2([[dcl[0], dcl[1]], [dcl[2], dcl[3]]])
            for sy in (0, 1):
                for sx in (0, 1):
                    coef = [[0] * 4 for _ in range(4)]
                    if cbp_chroma == 2:
                        unzigzag_to(coef, [0] + cac[comp][sy * 2 + sx])
                        for i in range(4):
                            for j in range(4):
                                if i or j:
                                    coef[i][j] = dequant_ac(coef[i][j], qpc,
                                                            i * 4 + j)
                    if cbp_chroma >= 1:
                        coef[0][0] = dequant_chroma_dc(dcr[sy][sx], qpc)
                    r4 = inv4x4(coef)
                    for i in range(4):
                        for j in range(4):
                            plane[y0 + sy * 4 + i][x0 + sx * 4 + j] = clip255(
                                pr[sy * 4 + i][sx * 4 + j] + r4[i][j])
        return cdc, cac, cbp_chroma

    def _write_chroma(self, w, st, mbx, mby, cdc, cac, cbp_chroma, qpc, cmode):
        if cbp_chroma >= 1:
            for comp in (0, 1):
                self.coverage.add(("ct", -1))
                cavlc_encode_block(w, cdc[comp], -1, 4)
        if cbp_chroma == 2:
            for comp, m in ((0, st.nnz_cb), (1, st.nnz_cr)):
                for sy in (0, 1):
                    for sx in (0, 1):
                        cx, cy = mbx * 2 + sx, mby * 2 + sy
                        nc = st.nc(m, cx, cy)
                        self.coverage.add(("ct", nc_class(nc)))
                        tc = cavlc_encode_block(w, cac[comp][sy * 2 + sx],
                                                nc, 15)
                        m[(cx, cy)] = tc
        else:
            for m in (st.nnz_cb, st.nnz_cr):
                for sy in (0, 1):
                    for sx in (0, 1):
                        m[(mbx * 2 + sx, mby * 2 + sy)] = 0


# --------------------------------------------------------------- decoder

class Sps:
    pass


class Pps:
    pass


def parse_sps(rbsp):
    r = BitReader(rbsp)
    s = Sps()
    s.profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    s.level = r.u(8)
    s.id = r.ue()
    if s.profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        s.chroma_format = r.ue()
        assert s.chroma_format == 1, "only 4:2:0"
        r.ue(); r.ue()  # bit depths
        r.u(1)          # qpprime_y_zero_transform_bypass
        assert r.u(1) == 0, "seq_scaling_matrix unsupported"
    s.log2_max_frame_num = r.ue() + 4
    s.poc_type = r.ue()
    if s.poc_type == 0:
        s.log2_max_poc_lsb = r.ue() + 4
    elif s.poc_type == 1:
        r.u(1); r.se(); r.se()
        for _ in range(r.ue()):
            r.se()
    s.max_num_ref_frames = r.ue()
    r.u(1)  # gaps allowed
    s.mb_w = r.ue() + 1
    s.mb_h_units = r.ue() + 1
    s.frame_mbs_only = r.u(1)
    assert s.frame_mbs_only == 1, "interlace unsupported"
    s.mb_h = s.mb_h_units
    r.u(1)  # direct_8x8_inference
    s.crop = (0, 0, 0, 0)
    if r.u(1):
        s.crop = (r.ue(), r.ue(), r.ue(), r.ue())  # l, r, t, b (chroma units)
    s.vui = r.u(1)
    return s


def parse_pps(rbsp):
    r = BitReader(rbsp)
    p = Pps()
    p.id = r.ue()
    p.sps_id = r.ue()
    p.cavlc = r.u(1) == 0
    assert p.cavlc, "CABAC unsupported (baseline is CAVLC)"
    r.u(1)  # bottom_field_pic_order
    assert r.ue() == 0, "slice groups unsupported"
    p.num_ref_l0_default = r.ue() + 1
    r.ue()          # num_ref_idx_l1 default (B only)
    p.weighted_pred = r.u(1) == 1
    r.u(2)          # weighted_bipred
    p.init_qp = 26 + r.se()
    r.se()          # qs
    p.chroma_qp_offset = r.se()
    p.deblock_control = r.u(1)
    assert r.u(1) == 0, "constrained_intra_pred unsupported"
    p.redundant = r.u(1)
    return p


class Decoder:
    """Reference decoder for the fixture subset; mirrors the Scala
    H264Decode operator (the spec compares both against the encoder's
    reconstruction)."""

    def __init__(self):
        self.sps = None
        self.pps = None
        self.frames = []
        self.dpb = []  # decoded reference pictures, most recent FIRST

    def feed_annexb(self, data):
        for nal in split_annexb(data):
            self.feed_nal(nal)
        return self.frames

    def feed_nal(self, nal):
        ntype = nal[0] & 0x1F
        rbsp = nal_to_rbsp(nal)
        if ntype == 7:
            self.sps = parse_sps(rbsp)
        elif ntype == 8:
            self.pps = parse_pps(rbsp)
        elif ntype in (1, 5):
            ref_idc = (nal[0] >> 5) & 3
            self.frames.append(self._decode_slice(rbsp, idr=(ntype == 5),
                                                  ref_idc=ref_idc))
        # other NAL types (SEI, AUD...) are skipped

    def _decode_slice(self, rbsp, idr, ref_idc=3):
        sps, pps = self.sps, self.pps
        assert sps is not None and pps is not None, "slice before SPS/PPS"
        r = BitReader(rbsp)
        assert r.ue() == 0, "multi-slice frames unsupported"
        slice_type = r.ue()
        assert slice_type in (0, 2, 5, 7), "only I/P slices"
        is_p = slice_type in (0, 5)
        assert r.ue() == pps.id
        r.u(sps.log2_max_frame_num)  # frame_num
        if idr:
            r.ue()  # idr_pic_id
        if sps.poc_type == 0:
            r.u(sps.log2_max_poc_lsb)
        if idr:
            self.dpb = []  # IDR resets the decoded picture buffer
        n_active = pps.num_ref_l0_default
        if is_p:
            assert self.dpb, "P slice before any reference"
            if r.u(1):  # num_ref_idx_active_override_flag
                n_active = r.ue() + 1
            assert n_active <= len(self.dpb), "more refs than the DPB holds"
            assert r.u(1) == 0, "ref_pic_list_modification unsupported"
        self._n_active = n_active
        self._wp = None
        if is_p and pps.weighted_pred:
            lwd_y = r.ue()
            lwd_c = r.ue()
            per = []
            for _ in range(n_active):
                lw, lo = 1 << lwd_y, 0
                cwb, cob, cwr, cor = 1 << lwd_c, 0, 1 << lwd_c, 0
                if r.u(1):  # luma_weight_l0_flag
                    lw = r.se()
                    lo = r.se()
                if r.u(1):  # chroma_weight_l0_flag
                    cwb = r.se(); cob = r.se()
                    cwr = r.se(); cor = r.se()
                per.append((lw, lo, cwb, cob, cwr, cor))
            self._wp = (lwd_y, lwd_c, per)
        if ref_idc != 0:
            if idr:
                r.u(1); r.u(1)  # no_output_of_prior / long_term flags
            else:
                assert r.u(1) == 0, "adaptive ref-pic marking unsupported"
        qp = pps.init_qp + r.se()
        if pps.deblock_control:
            idc = r.ue()
            assert idc == 1, "deblocking-enabled streams unsupported"
            # idc == 1: no alpha/beta offsets follow
        st = FrameState(sps.mb_w, sps.mb_h)
        cur_qp = qp
        if is_p:
            total = sps.mb_w * sps.mb_h
            count = 0
            while count < total:
                run = r.ue()
                assert count + run <= total, "mb_skip_run overruns picture"
                for _ in range(run):
                    self._decode_skip(st, sps, count % sps.mb_w,
                                      count // sps.mb_w)
                    count += 1
                if count < total:
                    cur_qp = self._decode_mb_p(r, st, sps, pps,
                                               count % sps.mb_w,
                                               count // sps.mb_w, cur_qp)
                    count += 1
        else:
            for mby in range(sps.mb_h):
                for mbx in range(sps.mb_w):
                    cur_qp = self._decode_mb(r, st, sps, pps, mbx, mby,
                                             cur_qp)
        if ref_idc != 0:
            self.dpb = ([st] + self.dpb)[:max(1, sps.max_num_ref_frames)]
        # crop (4:2:0 -> units of 2 luma samples horizontally/vertically)
        cl, cr_, ct, cb = sps.crop
        W, H = sps.mb_w * 16 - 2 * (cl + cr_), sps.mb_h * 16 - 2 * (ct + cb)
        y = [row[2 * cl:2 * cl + W] for row in st.y[2 * ct:2 * ct + H]]
        cbp = [row[cl:cl + W // 2] for row in st.cb[ct:ct + H // 2]]
        crp = [row[cl:cl + W // 2] for row in st.cr[ct:ct + H // 2]]
        return y, cbp, crp

    def _decode_mb(self, r, st, sps, pps, mbx, mby, cur_qp, mb_type=None):
        if mb_type is None:
            mb_type = r.ue()
        record_blocks(st, mbx * 4, mby * 4, 4, 4, -1, None)  # intra
        x0, y0 = mbx * 16, mby * 16
        if mb_type == 25:  # I_PCM
            r.byte_align()
            for yy in range(16):
                for xx in range(16):
                    st.y[y0 + yy][x0 + xx] = r.u(8)
            for plane in (st.cb, st.cr):
                for yy in range(8):
                    for xx in range(8):
                        plane[mby * 8 + yy][mbx * 8 + xx] = r.u(8)
            for by in range(4):
                for bx in range(4):
                    st.nnz_y[(mbx * 4 + bx, mby * 4 + by)] = 16
            for by in range(2):
                for bx in range(2):
                    st.nnz_cb[(mbx * 2 + bx, mby * 2 + by)] = 16
                    st.nnz_cr[(mbx * 2 + bx, mby * 2 + by)] = 16
            st.mb_is_i4[(mbx, mby)] = False
            return cur_qp
        assert 0 <= mb_type <= 24, f"non-intra mb_type {mb_type} in I slice"

        if mb_type == 0:  # I_NxN = I_4x4 (no 8x8 transform in baseline)
            st.mb_is_i4[(mbx, mby)] = True
            modes = [0] * 16
            for z in range(16):
                rr = ZSCAN4[z]
                fbx, fby = mbx * 4 + (rr & 3), mby * 4 + (rr >> 2)
                pm = st.pred_i4_mode(fbx, fby)
                if r.u(1):
                    modes[rr] = pm
                else:
                    rem = r.u(3)
                    modes[rr] = rem + (1 if rem >= pm else 0)
                st.i4_modes[(fbx, fby)] = modes[rr]
            cmode = r.ue()
            cbp = CBP_INTRA[r.ue()]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            new_qp = cur_qp
            if cbp != 0:
                new_qp = cur_qp + r.se()
            qpc = chroma_qp(new_qp, pps.chroma_qp_offset)
            for z in range(16):
                rr = ZSCAN4[z]
                fbx, fby = mbx * 4 + (rr & 3), mby * 4 + (rr >> 2)
                px, py = fbx * 4, fby * 4
                lv = [0] * 16
                if cbp_luma & (1 << (z // 4)):
                    nc = st.nc(st.nnz_y, fbx, fby)
                    lv, tc = cavlc_decode_block(r, nc, 16)
                    st.nnz_y[(fbx, fby)] = tc
                else:
                    st.nnz_y[(fbx, fby)] = 0
                ar = above_right_available(fbx, fby, sps.mb_w)
                pr = pred4x4(modes[rr], st.y, sps.mb_w * 16, sps.mb_h * 16,
                             px, py, ar)
                coef = [[0] * 4 for _ in range(4)]
                unzigzag_to(coef, lv)
                for i in range(4):
                    for j in range(4):
                        coef[i][j] = dequant_ac(coef[i][j], new_qp, i * 4 + j)
                r4 = inv4x4(coef)
                for i in range(4):
                    for j in range(4):
                        st.y[py + i][px + j] = clip255(pr[i][j] + r4[i][j])
            self._decode_chroma(r, st, sps, pps, mbx, mby, cmode, cbp_chroma,
                                qpc)
            return new_qp

        # I_16x16
        st.mb_is_i4[(mbx, mby)] = False
        pmode = (mb_type - 1) % 4
        cbp_chroma = ((mb_type - 1) // 4) % 3
        cbp_luma15 = (mb_type - 1) >= 12
        cmode = r.ue()
        new_qp = cur_qp + r.se()
        qpc = chroma_qp(new_qp, pps.chroma_qp_offset)
        pred = pred16x16(pmode, st.y, sps.mb_w * 16, sps.mb_h * 16, x0, y0)
        nc = st.nc(st.nnz_y, mbx * 4, mby * 4)
        dlev_scan, _ = cavlc_decode_block(r, nc, 16)
        dmat = [[0] * 4 for _ in range(4)]
        unzigzag_to(dmat, dlev_scan)
        dcrec = hadamard4(dmat)
        dcval = [[dequant_luma_dc(dcrec[i][j], new_qp) for j in range(4)]
                 for i in range(4)]
        acs = [[0] * 15 for _ in range(16)]
        if cbp_luma15:
            for z in range(16):
                rr = ZSCAN4[z]
                fbx, fby = mbx * 4 + (rr & 3), mby * 4 + (rr >> 2)
                nc = st.nc(st.nnz_y, fbx, fby)
                lv, tc = cavlc_decode_block(r, nc, 15)
                acs[rr] = lv
                st.nnz_y[(fbx, fby)] = tc
        else:
            for rr in range(16):
                st.nnz_y[(mbx * 4 + (rr & 3), mby * 4 + (rr >> 2))] = 0
        for by in range(4):
            for bx in range(4):
                coef = [[0] * 4 for _ in range(4)]
                unzigzag_to(coef, [0] + acs[by * 4 + bx])
                for i in range(4):
                    for j in range(4):
                        if i or j:
                            coef[i][j] = dequant_ac(coef[i][j], new_qp,
                                                    i * 4 + j)
                coef[0][0] = dcval[by][bx]
                r4 = inv4x4(coef)
                for i in range(4):
                    for j in range(4):
                        st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = clip255(
                            pred[by * 4 + i][bx * 4 + j] + r4[i][j])
        self._decode_chroma(r, st, sps, pps, mbx, mby, cmode, cbp_chroma, qpc)
        return new_qp

    def _decode_skip(self, st, sps, mbx, mby):
        ref = self.dpb[0]
        mv = skip_mv(st, mbx, mby)
        x0, y0 = mbx * 16, mby * 16
        W, H = sps.mb_w * 16, sps.mb_h * 16
        pred = mc_luma(ref.y, W, H, x0, y0, mv[0], mv[1])
        if self._wp is not None:
            pred = apply_wp(pred, *wp_luma(self._wp, 0))
        for i in range(16):
            for j in range(16):
                st.y[y0 + i][x0 + j] = pred[i][j]
        for comp, (plane, refp) in enumerate(((st.cb, ref.cb),
                                              (st.cr, ref.cr))):
            pr = mc_chroma(refp, W // 2, H // 2, mbx * 8, mby * 8,
                           mv[0], mv[1])
            if self._wp is not None:
                pr = apply_wp(pr, *wp_chroma(self._wp, 0, comp))
            for i in range(8):
                for j in range(8):
                    plane[mby * 8 + i][mbx * 8 + j] = pr[i][j]
        for by in range(4):
            for bx in range(4):
                st.nnz_y[(mbx * 4 + bx, mby * 4 + by)] = 0
        for by in range(2):
            for bx in range(2):
                st.nnz_cb[(mbx * 2 + bx, mby * 2 + by)] = 0
                st.nnz_cr[(mbx * 2 + bx, mby * 2 + by)] = 0
        st.mb_is_i4[(mbx, mby)] = False
        record_blocks(st, mbx * 4, mby * 4, 4, 4, 0, mv)

    def _decode_mb_p(self, r, st, sps, pps, mbx, mby, cur_qp):
        mb_type = r.ue()
        if mb_type >= 5:  # intra in a P slice
            return self._decode_mb(r, st, sps, pps, mbx, mby, cur_qp,
                                   mb_type=mb_type - 5)
        assert mb_type in (0, 1, 2, 3, 4), \
            f"P mb_type {mb_type} unsupported"
        n_act = self._n_active
        x0, y0 = mbx * 16, mby * 16
        W, H = sps.mb_w * 16, sps.mb_h * 16
        if mb_type == 0:
            ref_i = r.te(n_act - 1) if n_act > 1 else 0
            ref = self.dpb[ref_i]
            mvp = mvp_part(st, mbx * 4, mby * 4, 4, ref_i)
            mvx = mvp[0] + r.se()
            mvy = mvp[1] + r.se()
            record_blocks(st, mbx * 4, mby * 4, 4, 4, ref_i, (mvx, mvy))
            pred = mc_luma(ref.y, W, H, x0, y0, mvx, mvy)
            pred_cb = mc_chroma(ref.cb, W // 2, H // 2, mbx * 8, mby * 8,
                                mvx, mvy)
            pred_cr = mc_chroma(ref.cr, W // 2, H // 2, mbx * 8, mby * 8,
                                mvx, mvy)
            if self._wp is not None:
                pred = apply_wp(pred, *wp_luma(self._wp, ref_i))
                pred_cb = apply_wp(pred_cb, *wp_chroma(self._wp, ref_i, 0))
                pred_cr = apply_wp(pred_cr, *wp_chroma(self._wp, ref_i, 1))
        elif mb_type in (3, 4):  # P_8x8 / P_8x8ref0 (ref_idx inferred 0)
            subs = [r.ue() for _ in range(4)]
            assert all(t <= 3 for t in subs), f"bad sub_mb_type {subs}"
            e_refs = [0, 0, 0, 0]
            if mb_type == 3 and n_act > 1:
                e_refs = [r.te(n_act - 1) for _ in range(4)]
            pred = [[0] * 16 for _ in range(16)]
            pred_cb = [[0] * 8 for _ in range(8)]
            pred_cr = [[0] * 8 for _ in range(8)]
            for e in range(4):
                x8, y8 = 8 * (e & 1), 8 * (e >> 1)
                ref_i = e_refs[e]
                ref = self.dpb[ref_i]
                for dx, dy, pw, ph in sub_parts(subs[e]):
                    x0b = mbx * 4 + (x8 + dx) // 4
                    y0b = mby * 4 + (y8 + dy) // 4
                    wb, hb = pw // 4, ph // 4
                    mvp = mvp_part(st, x0b, y0b, wb, ref_i)
                    mv = (mvp[0] + r.se(), mvp[1] + r.se())
                    record_blocks(st, x0b, y0b, wb, hb, ref_i, mv)
                    pl = mc_luma(ref.y, W, H, x0 + x8 + dx, y0 + y8 + dy,
                                 mv[0], mv[1], pw, ph)
                    if self._wp is not None:
                        pl = apply_wp(pl, *wp_luma(self._wp, ref_i))
                    for i in range(ph):
                        for j in range(pw):
                            pred[y8 + dy + i][x8 + dx + j] = pl[i][j]
                    pc = mc_chroma(ref.cb, W // 2, H // 2,
                                   (x0 + x8 + dx) // 2, (y0 + y8 + dy) // 2,
                                   mv[0], mv[1], pw // 2, ph // 2)
                    pr_ = mc_chroma(ref.cr, W // 2, H // 2,
                                    (x0 + x8 + dx) // 2, (y0 + y8 + dy) // 2,
                                    mv[0], mv[1], pw // 2, ph // 2)
                    if self._wp is not None:
                        pc = apply_wp(pc, *wp_chroma(self._wp, ref_i, 0))
                        pr_ = apply_wp(pr_, *wp_chroma(self._wp, ref_i, 1))
                    for i in range(ph // 2):
                        for j in range(pw // 2):
                            pred_cb[(y8 + dy) // 2 + i][(x8 + dx) // 2 + j] = pc[i][j]
                            pred_cr[(y8 + dy) // 2 + i][(x8 + dx) // 2 + j] = pr_[i][j]
        else:
            vertical = mb_type == 2
            # mb_pred order: ALL ref_idx fields, then ALL mvds
            part_refs = [0, 0]
            if n_act > 1:
                part_refs = [r.te(n_act - 1) for _ in range(2)]
            pred = [[0] * 16 for _ in range(16)]
            pred_cb = [[0] * 8 for _ in range(8)]
            pred_cr = [[0] * 8 for _ in range(8)]
            for part in (0, 1):
                ref_i = part_refs[part]
                ref = self.dpb[ref_i]
                if vertical:
                    px0, py0, bw, bh = x0 + 8 * part, y0, 8, 16
                    x0b, y0b, wb, hb = mbx * 4 + 2 * part, mby * 4, 2, 4
                    mvp = mvp_8x16(st, mbx, mby, part, ref_i)
                else:
                    px0, py0, bw, bh = x0, y0 + 8 * part, 16, 8
                    x0b, y0b, wb, hb = mbx * 4, mby * 4 + 2 * part, 4, 2
                    mvp = mvp_16x8(st, mbx, mby, part, ref_i)
                mv = (mvp[0] + r.se(), mvp[1] + r.se())
                record_blocks(st, x0b, y0b, wb, hb, ref_i, mv)
                pl = mc_luma(ref.y, W, H, px0, py0, mv[0], mv[1], bw, bh)
                if self._wp is not None:
                    pl = apply_wp(pl, *wp_luma(self._wp, ref_i))
                for i in range(bh):
                    for j in range(bw):
                        pred[py0 - y0 + i][px0 - x0 + j] = pl[i][j]
                pc = mc_chroma(ref.cb, W // 2, H // 2, px0 // 2, py0 // 2,
                               mv[0], mv[1], bw // 2, bh // 2)
                pr_ = mc_chroma(ref.cr, W // 2, H // 2, px0 // 2, py0 // 2,
                                mv[0], mv[1], bw // 2, bh // 2)
                if self._wp is not None:
                    pc = apply_wp(pc, *wp_chroma(self._wp, ref_i, 0))
                    pr_ = apply_wp(pr_, *wp_chroma(self._wp, ref_i, 1))
                for i in range(bh // 2):
                    for j in range(bw // 2):
                        pred_cb[(py0 - y0) // 2 + i][(px0 - x0) // 2 + j] = pc[i][j]
                        pred_cr[(py0 - y0) // 2 + i][(px0 - x0) // 2 + j] = pr_[i][j]
        cbp = CBP_INTER[r.ue()]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        new_qp = cur_qp
        if cbp != 0:
            new_qp = cur_qp + r.se()
        qpc = chroma_qp(new_qp, pps.chroma_qp_offset)
        acs = [[0] * 16 for _ in range(16)]
        for z in range(16):
            rr = ZSCAN4[z]
            fbx, fby = mbx * 4 + (rr & 3), mby * 4 + (rr >> 2)
            if cbp_luma & (1 << (z // 4)):
                nc = st.nc(st.nnz_y, fbx, fby)
                lv, tc = cavlc_decode_block(r, nc, 16)
                acs[rr] = lv
                st.nnz_y[(fbx, fby)] = tc
            else:
                st.nnz_y[(fbx, fby)] = 0
        for by in range(4):
            for bx in range(4):
                coef = [[0] * 4 for _ in range(4)]
                unzigzag_to(coef, acs[by * 4 + bx])
                for i in range(4):
                    for j in range(4):
                        coef[i][j] = dequant_ac(coef[i][j], new_qp,
                                                i * 4 + j)
                r4 = inv4x4(coef)
                for i in range(4):
                    for j in range(4):
                        st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = clip255(
                            pred[by * 4 + i][bx * 4 + j] + r4[i][j])
        st.mb_is_i4[(mbx, mby)] = False
        self._decode_chroma(r, st, sps, pps, mbx, mby, None, cbp_chroma,
                            qpc, preds=(pred_cb, pred_cr))
        return new_qp

    def _decode_chroma(self, r, st, sps, pps, mbx, mby, cmode, cbp_chroma,
                       qpc, preds=None):
        dcl = [[0] * 4, [0] * 4]
        if cbp_chroma >= 1:
            for comp in (0, 1):
                dcl[comp], _ = cavlc_decode_block(r, -1, 4)
        acl = [[[0] * 15 for _ in range(4)] for _ in range(2)]
        if cbp_chroma == 2:
            for comp, m in ((0, st.nnz_cb), (1, st.nnz_cr)):
                for sy in (0, 1):
                    for sx in (0, 1):
                        cx, cy = mbx * 2 + sx, mby * 2 + sy
                        nc = st.nc(m, cx, cy)
                        lv, tc = cavlc_decode_block(r, nc, 15)
                        acl[comp][sy * 2 + sx] = lv
                        m[(cx, cy)] = tc
        else:
            for m in (st.nnz_cb, st.nnz_cr):
                for sy in (0, 1):
                    for sx in (0, 1):
                        m[(mbx * 2 + sx, mby * 2 + sy)] = 0
        for comp, plane in ((0, st.cb), (1, st.cr)):
            x0, y0 = mbx * 8, mby * 8
            pr = preds[comp] if preds is not None else pred_chroma(
                cmode, plane, sps.mb_w * 8, sps.mb_h * 8, x0, y0)
            d = dcl[comp]
            dcr = hadamard2([[d[0], d[1]], [d[2], d[3]]])
            for sy in (0, 1):
                for sx in (0, 1):
                    coef = [[0] * 4 for _ in range(4)]
                    if cbp_chroma == 2:
                        unzigzag_to(coef, [0] + acl[comp][sy * 2 + sx])
                        for i in range(4):
                            for j in range(4):
                                if i or j:
                                    coef[i][j] = dequant_ac(coef[i][j], qpc,
                                                            i * 4 + j)
                    if cbp_chroma >= 1:
                        coef[0][0] = dequant_chroma_dc(dcr[sy][sx], qpc)
                    r4 = inv4x4(coef)
                    for i in range(4):
                        for j in range(4):
                            plane[y0 + sy * 4 + i][x0 + sx * 4 + j] = clip255(
                                pr[sy * 4 + i][sx * 4 + j] + r4[i][j])
