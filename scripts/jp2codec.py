"""Minimal JPEG 2000 Part-1 codec — reversible 5/3 AND irreversible 9/7
paths — written from the public spec (ITU-T T.800 / ISO-IEC 15444-1):
MQ-coded passes; reversible streams carry no quantization, irreversible
streams scalar-quantize (derived or expounded, E.1) the float 9/7
coefficients; tiled codestreams (tile-part splits, Psot=0),
per-resolution custom precincts with canvas-anchored block partition,
quality layers, LRCP/RLCP/RPCL progressions, SOP/EPH framing — the full
Kakadu-encoded Sentinel-2 shape. Multi-component streams take the RCT
(G.2, reversible) or the ICT (G.3, irreversible).

This file exists ONLY to generate and self-check the checked-in test
fixture (see gen_jp2_fixture.py). The production decoder is
graft.sources.Jp2Decode (Scala), written independently against the same
spec clauses; the fixture is the conformance bridge between the two
implementations, the same role the hand-assembled tiny_scene_B1.tif
plays for the GeoTIFF codec.

Spec map:
  markers/codestream  T.800 Annex A (SOC/SIZ/COD/QCD/SOT/SOD/EOC)
  packet headers      T.800 Annex B (tag trees B.10.2, Lblock B.10.7)
  MQ coder            T.800 Annex C / T.88 (47-state table, byte stuffing)
  coefficient coding  T.800 Annex D (3 passes, 19 contexts, RL mode)
  5/3 wavelet         T.800 Annex F (reversible integer lifting)
  9/7 wavelet         T.800 Annex F.4.8.2 (irreversible float lifting)
  quantization        T.800 Annex E (scalar derived/expounded)
  color transforms    T.800 Annex G (RCT G.2, ICT G.3)
"""

import math
import struct

# 47-state MQ probability table (T.800 Table C.2): Qe, NMPS, NLPS, SWITCH
QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

N_CTX = 19        # 0-8 zero coding, 9-13 sign, 14-16 refinement, 17 RL, 18 uniform
CTX_RL, CTX_UNI = 17, 18


def initial_states():
    I = [0] * N_CTX
    I[0] = 4          # the all-zero significance context
    I[CTX_RL] = 3
    I[CTX_UNI] = 46
    return I, [0] * N_CTX


class MQEncoder:
    """T.88 MQ encoder (the OpenJPEG formulation of BYTEOUT/FLUSH)."""

    def __init__(self):
        self.I, self.MPS = initial_states()
        self.a, self.c, self.ct = 0x8000, 0, 12
        self.out = bytearray([0])  # spacer byte standing in for bp = start-1
        self.bp = 0

    def encode(self, d, cx):
        qe, nmps, nlps, sw = QE[self.I[cx]]
        if d == self.MPS[cx]:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.I[cx] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if sw:
                self.MPS[cx] ^= 1
            self.I[cx] = nlps
            self._renorm()

    def _renorm(self):
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def _emit(self, shift, mask, ct):
        self.bp += 1
        self.out.append((self.c >> shift) & 0xFF)
        self.c &= mask
        self.ct = ct

    def _byteout(self):
        if self.out[self.bp] == 0xFF:
            self._emit(20, 0xFFFFF, 7)
        elif (self.c & 0x8000000) == 0:
            self._emit(19, 0x7FFFF, 8)
        else:
            self.out[self.bp] += 1  # carry into the previous byte
            if self.out[self.bp] == 0xFF:
                self.c &= 0x7FFFFFF
                self._emit(20, 0xFFFFF, 7)
            else:
                self._emit(19, 0x7FFFF, 8)

    def flush(self):
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        assert self.out[0] == 0, "carry propagated into the spacer byte"
        data = self.out[1:]
        if data and data[-1] == 0xFF:
            data.pop()
        return bytes(data)


class MQDecoder:
    """T.88 MQ decoder; bytes past the segment end read as 0xFF."""

    def __init__(self, data):
        self.I, self.MPS = initial_states()
        self.data = data
        self.bp = 0
        self.c = self._byte(0) << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i):
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self):
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx):
        qe, nmps, nlps, sw = QE[self.I[cx]]
        self.a -= qe
        if (self.c >> 16) < qe:
            if self.a < qe:
                d = self.MPS[cx]
                self.I[cx] = nmps
            else:
                d = 1 - self.MPS[cx]
                if sw:
                    self.MPS[cx] ^= 1
                self.I[cx] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - self.MPS[cx]
                    if sw:
                        self.MPS[cx] ^= 1
                    self.I[cx] = nlps
                else:
                    d = self.MPS[cx]
                    self.I[cx] = nmps
                self._renorm()
            else:
                d = self.MPS[cx]
        return d

    def _renorm(self):
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break


class BitWriter:
    """Packet-header bit I/O with 0xFF stuffing (T.800 B.10.1)."""

    def __init__(self):
        self.out = bytearray()
        self.buf, self.avail = 0, 8

    def put(self, bit):
        self.buf = (self.buf << 1) | (bit & 1)
        self.avail -= 1
        if self.avail == 0:
            self._byteout()

    def put_bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1)

    def _byteout(self):
        self.out.append(self.buf)
        self.avail = 7 if self.buf == 0xFF else 8
        self.buf = 0

    def flush(self):
        if self.avail < (7 if self.out and self.out[-1] == 0xFF else 8):
            self.buf <<= self.avail
            self._byteout()
        if self.out and self.out[-1] == 0xFF:  # never end a header on 0xFF
            self.out.append(0)
        return bytes(self.out)


class BitReader:
    def __init__(self, data, pos=0):
        self.data = data
        self.pos = pos
        self.buf, self.avail = 0, 0
        self.prev = 0

    def get(self):
        if self.avail == 0:
            stuffed = self.prev == 0xFF
            self.buf = self.data[self.pos]
            self.pos += 1
            self.prev = self.buf
            self.avail = 7 if stuffed else 8
        self.avail -= 1
        return (self.buf >> self.avail) & 1

    def get_bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self):
        self.avail = 0
        if self.prev == 0xFF:  # consume the stuffed byte after a 0xFF tail
            self.pos += 1
        self.prev = 0


class TagTree:
    """T.800 B.10.2 tag tree over a w x h grid of leaves."""

    def __init__(self, w, h):
        assert w >= 1 and h >= 1, f"tag tree over empty grid {w}x{h}"
        self.dims = []
        ww, hh = w, h
        while True:
            self.dims.append((ww, hh))
            if ww == 1 and hh == 1:
                break
            ww, hh = (ww + 1) // 2, (hh + 1) // 2
        self.value = [[[0] * dw for _ in range(dh)] for (dw, dh) in self.dims]
        self.low = [[[0] * dw for _ in range(dh)] for (dw, dh) in self.dims]
        self.known = [[[False] * dw for _ in range(dh)] for (dw, dh) in self.dims]

    def set_leaves(self, vals):
        """vals[y][x] per leaf; internal nodes become subtree minima."""
        (w0, h0) = self.dims[0]
        for y in range(h0):
            for x in range(w0):
                self.value[0][y][x] = vals[y][x]
        for l in range(1, len(self.dims)):
            (lw, lh) = self.dims[l]
            (cw, ch) = self.dims[l - 1]
            for y in range(lh):
                for x in range(lw):
                    kids = [self.value[l - 1][cy][cx]
                            for cy in (2 * y, 2 * y + 1) if cy < ch
                            for cx in (2 * x, 2 * x + 1) if cx < cw]
                    self.value[l][y][x] = min(kids)

    def _path(self, x, y):
        return [(l, x >> l, y >> l) for l in range(len(self.dims) - 1, -1, -1)]

    def encode(self, x, y, threshold, bw):
        low = 0
        for (l, px, py) in self._path(x, y):
            if self.low[l][py][px] > low:
                low = self.low[l][py][px]
            while low < threshold:
                if low < self.value[l][py][px]:
                    bw.put(0)
                    low += 1
                else:
                    if not self.known[l][py][px]:
                        bw.put(1)
                        self.known[l][py][px] = True
                    break
            self.low[l][py][px] = low

    def decode(self, x, y, threshold, br):
        low = 0
        for (l, px, py) in self._path(x, y):
            if self.low[l][py][px] > low:
                low = self.low[l][py][px]
            while low < threshold and not self.known[l][py][px]:
                if br.get():
                    self.known[l][py][px] = True
                else:
                    low += 1
            self.low[l][py][px] = low
        lx, ly = x, y
        return self.known[0][ly][lx], self.low[0][ly][lx]


# ------------------------------------------------------------------ wavelet

def _ext(i, n):
    """Whole-sample symmetric extension (T.800 F.3.7)."""
    if i < 0:
        return -i
    if i >= n:
        return 2 * n - 2 - i
    return i


def fwd53_1d(x):
    n = len(x)
    if n == 1:
        return list(x)
    y = list(x)
    for i in range(1, n, 2):   # predict (high pass at odd positions)
        y[i] = x[i] - (x[_ext(i - 1, n)] + x[_ext(i + 1, n)]) // 2
    for i in range(0, n, 2):   # update (low pass at even positions)
        y[i] = x[i] + (y[_ext(i - 1, n)] + y[_ext(i + 1, n)] + 2) // 4
    return y


def inv53_1d(y):
    n = len(y)
    if n == 1:
        return list(y)
    x = list(y)
    for i in range(0, n, 2):
        x[i] = y[i] - (y[_ext(i - 1, n)] + y[_ext(i + 1, n)] + 2) // 4
    for i in range(1, n, 2):
        x[i] = y[i] + (x[_ext(i - 1, n)] + x[_ext(i + 1, n)]) // 2
    return x


# 9/7 lifting constants (T.800 Table F.4) and the DC-gain-1 normalization
# (low *= 1/K, high *= K — the Table F.6 analysis taps sum to 1 at DC)
A97 = -1.586134342059924
B97 = -0.052980118572961
G97 = 0.882911075530934
D97 = 0.443506852043971
K97 = 1.230174104914001


def fwd97_1d(x):
    """Irreversible 9/7 analysis (F.4.8.2): four sequential lifting steps
    over the symmetric extension, then the K normalization. Floats in,
    floats out; length-1 signals pass through (degenerate split)."""
    n = len(x)
    y = [float(v) for v in x]
    if n == 1:
        return y
    for i in range(1, n, 2):
        y[i] += A97 * (y[_ext(i - 1, n)] + y[_ext(i + 1, n)])
    for i in range(0, n, 2):
        y[i] += B97 * (y[_ext(i - 1, n)] + y[_ext(i + 1, n)])
    for i in range(1, n, 2):
        y[i] += G97 * (y[_ext(i - 1, n)] + y[_ext(i + 1, n)])
    for i in range(0, n, 2):
        y[i] += D97 * (y[_ext(i - 1, n)] + y[_ext(i + 1, n)])
    for i in range(0, n, 2):
        y[i] *= 1.0 / K97
    for i in range(1, n, 2):
        y[i] *= K97
    return y


def inv97_1d(y):
    """Inverse 9/7 synthesis — the analysis steps mirrored. The operation
    ORDER and expression shapes match graft.sources.Jp2Decode.inverse97
    exactly, so both decoders produce bit-identical IEEE doubles."""
    n = len(y)
    x = [float(v) for v in y]
    if n == 1:
        return x
    for i in range(0, n, 2):
        x[i] *= K97
    for i in range(1, n, 2):
        x[i] *= 1.0 / K97
    for i in range(0, n, 2):
        x[i] -= D97 * (x[_ext(i - 1, n)] + x[_ext(i + 1, n)])
    for i in range(1, n, 2):
        x[i] -= G97 * (x[_ext(i - 1, n)] + x[_ext(i + 1, n)])
    for i in range(0, n, 2):
        x[i] -= B97 * (x[_ext(i - 1, n)] + x[_ext(i + 1, n)])
    for i in range(1, n, 2):
        x[i] -= A97 * (x[_ext(i - 1, n)] + x[_ext(i + 1, n)])
    return x


def fwd97_2d(a):
    h, w = len(a), len(a[0])
    for x in range(w):
        col = fwd97_1d([a[y][x] for y in range(h)])
        for y in range(h):
            a[y][x] = col[y]
    for y in range(h):
        a[y] = fwd97_1d(a[y])
    return a


def inv97_2d(a):
    h, w = len(a), len(a[0])
    for y in range(h):
        a[y] = inv97_1d(a[y])
    for x in range(w):
        col = inv97_1d([a[y][x] for y in range(h)])
        for y in range(h):
            a[y][x] = col[y]
    return a


def fwd53_2d(a):
    """One decomposition level, in place semantics: columns then rows
    (the inverse of the decoder's rows-then-columns 2D_SR)."""
    h, w = len(a), len(a[0])
    for x in range(w):
        col = fwd53_1d([a[y][x] for y in range(h)])
        for y in range(h):
            a[y][x] = col[y]
    for y in range(h):
        a[y] = fwd53_1d(a[y])
    return a


def inv53_2d(a):
    h, w = len(a), len(a[0])
    for y in range(h):
        a[y] = inv53_1d(a[y])
    for x in range(w):
        col = inv53_1d([a[y][x] for y in range(h)])
        for y in range(h):
            a[y][x] = col[y]
    return a


def decompose(pixels, h, w, levels, irrev=False):
    """Forward DWT -> dict of subbands. Returns {(level, name): 2-D list};
    names HL (x odd), LH (y odd), HH; plus ('LL', levels). irrev=True
    runs the float 9/7 analysis instead of the integer 5/3."""
    a = [[pixels[y * w + x] for x in range(w)] for y in range(h)]
    bands = {}
    ch, cw = h, w
    for d in range(1, levels + 1):
        sub = [[a[y][x] for x in range(cw)] for y in range(ch)]
        (fwd97_2d if irrev else fwd53_2d)(sub)
        ll = [[sub[2 * y][2 * x] for x in range((cw + 1) // 2)] for y in range((ch + 1) // 2)]
        bands[(d, 'HL')] = [[sub[2 * y][2 * x + 1] for x in range(cw // 2)]
                            for y in range((ch + 1) // 2)]
        bands[(d, 'LH')] = [[sub[2 * y + 1][2 * x] for x in range((cw + 1) // 2)]
                            for y in range(ch // 2)]
        bands[(d, 'HH')] = [[sub[2 * y + 1][2 * x + 1] for x in range(cw // 2)]
                            for y in range(ch // 2)]
        for y in range((ch + 1) // 2):
            for x in range((cw + 1) // 2):
                a[y][x] = ll[y][x]
        ch, cw = (ch + 1) // 2, (cw + 1) // 2
    bands[(levels, 'LL')] = [[a[y][x] for x in range(cw)] for y in range(ch)]
    return bands


def reconstruct(bands, h, w, levels, stop=0, irrev=False):
    """Inverse synthesis from `levels` down to stop+1; with stop > 0 the
    returned grid is the LL at level `stop` (a reduced-resolution read)."""
    ll = bands[(levels, 'LL')]
    for d in range(levels, stop, -1):
        ph = -(-h // (2 ** (d - 1)))   # ceil div: parent dims at level d-1
        pw = -(-w // (2 ** (d - 1)))
        a = [[0.0 if irrev else 0] * pw for _ in range(ph)]
        hl, lh, hh = bands[(d, 'HL')], bands[(d, 'LH')], bands[(d, 'HH')]
        for y in range(ph):
            for x in range(pw):
                if y % 2 == 0 and x % 2 == 0:
                    a[y][x] = ll[y // 2][x // 2]
                elif y % 2 == 0:
                    a[y][x] = hl[y // 2][x // 2]
                elif x % 2 == 0:
                    a[y][x] = lh[y // 2][x // 2]
                else:
                    a[y][x] = hh[y // 2][x // 2]
        (inv97_2d if irrev else inv53_2d)(a)
        ll = a
    return ll


# ------------------------------------------------------- scalar quantization

def quant_params(rb, target_delta):
    """(eps, mu) whose E-3 step is closest at-or-below target_delta:
    delta = 2^(rb-eps) * (1 + mu/2^11), mantissa in [1, 2)."""
    e2 = math.floor(math.log2(target_delta))
    mantissa = target_delta / (2.0 ** e2)
    eps = rb - e2
    mu = int((mantissa - 1.0) * 2048)
    assert 0 <= eps <= 31 and 0 <= mu <= 2047, f"qstep out of range: {target_delta}"
    return eps, mu


def delta_of(rb, eps, mu):
    """E-3 reconstruction step for subband dynamic range rb — the SAME
    expression shape as the Scala decoder's deltaOf (bit-exact doubles)."""
    return (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)


def quant_table(depth, levels, qstep, derived):
    """Per-subband (eps, mu, delta) in codestream band order, plus the QCD
    payload bytes. Derived (style 1) signals only the LL pair and scales
    by decomposition level (E-5: eps_b = eps0 - NL + nb); expounded
    (style 2) signals every subband."""
    bandlist = [bn for r in range(levels + 1) for bn in packet_bands(levels, r)]
    quant = {}
    if derived:
        eps0, mu0 = quant_params(depth + gain('LL'), qstep)
        for (d, nm) in bandlist:
            nb = levels if nm == 'LL' else d
            eps = eps0 - levels + nb
            assert 1 <= eps <= 31, f"derived eps {eps} out of range"
            quant[(d, nm)] = (eps, mu0, delta_of(depth + gain(nm), eps, mu0))
        payload = struct.pack('>BH', (GUARD_BITS << 5) | 1, (eps0 << 11) | mu0)
    else:
        words = []
        for (d, nm) in bandlist:
            rb = depth + gain(nm)
            eps, mu = quant_params(rb, qstep)
            quant[(d, nm)] = (eps, mu, delta_of(rb, eps, mu))
            words.append((eps << 11) | mu)
        payload = struct.pack('>B', (GUARD_BITS << 5) | 2) + \
            b''.join(struct.pack('>H', wd) for wd in words)
    return quant, payload


# ----------------------------------------------------------- T1 block coder

def zc_ctx(h, v, d, orient):
    """Zero-coding context (T.800 Table D.1). LL and LH share the
    horizontal-primary column; HL swaps h/v; HH is diagonal-primary."""
    if orient == 'HL':
        h, v = v, h
    if orient != 'HH':
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv


def sc_ctx(hc, vc):
    """Sign-coding context + XOR bit (T.800 Tables D.3/D.4)."""
    return {
        (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
        (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
        (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
    }[(hc, vc)]


class BlockCoder:
    """Shared scan/context machinery for one code-block (w x h <= 64x64)."""

    def __init__(self, w, h, orient):
        self.w, self.h, self.orient = w, h, orient
        self.sig = [[False] * w for _ in range(h)]
        self.vis = [[False] * w for _ in range(h)]
        self.neg = [[False] * w for _ in range(h)]
        self.ref = [[0] * w for _ in range(h)]

    def _s(self, y, x):
        return 0 <= y < self.h and 0 <= x < self.w and self.sig[y][x]

    def counts(self, y, x):
        h = int(self._s(y, x - 1)) + int(self._s(y, x + 1))
        v = int(self._s(y - 1, x)) + int(self._s(y + 1, x))
        d = (int(self._s(y - 1, x - 1)) + int(self._s(y - 1, x + 1)) +
             int(self._s(y + 1, x - 1)) + int(self._s(y + 1, x + 1)))
        return h, v, d

    def sign_ctx(self, y, x):
        def contrib(yy, xx):
            if not self._s(yy, xx):
                return 0
            return -1 if self.neg[yy][xx] else 1
        hc = max(-1, min(1, contrib(y, x - 1) + contrib(y, x + 1)))
        vc = max(-1, min(1, contrib(y - 1, x) + contrib(y + 1, x)))
        return sc_ctx(hc, vc)

    def zctx(self, y, x):
        h, v, d = self.counts(y, x)
        return zc_ctx(h, v, d, self.orient)

    def scan(self):
        for k0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(k0, min(k0 + 4, self.h)):
                    yield y, x

    def columns(self):
        for k0 in range(0, self.h, 4):
            for x in range(self.w):
                yield k0, x


def encode_block(mags, negs, w, h, orient):
    """Encode one code-block, all passes in one MQ codeword segment.
    Returns (nbps, npasses, bytes); nbps == 0 means an all-zero block."""
    maxmag = max((mags[y][x] for y in range(h) for x in range(w)), default=0)
    if maxmag == 0:
        return 0, 0, b''
    nbps = maxmag.bit_length()
    mq = MQEncoder()
    st = BlockCoder(w, h, orient)

    def code_sign(y, x):
        ctx, xor = st.sign_ctx(y, x)
        mq.encode((1 if negs[y][x] else 0) ^ xor, ctx)
        st.neg[y][x] = negs[y][x]

    for p in range(nbps - 1, -1, -1):
        if p != nbps - 1:
            for y, x in st.scan():                       # significance pass
                if not st.sig[y][x] and st.zctx(y, x) != 0:
                    bit = (mags[y][x] >> p) & 1
                    mq.encode(bit, st.zctx(y, x))
                    st.vis[y][x] = True
                    if bit:
                        st.sig[y][x] = True
                        code_sign(y, x)
            for y, x in st.scan():                       # refinement pass
                if st.sig[y][x] and not st.vis[y][x]:
                    ctx = 16 if st.ref[y][x] > 0 else (
                        15 if sum(st.counts(y, x)) > 0 else 14)
                    mq.encode((mags[y][x] >> p) & 1, ctx)
                    st.ref[y][x] += 1
        for k0, x in st.columns():                       # cleanup pass
            start = 0
            full = k0 + 3 < h
            if full and all(not st.sig[k0 + i][x] and not st.vis[k0 + i][x]
                            and st.zctx(k0 + i, x) == 0 for i in range(4)):
                bits = [(mags[k0 + i][x] >> p) & 1 for i in range(4)]
                if not any(bits):
                    mq.encode(0, CTX_RL)
                    continue
                mq.encode(1, CTX_RL)
                k = bits.index(1)
                mq.encode((k >> 1) & 1, CTX_UNI)
                mq.encode(k & 1, CTX_UNI)
                st.sig[k0 + k][x] = True
                code_sign(k0 + k, x)
                start = k + 1
            for i in range(start, 4):
                y = k0 + i
                if y >= h:
                    break
                if st.sig[y][x] or st.vis[y][x]:
                    continue
                bit = (mags[y][x] >> p) & 1
                mq.encode(bit, st.zctx(y, x))
                if bit:
                    st.sig[y][x] = True
                    code_sign(y, x)
        for y, x in st.scan():
            st.vis[y][x] = False
    return nbps, 3 * nbps - 2, mq.flush()


def decode_block_passes(data, w, h, orient, nbps, npasses):
    """Pass sequence: cleanup(MSB), then (sig, mr, cl) per lower plane."""
    mq = MQDecoder(data)
    st = BlockCoder(w, h, orient)
    mags = [[0] * w for _ in range(h)]

    def read_sign(y, x):
        ctx, xor = st.sign_ctx(y, x)
        st.neg[y][x] = (mq.decode(ctx) ^ xor) == 1

    seq = [('cl', nbps - 1)]
    for p in range(nbps - 2, -1, -1):
        seq += [('sig', p), ('mr', p), ('cl', p)]
    for kind, p in seq[:npasses]:
        if kind == 'sig':
            for y, x in st.scan():
                if not st.sig[y][x] and st.zctx(y, x) != 0:
                    bit = mq.decode(st.zctx(y, x))
                    st.vis[y][x] = True
                    if bit:
                        st.sig[y][x] = True
                        mags[y][x] |= 1 << p
                        read_sign(y, x)
        elif kind == 'mr':
            for y, x in st.scan():
                if st.sig[y][x] and not st.vis[y][x]:
                    ctx = 16 if st.ref[y][x] > 0 else (
                        15 if sum(st.counts(y, x)) > 0 else 14)
                    if mq.decode(ctx):
                        mags[y][x] |= 1 << p
                    st.ref[y][x] += 1
        else:
            for k0, x in st.columns():
                start = 0
                full = k0 + 3 < h
                if full and all(not st.sig[k0 + i][x] and not st.vis[k0 + i][x]
                                and st.zctx(k0 + i, x) == 0 for i in range(4)):
                    if mq.decode(CTX_RL) == 0:
                        continue
                    k = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI)
                    st.sig[k0 + k][x] = True
                    mags[k0 + k][x] |= 1 << p
                    read_sign(k0 + k, x)
                    start = k + 1
                for i in range(start, 4):
                    y = k0 + i
                    if y >= h:
                        break
                    if st.sig[y][x] or st.vis[y][x]:
                        continue
                    if mq.decode(st.zctx(y, x)):
                        st.sig[y][x] = True
                        mags[y][x] |= 1 << p
                        read_sign(y, x)
            for y, x in st.scan():
                st.vis[y][x] = False
    return mags, st.neg


# --------------------------------------------------------- packets + stream

CB_EXP = 5          # 32x32 code-blocks -> exercises the tag-tree grid
GUARD_BITS = 2


def band_dims(h, w, d, name):
    if d == 0:          # COD levels=0: no wavelet, LL0 is the image itself
        assert name == 'LL'
        return h, w
    ph = -(-h // (2 ** (d - 1)))
    pw = -(-w // (2 ** (d - 1)))
    if name == 'LL':
        return (ph + 1) // 2, (pw + 1) // 2
    if name == 'HL':
        return (ph + 1) // 2, pw // 2
    if name == 'LH':
        return ph // 2, (pw + 1) // 2
    return ph // 2, pw // 2


def packet_bands(levels, r):
    if r == 0:
        return [(levels, 'LL')]
    d = levels - r + 1
    return [(d, 'HL'), (d, 'LH'), (d, 'HH')]


def gain(name):
    return {'LL': 0, 'HL': 1, 'LH': 1, 'HH': 2}[name]


def _packet_order(levels, layers, ncomp, prog, res_geom, prec_pos):
    """Packet sequence (layer, res, comp, precinct) for all five Part-1
    progression orders (T.800 B.12). res_geom[r] = (npx, npy);
    prec_pos[(r, p)] = the precinct's first-sample canvas position, which
    orders the position-major PCRL/CPRL walks (resolutions interleave;
    within one position r ascends, layers innermost)."""
    order = []
    if prog == 0:                                    # LRCP: l -> r -> c -> p
        for l in range(layers):
            for r in range(levels + 1):
                for c in range(ncomp):
                    for p in range(res_geom[r][0] * res_geom[r][1]):
                        order.append((l, r, c, p))
    elif prog == 1:                                  # RLCP: r -> l -> c -> p
        for r in range(levels + 1):
            for l in range(layers):
                for c in range(ncomp):
                    for p in range(res_geom[r][0] * res_geom[r][1]):
                        order.append((l, r, c, p))
    elif prog == 2:                                  # RPCL: r -> p -> c -> l
        for r in range(levels + 1):
            for p in range(res_geom[r][0] * res_geom[r][1]):
                for c in range(ncomp):
                    for l in range(layers):
                        order.append((l, r, c, p))
    else:                                            # PCRL / CPRL
        by_pos = {}
        for r in range(levels + 1):
            for p in range(res_geom[r][0] * res_geom[r][1]):
                by_pos.setdefault(prec_pos[(r, p)], []).append((r, p))
        if prog == 3:                                # PCRL: p -> c -> r -> l
            for pos in sorted(by_pos):
                for c in range(ncomp):
                    for (r, p) in sorted(by_pos[pos]):
                        for l in range(layers):
                            order.append((l, r, c, p))
        else:                                        # CPRL: c -> p -> r -> l
            for c in range(ncomp):
                for pos in sorted(by_pos):
                    for (r, p) in sorted(by_pos[pos]):
                        for l in range(layers):
                            order.append((l, r, c, p))
    return order


def _band_origin(gx0, gy0, d):
    """Global band-coordinate origin of a tile whose image-space origin is
    (gx0, gy0). Valid under the subset's alignment gate (tile origins are
    multiples of 2^levels), where B-15's ceil((tcx0 - 2^(d-1)·xob)/2^d)
    collapses to tcx0 >> d for every band of level d."""
    return gx0 >> d, gy0 >> d


def _tile_body(comp_tiles, h, w, depth, levels, cb_exp, gx0=0, gy0=0,
               sop=False, eph=False, precincts=None, layers=1, prog=0,
               quant=None):
    """Encode one tile's packet sequence from per-component level-shifted
    (and, for MCT streams, already RCT-transformed) samples.
    Returns (body bytes, packet-end offsets) — the offsets are the legal
    tile-part split points (a tile-part boundary must fall between
    packets, A.4.2). sop/eph emit the optional packet-framing markers.
    `depth` here is the EFFECTIVE coding depth (original + 1 for the RCT
    chroma expansion), used only for the Mb bound.

    Spec geometry (T.800 B.6/B.7): precincts of size 2^PPx(r) x 2^PPy(r)
    anchored at 0 on the resolution-r coordinates partition each
    resolution into packets; the code-block partition is ALSO anchored at
    0 on band coordinates (so a tile whose band range starts mid-block
    gets a partial first block), with the block size clamped to the
    precinct (2^(PP-1) in detail bands).

    layers > 1 splits each code-block's passes (and bytes,
    proportionally) across quality layers; first inclusion is signaled
    through the persistent inclusion tag tree at threshold layer+1,
    later contributions with the 1-bit path, zero-contribution layers
    with a 0 bit — the full B.10 layer machinery. prog 0..4 =
    LRCP/RLCP/RPCL/PCRL/CPRL (B.12): the first three nest layer /
    component loops around the in-resolution precinct raster, the last
    two order by precinct canvas position with resolutions interleaved.

    quant non-None marks the irreversible 9/7 path: samples are floats,
    the forward transform is the float 9/7, and each subband coefficient
    quantizes to floor(|c| / delta) with Mb = G + eps - 1 (E.1/E.2)."""
    ncomp = len(comp_tiles)
    all_bands = [decompose(t, h, w, levels, irrev=quant is not None)
                 for t in comp_tiles]
    pps = precincts or [(15, 15)] * (levels + 1)

    # ---- precompute: per (comp, r, precinct, band) the block grid and
    # each block's full coded data plus its per-layer (passes, bytes) split
    res_geom = []       # r -> (npx, npy)
    prec_pos = {}       # (r, pidx) -> (canvas y, canvas x) of first sample
    prec_bands = {}     # (c, r, pidx) -> list of None | dict per band
    for r in range(levels + 1):
        dres = levels - r
        trx0, try0 = gx0 >> dres, gy0 >> dres
        trx1 = -(-(gx0 + w) // (1 << dres))
        try1 = -(-(gy0 + h) // (1 << dres))
        ppx, ppy = pps[r]
        shx = ppx if r == 0 else ppx - 1
        shy = ppy if r == 0 else ppy - 1
        if trx1 > trx0 and try1 > try0:
            kx0, ky0 = trx0 >> ppx, try0 >> ppy
            npx = -(-trx1 // (1 << ppx)) - kx0
            npy = -(-try1 // (1 << ppy)) - ky0
        else:
            npx = npy = 0
        res_geom.append((npx, npy))
        for pidx in range(npx * npy):
            pxi, pyi = pidx % npx, pidx // npx
            prec_pos[(r, pidx)] = (
                max((ky0 + pyi) << ppy, try0) << dres,
                max((kx0 + pxi) << ppx, trx0) << dres)
        for c, pidx in ((c, p) for c in range(ncomp)
                        for p in range(npx * npy)):
            pxi, pyi = pidx % npx, pidx // npx
            bands = all_bands[c]
            entry = []
            for (d, name) in packet_bands(levels, r):
                bh, bw_ = band_dims(h, w, d, name)
                if bh == 0 or bw_ == 0:
                    entry.append(None)
                    continue
                tbx0, tby0 = _band_origin(gx0, gy0, d)
                px0 = max((kx0 + pxi) << shx, tbx0)
                px1 = min((kx0 + pxi + 1) << shx, tbx0 + bw_)
                py0 = max((ky0 + pyi) << shy, tby0)
                py1 = min((ky0 + pyi + 1) << shy, tby0 + bh)
                if px1 <= px0 or py1 <= py0:
                    entry.append(None)
                    continue
                cshx, cshy = min(cb_exp, shx), min(cb_exp, shy)
                bx0, by0 = px0 >> cshx, py0 >> cshy
                nbx = -(-px1 // (1 << cshx)) - bx0
                nby = -(-py1 // (1 << cshy)) - by0
                grid = bands[(d, name)]
                if quant is not None:
                    mb = GUARD_BITS + quant[(d, name)][0] - 1
                    qdelta = quant[(d, name)][2]
                else:
                    mb = GUARD_BITS + (depth + gain(name)) - 1
                    qdelta = None
                blocks = {}
                for by in range(nby):
                    for bx in range(nbx):
                        xa = max((bx0 + bx) << cshx, px0)
                        xb = min((bx0 + bx + 1) << cshx, px1)
                        ya = max((by0 + by) << cshy, py0)
                        yb = min((by0 + by + 1) << cshy, py1)
                        if qdelta is not None:
                            mags = [[int(abs(grid[ya - tby0 + y][xa - tbx0 + x])
                                         / qdelta)
                                     for x in range(xb - xa)]
                                    for y in range(yb - ya)]
                        else:
                            mags = [[abs(grid[ya - tby0 + y][xa - tbx0 + x])
                                     for x in range(xb - xa)]
                                    for y in range(yb - ya)]
                        negs = [[grid[ya - tby0 + y][xa - tbx0 + x] < 0
                                 for x in range(xb - xa)]
                                for y in range(yb - ya)]
                        nbps, npasses, data = encode_block(
                            mags, negs, xb - xa, yb - ya,
                            'LL' if name == 'LL' else name)
                        assert nbps <= mb, f"nbps {nbps} > Mb {mb} for {name}"
                        if nbps == 0:
                            continue
                        # per-layer split: layer l gets passes
                        # [n*l//L, n*(l+1)//L), bytes proportional to the
                        # cumulative pass count (monotone, total-exact)
                        cum_p = [npasses * (l + 1) // layers
                                 for l in range(layers)]
                        cum_b = [len(data) * cp // npasses for cp in cum_p]
                        cum_b[-1] = len(data)
                        contrib = []
                        pp = bb = 0
                        for l in range(layers):
                            contrib.append((cum_p[l] - pp, cum_b[l] - bb))
                            pp, bb = cum_p[l], cum_b[l]
                        first = next(l for l in range(layers)
                                     if contrib[l][0] > 0)
                        blocks[(by, bx)] = {
                            'zbp': mb - nbps, 'data': data,
                            'contrib': contrib, 'first': first,
                            'included': False, 'lblock': 3, 'sent': 0}
                incl_leaves = [[layers] * nbx for _ in range(nby)]
                for (by, bx), blk in blocks.items():
                    incl_leaves[by][bx] = blk['first']
                t_incl = TagTree(nbx, nby)
                t_incl.set_leaves(incl_leaves)
                t_zbp = TagTree(nbx, nby)
                t_zbp.set_leaves([[blocks.get((by, bx), {'zbp': 0})['zbp']
                                   for bx in range(nbx)] for by in range(nby)])
                entry.append({'nbx': nbx, 'nby': nby, 'blocks': blocks,
                              't_incl': t_incl, 't_zbp': t_zbp})
            prec_bands[(c, r, pidx)] = entry

    order = _packet_order(levels, layers, ncomp, prog, res_geom, prec_pos)

    body = bytearray()
    bounds = []
    nsop = 0
    for (l, r, c, p) in order:
        entry = prec_bands[(c, r, p)]
        any_contrib = any(
            hd is not None and any(
                (blk['included'] or blk['first'] == l) and
                blk['contrib'][l][0] > 0
                for blk in hd['blocks'].values())
            for hd in entry)
        if sop:
            body += b'\xFF\x91\x00\x04' + struct.pack('>H', nsop & 0xFFFF)
        nsop += 1
        bw_pkt = BitWriter()
        if not any_contrib:
            bw_pkt.put(0)
            body += bw_pkt.flush()
            if eph:
                body += b'\xFF\x92'
            bounds.append(len(body))
            continue
        bw_pkt.put(1)
        pkt_data = bytearray()
        for hd in entry:
            if hd is None:
                continue
            blocks = hd['blocks']
            t_incl, t_zbp = hd['t_incl'], hd['t_zbp']
            for by in range(hd['nby']):
                for bx in range(hd['nbx']):
                    blk = blocks.get((by, bx))
                    if blk is None or not blk['included']:
                        # first-inclusion signaling via the tag tree at
                        # threshold l+1 (leaf = first layer, or `layers`
                        # for never-included blocks)
                        t_incl.encode(bx, by, l + 1, bw_pkt)
                        if blk is None or blk['first'] != l:
                            continue
                        blk['included'] = True
                        t = 1
                        while not t_zbp.known[0][by][bx]:
                            t_zbp.encode(bx, by, t, bw_pkt)
                            t += 1
                    else:
                        np_, nb_ = blk['contrib'][l]
                        bw_pkt.put(1 if np_ > 0 else 0)
                        if np_ == 0:
                            continue
                    np_, nb_ = blk['contrib'][l]
                    _put_npasses(bw_pkt, np_)
                    nbits = blk['lblock'] + _ilog2(np_)
                    while (1 << nbits) <= nb_:
                        bw_pkt.put(1)
                        blk['lblock'] += 1
                        nbits += 1
                    bw_pkt.put(0)
                    bw_pkt.put_bits(nb_, nbits)
                    pkt_data += blk['data'][blk['sent']:blk['sent'] + nb_]
                    blk['sent'] += nb_
        body += bw_pkt.flush()
        if eph:
            body += b'\xFF\x92'
        body += pkt_data
        bounds.append(len(body))
    return bytes(body), bounds


def _plt_segments(lens):
    """PLT marker segments (T.800 A.7.3) for one tile-part header: Iplt
    packet lengths as 7-bit big-endian varints (MSB = continuation),
    chunked below the 65535-byte Lplt ceiling, Zplt restarting at 0 per
    header. Each length covers the whole packet including SOP/EPH."""
    def varint(n):
        bs = [n & 0x7F]
        n >>= 7
        while n:
            bs.append(0x80 | (n & 0x7F))
            n >>= 7
        return bytes(reversed(bs))
    out, seg, z = bytearray(), bytearray(), 0
    for L in lens:
        v = varint(L)
        if 3 + len(seg) + len(v) > 65535:
            out += b'\xFF\x58' + struct.pack('>HB', 3 + len(seg), z) + seg
            seg, z = bytearray(), z + 1
        seg += v  # the varint goes in the (possibly fresh) segment
    out += b'\xFF\x58' + struct.pack('>HB', 3 + len(seg), z) + seg
    return bytes(out)


def encode_j2k(pixels, h, w, depth, levels, cb_exp=CB_EXP,
               tile_w=None, tile_h=None, split_parts=1, last_psot_zero=False,
               sop=False, eph=False, precincts=None, layers=1, prog=0,
               components=None, mct=False, irrev=False, qstep=0.0625,
               qderived=False, plt=False):
    """Full codestream, 1..n unsigned-depth components. Default is a
    single tile; pass tile_w/tile_h for a tiled codestream (one SOT per
    tile, row-major Isot). split_parts > 1 splits each tile's packets
    across that many tile-parts at packet boundaries (TPsot 0..n-1);
    last_psot_zero emits the final tile-part with Psot=0 (data-to-EOC,
    legal only there, A.4.2). precincts = list of (PPx, PPy) per
    resolution r=0..levels (COD Scod bit 0 + per-resolution size bytes),
    the layout Kakadu-encoded Sentinel-2 products use.

    components = list of per-component flat pixel lists (overrides
    `pixels`); mct=True applies the reversible color transform (T.800
    G.2) over components 0..2 — the RGB PVI-quicklook shape. prog 0..4 =
    LRCP/RLCP/RPCL/PCRL/CPRL.

    irrev=True encodes the irreversible 9/7 path: float DWT, scalar
    quantization at step `qstep` in sample units (derived style when
    qderived, expounded otherwise), and the ICT (G.3) instead of the RCT
    when mct is set — the real Sentinel-2 PVI preview regime."""
    comps = components if components is not None else [pixels]
    ncomp = len(comps)
    assert not mct or ncomp >= 3, "MCT needs at least 3 components"
    tw = tile_w or w
    th = tile_h or h
    # subset alignment gate (shared with the Scala decoder): tile origins
    # must be multiples of 2^levels so per-tile local DWT parity equals
    # the spec's global parity
    assert (tw >= w and th >= h) or (tw % (1 << levels) == 0 and
                                     th % (1 << levels) == 0), \
        "tile size must be a multiple of 2^levels"
    ntx = -(-w // tw)
    nty = -(-h // th)
    half = 1 << (depth - 1)
    if irrev:
        shifted = [[float(v - half) for v in plane] for plane in comps]
        if mct:
            # forward ICT (G-10..G-12) on the DC-shifted float planes
            R, G, B = shifted[0], shifted[1], shifted[2]
            shifted[0] = [0.299 * r + 0.587 * g + 0.114 * b
                          for r, g, b in zip(R, G, B)]
            shifted[1] = [-0.168736 * r - 0.331264 * g + 0.5 * b
                          for r, g, b in zip(R, G, B)]
            shifted[2] = [0.5 * r - 0.418688 * g - 0.081312 * b
                          for r, g, b in zip(R, G, B)]
        eff_depth = depth                    # ICT keeps the nominal range
    else:
        shifted = [[v - half for v in plane] for plane in comps]
        if mct:
            # forward RCT (G-1..G-3) on the DC-shifted planes: Y, U=Cb, V=Cr
            R, G, B = shifted[0], shifted[1], shifted[2]
            shifted[0] = [(r + 2 * g + b) // 4 for r, g, b in zip(R, G, B)]
            shifted[1] = [b - g for g, b in zip(G, B)]
            shifted[2] = [r - g for r, g in zip(R, G)]
        eff_depth = depth + 1 if mct else depth  # chroma range expansion
    quant = None
    if irrev:
        quant, qcd_payload = quant_table(eff_depth, levels, qstep, qderived)

    out = bytearray()
    out += b'\xFF\x4F'                                      # SOC
    siz = struct.pack('>HHIIIIIIIIH', 38 + 3 * ncomp, 0, w, h, 0, 0,
                      tw, th, 0, 0, ncomp)
    siz += bytes([depth - 1, 1, 1]) * ncomp
    out += b'\xFF\x51' + siz
    # SPcod transform byte: 1 = reversible 5/3, 0 = irreversible 9/7
    spcod = bytes([levels, cb_exp - 2, cb_exp - 2, 0, 0 if irrev else 1])
    scod = (2 if sop else 0) | (4 if eph else 0)
    if precincts is not None:
        scod |= 1
        spcod += bytes((ppy << 4) | ppx for (ppx, ppy) in precincts)
    cod = struct.pack('>HBBHB', 12 + (0 if precincts is None else levels + 1),
                      scod, prog, layers, 1 if mct else 0) + spcod
    out += b'\xFF\x52' + cod
    if irrev:
        qcd = struct.pack('>H', 2 + len(qcd_payload)) + qcd_payload
    else:
        eps = [eff_depth + gain('LL')]
        for r in range(1, levels + 1):
            eps += [eff_depth + gain(n) for n in ('HL', 'LH', 'HH')]
        qcd = struct.pack('>HB', 3 + len(eps), GUARD_BITS << 5) + \
            bytes(e << 3 for e in eps)
    out += b'\xFF\x5C' + qcd

    for ty in range(nty):
        for tx in range(ntx):
            isot = ty * ntx + tx
            x0, x1 = tx * tw, min((tx + 1) * tw, w)
            y0, y1 = ty * th, min((ty + 1) * th, h)
            t_h, t_w = y1 - y0, x1 - x0
            tiles = [[plane[(y0 + y) * w + (x0 + x)]
                      for y in range(t_h) for x in range(t_w)]
                     for plane in shifted]
            body, bounds = _tile_body(tiles, t_h, t_w, eff_depth, levels,
                                      cb_exp, gx0=x0, gy0=y0, sop=sop,
                                      eph=eph, precincts=precincts,
                                      layers=layers, prog=prog, quant=quant)
            n_parts = min(split_parts, len(bounds)) if split_parts > 1 else 1
            cuts = [0] + [bounds[(i + 1) * len(bounds) // n_parts - 1]
                          for i in range(n_parts)]
            cuts[-1] = len(body)
            for tp in range(n_parts):
                chunk = body[cuts[tp]:cuts[tp + 1]]
                plt_bytes = b''
                if plt:
                    ends = [b for b in bounds if cuts[tp] < b <= cuts[tp + 1]]
                    lens = [e - s for s, e in
                            zip([cuts[tp]] + ends[:-1], ends)]
                    plt_bytes = _plt_segments(lens)
                is_last = (isot == ntx * nty - 1) and (tp == n_parts - 1)
                psot = 0 if (is_last and last_psot_zero) else \
                    12 + len(plt_bytes) + 2 + len(chunk)
                out += b'\xFF\x90' + struct.pack('>HHIBB', 10, isot, psot,
                                                 tp, n_parts)
                out += plt_bytes
                out += b'\xFF\x93' + chunk
    out += b'\xFF\xD9'
    return bytes(out)


def _ilog2(n):
    return n.bit_length() - 1


def _put_npasses(bw, n):
    if n == 1:
        bw.put(0)
    elif n == 2:
        bw.put(1)
        bw.put(0)
    elif n <= 5:
        bw.put_bits(0b11, 2)
        bw.put_bits(n - 3, 2)
    elif n <= 36:
        bw.put_bits(0b1111, 4)
        bw.put_bits(n - 6, 5)
    else:
        bw.put_bits(0b111111111, 9)
        bw.put_bits(n - 37, 7)


def _get_npasses(br):
    if br.get() == 0:
        return 1
    if br.get() == 0:
        return 2
    v = br.get_bits(2)
    if v < 3:
        return 3 + v
    v = br.get_bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.get_bits(7)


def decode_j2k(stream, discard=0):
    """Reference decoder for the subset encode_j2k emits (and the subset
    the Scala decoder accepts). Returns (h, w, depth, pixels row-major)
    for one component, or (h, w, depth, [plane, ...]) for multi-component
    streams (inverse RCT applied when COD says so, so planes come back as
    R, G, B); discard > 0 returns the reduced-resolution LL read (dims
    shrink by 2^discard, detail bands below skip entropy decode)."""
    pos = 0
    assert stream[0:2] == b'\xFF\x4F'
    pos = 2
    h = w = depth = levels = None
    eps = None
    qinfo = None        # irreversible: ('derived'|'expounded', [(eps, mu)])
    guard = GUARD_BITS
    irrev = False
    ncomp = 1
    mct = False
    tile_parts = {}
    while pos < len(stream):
        marker = stream[pos:pos + 2]
        pos += 2
        if marker == b'\xFF\xD9':
            break
        ln = struct.unpack('>H', stream[pos:pos + 2])[0]
        seg = stream[pos + 2:pos + ln]
        if marker == b'\xFF\x51':
            # Lsiz, Rsiz, Xsiz, Ysiz, XOsiz, YOsiz, XTsiz, YTsiz, XTOsiz,
            # YTOsiz, Csiz then per-component Ssiz, XRsiz, YRsiz (A.5.1)
            _, _, xs, ys, xo, yo, xt, yt, xto, yto, ncomp = \
                struct.unpack('>HHIIIIIIIIH', stream[pos:pos + 38])
            for ci in range(ncomp):
                ssiz, xr, yr = struct.unpack(
                    '>BBB', stream[pos + 38 + 3 * ci:pos + 41 + 3 * ci])
                assert xr == 1 and yr == 1, "subsampling outside subset"
                if ci == 0:
                    depth = (ssiz & 0x7F) + 1
                else:
                    assert (ssiz & 0x7F) + 1 == depth, "mixed depths"
            h, w = ys - yo, xs - xo
        elif marker == b'\xFF\x52':
            levels = seg[5]
            cb_exp = seg[6] + 2
            sop, eph = bool(seg[0] & 2), bool(seg[0] & 4)
            prog = seg[1]
            layers = struct.unpack('>H', seg[2:4])[0]
            mct = seg[4] == 1
            irrev = seg[9] == 0
            precincts = [(b & 0xF, b >> 4) for b in seg[10:10 + levels + 1]] \
                if seg[0] & 1 else None
        elif marker == b'\xFF\x5C':
            sty = seg[0] & 0x1F
            guard = seg[0] >> 5
            if sty == 0:
                eps = [b >> 3 for b in seg[1:]]
            elif sty == 1:
                w0 = struct.unpack('>H', seg[1:3])[0]
                qinfo = ('derived', [(w0 >> 11, w0 & 0x7FF)])
            else:
                assert sty == 2, f"unknown Sqcd style {sty}"
                qinfo = ('expounded',
                         [(wd >> 11, wd & 0x7FF) for wd in
                          struct.unpack(f'>{(len(seg) - 1) // 2}H', seg[1:])])
        elif marker == b'\xFF\x90':
            isot = struct.unpack('>H', stream[pos + 2:pos + 4])[0]
            psot = struct.unpack('>I', stream[pos + 4:pos + 8])[0]
            end = (len(stream) - 2) if psot == 0 else pos - 2 + psot
            sod = stream.find(b'\xFF\x93', pos)
            tile_parts.setdefault(isot, []).append(stream[sod + 2:end])
            pos = end
            continue
        pos += ln
    ntx, nty = -(-(xs - xto) // xt), -(-(ys - yto) // yt)
    discard = min(discard, levels)
    rh, rw = -(-h // (1 << discard)), -(-w // (1 << discard))
    out2d = [[[0] * rw for _ in range(rh)] for _ in range(ncomp)]
    half = 1 << (depth - 1)
    assert sorted(tile_parts) == list(range(ntx * nty)), "missing tiles"
    quant = None
    if irrev:
        assert qinfo is not None, "irreversible stream lacks scalar QCD"
        bandlist = [bn for r in range(levels + 1)
                    for bn in packet_bands(levels, r)]
        kind, pairs = qinfo
        quant = {}
        for bi, (d, nm) in enumerate(bandlist):
            if kind == 'derived':
                e0, m0 = pairs[0]
                e, m = e0 - levels + (levels if nm == 'LL' else d), m0
            else:
                e, m = pairs[bi]
            quant[(d, nm)] = (e, m, delta_of(depth + gain(nm), e, m))
    else:
        assert eps is not None, "reversible stream lacks no-quant QCD"
    for ty in range(nty):
        for tx in range(ntx):
            x0, x1 = max(xto + tx * xt, xo), min(xto + (tx + 1) * xt, xs)
            y0, y1 = max(yto + ty * yt, yo), min(yto + (ty + 1) * yt, ys)
            t_h, t_w = y1 - y0, x1 - x0
            body = b''.join(tile_parts[ty * ntx + tx])
            planes = _decode_tile(body, t_h, t_w, levels, cb_exp, eps,
                                  gx0=x0, gy0=y0, sop=sop, eph=eph,
                                  precincts=precincts, layers=layers,
                                  prog=prog, discard=discard, ncomp=ncomp,
                                  quant=quant, guard=guard)
            rth, rtw = -(-t_h // (1 << discard)), -(-t_w // (1 << discard))
            rx0, ry0 = x0 >> discard, y0 >> discard  # exact: aligned origins
            if mct and irrev:
                # inverse ICT (G-13..G-15) on the unrounded float planes
                for y in range(rth):
                    for x in range(rtw):
                        yv, cb, cr = (planes[0][y][x], planes[1][y][x],
                                      planes[2][y][x])
                        planes[0][y][x] = yv + 1.402 * cr
                        planes[1][y][x] = yv - 0.344136 * cb - 0.714136 * cr
                        planes[2][y][x] = yv + 1.772 * cb
            elif mct:
                # inverse RCT (G-6..G-8) before the DC shift
                for y in range(rth):
                    for x in range(rtw):
                        yv, u, v = (planes[0][y][x], planes[1][y][x],
                                    planes[2][y][x])
                        g = yv - ((u + v) >> 2)
                        planes[0][y][x] = v + g     # R
                        planes[1][y][x] = g         # G
                        planes[2][y][x] = u + g     # B
            for c in range(ncomp):
                for y in range(rth):
                    for x in range(rtw):
                        # irreversible: round half-even (== JVM Math.rint)
                        v = (round(planes[c][y][x]) if irrev
                             else planes[c][y][x]) + half
                        out2d[c][ry0 + y][rx0 + x] = \
                            max(0, min((1 << depth) - 1, v))
    outs = [[p[y][x] for y in range(rh) for x in range(rw)] for p in out2d]
    return rh, rw, depth, (outs[0] if ncomp == 1 else outs)


def _decode_tile(body, h, w, levels, cb_exp, eps, gx0=0, gy0=0,
                 sop=False, eph=False, precincts=None, layers=1, prog=0,
                 discard=0, ncomp=1, quant=None, guard=GUARD_BITS):
    """One tile's packets -> per-component level-shifted 2-D samples
    (reference side). Mirrors _tile_body's precinct / layer /
    globally-anchored geometry: per-block state (inclusion, Lblock,
    accumulated passes + bytes) persists across layer packets; every
    block decodes once at the end from its concatenated segments.
    quant non-None = irreversible: float grids, coefficients dequantize
    as sign * (q + 0.5) * delta (E.1.2 midpoint reconstruction)."""
    pps = precincts or [(15, 15)] * (levels + 1)
    irrev = quant is not None
    all_bands = [{} for _ in range(ncomp)]
    mbs = {}
    epi = 0
    for r in range(levels + 1):
        for (d, name) in packet_bands(levels, r):
            bh, bw_ = band_dims(h, w, d, name)
            mbs[(d, name)] = guard + (quant[(d, name)][0] if irrev
                                      else eps[epi]) - 1
            epi += 1
            zero = 0.0 if irrev else 0
            for c in range(ncomp):
                all_bands[c][(d, name)] = [[zero] * bw_ for _ in range(bh)]

    res_geom = []
    prec_pos = {}
    for r in range(levels + 1):
        dres = levels - r
        trx0, try0 = gx0 >> dres, gy0 >> dres
        trx1 = -(-(gx0 + w) // (1 << dres))
        try1 = -(-(gy0 + h) // (1 << dres))
        ppx, ppy = pps[r]
        if trx1 > trx0 and try1 > try0:
            kx0, ky0 = trx0 >> ppx, try0 >> ppy
            npx = -(-trx1 // (1 << ppx)) - kx0
            npy = -(-try1 // (1 << ppy)) - ky0
        else:
            kx0 = ky0 = npx = npy = 0
        res_geom.append((npx, npy, kx0, ky0))
        for p in range(npx * npy):
            prec_pos[(r, p)] = (
                max((ky0 + p // npx) << ppy, try0) << dres,
                max((kx0 + p % npx) << ppx, trx0) << dres)

    order = _packet_order(levels, layers, ncomp, prog,
                          [(g[0], g[1]) for g in res_geom], prec_pos)

    state = {}      # (c, r, p, band_idx) -> {'t_incl','t_zbp','blocks'}
    bodypos = 0
    for (l, r, c, p) in order:
        npx, npy, kx0, ky0 = res_geom[r]
        pxi, pyi = p % npx, p // npx
        ppx, ppy = pps[r]
        shx = ppx if r == 0 else ppx - 1
        shy = ppy if r == 0 else ppy - 1
        if sop and body[bodypos:bodypos + 2] == b'\xFF\x91':
            bodypos += 6
        br = BitReader(body, bodypos)
        contribs = []
        nonempty = br.get()
        if nonempty:
            for bi, (d, name) in enumerate(packet_bands(levels, r)):
                bh, bw_ = band_dims(h, w, d, name)
                if bh == 0 or bw_ == 0:
                    continue
                tbx0, tby0 = _band_origin(gx0, gy0, d)
                px0 = max((kx0 + pxi) << shx, tbx0)
                px1 = min((kx0 + pxi + 1) << shx, tbx0 + bw_)
                py0 = max((ky0 + pyi) << shy, tby0)
                py1 = min((ky0 + pyi + 1) << shy, tby0 + bh)
                if px1 <= px0 or py1 <= py0:
                    continue
                cshx, cshy = min(cb_exp, shx), min(cb_exp, shy)
                bx0, by0 = px0 >> cshx, py0 >> cshy
                nbx = -(-px1 // (1 << cshx)) - bx0
                nby = -(-py1 // (1 << cshy)) - by0
                st = state.setdefault((c, r, p, bi), {
                    't_incl': TagTree(nbx, nby), 't_zbp': TagTree(nbx, nby),
                    'blocks': {}})
                for by in range(nby):
                    for bx in range(nbx):
                        blk = st['blocks'].get((by, bx))
                        if blk is None:
                            known, val = st['t_incl'].decode(bx, by, l + 1, br)
                            if not (known and val <= l):
                                continue
                            t = 1
                            while True:
                                k2, zv = st['t_zbp'].decode(bx, by, t, br)
                                if k2:
                                    break
                                t += 1
                            blk = {'nbps': mbs[(d, name)] - zv, 'lblock': 3,
                                   'passes': 0, 'segs': bytearray()}
                            st['blocks'][(by, bx)] = blk
                        else:
                            if not br.get():
                                continue
                        np_ = _get_npasses(br)
                        while br.get():
                            blk['lblock'] += 1
                        nlen = br.get_bits(blk['lblock'] + _ilog2(np_))
                        blk['passes'] += np_
                        xa = max((bx0 + bx) << cshx, px0)
                        xb = min((bx0 + bx + 1) << cshx, px1)
                        ya = max((by0 + by) << cshy, py0)
                        yb = min((by0 + by + 1) << cshy, py1)
                        contribs.append((blk, nlen, d, name,
                                         xa - tbx0, ya - tby0,
                                         xb - xa, yb - ya))
        br.align()
        datapos = br.pos
        if eph:
            assert body[datapos:datapos + 2] == b'\xFF\x92', "missing EPH"
            datapos += 2
        for (blk, nlen, d, name, x0, y0, ww, hh) in contribs:
            blk['segs'] += body[datapos:datapos + nlen]
            blk['rect'] = (d, name, x0, y0, ww, hh)
            datapos += nlen
        bodypos = datapos

    for (c, _, _, _), st in state.items():
        for blk in st['blocks'].values():
            if blk['passes'] == 0 or 'rect' not in blk:
                continue
            (d, name, x0, y0, ww, hh) = blk['rect']
            if name != 'LL' and d <= discard:
                continue  # reduced read: dropped detail bands never decode
            mags, negs = decode_block_passes(
                bytes(blk['segs']), ww, hh, 'LL' if name == 'LL' else name,
                blk['nbps'], blk['passes'])
            grid = all_bands[c][(d, name)]
            if irrev:
                qdelta = quant[(d, name)][2]
                for y in range(hh):
                    for x in range(ww):
                        m = mags[y][x]
                        if m != 0:
                            v = (m + 0.5) * qdelta
                            grid[y0 + y][x0 + x] = -v if negs[y][x] else v
            else:
                for y in range(hh):
                    for x in range(ww):
                        grid[y0 + y][x0 + x] = \
                            -mags[y][x] if negs[y][x] else mags[y][x]
    return [reconstruct(all_bands[c], h, w, levels, stop=discard, irrev=irrev)
            for c in range(ncomp)]


def wrap_jp2(codestream, h, w, depth, ncomp=1):
    """JP2 container: signature, ftyp, jp2h(ihdr+colr), jp2c. colr says
    sRGB for 3+ components (the PVI quicklook layout), greyscale else."""
    def box(typ, payload):
        return struct.pack('>I', 8 + len(payload)) + typ + payload
    sig = bytes([0, 0, 0, 0x0C]) + b'jP  ' + bytes([0x0D, 0x0A, 0x87, 0x0A])
    ftyp = box(b'ftyp', b'jp2 ' + struct.pack('>I', 0) + b'jp2 ')
    ihdr = box(b'ihdr', struct.pack('>IIHBBBB', h, w, ncomp, depth - 1, 7, 0, 0))
    colr = box(b'colr', bytes([1, 0, 0]) +
               struct.pack('>I', 16 if ncomp >= 3 else 17))
    jp2h = box(b'jp2h', ihdr + colr)
    jp2c = box(b'jp2c', codestream)
    return sig + ftyp + jp2h + jp2c
