"""Generate the JP2 parameter-space conformance battery (test resources).

Each fixture is an independently-encoded raw J2K codestream (jp2codec.py,
written from ITU-T T.800 separately from the Scala decoder) whose pixels
follow a closed-form formula both implementations can recompute — so the
Scala spec (Jp2DecodeSpec) checks decoded output against the FORMULA, not
against either codec. Every stream is self-checked (encode -> reference
decode == input) before being written.

The matrix walks the decoder's subset edges:
  - levels=0 (no wavelet at all; LL0 = the image)
  - 1x1, single-row and single-column images (degenerate DWT extension)
  - sub-code-block dims, ragged multi-block grids, cb 16..64
  - depth 8/12/16 (16 is the decoder's cap)
  - constant-at-DC-midpoint image (all-empty packets)
  - hash-noise images (dense sign coding, RL interruptions, deep
    bitplanes) at 12- and 16-bit depth

Formulas (i = r*w + c):
  lin(a,b,m):  v = (r*a + c*b) % m
  hash:        v = ((i * 2654435761) >> 13) & ((1 << depth) - 1)
  const:       v = 1 << (depth - 1)   (zero after the DC level shift)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jp2codec as jc

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "src", "test", "resources", "graft", "jp2")

# name, h, w, depth, levels, cb_exp, formula, extra encode kwargs
CASES = [
    ("lv0_16x16_d8",    16, 16,  8, 0, 6, ("lin", 11, 3, 256), {}),
    ("lv1_1x1_d8",       1,  1,  8, 1, 6, ("lin", 0, 0, 1), {}),  # v=0
    ("lv2_1x37_d8",      1, 37,  8, 2, 6, ("lin", 0, 9, 251), {}),
    ("lv2_29x1_d8",     29,  1,  8, 2, 6, ("lin", 7, 0, 241), {}),
    ("lv1_5x3_d8",       5,  3,  8, 1, 6, ("lin", 17, 29, 256), {}),
    ("lv3_40x33_d12_cb16", 40, 33, 12, 3, 4, ("lin", 59, 23, 4096), {}),
    ("lv5_96x80_d16_cb64", 96, 80, 16, 5, 6, ("lin", 131, 61, 65536), {}),
    ("const_33x17_d12", 33, 17, 12, 2, 6, ("const",), {}),
    ("noise_47x31_d12_cb16", 47, 31, 12, 2, 4, ("hash",), {}),
    ("noise_64x64_d16_cb64", 64, 64, 16, 3, 6, ("hash",), {}),
    # tiled codestreams — the Sentinel-2 container shape (one SOT per
    # tile, independent per-tile wavelet + packets, stitched on decode)
    ("tiled_80x112_d12_t48", 80, 112, 12, 2, 4, ("hash",),
     {"tile_w": 48, "tile_h": 48}),                  # ragged 2x3 grid
    ("tiled_53x71_d10_t32", 53, 71, 10, 1, 6, ("lin", 41, 13, 1024),
     {"tile_w": 32, "tile_h": 32}),                  # ragged 2x3, depth 10
    # multi-tile-part: each tile's packets split across 3 SOTs at packet
    # boundaries; the stream's final tile-part carries Psot=0 (to-EOC)
    ("tileparts_64x64_d12_tp3", 64, 64, 12, 2, 6, ("hash",),
     {"tile_w": 32, "tile_h": 32, "split_parts": 3, "last_psot_zero": True}),
    # SOP/EPH packet framing (Kakadu's common production settings),
    # combined with a tiled stream so the markers ride the tile walk
    ("sopeph_48x80_d12_t32", 48, 80, 12, 2, 6, ("hash",),
     {"tile_w": 32, "tile_h": 32, "sop": True, "eph": True}),
    # custom precincts (COD Scod bit 0 + per-resolution sizes): multiple
    # packets per resolution in raster order, block size clamped to the
    # precinct (2^(PP-1) in detail bands)
    ("prec_96x64_d12_p5", 96, 64, 12, 2, 6, ("hash",),
     {"precincts": [(5, 5), (5, 5), (5, 5)]}),
    # the full Kakadu-encoded Sentinel-2 shape in miniature: tiled +
    # per-resolution precincts + SOP/EPH framing
    ("kakadu_96x96_d12_t64", 96, 96, 12, 2, 4, ("hash",),
     {"tile_w": 64, "tile_h": 64, "precincts": [(4, 4), (5, 5), (5, 5)],
      "sop": True, "eph": True}),
    # PLT packet-length tables (A.7.3): the seek index a windowed read
    # uses to SKIP unneeded precincts without parsing their headers —
    # standalone on a precincted RPCL stream, combined with the full
    # Kakadu shape (tiled + precincts + SOP/EPH + 2 tile-parts, so the
    # per-tile-part PLT slicing is exercised), and with quality layers
    # (skip decisions must hold across every layer of a precinct)
    ("plt_96x64_d12_p5", 96, 64, 12, 2, 6, ("hash",),
     {"precincts": [(5, 5), (5, 5), (5, 5)], "prog": 2, "plt": True}),
    ("pltkakadu_96x96_d12_t64", 96, 96, 12, 2, 4, ("hash",),
     {"tile_w": 64, "tile_h": 64, "precincts": [(4, 4), (5, 5), (5, 5)],
      "sop": True, "eph": True, "split_parts": 2, "plt": True}),
    ("pltlayers_48x48_d12_l3", 48, 48, 12, 2, 4, ("hash",),
     {"layers": 3, "precincts": [(4, 4), (4, 4), (4, 4)], "plt": True}),
    # quality layers: block passes split across layers (first inclusion
    # through the tag tree at threshold layer+1, later contributions via
    # the 1-bit path, zero-contribution layers as a 0 bit), in all three
    # in-subset progressions
    ("layers3_48x48_d12_lrcp", 48, 48, 12, 2, 4, ("hash",), {"layers": 3}),
    ("layers2_40x56_d12_rlcp", 40, 56, 12, 2, 5, ("hash",),
     {"layers": 2, "prog": 1}),
    # everything at once: layered RPCL + tiled + precincts + SOP/EPH
    ("works_64x96_d12_l3", 64, 96, 12, 2, 4, ("hash",),
     {"tile_w": 32, "tile_h": 32, "precincts": [(4, 4), (5, 5), (5, 5)],
      "sop": True, "eph": True, "layers": 3, "prog": 2}),
    # the position-major progressions (T.800 B.12.1.4/5) — custom
    # precincts so positions genuinely interleave resolutions, and a
    # tiled PCRL stream so the walk rides the tile grid too
    ("pcrl_48x80_d12_t32", 48, 80, 12, 2, 6, ("hash",),
     {"tile_w": 32, "tile_h": 32, "prog": 3,
      "precincts": [(4, 4), (4, 4), (4, 4)]}),
    ("cprl_64x64_d12_p4", 64, 64, 12, 2, 4, ("hash",),
     {"prog": 4, "precincts": [(4, 4), (4, 4), (4, 4)]}),
]

# multi-component fixtures: per-component closed-form hash planes
#   v(ci, i) = ((i * (2654435761 + ci*97)) >> 13) & mask
# — RGB with and without the reversible color transform (mct), every
# structural feature the PVI quicklook asset carries
# (name, h, w, depth, levels, cb_exp, ncomp, mct, prog, kwargs)
MULTI_CASES = [
    ("rgb_40x56_d8_lrcp", 40, 56, 8, 2, 5, 3, False, 0, {}),
    ("rgb_33x47_d8_pcrl", 33, 47, 8, 2, 4, 3, False, 3,
     {"precincts": [(4, 4), (5, 5), (5, 5)]}),
    ("rct_48x64_d8_rpcl", 48, 64, 8, 2, 5, 3, True, 2, {}),
    ("rct_56x40_d8_cprl", 56, 40, 8, 3, 5, 3, True, 4,
     {"precincts": [(4, 4), (4, 4), (5, 5), (5, 5)]}),
    # the PVI miniature (publish.py:178-179 reads **/*PVI*.jp2): 8-bit
    # RGB + RCT + tiled + per-resolution precincts + SOP/EPH + layers,
    # wrapped in a JP2 container with an sRGB colr box
    ("pvi_64x96_d8_l2", 64, 96, 8, 2, 4, 3, True, 2,
     {"tile_w": 32, "tile_h": 32, "precincts": [(4, 4), (5, 5), (5, 5)],
      "sop": True, "eph": True, "layers": 2}),
]

# irreversible 9/7 fixtures (lossy — scalar quantization, float DWT, ICT
# for RGB). The decode is NOT bit-exact against the input formula, so
# each fixture carries a `.px.txt` sidecar holding the INDEPENDENT Python
# decoder's output: the Scala decoder must match it bit-exactly (both
# implement the same IEEE-double dequant + 9/7 synthesis + ICT + G.1.2
# half-even rounding), and the generator self-checks the sidecar against
# the original pixels within the quantization error bound.
# (name, h, w, depth, levels, cb_exp, ncomp, mct, qstep, qderived, kwargs)
IRREV_CASES = [
    ("i97_40x56_d8",          40, 56,  8, 2, 5, 1, False, 0.0625, False, {}),
    ("i97_1x37_d8",            1, 37,  8, 2, 6, 1, False, 0.0625, False, {}),
    ("i97_29x1_d8",           29,  1,  8, 2, 6, 1, False, 0.0625, False, {}),
    # derived quantization (Sqcd style 1): eps scales with the
    # decomposition level from one signalled LL pair (E-5)
    ("i97der_47x31_d12",      47, 31, 12, 2, 4, 1, False, 0.25,   True,  {}),
    # coarse step — the genuinely lossy regime (visible error, deep
    # zero-bitplane truncation); also gets a reduced-resolution sidecar
    ("i97coarse_64x64_d12_q8", 64, 64, 12, 3, 6, 1, False, 8.0,   False, {}),
    # the irreversible color transform (G.3) over RGB planes
    ("ict_33x47_d8",          33, 47,  8, 2, 4, 3, True, 0.03125, False, {}),
    # the real lossy-preview regime end to end: 9/7 + ICT + tiled +
    # per-resolution precincts + SOP/EPH + 2 layers RPCL, in a JP2
    # container — what a lossy-coded PVI quicklook actually carries
    ("pvi97_64x96_d8_l2",     64, 96,  8, 2, 4, 3, True, 0.0625,  False,
     {"tile_w": 32, "tile_h": 32, "precincts": [(4, 4), (5, 5), (5, 5)],
      "sop": True, "eph": True, "layers": 2, "prog": 2}),
]


def multi_pixels_for(h, w, depth, ncomp):
    mask = (1 << depth) - 1
    return [[((i * (2654435761 + ci * 97)) >> 13) & mask
             for i in range(h * w)] for ci in range(ncomp)]


def pixels_for(h, w, depth, formula):
    kind = formula[0]
    if kind == "lin":
        _, a, b, m = formula
        return [(r * a + c * b) % m for r in range(h) for c in range(w)]
    if kind == "const":
        return [1 << (depth - 1)] * (h * w)
    mask = (1 << depth) - 1
    return [((i * 2654435761) >> 13) & mask for i in range(h * w)]


# fixtures that also get reduced-resolution (discard=k) expectation
# sidecars: <name>.r<k>.txt, one pixel per line row-major. The reference
# values come from decode_j2k(discard=k), which the self-check below pins
# against the INDEPENDENT forward-DWT LL of the input pixels.
REDUCED = {"kakadu_96x96_d12_t64": (1, 2), "lv3_40x33_d12_cb16": (1, 2),
           "works_64x96_d12_l3": (1,)}


def reduced_expect(px, h, w, depth, k, tile_w, tile_h):
    """LL at level k per tile via the FORWARD transform, stitched."""
    tw, th = tile_w or w, tile_h or h
    half = 1 << (depth - 1)
    lim = (1 << depth) - 1
    rh, rw = -(-h // (1 << k)), -(-w // (1 << k))
    out = [[0] * rw for _ in range(rh)]
    for ty0 in range(0, h, th):
        for tx0 in range(0, w, tw):
            t_h, t_w = min(th, h - ty0), min(tw, w - tx0)
            shifted = [px[(ty0 + y) * w + (tx0 + x)] - half
                       for y in range(t_h) for x in range(t_w)]
            ll = jc.decompose(shifted, t_h, t_w, k)[(k, 'LL')]
            for y in range(len(ll)):
                for x in range(len(ll[0])):
                    out[(ty0 >> k) + y][(tx0 >> k) + x] = \
                        max(0, min(lim, ll[y][x] + half))
    return [out[y][x] for y in range(rh) for x in range(rw)]


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for (name, h, w, depth, levels, cb_exp, formula, kwargs) in CASES:
        px = pixels_for(h, w, depth, formula)
        stream = jc.encode_j2k(px, h, w, depth, levels, cb_exp=cb_exp, **kwargs)
        dh, dw, dd, got = jc.decode_j2k(stream)
        assert (dh, dw, dd) == (h, w, depth), f"{name}: geometry mismatch"
        assert got == px, f"{name}: reference self-decode mismatch"
        path = os.path.join(OUT_DIR, f"{name}.j2k")
        with open(path, "wb") as f:
            f.write(stream)
        print(f"{name}: {w}x{h}@{depth} levels={levels} cb={1 << cb_exp}"
              f" -> {len(stream)} bytes OK")
        for k in REDUCED.get(name, ()):
            rh, rw, _, red = jc.decode_j2k(stream, discard=k)
            exp = reduced_expect(px, h, w, depth, k,
                                 kwargs.get("tile_w"), kwargs.get("tile_h"))
            assert red == exp, f"{name} r{k}: reduced decode != forward-DWT LL"
            with open(os.path.join(OUT_DIR, f"{name}.r{k}.txt"), "w") as f:
                f.write("\n".join(str(v) for v in red) + "\n")
            print(f"  r{k}: {rw}x{rh} reduced sidecar OK")
    for (name, h, w, depth, levels, cb_exp, ncomp, mct, prog,
         kwargs) in MULTI_CASES:
        planes = multi_pixels_for(h, w, depth, ncomp)
        stream = jc.encode_j2k(None, h, w, depth, levels, cb_exp=cb_exp,
                               components=planes, mct=mct, prog=prog,
                               **kwargs)
        dh, dw, dd, got = jc.decode_j2k(stream)
        assert (dh, dw, dd) == (h, w, depth), f"{name}: geometry mismatch"
        assert got == planes, f"{name}: reference self-decode mismatch"
        if name.startswith("pvi"):
            path = os.path.join(OUT_DIR, f"{name}.jp2")
            blob = jc.wrap_jp2(stream, h, w, depth, ncomp=ncomp)
        else:
            path = os.path.join(OUT_DIR, f"{name}.j2k")
            blob = stream
        with open(path, "wb") as f:
            f.write(blob)
        print(f"{name}: {w}x{h}@{depth} x{ncomp} mct={int(mct)} prog={prog}"
              f" -> {len(blob)} bytes OK")
    for (name, h, w, depth, levels, cb_exp, ncomp, mct, qstep, qderived,
         kwargs) in IRREV_CASES:
        if ncomp == 1:
            orig = [pixels_for(h, w, depth, ("hash",))]
            stream = jc.encode_j2k(orig[0], h, w, depth, levels,
                                   cb_exp=cb_exp, irrev=True, qstep=qstep,
                                   qderived=qderived, **kwargs)
        else:
            orig = multi_pixels_for(h, w, depth, ncomp)
            stream = jc.encode_j2k(None, h, w, depth, levels, cb_exp=cb_exp,
                                   components=orig, mct=mct, irrev=True,
                                   qstep=qstep, qderived=qderived, **kwargs)
        dh, dw, dd, got = jc.decode_j2k(stream)
        got_planes = got if ncomp > 1 else [got]
        assert (dh, dw, dd) == (h, w, depth), f"{name}: geometry mismatch"
        # quantization-error self-check vs the ORIGINAL pixels: the step
        # bounds each coefficient's error by delta/2 and the synthesis
        # L1 gain is small — 3*qstep + 2 holds with margin on every case
        err = max(abs(a - b) for p, q in zip(got_planes, orig)
                  for a, b in zip(p, q))
        assert err <= 3 * qstep + 2, f"{name}: err {err} > bound"
        if name.startswith("pvi"):
            path = os.path.join(OUT_DIR, f"{name}.jp2")
            blob = jc.wrap_jp2(stream, h, w, depth, ncomp=ncomp)
        else:
            path = os.path.join(OUT_DIR, f"{name}.j2k")
            blob = stream
        with open(path, "wb") as f:
            f.write(blob)
        with open(os.path.join(OUT_DIR, f"{name}.px.txt"), "w") as f:
            for p in got_planes:
                f.write("\n".join(str(v) for v in p) + "\n")
        print(f"{name}: {w}x{h}@{depth} x{ncomp} 9/7 qstep={qstep}"
              f"{' derived' if qderived else ''} -> {len(blob)} bytes,"
              f" maxerr {err} OK")
        if name == "i97coarse_64x64_d12_q8":
            rh, rw, _, red = jc.decode_j2k(stream, discard=1)
            with open(os.path.join(OUT_DIR, f"{name}.r1.txt"), "w") as f:
                f.write("\n".join(str(v) for v in red) + "\n")
            print(f"  r1: {rw}x{rh} reduced sidecar OK")
    print(f"battery of {len(CASES)} + {len(MULTI_CASES)} +"
          f" {len(IRREV_CASES)} fixtures in {OUT_DIR}")


if __name__ == "__main__":
    main()
