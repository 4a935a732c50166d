"""Generate the checked-in JP2 test fixture and self-check the codec.

The fixture is a 12-bit single-band 97x61 image with the deterministic
pixel formula v(r,c) = (r*31 + c*7) % 3000 — the same role (and the same
independent-generator method) as tiny_scene_B1.tif. Ragged dims against
the 32x32 code-blocks and 2 decomposition levels exercise the tag-tree
grids, partial stripes and ceil-division subband geometry.

Self-checks before writing anything:
  1. unit: MQ encoder -> decoder round-trip on random bit/context streams
  2. unit: tag-tree encode -> decode on random grids
  3. unit: forward -> inverse 5/3 DWT on random signals
  4. end-to-end: encode_j2k -> decode_j2k == input pixels
"""

import random
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jp2codec as jc


def selftest_mq():
    rng = random.Random(7)
    for trial in range(20):
        n = rng.randint(1, 2000)
        bits = [rng.randint(0, 1) for _ in range(n)]
        ctxs = [rng.randint(0, jc.N_CTX - 1) for _ in range(n)]
        enc = jc.MQEncoder()
        for b, c in zip(bits, ctxs):
            enc.encode(b, c)
        data = enc.flush()
        dec = jc.MQDecoder(data)
        got = [dec.decode(c) for c in ctxs]
        assert got == bits, f"MQ round-trip failed at trial {trial}"


def selftest_tagtree():
    rng = random.Random(11)
    for trial in range(20):
        w, h = rng.randint(1, 9), rng.randint(1, 9)
        vals = [[rng.randint(0, 6) for _ in range(w)] for _ in range(h)]
        enc_tree = jc.TagTree(w, h)
        enc_tree.set_leaves(vals)
        bw = jc.BitWriter()
        # the zero-bitplane usage pattern: raise threshold until known
        for y in range(h):
            for x in range(w):
                t = 1
                while not enc_tree.known[0][y][x]:
                    enc_tree.encode(x, y, t, bw)
                    t += 1
        data = bw.flush()
        dec_tree = jc.TagTree(w, h)
        br = jc.BitReader(data)
        for y in range(h):
            for x in range(w):
                t = 1
                while True:
                    known, v = dec_tree.decode(x, y, t, br)
                    if known:
                        break
                    t += 1
                assert v == vals[y][x], f"tag tree ({x},{y}): {v} != {vals[y][x]}"


def selftest_dwt():
    rng = random.Random(13)
    for n in list(range(1, 20)) + [61, 97]:
        x = [rng.randint(-2048, 2047) for _ in range(n)]
        assert jc.inv53_1d(jc.fwd53_1d(x)) == x, f"1-D DWT round-trip n={n}"
    for (h, w) in [(1, 7), (7, 1), (5, 5), (13, 9), (61, 97)]:
        a = [[rng.randint(-2048, 2047) for _ in range(w)] for _ in range(h)]
        orig = [row[:] for row in a]
        assert jc.inv53_2d(jc.fwd53_2d(a)) == orig, f"2-D DWT round-trip {h}x{w}"


def selftest_blocks():
    rng = random.Random(17)
    for trial in range(10):
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        mags = [[max(0, rng.randint(-40, 400)) for _ in range(w)] for _ in range(h)]
        negs = [[rng.random() < 0.4 for _ in range(w)] for _ in range(h)]
        orient = rng.choice(['LL', 'HL', 'LH', 'HH'])
        nbps, npasses, data = jc.encode_block(mags, negs, w, h, orient)
        if nbps == 0:
            assert all(m == 0 for row in mags for m in row)
            continue
        gm, gn = jc.decode_block_passes(data, w, h, orient, nbps, npasses)
        for y in range(h):
            for x in range(w):
                assert gm[y][x] == mags[y][x], \
                    f"trial {trial} mag ({x},{y}): {gm[y][x]} != {mags[y][x]}"
                if mags[y][x] != 0:
                    assert gn[y][x] == negs[y][x], f"trial {trial} sign ({x},{y})"


H, W, DEPTH, LEVELS = 61, 97, 12, 2


def fixture_pixels():
    return [(r * 31 + c * 7) % 3000 for r in range(H) for c in range(W)]


def main():
    selftest_mq()
    print("MQ coder round-trip: OK")
    selftest_tagtree()
    print("tag trees: OK")
    selftest_dwt()
    print("5/3 DWT: OK")
    selftest_blocks()
    print("T1 block coder: OK")

    px = fixture_pixels()
    stream = jc.encode_j2k(px, H, W, DEPTH, LEVELS)
    dh, dw, dd, got = jc.decode_j2k(stream)
    assert (dh, dw, dd) == (H, W, DEPTH)
    assert got == px, "end-to-end self-decode mismatch"
    print(f"end-to-end {W}x{H}@{DEPTH}bit levels={LEVELS}: OK "
          f"({len(stream)} byte codestream)")

    jp2 = jc.wrap_jp2(stream, H, W, DEPTH)
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "src/main/resources/graft/tiny_band_B02.jp2"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(jp2)
    print(f"wrote {out} ({len(jp2)} bytes)")

    # a second, raw-codestream fixture with different geometry (single
    # level, dims under one code-block) for the Scala spec
    px2 = [(r * 13 + c * 5) % 997 for r in range(10) for c in range(23)]
    s2 = jc.encode_j2k(px2, 10, 23, 10, 1)
    d2 = jc.decode_j2k(s2)
    assert d2 == (10, 23, 10, px2)
    out2 = os.path.join(os.path.dirname(out), "tiny_band_raw.j2k")
    with open(out2, "wb") as f:
        f.write(s2)
    print(f"wrote {out2} ({len(s2)} bytes)")


if __name__ == "__main__":
    main()
