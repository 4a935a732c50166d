#!/usr/bin/env python3
"""Independent WARC fixture generator + oracle for q164.

Writes src/main/resources/graft/warc/tiny.warc.gz (per-record gzip members,
the Common-Crawl layout) and tiny.warc (the identical records, plain), and
prints the DuckDB VALUES rows for q164's oracle: per record, the metadata
plus the md5/length of the EXTRACTED text, computed by THIS script's own
Python implementation of the documented extraction spec (HtmlFunctions
scaladoc) — fully independent of the Scala code under test.

Run: python3 scripts/gen_warc_fixture.py
"""
import gzip
import hashlib
import os
import re

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "warc")


def gz(data: bytes) -> bytes:
    """gzip with mtime pinned to 0 so regeneration is byte-deterministic."""
    return gzip.compress(data, mtime=0)


# ---------- the INDEPENDENT extraction replay (spec: HtmlFunctions) ------
ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")]


def html_to_text(html: str) -> str:
    s = re.sub(r"(?s)<!--.*?-->", " ", html)
    s = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", " ", s)
    s = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", " ", s)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    for a, b in ENTITIES:
        s = s.replace(a, b)
    return re.sub(r"\s+", " ", s).strip()


BLOCK_PAT = (r"(?i)</?(?:p|div|td|th|li|h[1-6]|tr|table|thead|tbody|ul|ol|"
             r"dl|dt|dd|section|article|main|header|footer|nav|aside|"
             r"blockquote|pre|form|fieldset|hr|br)\b[^>]*>")


def strip_tags(seg: str) -> str:
    s = re.sub(r"(?s)<[^>]*>", " ", seg)
    for a, b in ENTITIES:
        s = s.replace(a, b)
    return re.sub(r"\s+", " ", s).strip()


def main_text(html: str, min_chars: int = 25) -> str:
    s = re.sub(r"(?s)<!--.*?-->", " ", html)
    s = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", " ", s)
    s = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", " ", s)
    kept = []
    for seg in re.split(BLOCK_PAT, s):
        text = strip_tags(seg)
        anchors = re.findall(r"(?is)<a\b[^>]*>(.*?)</a\s*>", seg)
        link = strip_tags(" ".join(anchors))
        if len(text) >= min_chars and 3 * len(link) <= len(text):
            kept.append(text)
    return "\n".join(kept)


# ---------- fixture pages ------------------------------------------------
PAGE_A = """<!DOCTYPE html><html><head><title>Corpus page one</title>
<style type="text/css">body { color: #fff; } .x { display: none }</style>
<script src="app.js"></script>
<script type="text/javascript">var tracker = "do not extract"; if (1 < 2) { go(); }</script>
</head><body>
<!-- navigation chrome -->
<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About the site</a></li></ul></nav>
<div class="main"><h1>Observation networks &amp; data cubes</h1>
<p>Earth observation archives grow by petabytes every year, and the
pipelines that clean them decide what models can learn.</p>
<P>Deduplication, language identification &lt;and&gt; quality scoring run
before any tokenizer sees a byte &mdash; order matters.</P>
</div>
<footer><a href="/terms">Terms</a> &middot; <a href="/privacy">Privacy</a></footer>
</body></html>"""

PAGE_B = """<html><body>
<SCRIPT>console.log("upper case tag");</SCRIPT>
<div id=content>The &quot;data quality&quot; loop: measure, filter,
re-measure &#39;until&#39; the corpus stops changing. Costs scale with
bytes scanned, not rows kept.</div>
<div class="links"><a href="a">one</a> <a href="b">two</a> <a href="c">three</a></div>
<br>Trailing tail text outside any div, long enough to keep as a block.
</body></html>"""

PAGE_C = """<html><body><p>Short.</p>
<p>An unclosed script below keeps its text by design:</p>
<script>var broken = true;
<p>visible because the script never closed</p>
</body></html>"""

PAGE_A_VAR = PAGE_A.replace(
    "pipelines that clean them decide what models can learn",
    "pipelines that curate them shape what models can learn").replace(
    "Corpus page one", "Corpus page one (mirror)")

PAGE_D = """<html><body>
<div><p>Shard manifests record every exported file with its row count and
byte size, so a resumable loader can verify completeness before training
starts rather than failing mid-epoch.</p></div>
<footer><a href="/terms">Terms</a></footer>
</body></html>"""

PLAIN_TXT = "robots: disallow nothing\nsitemap: /sitemap.xml\n"


# ---------- media payloads (image/audio response records) -----------------
# The INDEPENDENT replay of the signature plane: PNG/WAV encoded here with
# stdlib struct+zlib, perceptual hashes recomputed from the same formulas
# (no Scala involved) — margins asserted so float order can't flip a bit.

def png_gray(pix):
    """8-bit grayscale PNG around pix[y][x] (0..255)."""
    import struct
    import zlib
    h, w = len(pix), len(pix[0])

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data) & 0xffffffff))
    raw = b"".join(b"\x00" + bytes(row) for row in pix)
    return (b"\x89PNG\r\n\x1a\n" +
            chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)) +
            chunk(b"IDAT", zlib.compress(raw, 9)) +
            chunk(b"IEND", b""))


def img_pixels(img, perturb=False):
    """The q169 battery pixel formula (a different img id), optionally with
    the +1-where-(x+y)%5==0 near-dup perturbation; 8-bit-exact asserted."""
    pix = [[((x * 7 + y * 13 + img * 29) * (x + y + img + 1) + x * y) % 256
            + (1 if perturb and (x + y) % 5 == 0 else 0)
            for x in range(32)] for y in range(32)]
    assert all(0 <= v <= 255 for row in pix for v in row)
    return pix


def phash64(g):
    """The PHash64Expr contract: 8x8 plain-cosine DCT of the 32x32 grid,
    63-AC exact-middle median, sign bits at u*8+v. Unsigned 64-bit."""
    import math
    c = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for yy in range(32):
                for x in range(32):
                    s += (g[yy][x] * math.cos((2 * x + 1) * u * math.pi / 64)
                          * math.cos((2 * yy + 1) * v * math.pi / 64))
            c[u * 8 + v] = s
    med = sorted(c[1:])[31]
    margin = min(abs(x - med) for x in c if abs(x - med) > 0)
    assert margin > 1e-3, f"phash margin {margin} too small"
    h = 0
    for k in range(64):
        if c[k] > med:
            h |= 1 << k
    return h


def wav_pcm16(samples, rate=8000):
    """Canonical 44-byte RIFF/WAVE mono PCM16 (the pcm16Wav layout)."""
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" +
            b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16) +
            b"data" + struct.pack("<I", len(data)) + data)


def tone_samples(tid, gain=1):
    return [gain * (((tid + 3) * ((n * n) % 977) + 17 * n) % 4096 - 2048)
            for n in range(1024)]


def afp64(x):
    """The Afp64Expr contract: 5x64-sample frames -> 17 WHT sequency bands
    of 3 bins each (integer-exact) -> Haitsma-Kalker double-difference
    sign bits at (t-1)*16+b. Unsigned 64-bit."""
    def sgn(n, k):
        return 1 if bin(n & k).count("1") % 2 == 0 else -1
    e = [[0] * 17 for _ in range(5)]
    for t in range(5):
        for b in range(17):
            tot = 0
            for j in range(3):
                k = b * 3 + j + 1
                w = sum(x[t * 64 + n] * sgn(n, k) for n in range(64))
                tot += w * w
            e[t][b] = tot
    h = 0
    for t in range(1, 5):
        for b in range(16):
            diff = (e[t][b] - e[t][b + 1]) - (e[t - 1][b] - e[t - 1][b + 1])
            if diff > 0:
                h |= 1 << ((t - 1) * 16 + b)
    return h


IMG_A = png_gray(img_pixels(20))
IMG_A_VAR = png_gray(img_pixels(20, perturb=True))   # near-dup of IMG_A
IMG_B = png_gray(img_pixels(22))                     # distinct
TONE_A = wav_pcm16(tone_samples(30))
TONE_A_GAIN = wav_pcm16(tone_samples(30, gain=2))    # afp-identical twin

# video records embed the committed avc1 corpus clips (generated and
# round-trip-verified by scripts/gen_h264_fixture.py); CLIP_A is re-hosted
# byte-identical on a second domain (dist-0 keyframe-pHash pair by
# construction), CLIP_B is a distinct clip
H264_CORPUS = os.path.join(os.path.dirname(__file__), "..",
                           "src", "main", "resources", "graft", "h264",
                           "corpus")
with open(os.path.join(H264_CORPUS, "clip_00.mp4"), "rb") as _f:
    CLIP_A = _f.read()
with open(os.path.join(H264_CORPUS, "clip_01.mp4"), "rb") as _f:
    CLIP_B = _f.read()
# first-keyframe pHashes of clip_00/clip_01 — the q173 oracle literals,
# produced by gen_h264_fixture.py's INDEPENDENT python-encoder replay
# (section 14); carried here (as unsigned) to replay the video near-dup
# distances without re-decoding
CLIP_A_PHASH = 8636034951607170629 % (1 << 64)
CLIP_B_PHASH = 3676657861836354165 % (1 << 64)

WARCINFO = ("software: graft-fixture/1.0\r\n"
            "format: WARC File Format 1.0\r\n")

REQUEST = ("GET /page-a HTTP/1.1\r\n"
           "Host: fixture.example\r\n"
           "User-Agent: graft-fixture\r\n\r\n")


def http_response(status: int, reason: str, ctype: str, body: bytes,
                  extra_headers=()) -> bytes:
    head = f"HTTP/1.1 {status} {reason}\r\nContent-Type: {ctype}\r\n"
    for h in extra_headers:
        head += h + "\r\n"
    head += f"Content-Length: {len(body)}\r\n\r\n"
    return head.encode("ascii") + body


def chunked(body: bytes, sizes=(7, 64, 13)) -> bytes:
    """HTTP/1.1 chunked transfer coding: hex-size CRLF data CRLF ...,
    terminated by a 0-chunk (sizes cycle until the body is consumed)."""
    out = bytearray()
    i = 0
    k = 0
    while i < len(body):
        n = min(sizes[k % len(sizes)], len(body) - i)
        out += f"{n:x}".encode("ascii") + b"\r\n"
        out += body[i:i + n] + b"\r\n"
        i += n
        k += 1
    out += b"0\r\n\r\n"
    return bytes(out)


def record(rid: int, rtype: str, uri: str, ctype: str, block: bytes) -> bytes:
    h = ("WARC/1.0\r\n"
         f"WARC-Type: {rtype}\r\n"
         f"WARC-Record-ID: <urn:uuid:0000-{rid:04d}>\r\n"
         "WARC-Date: 2026-08-15T00:00:00Z\r\n")
    if uri:
        h += f"WARC-Target-URI: {uri}\r\n"
    h += f"Content-Type: {ctype}\r\nContent-Length: {len(block)}\r\n\r\n"
    return h.encode("ascii") + block + b"\r\n\r\n"


def build_records():
    recs = []
    recs.append(record(0, "warcinfo", "",
                       "application/warc-fields", WARCINFO.encode("ascii")))
    recs.append(record(1, "request", "http://fixture.example/page-a",
                       "application/http; msgtype=request",
                       REQUEST.encode("ascii")))
    recs.append(record(2, "response", "http://fixture.example/page-a",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html; charset=utf-8",
                                     PAGE_A.encode("ascii"))))
    recs.append(record(3, "response", "http://fixture.example/page-b",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     PAGE_B.encode("ascii"))))
    recs.append(record(4, "response", "http://fixture.example/robots.txt",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/plain",
                                     PLAIN_TXT.encode("ascii"))))
    recs.append(record(5, "response", "http://fixture.example/missing",
                       "application/http; msgtype=response",
                       http_response(404, "Not Found", "text/html",
                                     b"<html><body><p>404 not here</p></body></html>")))
    recs.append(record(6, "response", "http://fixture.example/page-c",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     PAGE_C.encode("ascii"))))
    # real-crawl body codings: chunked transfer, gzip content, and both
    recs.append(record(7, "response", "http://fixture.example/chunked",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     chunked(PAGE_B.encode("ascii")),
                                     ["Transfer-Encoding: chunked"])))
    recs.append(record(8, "response", "http://fixture.example/gzipped",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     gz(PAGE_A.encode("ascii")),
                                     ["Content-Encoding: gzip"])))
    recs.append(record(9, "response", "http://fixture.example/both",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     chunked(gz(
                                         PAGE_C.encode("ascii"))),
                                     ["Transfer-Encoding: chunked",
                                      "Content-Encoding: gzip"])))
    # a second registered domain carrying a NEAR-duplicate of page-a (a
    # few words changed — survives exact dedup, collapses under minhash
    # LSH) plus a distinct page; the mirror URL needs canonicalization
    # (host case, default port, trailing slash) before domain grouping
    recs.append(record(10, "response", "http://MIRROR.example:80/page-a-variant/",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     PAGE_A_VAR.encode("ascii"))))
    recs.append(record(11, "response", "http://mirror.example/page-d?b=2&a=1#sec",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     PAGE_D.encode("ascii"))))
    # media response records — the multimodal half of the crawl: two PNGs
    # that are perceptual near-dups across domains (the copy needs URL
    # canonicalization), one distinct PNG delivered gzip-encoded (binary
    # body through Content-Encoding), and a WAV with a x2-gain twin
    # (afp-identical by the fingerprint's gain invariance)
    recs.append(record(12, "response", "http://fixture.example/img-a.png",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "image/png", IMG_A)))
    recs.append(record(13, "response", "http://MIRROR.example:80/img-a-copy.png",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "image/png", IMG_A_VAR)))
    recs.append(record(14, "response", "http://fixture.example/img-b.png",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "image/png", gz(IMG_B),
                                     ["Content-Encoding: gzip"])))
    recs.append(record(15, "response", "http://fixture.example/tone-a.wav",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "audio/x-wav", TONE_A)))
    recs.append(record(16, "response", "http://mirror.example/tone-a-gain.wav",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "audio/x-wav", TONE_A_GAIN)))
    # video: a clip re-hosted byte-identical on the mirror domain (dist-0
    # keyframe-pHash pair) and a distinct clip
    recs.append(record(17, "response", "http://fixture.example/clip-a.mp4",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "video/mp4", CLIP_A)))
    recs.append(record(18, "response", "http://MIRROR.example:80/clip-a-copy.mp4",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "video/mp4", CLIP_A)))
    recs.append(record(19, "response", "http://fixture.example/clip-b.mp4",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "video/mp4", CLIP_B)))
    return recs


def q194_rows():
    """Independent replay of the q194 link graph: out-link extraction
    (same documented contract as HtmlFunctions.extractLinks — comments/
    scripts removed first, first href attribute, quote styles, anchor
    text under the strip_tags semantics) with absolutization via the
    stdlib's OWN RFC 3986 implementation (urljoin), fragments stripped
    (a fetch target has no fragment)."""
    from urllib.parse import urljoin
    pages = [("http://fixture.example/page-a", PAGE_A),
             ("http://fixture.example/page-b", PAGE_B),
             ("http://fixture.example/page-c", PAGE_C),
             ("http://fixture.example/chunked", PAGE_B),
             ("http://fixture.example/gzipped", PAGE_A),
             ("http://fixture.example/both", PAGE_C),
             ("http://MIRROR.example:80/page-a-variant/", PAGE_A_VAR),
             ("http://mirror.example/page-d?b=2&a=1#sec", PAGE_D)]
    out = []
    for uri, html in pages:
        s = re.sub(r"(?s)<!--.*?-->", " ", html)
        s = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", " ", s)
        s = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", " ", s)
        for el in re.findall(r"(?is)<a\b[^>]*>.*?</a\s*>", s):
            m = re.search(
                r"(?is)<a\b[^>]*?href\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+)", el)
            if not m:
                continue
            href = m.group(1)
            if href[:1] in "\"'":
                href = href[1:-1]
            inner = re.search(r"(?is)<a\b[^>]*>(.*?)</a\s*>", el).group(1)
            anchor = strip_tags(inner)
            resolved = re.sub(r"#.*$", "", urljoin(uri, href))
            out.append((uri, href, resolved, anchor))
    return sorted(out)


def expected_rows():
    """(index, type, uri, status, payload_len, payload_md5, text_md5,
    text_chars) per record — payload is the DECODED entity body (after
    dechunk/gunzip) and payload_md5 hashes those raw bytes for every
    record (the binary-integrity witness); text is html_to_text for HTML
    responses, the decoded payload for other text/non-HTTP records, and
    '' for binary responses (a crawler never UTF-8-decodes a PNG)."""
    html = {2, 3, 5, 6, 7, 8, 9, 10, 11}
    binary = {12, 13, 14, 15, 16, 17, 18, 19}
    rows = []
    for i, (rtype, uri, status, payload) in enumerate([
        ("warcinfo", "", -1, WARCINFO.encode("ascii")),
        ("request", "http://fixture.example/page-a", -1, b""),
        ("response", "http://fixture.example/page-a", 200, PAGE_A.encode("ascii")),
        ("response", "http://fixture.example/page-b", 200, PAGE_B.encode("ascii")),
        ("response", "http://fixture.example/robots.txt", 200, PLAIN_TXT.encode("ascii")),
        ("response", "http://fixture.example/missing", 404,
         b"<html><body><p>404 not here</p></body></html>"),
        ("response", "http://fixture.example/page-c", 200, PAGE_C.encode("ascii")),
        ("response", "http://fixture.example/chunked", 200, PAGE_B.encode("ascii")),
        ("response", "http://fixture.example/gzipped", 200, PAGE_A.encode("ascii")),
        ("response", "http://fixture.example/both", 200, PAGE_C.encode("ascii")),
        ("response", "http://MIRROR.example:80/page-a-variant/", 200, PAGE_A_VAR.encode("ascii")),
        ("response", "http://mirror.example/page-d?b=2&a=1#sec", 200, PAGE_D.encode("ascii")),
        ("response", "http://fixture.example/img-a.png", 200, IMG_A),
        ("response", "http://MIRROR.example:80/img-a-copy.png", 200, IMG_A_VAR),
        ("response", "http://fixture.example/img-b.png", 200, IMG_B),
        ("response", "http://fixture.example/tone-a.wav", 200, TONE_A),
        ("response", "http://mirror.example/tone-a-gain.wav", 200, TONE_A_GAIN),
        ("response", "http://fixture.example/clip-a.mp4", 200, CLIP_A),
        ("response", "http://MIRROR.example:80/clip-a-copy.mp4", 200, CLIP_A),
        ("response", "http://fixture.example/clip-b.mp4", 200, CLIP_B),
    ]):
        if i in html:
            text = html_to_text(payload.decode("ascii"))
        elif i in binary:
            text = ""
        else:
            text = payload.decode("ascii")
        pmd5 = hashlib.md5(payload).hexdigest()
        tmd5 = hashlib.md5(text.encode("utf-8")).hexdigest()
        rows.append((i, rtype, uri, status, len(payload),
                     pmd5, tmd5, len(text)))
    return rows


# ---------- the INDEPENDENT q170 replay: crawl -> training shards --------
# Mirrors the documented contracts (UrlFunctions scaladoc, DedupFunctions
# minhash/LSH/dedupNear, SamplingFunctions.capPerGroup/shardByTokenBudget)
# in plain Python — no Scala involved.

TWO_LEVEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "gov.za",
    "com.ar", "com.tr", "com.tw", "com.sg", "com.hk", "com.my",
    "co.nz", "org.nz", "govt.nz",
    "co.id", "or.id", "ac.id", "go.id"}


def pct_normalize(s: str) -> str:
    """RFC 3986 percent-escape normalization (the UrlFunctions contract):
    unreserved bytes decode, other valid escapes upcase their hex,
    malformed escapes pass verbatim."""
    parts = s.split("%")
    out = [parts[0]]
    for p in parts[1:]:
        h = p[:2].upper()
        if not re.fullmatch(r"[0-9A-F]{2}", h or ""):
            out.append("%" + p)
        elif re.fullmatch(r"3[0-9]|4[1-9A-F]|5[0-9A]|6[1-9A-F]|7[0-9A]|2[DE]|5F|7E", h):
            out.append(chr(int(h, 16)) + p[2:])
        else:
            out.append("%" + h + p[2:])
    return "".join(out)


def split_host_port(authority: str):
    """IPv6-aware host/port split of a lowercased authority."""
    if authority.startswith("["):
        m = re.match(r"^(\[[^\]]*\])", authority)
        host = m.group(1) if m else ""
        pm = re.match(r"^\[[^\]]*\]:([0-9]+)$", authority)
        port = pm.group(1) if pm else ""
        return host, port
    host = re.match(r"^([^:]*)", authority).group(1)
    port = re.search(r":([0-9]*)$", authority).group(1) if ":" in authority else ""
    return host, port


def canonicalize_url(url: str) -> str:
    nofrag = re.match(r"^([^#]*)", url.strip()).group(1)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", nofrag)
    if not m:
        return nofrag
    scheme = m.group(1).lower()
    rest = nofrag[m.end():]
    authority = re.sub(r"^[^@]*@", "", re.match(r"^([^/?]*)", rest).group(1)).lower()
    pathquery = re.sub(r"^[^/?]*", "", rest)
    path = pct_normalize(re.match(r"^([^?]*)", pathquery).group(1))
    query = pct_normalize(re.sub(r"^[^?]*\?", "", pathquery)) if "?" in pathquery else ""
    host, port = split_host_port(authority)
    keep = port != "" and not ((scheme == "http" and port == "80") or
                               (scheme == "https" and port == "443"))
    auth = host + ((":" + port) if keep else "")
    stripped = re.sub(r"/+$", "", path)
    cpath = stripped if stripped else "/"
    params = sorted(p for p in query.split("&") if p)
    cquery = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{auth}{cpath}{cquery}"


def registered_domain(url: str) -> str:
    """The two-label-suffix SUBSET of the UrlFunctions PSL algorithm —
    sufficient for the fixture's hosts (the wildcard/exception/3-label
    rules never fire on fixture.example/mirror.example); the full PSL
    battery is oracled separately in q171."""
    nofrag = re.match(r"^([^#]*)", url.strip()).group(1)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", nofrag)
    rest = nofrag[m.end():] if m else nofrag
    authority = re.sub(r"^[^@]*@", "", re.match(r"^([^/?]*)", rest).group(1)).lower()
    host, _ = split_host_port(authority)
    labels = host.split(".")
    if (re.fullmatch(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", host)
            or host.startswith("[") or len(labels) <= 1):
        return host
    if len(labels) >= 3 and ".".join(labels[-2:]) in TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def md5hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def minhash_sig(text: str, n: int, k: int):
    toks = text.split()
    shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    if not shingles:
        return [None] * k
    return [min(md5hex(f"s{j}" + sh) for sh in shingles) for j in range(k)]


def jaccard3(a: str, b: str, n: int = 3) -> float:
    ta, tb = a.split(), b.split()
    sa = {" ".join(ta[i:i + n]) for i in range(len(ta) - n + 1)}
    sb = {" ".join(tb[i:i + n]) for i in range(len(tb) - n + 1)}
    u = len(sa | sb)
    return (len(sa & sb) / u) if u else 0.0


def q170_rows(bands=4, rows_per_band=2, n=3, tau=0.6, cap=2,
              seed="crawl", shard_tokens=30, buckets=4096):
    # 1. the .warc.gz 200 HTML pages (one copy per record)
    pages = [
        (2, "http://fixture.example/page-a", PAGE_A),
        (3, "http://fixture.example/page-b", PAGE_B),
        (6, "http://fixture.example/page-c", PAGE_C),
        (7, "http://fixture.example/chunked", PAGE_B),
        (8, "http://fixture.example/gzipped", PAGE_A),
        (9, "http://fixture.example/both", PAGE_C),
        (10, "http://MIRROR.example:80/page-a-variant/", PAGE_A_VAR),
        (11, "http://mirror.example/page-d?b=2&a=1#sec", PAGE_D),
    ]
    # 2. main text + quality gate, canonical url + registered domain
    docs = []
    for rid, uri, html in pages:
        mt = main_text(html)
        if len(mt) < 40:
            continue
        docs.append(dict(rid=rid, canon=canonicalize_url(uri),
                         dom=registered_domain(uri), mt=mt))
    # 3. exact dedup by main text: keeper = the min-rid (first-crawled)
    #    ROW — canon/dom/rid all come from that one record so they stay
    #    mutually consistent (a group spanning registered domains reports
    #    the keeper's domain, not an unrelated min)
    groups = {}
    for d in docs:
        groups.setdefault(d["mt"], []).append(d)
    exact = []
    for mt, ds in groups.items():
        k = min(ds, key=lambda x: x["rid"])
        exact.append(dict(mt=mt, canon=k["canon"], dom=k["dom"],
                          rid=k["rid"], n=len(ds)))
    # 4. near-dedup FIRST (caps must count unique content, not copies):
    #    minhash LSH candidates -> exact jaccard >= tau -> union-find
    #    components -> keep min rid
    k = bands * rows_per_band
    sigs = {d["rid"]: minhash_sig(d["mt"], n, k) for d in exact}
    pairs = set()
    for b in range(bands):
        keymap = {}
        for d in exact:
            key = "|".join(x or "" for x in sigs[d["rid"]][b * rows_per_band:(b + 1) * rows_per_band])
            keymap.setdefault(key, []).append(d)
        for ds in keymap.values():
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    a, c = sorted((ds[i], ds[j]), key=lambda d: d["rid"])
                    if jaccard3(a["mt"], c["mt"], n) >= tau:
                        pairs.add((a["rid"], c["rid"]))
    parent = {}
    def find(x):
        while parent.get(x, x) != x:
            x = parent.get(x, x)
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    neared = [d for d in exact if find(d["rid"]) == d["rid"]]
    # 5. per-domain cap: keep `cap` per dom by (md5(canon), canon)
    kept = []
    bydom = {}
    for d in neared:
        bydom.setdefault(d["dom"], []).append(d)
    for dom, ds in bydom.items():
        ds.sort(key=lambda d: (md5hex(d["canon"]), d["canon"]))
        kept.extend(ds[:cap])
    # 6. token counts + shardByTokenBudget(md5(seed||rid) bucketing,
    #    per-bucket offsets, prefix sums in (h, rid) order)
    for d in kept:
        d["tok"] = len(d["mt"].split())
        d["h"] = md5hex(seed + str(d["rid"]))
        d["b"] = int(d["h"][:4], 16) * buckets // 65536
    totals = {}
    for d in kept:
        totals[d["b"]] = totals.get(d["b"], 0) + d["tok"]
    offs, acc = {}, 0
    for b in sorted(totals):
        offs[b] = acc
        acc += totals[b]
    out = []
    for b in sorted({d["b"] for d in kept}):
        run = offs[b]
        for d in sorted((d for d in kept if d["b"] == b),
                        key=lambda d: (d["h"], d["rid"])):
            d["shard"] = run // shard_tokens
            run += d["tok"]
    for d in sorted(kept, key=lambda d: d["canon"]):
        out.append((d["canon"], d["dom"], d["n"], d["tok"], d["shard"]))
    return out


# ---------- the INDEPENDENT q198 replay: plan -> fetch -> corpus ---------


def q198_rows(cap=25, default_delay=1.0, bands=4, rows_per_band=2, n=3,
              tau=0.6, seed="lifecycle", shard_tokens=30, buckets=4096):
    """Independent replay of the q198 crawl lifecycle: DISCOVERY (archive
    addresses + out-links of fetched pages, canonicalized) -> robots gate
    (graftbot policy over both fixture hosts) -> per-host cap -> Crawl-
    delay schedule = the PLAN; joined against the .warc.gz archive as the
    fetch results (hit/miss/status/content-type); the fetched HTML subset
    then runs gate -> exact dedup -> near dedup -> token shards. One row
    per planned URL: (url, fetch_at, outcome, shard|None)."""
    from urllib.parse import urljoin
    archive = [
        (2, "http://fixture.example/page-a", 200, "text/html; charset=utf-8", PAGE_A),
        (3, "http://fixture.example/page-b", 200, "text/html", PAGE_B),
        (4, "http://fixture.example/robots.txt", 200, "text/plain", None),
        (5, "http://fixture.example/missing", 404, "text/html", None),
        (6, "http://fixture.example/page-c", 200, "text/html", PAGE_C),
        (7, "http://fixture.example/chunked", 200, "text/html", PAGE_B),
        (8, "http://fixture.example/gzipped", 200, "text/html", PAGE_A),
        (9, "http://fixture.example/both", 200, "text/html", PAGE_C),
        (10, "http://MIRROR.example:80/page-a-variant/", 200, "text/html", PAGE_A_VAR),
        (11, "http://mirror.example/page-d?b=2&a=1#sec", 200, "text/html", PAGE_D),
        (12, "http://fixture.example/img-a.png", 200, "image/png", None),
        (13, "http://MIRROR.example:80/img-a-copy.png", 200, "image/png", None),
        (14, "http://fixture.example/img-b.png", 200, "image/png", None),
        (15, "http://fixture.example/tone-a.wav", 200, "audio/x-wav", None),
        (16, "http://mirror.example/tone-a-gain.wav", 200, "audio/x-wav", None),
        (17, "http://fixture.example/clip-a.mp4", 200, "video/mp4", None),
        (18, "http://MIRROR.example:80/clip-a-copy.mp4", 200, "video/mp4", None),
        (19, "http://fixture.example/clip-b.mp4", 200, "video/mp4", None),
    ]
    by_canon = {canonicalize_url(u): (rid, st, ct, body)
                for rid, u, st, ct, body in archive}
    # discovery: every archive address + every out-link of a fetched page
    # (q194's extraction/resolution), all canonicalized
    discovered = set(by_canon)
    for _, _, resolved, _ in q194_rows():
        discovered.add(canonicalize_url(resolved))
    # robots gate (graftbot): fixture.example names the token, mirror's
    # star group applies; REP longest-match with '*'/'$', allow wins ties
    rules = {
        "fixture.example": [(False, "/privacy")],
        "mirror.example": [(False, "/terms$")],
    }
    delays = {"fixture.example": 2.0}

    def rule_re(rule):
        end = rule.endswith("$")
        body = rule[:-1] if end else rule
        return "^" + re.escape(body).replace(r"\*", ".*") + ("$" if end else "")

    def allowed(url):
        m = re.match(r"^https?://([^/?]*)", url)
        host = m.group(1)
        rest = url[m.end():]
        path = re.match(r"^([^?]*)", rest).group(1) or "/"
        query = rest[len(path):]
        tgt = path + (query if query not in ("", "?") else "")
        best = (-1, True)
        for allow, rule in rules.get(host, []):
            if re.match(rule_re(rule), tgt) and (
                    len(rule) > best[0] or (len(rule) == best[0] and allow)):
                best = (len(rule), allow)
        return best[1]

    def host_of(url):
        return re.match(r"^https?://([^/?]*)", url).group(1)

    fetchable = sorted(u for u in discovered if allowed(u))
    # per-host cap (md5 rank) then the politeness ladder at the host delay
    plan = []
    byhost = {}
    for u in fetchable:
        byhost.setdefault(host_of(u), []).append(u)
    for h, us in byhost.items():
        us.sort(key=lambda u: (md5hex(u), u))
        d = delays.get(h, default_delay)
        for i, u in enumerate(us[:cap]):
            plan.append(dict(url=u, fetch_at=round(i * d, 2)))
    # fetch-results join + corpus build over the planned HTML subset
    docs = []
    for p in plan:
        rec = by_canon.get(p["url"])
        if rec is None:
            p["outcome"] = "miss"
            continue
        rid, st, ct, body = rec
        if st != 200:
            p["outcome"] = "error"
        elif not ct.startswith("text/html"):
            p["outcome"] = "skip"
        else:
            mt = main_text(body)
            if len(mt) < 40:
                p["outcome"] = "thin"
            else:
                p["outcome"] = None  # decided by dedup below
                docs.append(dict(plan=p, rid=rid, mt=mt))
    groups = {}
    for d in docs:
        groups.setdefault(d["mt"], []).append(d)
    keepers = []
    for mt, ds in groups.items():
        k = min(ds, key=lambda x: x["rid"])
        for d in ds:
            if d is not k:
                d["plan"]["outcome"] = "dup"
        keepers.append(k)
    k = bands * rows_per_band
    sigs = {d["rid"]: minhash_sig(d["mt"], n, k) for d in keepers}
    pairs = set()
    for b in range(bands):
        keymap = {}
        for d in keepers:
            key = "|".join(x or "" for x in
                           sigs[d["rid"]][b * rows_per_band:(b + 1) * rows_per_band])
            keymap.setdefault(key, []).append(d)
        for ds in keymap.values():
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    a, c = sorted((ds[i], ds[j]), key=lambda d: d["rid"])
                    if jaccard3(a["mt"], c["mt"], n) >= tau:
                        pairs.add((a["rid"], c["rid"]))
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent.get(x, x)
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    kept = []
    for d in keepers:
        if find(d["rid"]) == d["rid"]:
            kept.append(d)
        else:
            d["plan"]["outcome"] = "near"
    # shardByTokenBudget replay (seed-bucketed prefix sums) over the kept
    for d in kept:
        d["tok"] = len(d["mt"].split())
        d["h"] = md5hex(seed + str(d["rid"]))
        d["b"] = int(d["h"][:4], 16) * buckets // 65536
    totals = {}
    for d in kept:
        totals[d["b"]] = totals.get(d["b"], 0) + d["tok"]
    offs, acc = {}, 0
    for b in sorted(totals):
        offs[b] = acc
        acc += totals[b]
    for b in sorted({d["b"] for d in kept}):
        run = offs[b]
        for d in sorted((d for d in kept if d["b"] == b),
                        key=lambda d: (d["h"], d["rid"])):
            d["plan"]["outcome"] = "kept"
            d["plan"]["shard"] = run // shard_tokens
            run += d["tok"]
    return [(p["url"], p["fetch_at"], p["outcome"], p.get("shard"))
            for p in sorted(plan, key=lambda p: p["url"])]


# ---------- the INDEPENDENT q175 replay: multimodal crawl near-dedup -----
# WARC -> route by content type -> text: mainText + minhash-LSH near-dedup
# (the q170 front half); image: PNG -> pHash; audio: WAV -> afp -> hamming
# pairs <= 4 -> union-find per modality -> kept representatives.

def _components(ids, pairs):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent.get(x, x)
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    return comp


def q175_rows(bands=4, rows_per_band=2, n=3, tau=0.6, max_dist=4):
    rows = []
    # text: the q170 front half (gate -> exact dedup keeper=min-rid row ->
    # minhash LSH + jaccard pairs -> components); n_members counts CRAWL
    # RECORDS (exact copies included) collapsing into each keeper
    pages = [
        (2, "http://fixture.example/page-a", PAGE_A),
        (3, "http://fixture.example/page-b", PAGE_B),
        (6, "http://fixture.example/page-c", PAGE_C),
        (7, "http://fixture.example/chunked", PAGE_B),
        (8, "http://fixture.example/gzipped", PAGE_A),
        (9, "http://fixture.example/both", PAGE_C),
        (10, "http://MIRROR.example:80/page-a-variant/", PAGE_A_VAR),
        (11, "http://mirror.example/page-d?b=2&a=1#sec", PAGE_D),
    ]
    docs = []
    for rid, uri, html in pages:
        mt = main_text(html)
        if len(mt) >= 40:
            docs.append(dict(rid=rid, canon=canonicalize_url(uri), mt=mt))
    groups = {}
    for d in docs:
        groups.setdefault(d["mt"], []).append(d)
    exact = []
    for mt, ds in groups.items():
        k = min(ds, key=lambda x: x["rid"])
        exact.append(dict(mt=mt, canon=k["canon"], rid=k["rid"], n=len(ds)))
    k = bands * rows_per_band
    sigs = {d["rid"]: minhash_sig(d["mt"], n, k) for d in exact}
    pairs = set()
    for b in range(bands):
        keymap = {}
        for d in exact:
            key = "|".join(x or "" for x in
                           sigs[d["rid"]][b * rows_per_band:(b + 1) * rows_per_band])
            keymap.setdefault(key, []).append(d)
        for ds in keymap.values():
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    a, c = sorted((ds[i], ds[j]), key=lambda d: d["rid"])
                    if jaccard3(a["mt"], c["mt"], n) >= tau:
                        pairs.add((a["rid"], c["rid"]))
    byrid = {d["rid"]: d for d in exact}
    for root, members in _components([d["rid"] for d in exact], pairs).items():
        keeper = byrid[min(members)]
        rows.append(("text", keeper["canon"],
                     sum(byrid[m]["n"] for m in members)))

    # image / audio: perceptual signature -> hamming <= max_dist pairs
    def media(modality, items, sig_fn):
        sigs = {rid: sig_fn(payload) for rid, _, payload in items}
        uris = {rid: canonicalize_url(uri) for rid, uri, _ in items}
        ids = sorted(sigs)
        mpairs = {(a, b) for ai, a in enumerate(ids) for b in ids[ai + 1:]
                  if bin(sigs[a] ^ sigs[b]).count("1") <= max_dist}
        for root, members in _components(ids, mpairs).items():
            rows.append((modality, uris[min(members)], len(members)))
    media("image", [(12, "http://fixture.example/img-a.png", img_pixels(20)),
                    (13, "http://MIRROR.example:80/img-a-copy.png", img_pixels(20, True)),
                    (14, "http://fixture.example/img-b.png", img_pixels(22))],
          phash64)
    media("audio", [(15, "http://fixture.example/tone-a.wav", tone_samples(30)),
                    (16, "http://mirror.example/tone-a-gain.wav", tone_samples(30, 2))],
          afp64)
    # video: byte-identical payloads hash identically BY CONSTRUCTION
    # (same decoder, same bytes); cross-clip distance replays from the
    # q173 literals (the independent python-encoder replay in
    # gen_h264_fixture.py) — sig_fn is identity over those hashes
    media("video", [(17, "http://fixture.example/clip-a.mp4", CLIP_A_PHASH),
                    (18, "http://MIRROR.example:80/clip-a-copy.mp4", CLIP_A_PHASH),
                    (19, "http://fixture.example/clip-b.mp4", CLIP_B_PHASH)],
          lambda h: h)
    return sorted(rows)


def kept_blocks(html: str, min_chars: int = 25):
    s = re.sub(r"(?s)<!--.*?-->", " ", html)
    s = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", " ", s)
    s = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", " ", s)
    kept = []
    for seg in re.split(BLOCK_PAT, s):
        text = strip_tags(seg)
        anchors = re.findall(r"(?is)<a\b[^>]*>(.*?)</a\s*>", seg)
        link = strip_tags(" ".join(anchors))
        if len(text) >= min_chars and 3 * len(link) <= len(text):
            kept.append(text)
    return kept


def main():
    os.makedirs(OUT, exist_ok=True)
    recs = build_records()
    with open(os.path.join(OUT, "tiny.warc"), "wb") as f:
        for r in recs:
            f.write(r)
    with open(os.path.join(OUT, "tiny.warc.gz"), "wb") as f:
        for r in recs:  # one gzip MEMBER per record (Common-Crawl layout)
            f.write(gz(r))
    print("wrote", OUT)

    print("\n-- q164 oracle VALUES (one set per file kind) --")
    for row in expected_rows():
        i, rtype, uri, status, plen, pmd5, tmd5, nch = row
        print(f"  (CAST({i} AS BIGINT), '{rtype}', '{uri}', "
              f"CAST({status} AS BIGINT), CAST({plen} AS BIGINT), "
              f"'{pmd5}', '{tmd5}', CAST({nch} AS BIGINT)),")

    # q165: main-content (density-filtered) extraction over the HTML
    # 200-responses — per page: kept-block count, main-text md5/length.
    print("\n-- q165 oracle VALUES --")
    for uri, html in [("http://fixture.example/page-a", PAGE_A),
                      ("http://fixture.example/page-b", PAGE_B),
                      ("http://fixture.example/page-c", PAGE_C),
                      # body-coded records decode to the same pages
                      ("http://fixture.example/chunked", PAGE_B),
                      ("http://fixture.example/gzipped", PAGE_A),
                      ("http://fixture.example/both", PAGE_C),
                      ("http://MIRROR.example:80/page-a-variant/", PAGE_A_VAR),
                      ("http://mirror.example/page-d?b=2&a=1#sec", PAGE_D)]:
        blocks = kept_blocks(html)
        mt = "\n".join(blocks)
        md5 = hashlib.md5(mt.encode("utf-8")).hexdigest()
        full = html_to_text(html)
        print(f"  ('{uri}', CAST({len(blocks)} AS BIGINT), '{md5}', "
              f"CAST({len(mt)} AS BIGINT), CAST({len(full)} AS BIGINT)),")

    # q168: the composed crawl->clean-corpus pipeline — main-text extract,
    # quality gate (>=40 main chars), exact dedup by main text (the coded
    # twins collapse onto their plain pages), per group the keeper uri,
    # copy count, token and char counts.
    print("\n-- q168 oracle VALUES --")
    groups = {}
    for uri, html in [("http://fixture.example/page-a", PAGE_A),
                      ("http://fixture.example/page-b", PAGE_B),
                      ("http://fixture.example/page-c", PAGE_C),
                      ("http://fixture.example/chunked", PAGE_B),
                      ("http://fixture.example/gzipped", PAGE_A),
                      ("http://fixture.example/both", PAGE_C),
                      ("http://MIRROR.example:80/page-a-variant/", PAGE_A_VAR),
                      ("http://mirror.example/page-d?b=2&a=1#sec", PAGE_D)]:
        mt = main_text(html)
        if len(mt) < 40:
            continue
        groups.setdefault(mt, []).append(uri)
    for mt, uris in sorted(groups.items(), key=lambda kv: min(kv[1])):
        print(f"  ('{min(uris)}', CAST({len(uris)} AS BIGINT), "
              f"CAST({len(mt.split())} AS BIGINT), "
              f"CAST({len(mt)} AS BIGINT)),")

    print("\n-- q170 oracle VALUES --")
    for row in q170_rows():
        uri, dom, n, tok, shard = row
        print(f"  ('{uri}', '{dom}', CAST({n} AS BIGINT), "
              f"CAST({tok} AS BIGINT), CAST({shard} AS BIGINT)),")

    print("\n-- q194 oracle VALUES (target_uri, href, resolved, anchor) --")
    for uri, href, resolved, anchor in q194_rows():
        print(f"  ('{uri}', '{href}', '{resolved}', '{anchor}'),")

    print("\n-- q175 oracle VALUES (modality, keeper_uri, n_members) --")
    for modality, uri, nm in q175_rows():
        print(f"  ('{modality}', '{uri}', CAST({nm} AS BIGINT)),")
    ia, iv = phash64(img_pixels(20)), phash64(img_pixels(20, True))
    print(f"-- img-a vs img-a-copy hamming: {bin(ia ^ iv).count('1')}")
    aa, ag = afp64(tone_samples(30)), afp64(tone_samples(30, 2))
    print(f"-- tone-a vs tone-a-gain hamming: {bin(aa ^ ag).count('1')}")

    print("\n-- main_text(PAGE_A) for the spec --")
    print(repr(main_text(PAGE_A)))
    print("\n-- main_text(PAGE_B) --")
    print(repr(main_text(PAGE_B)))
    print("\n-- html_to_text(PAGE_C) --")
    print(repr(html_to_text(PAGE_C)))
    print("\n-- main_text(PAGE_C) --")
    print(repr(main_text(PAGE_C)))


if __name__ == "__main__":
    main()
