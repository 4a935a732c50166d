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
    return recs


def expected_rows():
    """(index, type, uri, status, payload_len, text_md5, text_chars) per
    record — payload is the DECODED entity body (after dechunk/gunzip);
    text is html_to_text for HTML responses, the raw payload decoded for
    everything else."""
    bodies = {
        2: PAGE_A, 3: PAGE_B, 6: PAGE_C,
        5: "<html><body><p>404 not here</p></body></html>",
        7: PAGE_B, 8: PAGE_A, 9: PAGE_C,
        10: PAGE_A_VAR, 11: PAGE_D,
    }
    rows = []
    for i, (rtype, uri, status, payload) in enumerate([
        ("warcinfo", "", -1, WARCINFO),
        ("request", "http://fixture.example/page-a", -1, ""),
        ("response", "http://fixture.example/page-a", 200, PAGE_A),
        ("response", "http://fixture.example/page-b", 200, PAGE_B),
        ("response", "http://fixture.example/robots.txt", 200, PLAIN_TXT),
        ("response", "http://fixture.example/missing", 404,
         "<html><body><p>404 not here</p></body></html>"),
        ("response", "http://fixture.example/page-c", 200, PAGE_C),
        ("response", "http://fixture.example/chunked", 200, PAGE_B),
        ("response", "http://fixture.example/gzipped", 200, PAGE_A),
        ("response", "http://fixture.example/both", 200, PAGE_C),
        ("response", "http://MIRROR.example:80/page-a-variant/", 200, PAGE_A_VAR),
        ("response", "http://mirror.example/page-d?b=2&a=1#sec", 200, PAGE_D),
    ]):
        if i in bodies:
            text = html_to_text(bodies[i])
        else:
            text = payload
        md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
        rows.append((i, rtype, uri, status, len(payload.encode("ascii")),
                     md5, len(text)))
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


def canonicalize_url(url: str) -> str:
    nofrag = re.match(r"^([^#]*)", url.strip()).group(1)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", nofrag)
    if not m:
        return nofrag
    scheme = m.group(1).lower()
    rest = nofrag[m.end():]
    authority = re.sub(r"^[^@]*@", "", re.match(r"^([^/?]*)", rest).group(1)).lower()
    pathquery = re.sub(r"^[^/?]*", "", rest)
    path = re.match(r"^([^?]*)", pathquery).group(1)
    query = re.sub(r"^[^?]*\?", "", pathquery) if "?" in pathquery else ""
    host = re.match(r"^([^:]*)", authority).group(1)
    port = re.search(r":([0-9]*)$", authority).group(1) if ":" in authority else ""
    keep = port != "" and not ((scheme == "http" and port == "80") or
                               (scheme == "https" and port == "443"))
    auth = host + ((":" + port) if keep else "")
    stripped = re.sub(r"/+$", "", path)
    cpath = stripped if stripped else "/"
    params = sorted(p for p in query.split("&") if p)
    cquery = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{auth}{cpath}{cquery}"


def registered_domain(url: str) -> str:
    nofrag = re.match(r"^([^#]*)", url.strip()).group(1)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", nofrag)
    rest = nofrag[m.end():] if m else nofrag
    authority = re.sub(r"^[^@]*@", "", re.match(r"^([^/?]*)", rest).group(1)).lower()
    host = re.match(r"^([^:]*)", authority).group(1)
    labels = host.split(".")
    if re.fullmatch(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", host) or len(labels) <= 1:
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
        i, rtype, uri, status, plen, md5, nch = row
        print(f"  (CAST({i} AS BIGINT), '{rtype}', '{uri}', "
              f"CAST({status} AS BIGINT), CAST({plen} AS BIGINT), "
              f"'{md5}', CAST({nch} AS BIGINT)),")

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
