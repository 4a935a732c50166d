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
                                     gzip.compress(PAGE_A.encode("ascii")),
                                     ["Content-Encoding: gzip"])))
    recs.append(record(9, "response", "http://fixture.example/both",
                       "application/http; msgtype=response",
                       http_response(200, "OK", "text/html",
                                     chunked(gzip.compress(
                                         PAGE_C.encode("ascii"))),
                                     ["Transfer-Encoding: chunked",
                                      "Content-Encoding: gzip"])))
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
    ]):
        if i in bodies:
            text = html_to_text(bodies[i])
        else:
            text = payload
        md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
        rows.append((i, rtype, uri, status, len(payload.encode("ascii")),
                     md5, len(text)))
    return rows


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
            f.write(gzip.compress(r))
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
                      ("http://fixture.example/both", PAGE_C)]:
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
                      ("http://fixture.example/both", PAGE_C)]:
        mt = main_text(html)
        if len(mt) < 40:
            continue
        groups.setdefault(mt, []).append(uri)
    for mt, uris in sorted(groups.items(), key=lambda kv: min(kv[1])):
        print(f"  ('{min(uris)}', CAST({len(uris)} AS BIGINT), "
              f"CAST({len(mt.split())} AS BIGINT), "
              f"CAST({len(mt)} AS BIGINT)),")

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
