#!/usr/bin/env python3
"""Independent charset-decode fixture generator + oracle for q202.

Writes src/main/resources/graft/warc/charset.warc.gz — a WARC archive of
HTTP responses whose bodies are NOT all UTF-8 (ISO-8859-1, Windows-1252,
GBK, meta-sniffed, bogus-charset, plain UTF-8) — and prints the DuckDB
VALUES rows for q202's oracle: per record the resolved charset name, the
md5/length of main_text computed under THIS script's own implementation
of the documented decode spec (BodyDecode scaladoc): charset parameter →
<meta charset> sniff over the first 1024 bytes read as ISO-8859-1 →
undeclared heuristic (UTF-8 when the payload validates as strict UTF-8,
Windows-1252 otherwise — the WET-extractor convention); DECLARED but
unknown charsets fall back to UTF-8; errors replace.

The script also ASSERTS, for every legacy-charset record, that a naive
UTF-8 decode produces a DIFFERENT main-text md5 — i.e. the oracle rows
can only be matched by a correct charset-aware decode, never by
cast("string").

Run: python3 scripts/gen_charset_fixture.py
"""
import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
from gen_warc_fixture import gz, http_response, record, main_text  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "warc")

# JVM canonical names for the charsets this battery uses (what
# Charset.forName(name).name() returns — the audit column's values).
JVM_NAME = {"iso-8859-1": "ISO-8859-1", "windows-1252": "windows-1252",
            "gbk": "GBK", "utf-8": "UTF-8", "": "UTF-8",
            "klingon-9": "UTF-8"}


def resolve_charset(body: bytes, ctype: str) -> str:
    """The documented resolution spec, replayed independently."""
    m = re.search(r"(?i)charset\s*=\s*[\"']?\s*([A-Za-z0-9][A-Za-z0-9._:\-]*)",
                  ctype or "")
    name = m.group(1) if m else ""
    if not name:
        prefix = body[:1024].decode("iso-8859-1")
        m = re.search(
            r"(?is)<meta\b[^>]*charset\s*=\s*[\"']?\s*([A-Za-z0-9][A-Za-z0-9._:\-]*)",
            prefix)
        name = m.group(1) if m else ""
    if not name:
        # NOTHING declared: strict-UTF-8 validity decides (the heuristic
        # for undeclared legacy pages; pure ASCII validates as UTF-8)
        try:
            body.decode("utf-8", errors="strict")
            return "UTF-8"
        except UnicodeDecodeError:
            return "windows-1252"
    # DECLARED but unknown names → UTF-8 (mirrors the Charset.forName
    # fallback; the heuristic is only for the undeclared path)
    return JVM_NAME.get(name.lower(), "UTF-8")


def decode(body: bytes, ctype: str) -> str:
    cs = resolve_charset(body, ctype)
    return body.decode(cs.lower(), errors="replace")


# ---------- the battery --------------------------------------------------
# Each page's main text carries non-ASCII characters whose legacy-charset
# bytes are VALID UTF-8-breaking sequences, so a naive decode visibly
# diverges. Bodies are valid in their declared charsets (no malformed
# bytes) — replacement-char counting differences between decoders never
# enter the oracle; the malformed path is spec-tested in Scala only.

PAGE_ISO = """<!DOCTYPE html><html><head><title>Café guide</title></head><body>
<p>La niña pidió un café con azúcar y el señor
eligió un menú del día en el pequeño salón.</p>
<p>Die Küche öffnet spät; heiße Getränke und
süßes Gebäck stehen täglich bereit für alle.</p>
</body></html>"""

PAGE_1252 = """<!DOCTYPE html><html><head><title>Style notes</title></head><body>
<p>“Smart quotes” and the em—dash — plus an ellipsis…
travel badly across encodings, and ‘single’ quotes do too.</p>
<p>The euro sign € and the trademark ™ sit in the 0x80–0x9F
range that ISO-8859-1 leaves to control codes entirely.</p>
</body></html>"""

PAGE_META_UTF8 = """<!DOCTYPE html><html><head><meta charset="utf-8">
<title>Sniffed page</title></head><body>
<p>No Content-Type parameter here — the «meta» element in
the first kilobyte is the only charset declaration this page carries.</p>
</body></html>"""

PAGE_SNIFF_1252 = """<!DOCTYPE html><html><head>
<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">
<title>Legacy CMS output</title></head><body>
<p>Typographers’ punctuation — “like this” — came
from a template older than the server that now hosts the page itself.</p>
</body></html>"""

PAGE_PLAIN_UTF8 = """<!DOCTYPE html><html><head><title>Default path</title></head><body>
<p>No parameter and no meta tag: the fallback decodes this body as UTF-8,
and its naïve café characters survive because the bytes are UTF-8.</p>
</body></html>"""

PAGE_BOGUS = """<!DOCTYPE html><html><head><title>Bogus charset</title></head><body>
<p>The header claims charset=klingon-9; an unknown name must fall back to
UTF-8 and keep serving this perfectly ordinary ASCII paragraph.</p>
</body></html>"""

PAGE_UNDECLARED_1252 = """<!DOCTYPE html><html><head><title>Forum archive</title></head><body>
<p>No header parameter, no meta element — yet the body carries “smart
quotes”, an em—dash and a stray euro € from a 2003 message board whose
server never learned to label what its templates emit.</p>
</body></html>"""

PAGE_GBK = """<!DOCTYPE html><html><head><title>GBK page</title></head><body>
<p>数据管道在大规模训练中
处理数十亿网页，编码检测
决定文本是否可用。</p>
</body></html>"""

BATTERY = [
    # (rid, uri, content-type header value, page text, encode charset)
    (0, "http://charset.example/iso",
     "text/html; charset=ISO-8859-1", PAGE_ISO, "iso-8859-1"),
    (1, "http://charset.example/win1252",
     'text/html; charset="windows-1252"', PAGE_1252, "windows-1252"),
    (2, "http://charset.example/meta-utf8",
     "text/html", PAGE_META_UTF8, "utf-8"),
    (3, "http://charset.example/sniff1252",
     "text/html", PAGE_SNIFF_1252, "windows-1252"),
    (4, "http://charset.example/plain-utf8",
     "text/html", PAGE_PLAIN_UTF8, "utf-8"),
    (5, "http://charset.example/bogus",
     "text/html; charset=klingon-9", PAGE_BOGUS, "utf-8"),
    (6, "http://charset.example/gbk",
     "text/html; charset=gbk", PAGE_GBK, "gbk"),
    # NO declaration anywhere + bytes that break strict UTF-8: only the
    # undeclared-page heuristic (valid-UTF-8 check → Windows-1252) can
    # reach this record's md5
    (7, "http://charset.example/undeclared1252",
     "text/html", PAGE_UNDECLARED_1252, "windows-1252"),
]


def md5hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def main():
    os.makedirs(OUT, exist_ok=True)
    recs = []
    rows = []
    for rid, uri, ctype, page, enc in BATTERY:
        body = page.encode(enc)
        recs.append(record(rid, "response", uri,
                           "application/http; msgtype=response",
                           http_response(200, "OK", ctype, body)))
        cs = resolve_charset(body, ctype)
        mt = main_text(decode(body, ctype))
        naive_mt = main_text(body.decode("utf-8", errors="replace"))
        if enc not in ("utf-8",):
            assert md5hex(mt) != md5hex(naive_mt), \
                f"{uri}: naive UTF-8 decode must visibly diverge"
        else:
            assert mt == naive_mt
        rows.append((uri, cs, md5hex(mt), len(mt)))
    with open(os.path.join(OUT, "charset.warc.gz"), "wb") as f:
        for r in recs:  # one gzip member per record (Common-Crawl layout)
            f.write(gz(r))
    print("wrote", os.path.join(OUT, "charset.warc.gz"))

    print("\n-- q202 oracle VALUES (url, cs, mt_md5, n_chars) --")
    for uri, cs, md5, n in rows:
        print(f"  ('{uri}', '{cs}', '{md5}', CAST({n} AS BIGINT)),")


if __name__ == "__main__":
    main()
