#!/usr/bin/env python3
"""Independent PSL replay for q208_psl_vendored's oracle VALUES.

Implements the public-suffix algorithm (https://publicsuffix.org/list/)
from the spec, independently of the Scala implementation, over the SAME
vendored snapshot (src/main/resources/graft/psl/public_suffix_list.dat,
the Debian `publicsuffix 20230209.2326-1` packaging of the
publicsuffix.org list), and prints the oracle VALUES block for the
fixed host battery.

Contract mirrored from graft.functions.UrlFunctions (the engine's
documented deviations from the raw spec, pinned by UrlFunctionsSpec):
  - IPv4 / bracketed / single-label hosts pass through unchanged;
  - a host that IS a public suffix passes through unchanged (the spec
    leaves it undefined/null; the engine keeps the row);
  - no matching rule => the default '*' rule: last two labels.

Assertions:
  - the vendored list parses to EXACTLY the rule count the Scala side
    sees (drift between resource and replay is loud);
  - on every battery row marked `differs`, the naive "last two labels"
    heuristic yields a DIFFERENT answer than the PSL — so a hash match
    on q208 proves real rule resolution, not the fallback.
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))
DAT = os.path.join(HERE, "..", "src", "main", "resources", "graft", "psl",
                   "public_suffix_list.dat")

EXPECTED_RULES = 9506

# (host, differs-from-naive-last-2?)
BATTERY = [
    ("example.com", False),
    ("www.example.com", False),
    ("deep.a.b.example.com", False),
    ("example.co.uk", True),           # co.uk suffix: naive gives co.uk
    ("www.example.co.uk", True),
    ("b.test.ck", True),               # *.ck wildcard
    ("a.b.test.ck", True),
    ("www.ck", False),                 # !www.ck exception: registrable
    ("www.www.ck", False),        # PSL == naive here
    ("test.ck", False),                # suffix-itself pass-through
    ("www.city.kawasaki.jp", True),    # !city.kawasaki.jp exception
    ("a.b.kawasaki.jp", True),         # *.kawasaki.jp wildcard
    ("kawasaki.jp", False),
    ("myblog.blogspot.com", True),     # PRIVATE section exact rule
    ("www.myblog.blogspot.com", True),
    ("bucket.s3.amazonaws.com", True), # PRIVATE 3-label exact rule
    ("s3.amazonaws.com", False),       # suffix-itself pass-through
    ("x.y.eu-west-1.compute.amazonaws.com", True),  # *.compute.amazonaws.com
    ("host.pvt.k12.ma.us", True),      # 4-label exact rule
    ("sub.host.pvt.k12.ma.us", True),
    ("b.s3.cn-north-1.amazonaws.com.cn", True),     # 5-label exact rule
    ("c.b.s3.cn-north-1.amazonaws.com.cn", True),
    ("example.公司.cn", True), # U-label IDN rule 公司.cn
    ("example.unknowntld", False),     # default '*' rule
    ("a.example.unknowntld", False),   # default rule IS last-2
    ("192.168.0.1", False),            # IP pass-through (naive: 0.1!)
    ("localhost", False),              # single label
    ("a.schools.nsw.edu.au", True),    # ICANN 4-label exact rule
]


def load_rules(path):
    rules = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            tok = line.strip().split(None, 1)
            tok = tok[0] if tok else ""
            if tok and not tok.startswith("//"):
                rules.append(tok)
    return rules


def parse(rules):
    exc, wild, exact = {}, {}, {}
    for r in rules:
        r = r.strip().lower()
        if r.startswith("!"):
            b = r[1:]
            exc.setdefault(b.count(".") + 1, set()).add(b)
        elif r.startswith("*."):
            b = r[2:]
            wild.setdefault(b.count(".") + 1, set()).add(b)
        else:
            exact.setdefault(r.count(".") + 1, set()).add(r)
    return exc, wild, exact


def regdom(host, exc, wild, exact):
    import re
    if re.fullmatch(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", host) or \
            host.startswith("["):
        return host
    labels = host.split(".")
    n = len(labels)
    if n <= 1:
        return host

    def last_k(k):
        return ".".join(labels[n - k:])

    for k in sorted(exc, reverse=True):          # exceptions prevail
        if n >= k and last_k(k) in exc[k]:
            return last_k(k)
    suffix_lens = sorted({k + 1 for k in wild} | set(exact), reverse=True)
    for s in suffix_lens:                        # longest suffix wins
        if (s - 1) in wild and n >= s - 1 and last_k(s - 1) in wild[s - 1]:
            return last_k(s + 1) if n >= s + 1 else host
        if s in exact and n >= s and last_k(s) in exact[s]:
            return last_k(s + 1) if n >= s + 1 else host
    return last_k(2)                             # default '*' rule


def main():
    rules = load_rules(DAT)
    assert len(rules) == EXPECTED_RULES, \
        f"vendored list drifted: {len(rules)} rules, expected {EXPECTED_RULES}"
    exc, wild, exact = parse(rules)
    rows = []
    for host, differs in BATTERY:
        rd = regdom(host, exc, wild, exact)
        naive = ".".join(host.split(".")[-2:]) if host.count(".") >= 1 else host
        if differs:
            assert rd != naive, \
                f"{host}: PSL answer {rd} equals the naive fallback — row proves nothing"
        else:
            assert rd == naive or host in (rd,), (host, rd, naive)
        rows.append((f"http://{host}/x", rd))
    print("VALUES block for q208_psl_vendored's oracle:\n")
    body = ",\n".join(f"  ('{u}', '{d}')" for u, d in rows)
    print(body)
    n_diff = sum(1 for _, d in BATTERY if d)
    print(f"\n-- {len(rows)} rows, {n_diff} prove rule resolution "
          f"(PSL != last-2-labels), {len(rules)} rules")


if __name__ == "__main__":
    main()
