package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction for the crawl
  * front door — pure column expressions end to end (regexp/split/sort/
  * concat builtins, all whole-stage-codegen'd; no UDF, no parsing
  * library), so a 100 TB URL column canonicalizes inside the scan task.
  *
  * Role anchor: the reference normalizes asset paths through one shared
  * grammar before publishing or comparing them
  * (bdc_collection_builder/celery/publish.py:131–156 — strip the
  * configured prefix, re-root, compare in canonical form); a web-crawl
  * catalog needs the same discipline on URLs, where the equivalences are
  * case (scheme/host), default ports, fragments, trailing slashes, and
  * query-parameter order. Without it, `HTTP://X.com:80/a?b=1&a=2#f` and
  * `http://x.com/a?a=2&b=1` count as two documents and defeat per-domain
  * caps and URL-keyed dedup.
  *
  * The CONTRACT (replayed by the DuckDB oracle with ITS string ops):
  *  - scheme and host lowercase; userinfo (`user:pw@`) dropped;
  *  - default ports removed (http:80, https:443); other ports kept;
  *  - fragment dropped;
  *  - path: empty → `/`; trailing slashes dropped from non-root paths
  *    (`/a/b//` → `/a/b`, a fixed point — canonicalizing twice changes
  *    nothing); percent-escapes and dot-segments are NOT
  *    rewritten (lossy rewrites belong to a fetcher, not a dedup key);
  *  - query: parameters sorted bytewise by their full `k=v` text, empty
  *    parameters (from `&&` or a trailing `&`) dropped, an empty query
  *    string drops its `?`. Duplicate keys keep all occurrences (sorted),
  *    preserving semantics for `a=1&a=2`-style params.
  *
  * Registered domain: suffix-list lookup over the bundled multi-label
  * public suffixes ([[UrlFunctions.TwoLevelSuffixes]], the high-traffic
  * subset of the public suffix list's two-label entries) — hosts under
  * `co.uk`-style suffixes register at the third label from the right,
  * everything else at the second; IPv4 literals and single-label hosts
  * return unchanged. The set is a broadcast-free literal array (a few
  * hundred bytes in the plan, not a join).
  */
object UrlFunctions {

  /** High-traffic two-label public suffixes (public-suffix-list subset;
    * the full list swaps in the same way — a bigger literal array). */
  val TwoLevelSuffixes: Seq[String] = Seq(
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
    "co.id", "or.id", "ac.id", "go.id")

  private def splitUrl(url: Column): (Column, Column, Column, Column) = {
    val noFrag = regexp_extract(trim(url), "^([^#]*)", 1)
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // authority = up to the first '/' or '?', userinfo stripped
    val authority = regexp_replace(
      regexp_extract(rest, "^([^/?]*)", 1), "^[^@]*@", "")
    val pathQuery = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_extract(pathQuery, "^([^?]*)", 1)
    val query = when(pathQuery.contains("?"),
      regexp_replace(pathQuery, "^[^?]*\\?", "")).otherwise(lit(""))
    (scheme, lower(authority), path, query)
  }

  /** Lowercased host (no port, no userinfo) of a URL column. */
  def urlHost(url: Column): Column = {
    val (_, authority, _, _) = splitUrl(url)
    regexp_extract(authority, "^([^:]*)", 1)
  }

  /** Canonical URL under the contract above. Non-URL strings (no
    * `scheme://`) come back trimmed-and-defragmented only — a salvage
    * identity, never a null that silently drops crawl rows. */
  def canonicalizeUrl(url: Column): Column = {
    val (scheme, authority, path, query) = splitUrl(url)
    val host = regexp_extract(authority, "^([^:]*)", 1)
    val port = when(authority.contains(":"),
      regexp_extract(authority, ":([0-9]*)$", 1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val canonAuth = concat(host, when(keepPort, concat(lit(":"), port)).otherwise(lit("")))
    val stripped = regexp_replace(path, "/+$", "")
    val trimmedPath = when(stripped === "", lit("/")).otherwise(stripped)
    val params = filter(split(query, "&"), p => p =!= "")
    val canonQuery = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    when(scheme === "", regexp_extract(trim(url), "^([^#]*)", 1))
      .otherwise(concat(scheme, lit("://"), canonAuth, trimmedPath, canonQuery))
  }

  /** Registered domain of a URL column under the bundled suffix subset:
    * `a.b.co.uk` → `b.co.uk`, `x.y.example.com` → `example.com`, IPv4
    * literals and single-label hosts unchanged. */
  def registeredDomain(url: Column): Column = {
    val host = urlHost(url)
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    val isIpv4 = host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    val suffixes = array(TwoLevelSuffixes.map(lit): _*)
    when(isIpv4 || n <= 1, host)
      .when(n >= 3 && array_contains(suffixes, last2), last3)
      .otherwise(last2)
  }
}
