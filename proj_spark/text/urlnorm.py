"""URL canonicalization for web-crawl dedup.

Common-Crawl-style corpora carry the same page under many URL spellings
(scheme/case/www variants, tracking query params, fragments, trailing
slashes).  `canonical_url` collapses them with the standard
crawl-dedup normalization rules as ONE pure expression chain — no UDF,
fully codegen'd, map-only — and `canonical_url_sql` is its DuckDB twin
(same regexes, same order), so canonical groups match bit-for-bit.

Rules (applied in order, mirroring RFC 3986 §6 syntax-based
normalization plus the usual crawl-frontier extras):
  1. drop the fragment (``#...``);
  2. drop tracking query parameters (``utm_*``, ``ref``, ``fbclid``,
     ``gclid``, ``sessionid``), then a now-empty ``?``;
  3. lower-case the scheme+host; force ``https``;
  4. strip a leading ``www.``;
  5. strip one trailing ``/`` from a non-root path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_TRACK = r"(utm_[a-z]+|ref|fbclid|gclid|sessionid)=[^&#]*"


def canonical_url(col: F.Column) -> F.Column:
    u = F.regexp_replace(col, r"#.*$", "")
    # tracking params: kill "key=value&" or "(?|&)key=value" repeatedly
    u = F.regexp_replace(u, _TRACK + r"&", "")
    u = F.regexp_replace(u, r"[?&]" + _TRACK, "")
    u = F.regexp_replace(u, r"\?$", "")
    # scheme + host lower-cased, https forced, www. stripped: rebuild
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z]+://[^/?#]*", "")
    host = F.regexp_replace(
        F.regexp_replace(scheme_host, r"^[a-z]+://", ""), r"^www\.", "")
    u = F.concat(F.lit("https://"), host, rest)
    # one trailing slash off a non-root path
    return F.regexp_replace(u, r"(://[^/]+/.+?)/$", r"$1")


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin (regexp_replace is single-match by default in both
    engines; the 'g' flag is only needed where Spark also replaces all,
    which these rules avoid by design except the param strips)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    u = f"regexp_replace({u}, '{_TRACK}&', '', 'g')"
    u = f"regexp_replace({u}, '[?&]{_TRACK}', '', 'g')"
    u = f"regexp_replace({u}, '\\?$', '')"
    scheme_host = f"lower(regexp_extract({u}, '^([a-zA-Z]+://[^/?#]*)', 1))"
    rest = f"regexp_replace({u}, '^[a-zA-Z]+://[^/?#]*', '')"
    host = (f"regexp_replace(regexp_replace({scheme_host}, '^[a-z]+://', ''),"
            f" '^www\\.', '')")
    u = f"('https://' || {host} || {rest})"
    return f"regexp_replace({u}, '(://[^/]+/.+?)/$', '\\1')"
