"""URL canonicalization — the normalize-before-dedup step of a web-log
pipeline, as pure JVM expressions (regexp + higher-order array ops; no
Python in the row path, so the whole thing stays inside whole-stage
codegen and scales as a map-only projection).

Rules (all deterministic, idempotent):
  * scheme and host lowercased
  * default port stripped (:443 for https, :80 for http)
  * fragment dropped
  * utm_* tracking params dropped; surviving `k=v` tokens sorted
    lexicographically and re-joined with '&' (empty query -> no '?')
  * trailing slashes trimmed from the path; empty path -> '/'

Patterns are RE2-safe (no backrefs/lookaround) so Java regex and
DuckDB/RE2 oracles agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize(url: Column) -> Column:
    """Canonical form of `url` per the module rules. NULL-safe: a value
    with no scheme/authority canonicalizes its parseable parts (missing
    pieces extract as '')."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    host = (F.when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
            .when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
            .otherwise(auth))
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.array_join(
        F.array_sort(F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.startswith("utm_"))), "&")
    qpart = F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params))
    return F.concat(scheme, F.lit("://"), host, path, qpart)
