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

from pyspark.sql import Column, DataFrame, functions as F

from .. import spec

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def path_template(path: Column) -> Column:
    """Generalize a URL path to its route template: every all-digit
    segment becomes '{id}' ('/s2/item/4821' → '/s2/item/{id}'). Pure
    JVM higher-order transform — one split, one per-segment rlike, no
    regex replacement materialization; at log scale the template is the
    natural rollup key for traffic/latency dashboards where raw paths
    have unbounded cardinality."""
    segs = F.split(path, "/")
    return F.array_join(
        F.transform(segs, lambda s: F.when(s.rlike("^[0-9]+$"),
                                           F.lit("{id}")).otherwise(s)),
        "/")


def template_census(fetches: DataFrame, path_col: str = "path") -> DataFrame:
    """Per-template (requests, distinct_paths) census. Two-stage
    aggregate — (template, path) pre-count, then the template rollup —
    so the plan never widens into the Expand a mixed
    count/count-distinct would produce; both stages map-side combine."""
    t = fetches.select(path_template(F.col(path_col)).alias("template"),
                       F.col(path_col).alias("path"))
    per_path = (t.groupBy("template", "path")
                .agg(F.count(F.lit(1)).alias("n")))
    return (per_path.groupBy("template")
            .agg(F.sum("n").alias("requests"),
                 F.count(F.lit(1)).alias("distinct_paths")))


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


def canonical_key(html: Column, url: Column) -> Column:
    """Page dedup key = declared <link rel="canonical"> target, else the
    page's own url. Extraction is a single JVM regexp over the html bytes
    cast to string (UTF-8, invalid sequences become replacement chars —
    the pattern is pure ASCII so extraction is unaffected); no Python
    stage, no Arrow transfer: this is a map-only projection fused into
    the scan."""
    c = F.regexp_extract(html.cast("string"), spec.CANONICAL_RE_STR, 1)
    return F.when(c != "", c).otherwise(url)


def canonical_groups(pages: DataFrame) -> DataFrame:
    """pages -> (canonical_key, n_pages, rep_url): fold the crawl onto
    canonical targets (the dedup step that runs BEFORE content hashing in
    CC-style pipelines — mirror/AMP/tracking variants all declare the
    same canonical). Representative = latest crawl, (warc_ts, url) struct
    tie-break so re-crawled mirrors resolve deterministically. ONE
    map-combined hash aggregation; html never reaches the shuffle."""
    keyed = pages.select(
        canonical_key(F.col("html"), F.col("url")).alias("canonical_key"),
        # engine-portable composite order key: zero-padded epoch seconds
        # then url — lexicographic compare == (warc_ts, url) compare, and
        # DuckDB's arg_max can rank it (no struct-key arg_max there)
        F.concat(F.lpad(F.col("warc_ts").cast("long").cast("string"), 20, "0"),
                 F.lit("|"), F.col("url")).alias("_ord"))
    # max(_ord) then strip the fixed 21-char prefix, NOT max_by(url, _ord).
    # Either way Spark plans SortAggregate (string agg buffers are not
    # mutable, so HashAggregate is off the table for ANY string argmax);
    # the single-column max halves the buffer vs max_by's (url, key) pair
    # and the key's suffix IS the url, so the winner is identical. Still
    # partial-combined map-side: duplicates collapse before the shuffle.
    return keyed.groupBy("canonical_key").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.substring(F.max("_ord"), 22, 2_147_483_647).alias("rep_url"))
