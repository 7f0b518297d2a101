"""WAT-style outlink extraction from raw html — the crawl-graph feeder
op: every Common-Crawl-scale pipeline derives its link graph by running
exactly this shape (regex href scan over the html bytes, domain parse,
src×dst aggregate) over the page corpus.

The href grammar is pinned in spec.HREF_RE (one source of truth shared
with the pure-Python layer and the fixture renderer). The UDF is an
Arrow-batched pandas UDF — the regex scan is the same embarrassingly
parallel per-row CPU shape as parse_html, so it rides the identical
scaling story; everything downstream of it (explode, domain extract,
aggregate) is JVM expressions with map-side partial combine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from .. import spec

_DOMAIN_RE = r"https://([^/]+)/"


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(spec.extract_links)


def domain_col(url: Column) -> Column:
    return F.regexp_extract(url, _DOMAIN_RE, 1)


def domain_link_counts(pages: DataFrame) -> DataFrame:
    """pages(url, html) -> (src_domain, dst_domain, links): the domain-level
    link graph. One explode + one partial-combined hash agg; the html
    column is pruned immediately after the UDF so the shuffle carries two
    short strings per link, never page bytes."""
    links = pages.select(
        domain_col(F.col("url")).alias("src_domain"),
        F.explode(extract_links_udf("html")).alias("href"))
    return (links.groupBy("src_domain",
                          domain_col(F.col("href")).alias("dst_domain"))
            .agg(F.count("*").alias("links")))


def resolve_redirects(edges: DataFrame, max_chain: int = 64,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Resolve every url's FINAL redirect target by pointer doubling:
    (src, final_url, hops) for each row of a functional redirect table
    (at most one outgoing edge per src — duplicate sources raise, they
    would make the result nondeterministic).

    Why doubling: the naive walk joins once per HOP — a 64-deep chain
    costs 64 shuffles. Compressing (a→b, b→c) into (a→c, hops summed)
    every round makes surviving pointers skip 2^round hops, so
    ceil(log2(max_chain)) + 1 rounds resolve any chain up to max_chain —
    6 shuffle rounds instead of 64, the difference between feasible and
    not at a 10^12-url crawl graph. Rounds checkpoint through the
    pagerank lineage-cut helper; the loop exits early once no pointer
    advanced.

    Cycles never terminate, so they FAIL LOUDLY (the connected-components
    convention): pointers still advancing after the round budget raise
    ValueError instead of silently returning a mid-cycle node.
    """
    import math

    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable else df.localCheckpoint()

    dup = (edges.groupBy(src).agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > 1).count())
    if dup:
        raise ValueError(f"{dup} sources have multiple outgoing redirects")

    m = _cut(edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"),
                          F.lit(1).cast("long").alias("hops")))
    for _ in range(max(1, math.ceil(math.log2(max_chain)) + 1)):
        nxt = m.select(F.col("_s").alias("_js"), F.col("_d").alias("_jd"),
                       F.col("hops").alias("_jh"))
        m2 = (m.join(nxt, m["_d"] == nxt["_js"], "left")
              .select(m["_s"],
                      F.coalesce(nxt["_jd"], m["_d"]).alias("_d"),
                      (m["hops"] + F.coalesce(nxt["_jh"], F.lit(0)))
                      .alias("hops"),
                      nxt["_js"].isNotNull().alias("_moved")))
        advanced = m2.filter("_moved").count()  # bounded: one scalar
        m = _cut(m2.drop("_moved"))
        if advanced == 0:
            return m.select(F.col("_s").alias(src),
                            F.col("_d").alias("final_url"), "hops")
    raise ValueError(
        f"redirect chains did not resolve within max_chain={max_chain} "
        f"hops — cycle or deeper chain; refusing to return partial walks")


_ANCHOR_TYPE = ArrayType(StructType([
    StructField("href", StringType()), StructField("anchor", StringType())]))


@pandas_udf(_ANCHOR_TYPE)
def extract_anchors_udf(html: pd.Series) -> pd.Series:
    return html.map(spec.extract_anchors)


def anchor_text_census(pages: DataFrame) -> DataFrame:
    """pages(html) -> (dst_domain, term, mentions): how the web describes
    each site — the per-target anchor-text census every search/ranking
    stack derives from its crawl (anchor terms are among the strongest
    relevance signals, and the census also feeds spam/bridge detection).

    Shape: ONE Arrow stage (the anchor regex scan, same embarrassingly
    parallel profile as parse_html), then pure JVM: explode anchors,
    explode split(anchor) terms, partial-combined hash agg. html is
    pruned right after the UDF, so the shuffle carries (short domain,
    short term) pairs — never page bytes; empty anchor texts are dropped
    before the explode fans them out."""
    anchors = (pages
               .select(F.explode(extract_anchors_udf("html")).alias("a"))
               .select(domain_col(F.col("a.href")).alias("dst_domain"),
                       F.col("a.anchor").alias("anchor"))
               .filter(F.col("anchor") != ""))
    return (anchors
            .select("dst_domain",
                    F.explode(F.split("anchor", " ")).alias("term"))
            .groupBy("dst_domain", "term")
            .agg(F.count(F.lit(1)).alias("mentions")))


def hreflang_alternates(pages: DataFrame) -> DataFrame:
    """pages(url, html) -> (url, hreflang, alt_url): the declared
    translation set per page — the seed signal for mining aligned
    multilingual training pairs. Pure JVM: two regexp_extract_all passes
    over the SAME pinned grammar (spec.ALTERNATE_RE_STR) zipped
    positionally, so lang/href stay paired by construction; no Python
    stage, map-only until whatever rollup the consumer adds."""
    doc = F.col("html").cast("string")
    langs = F.regexp_extract_all(doc, F.lit(spec.ALTERNATE_RE_STR), F.lit(1))
    hrefs = F.regexp_extract_all(doc, F.lit(spec.ALTERNATE_RE_STR), F.lit(2))
    pair = F.zip_with(langs, hrefs,
                      lambda l, h: F.struct(l.alias("hreflang"),
                                            h.alias("alt_url")))
    return (pages.select("url", F.explode(pair).alias("a"))
            .select("url", "a.hreflang", "a.alt_url"))
