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
from pyspark.sql.types import ArrayType, StringType

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
