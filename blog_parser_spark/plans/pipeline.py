"""The flagship batch plan: parse -> enrich -> route -> aggregate
(BASELINE.json north_star; SURVEY.md §3.2).

Plan shape (verified via .explain): parquet scan -> [optional pushed
filters] -> url-window dedup (shuffle 1) -> ArrowEvalPython parse ->
broadcast joins (no shuffle) -> when-chain routing -> hash aggregate
(shuffle 2). Exactly two wide boundaries end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import aggregate, enrich, parse, route
from ..sources import io


def routed_pages(spark: SparkSession, pages: DataFrame, *, dedup: bool = True,
                 with_meta: bool = False, keep_text: bool = False) -> DataFrame:
    """pages -> routed (enriched rows + sink), the shared spine."""
    if dedup:
        pages = parse.dedup_latest(pages)
    parsed = parse.parse_pages(pages, keep_text=keep_text)
    enriched = enrich.enrich(
        parsed, io.lang_norm_df(spark),
        io.domain_meta_df(spark) if with_meta else None)
    return route.route(enriched)


def flagship(spark: SparkSession, pages: DataFrame, *, dedup: bool = True,
             salted: bool = False) -> DataFrame:
    """pages -> per-sink aggregate counts (the acceptance aggregate)."""
    routed = routed_pages(spark, pages, dedup=dedup)
    agg = (aggregate.agg_sink_counts_salted if salted
           else aggregate.agg_sink_counts)
    return agg(routed)
