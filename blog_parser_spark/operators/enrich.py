"""Enrich operators: broadcast-joined lookups + url/domain/day derivation
(SURVEY.md §2.3 `parse_url_domain`, `join_broadcast_lang`,
`join_broadcast_domain`). All JVM-side expressions — zero Python here."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import oracle


def with_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Host part of url via JVM parse_url (null on malformed — degrade,
    never crash; mirrors oracle.url_domain)."""
    return df.withColumn("domain", F.parse_url(F.col(url_col), F.lit("HOST")))


def with_day(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    return df.withColumn("day", F.to_date(ts_col))


def join_lang_norm(df: DataFrame, lang_norm: DataFrame) -> DataFrame:
    """Broadcast left join + coalesce to 'und' for unmapped langs."""
    dim = lang_norm.withColumnRenamed("lang_raw", "lang")
    return (df.join(F.broadcast(dim), "lang", "left")
            .withColumn("lang_norm",
                        F.coalesce("lang_norm", F.lit(oracle.LANG_NORM_DEFAULT))))


def join_domain_meta(df: DataFrame, domain_meta: DataFrame) -> DataFrame:
    """Broadcast left join of site/domain metadata on domain."""
    return df.join(F.broadcast(domain_meta), "domain", "left")


def enrich(parsed: DataFrame, lang_norm: DataFrame,
           domain_meta: DataFrame | None = None) -> DataFrame:
    df = with_day(with_domain(parsed))
    df = join_lang_norm(df, lang_norm)
    if domain_meta is not None:
        df = join_domain_meta(df, domain_meta)
    return df
