"""Routing: lang x doc-class predicates -> sink, as a deterministic
first-match F.when chain (SURVEY.md §2.3 `route_classify`). Must mirror
oracle.route_sink exactly — routed-row equality is an acceptance gate."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .. import oracle


def doc_class_col(len_col: str = "extracted_len") -> Column:
    return F.when(F.col(len_col) >= oracle.DOC_CLASS_LONG_CHARS,
                  F.lit("long")).otherwise(F.lit("short"))


def sink_col() -> Column:
    """First-match when chain — order IS the semantics (oracle.route_sink)."""
    eu = F.col("lang_norm").isin(*oracle.EU_LANGS)
    long = F.col("doc_class") == "long"
    return (
        F.when(~F.col("parse_ok"), F.lit("quarantine"))
         .when((F.col("lang_norm") == "eng") & long, F.lit("en-long"))
         .when(F.col("lang_norm") == "eng", F.lit("en-short"))
         .when(eu & long, F.lit("eu-long"))
         .when(eu, F.lit("eu-short"))
         .otherwise(F.lit("rest"))
    )


def route(enriched: DataFrame) -> DataFrame:
    return (enriched
            .withColumn("doc_class", doc_class_col())
            .withColumn("sink", sink_col()))
