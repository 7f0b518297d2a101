"""Parse operators: the reference parser's entire per-document work as ONE
vectorized pandas UDF (SURVEY.md §2.3 `parse_html`, `split_sentences`,
`win_dedup_latest`, `failure_split`).

Everything per-document runs inside `spec.parse_document` (the same code
the pure-Python oracle runs); Spark supplies batching (Arrow), scheduling,
and parallelism. One UDF returning a struct — never five UDFs — so each row
crosses the JVM<->Python boundary exactly once.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, StringType, StructField, StructType,
)

from .. import spec

PARSED_STRUCT = StructType([
    StructField("title", StringType()),
    StructField("headings", ArrayType(StringType())),
    StructField("paragraphs", ArrayType(StringType())),
    StructField("extracted_text", StringType()),
    StructField("n_sentences", IntegerType()),
    StructField("parse_ok", BooleanType()),
    StructField("parse_err", StringType()),
])


@pandas_udf(PARSED_STRUCT)
def parse_html_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """PARSE_SPEC v1 over html bytes, scalar-iterator form: per-worker setup
    (regexes are module-level, compiled once at import) is amortized across
    all Arrow batches of a task."""
    for html in batches:
        parsed = [spec.parse_document(None if h is None else bytes(h)) for h in html]
        yield pd.DataFrame(parsed, columns=spec.Parsed._fields)


@pandas_udf(ArrayType(StringType()))
def split_sentences_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for paragraphs in batches:
        yield paragraphs.map(lambda p: [] if p is None else spec.split_sentences(p))


def dedup_latest(pages: DataFrame) -> DataFrame:
    """win_dedup_latest: keep the newest crawl per url. Tie-break on
    md5(html) descending (pure function of data — deterministic under
    retries/reorder; mirrors oracle._dedup_key). One shuffle on url."""
    w = (Window.partitionBy("url")
         .orderBy(F.desc("warc_ts"),
                  F.desc(F.coalesce(F.md5("html"), F.lit("")))))
    return (pages.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def parse_pages(pages: DataFrame, keep_text: bool = False) -> DataFrame:
    """pages -> parsed (SURVEY.md §1.2). Filter/prune BEFORE calling this so
    pushdown happens on raw columns and skipped rows never cross into
    Python."""
    cols = [
        F.col("url"), F.col("warc_ts"), F.col("lang"),
        F.col("_p.title").alias("title"),
        F.col("_p.headings").alias("headings"),
        F.col("_p.paragraphs").alias("paragraphs"),
        F.col("_p.extracted_text").alias("extracted_text"),
        F.col("_p.n_sentences").alias("n_sentences"),
        F.coalesce(F.length("html").cast("long"), F.lit(0)).alias("n_bytes"),
        F.col("_p.parse_ok").alias("parse_ok"),
        F.col("_p.parse_err").alias("parse_err"),
    ]
    if keep_text:
        cols.append(F.col("text"))
    return pages.withColumn("_p", parse_html_udf("html")).select(*cols)


def explode_sentences(parsed: DataFrame) -> DataFrame:
    """parsed -> sentences(url, para_idx, sent_idx, sentence), order-exact.

    posexplode_outer (not posexplode) on the UDF output: the non-outer
    variant makes Catalyst inject a `size(..)>0` pre-filter that references
    the UDF column and DUPLICATES the ArrowEvalPython stage (2x the Python
    work — observed 2x wall on sf0.1). Outer explode needs no pre-filter;
    the null rows (empty arrays) are dropped JVM-side afterwards."""
    paras = (parsed.select(
        "url", F.posexplode_outer("paragraphs").alias("para_idx", "paragraph"))
        .filter(F.col("paragraph").isNotNull()))
    return (paras
            .withColumn("_s", split_sentences_udf("paragraph"))
            .select("url", "para_idx",
                    F.posexplode_outer("_s").alias("sent_idx", "sentence"))
            .filter(F.col("sentence").isNotNull()))


def failure_split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok, failed) — failures are routed to quarantine and counted in the
    manifest, never silently dropped."""
    return parsed.filter(F.col("parse_ok")), parsed.filter(~F.col("parse_ok"))
