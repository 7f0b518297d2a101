"""Source/sink abstraction (SURVEY.md §2.3 scans + FIXTURES.md §B synthesis).

Production target is Iceberg (`spark.read.format("iceberg")`, bucketed
writes); this sandbox has no Iceberg jar, so everything funnels through
this module: swap `TABLE_FORMAT` and every caller gets Iceberg without
code changes. All fixture synthesis is pure-function-of-data (no RNG, no
clock) so it is byte-reproducible and resumable.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType, TimestampType,
)

from .. import oracle, spec

TABLE_FORMAT = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Iceberg in prod, parquet here."""
    if TABLE_FORMAT == "iceberg":
        return spark.read.format("iceberg").load(f"{sf_dir}/{name}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- pages synthesis (FIXTURES.md §B) ---------------------------------------

def _render_html_udf():
    """Vectorized html renderer — fixture-build only, not a pipeline op."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def render(text: pd.Series) -> pd.Series:
        return text.map(lambda t: None if t is None else spec.render_html(t))

    return render


def synth_pages(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """documents -> pages(url, warc_ts, html, text, lang), deterministic.

    replicate=k deterministically tiles the corpus k-fold (distinct urls via
    a replica index) for bench runs where the raw fixture is too small; k=1
    reproduces FIXTURES.md §B exactly.
    """
    docs = read_table(spark, sf_dir, "documents")
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).withColumn(
            "doc_id", F.col("doc_id") + F.col("rep") * 10_000_000).drop("rep")
    render = _render_html_udf()
    return docs.select(
        F.concat(F.lit("https://"), "source", F.lit(".example.com/post/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.expr(
            f"timestamp'{spec.WARC_TS_BASE}' "
            f"+ make_interval(0, 0, 0, cast(doc_id % {spec.WARC_TS_DAY_MOD} as int), 0, 0, "
            f"cast(doc_id % {spec.WARC_TS_SEC_MOD} as int))"
        ).alias("warc_ts"),
        render("text").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def adversarial_pages_df(spark: SparkSession) -> DataFrame:
    from .fixtures import adversarial_pages
    rows = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
            for r in adversarial_pages()]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


# --- broadcast dims ----------------------------------------------------------

LANG_NORM_SCHEMA = StructType([
    StructField("lang_raw", StringType(), False),
    StructField("lang_norm", StringType(), False),
])
DOMAIN_META_SCHEMA = StructType([
    StructField("domain", StringType(), False),
    StructField("site_category", StringType(), False),
    StructField("country", StringType(), False),
    StructField("tier", IntegerType(), False),
])


def lang_norm_df(spark: SparkSession) -> DataFrame:
    rows = [(r["lang_raw"], r["lang_norm"]) for r in oracle.lang_norm_rows()]
    return spark.createDataFrame(rows, LANG_NORM_SCHEMA)


def domain_meta_df(spark: SparkSession, n_sources: int = 20) -> DataFrame:
    rows = [(r["domain"], r["site_category"], r["country"], r["tier"])
            for r in oracle.domain_meta_rows(n_sources)]
    return spark.createDataFrame(rows, DOMAIN_META_SCHEMA)


# --- sinks -------------------------------------------------------------------

def write_fanout(df: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """sink_fanout: ONE pass, partitioned by sink (no per-sink job loop).

    On Iceberg this is writeTo(...).partitionedBy("sink"); the repartition
    by sink keeps one writer per sink partition and avoids small files.
    """
    (df.repartition("sink")
       .write.mode(mode).partitionBy("sink").parquet(out_dir))


def write_bucketed_table(df: DataFrame, table: str, buckets: int = 16,
                         key: str = "url") -> None:
    """Catalog-registered bucketed+sorted table (Spark bucketBy): two tables
    bucketed the same way join with ZERO shuffle exchanges — each task reads
    matching bucket files from both sides (verified in tests/test_plans.py).

    This is the co-located-join layout for url-keyed tables that are joined
    repeatedly (e.g. parsed pages vs a per-url quality-score table): the
    shuffle is paid once at write time, then every downstream join is
    exchange-free. On Iceberg the equivalent is
    `partitionedBy(bucket(N, key))` + storage-partitioned joins."""
    (df.write.mode("overwrite").format("parquet")
       .bucketBy(buckets, key).sortBy(key).saveAsTable(table))


def write_bucketed_by_url(df: DataFrame, out_dir: str, buckets: int = 256,
                          mode: str = "overwrite") -> None:
    """sink_bucketed: bucket-by-url-hash layout (Iceberg bucket(256,url) in
    prod). Parquet fallback: hash-repartition + bucket column partition so
    downstream url-keyed reads prune to one bucket."""
    b = F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int").alias("url_bucket")
    (df.withColumn("url_bucket", b)
       .repartition(buckets, "url_bucket")
       .write.mode(mode).partitionBy("url_bucket").parquet(out_dir))
