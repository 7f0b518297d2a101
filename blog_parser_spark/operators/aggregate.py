"""Aggregate operators (SURVEY.md §2.3): the flagship per-sink counts, the
salted two-phase variant for hot-domain skew, and exactness helpers.

Salting policy: salts are pure functions of data (pmod(xxhash64(url), K)),
NEVER rand() — task retries must reproduce identical partial aggregates or
exact-match acceptance breaks (SURVEY.md §7 hard part b)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

AGG_KEYS = ("sink", "domain", "lang_norm", "day")

def _metrics():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_sentences").alias("sentences"),
        F.sum("n_bytes").alias("bytes"),
    ]


def agg_sink_counts(routed: DataFrame) -> DataFrame:
    """Per (sink, domain, lang_norm, day): docs, sentences, bytes.

    One shuffle; Spark's hash aggregate already does map-side partial
    aggregation, so this is the plan of record for uniform keys."""
    return routed.groupBy(*AGG_KEYS).agg(*_metrics())


def agg_sink_counts_salted(routed: DataFrame, buckets: int = 32) -> DataFrame:
    """Same result, two-phase with an explicit url-hash salt.

    For hot domains (one domain = 50% of rows) the single-shuffle plan
    lands the hot group on one reducer; phase 1 spreads it over `buckets`
    reducers, phase 2 merges `buckets` partials per group. Result is
    EXACTLY equal to agg_sink_counts (tests assert this)."""
    salt = F.pmod(F.xxhash64("url"), F.lit(buckets)).alias("_salt")
    partial = (routed
               .groupBy(*AGG_KEYS, salt)
               .agg(F.count(F.lit(1)).alias("_docs"),
                    F.sum("n_sentences").alias("_sentences"),
                    F.sum("n_bytes").alias("_bytes")))
    return (partial.groupBy(*AGG_KEYS)
            .agg(F.sum("_docs").alias("docs"),
                 F.sum("_sentences").alias("sentences"),
                 F.sum("_bytes").alias("bytes")))


def bitmap_build(df: DataFrame, group_cols: list[str],
                 key_col: str) -> DataFrame:
    """Per-(group, bucket) EXACT-distinct bitmaps of key_col: the
    storable/mergeable building block for incremental distinct counting.
    Persist these per partition (e.g. per day) once; any later rollup is
    a bitmap OR — no raw-data rescan, and unlike HLL the answer is exact.
    One hash shuffle with map-side partial bitmap construction."""
    return (df.groupBy(*group_cols,
                       F.bitmap_bucket_number(key_col).alias("bkt"))
            .agg(F.bitmap_construct_agg(
                F.bitmap_bit_position(key_col)).alias("bm")))


def bitmap_merge_count(bitmaps: DataFrame,
                       group_cols: list[str]) -> DataFrame:
    """OR-merge stored bitmaps down to group_cols and count exactly:
    first OR per (group, bucket) — collapsing e.g. the per-day axis —
    then sum the per-bucket cardinalities. Input size is #groups x
    #buckets bitmap rows, not raw data."""
    merged = (bitmaps.groupBy(*group_cols, "bkt")
              .agg(F.bitmap_or_agg("bm").alias("bm")))
    return (merged.groupBy(*group_cols)
            .agg(F.sum(F.bitmap_count("bm")).cast("long")
                 .alias("distinct_count")))


def multiset_equal(a: DataFrame, b: DataFrame) -> bool:
    """Routed-row equality gate: exceptAll empty both directions."""
    cols = sorted(a.columns)
    a, b = a.select(*cols), b.select(*cols)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
