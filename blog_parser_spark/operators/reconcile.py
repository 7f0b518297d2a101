"""Snapshot reconciliation — the data-quality diff every lakehouse
migration/backfill ends with: given two snapshots of the same keyed
table, classify every key as added / removed / changed / unchanged by
comparing row fingerprints, and report per-class counts.

Scale shape: each side reduces map-side to (key, md5-fingerprint) —
the ONLY columns that shuffle — then ONE full-outer shuffle join on the
key and a map-side-combined count. At 100 TB the shuffle carries
~48 bytes/row regardless of table width; with both sides bucketed by
key (sources/io.py write_bucketed) the join is zero-shuffle.

Fingerprints hash BIGINT/VARCHAR columns only: double columns must be
excluded or pre-cast by the caller, because float->string rendering is
engine-specific (Spark '1.0E7' vs DuckDB '10000000.0') and the whole
point of the fingerprint is cross-engine verifiability. NULLs map to a
\\x00 sentinel distinct from the \\x1f separator, so (NULL, 'a') and
('', 'a') fingerprint differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"
NULL_SENTINEL = "\x00"


def fingerprint(df: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """Reduce to (key, h) where h = md5 over sentinel-coalesced cols."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
             for c in cols]
    return df.select(F.col(key).alias("key"),
                     F.md5(F.concat_ws(SEP, *parts)).alias("h"))


def snapshot_diff(a: DataFrame, b: DataFrame, key: str,
                  cols: list[str]) -> DataFrame:
    """Per-key diff classification between snapshots a (old) and b (new).

    Returns (key, diff_class) with diff_class in
    {added, removed, changed, unchanged}."""
    fa = fingerprint(a, key, cols).withColumnsRenamed({"h": "h_a"})
    fb = fingerprint(b, key, cols).withColumnsRenamed({"h": "h_b"})
    joined = fa.join(fb, "key", "full_outer")
    cls = (F.when(F.col("h_a").isNull(), "added")
           .when(F.col("h_b").isNull(), "removed")
           .when(F.col("h_a") != F.col("h_b"), "changed")
           .otherwise("unchanged"))
    return joined.select("key", cls.alias("diff_class"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """Per-class counts + min/max affected key (the audit headline)."""
    return (diff.groupBy("diff_class")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("key").alias("min_key"),
                 F.max("key").alias("max_key")))
