"""Lineage manifests + resumable batch runs (SURVEY.md §2.3 sink_manifest,
§4 resume-from-checkpoint).

Unit of lineage = BUCKET: pmod(xxhash64(url), n_buckets) — a pure function
of the data, stable across retries, repartitioning, and cluster sizes
(a partition id is none of those). Per bucket the manifest records rows
parsed, parse failures, bytes, sentences, and the wall-clock of the pass
that produced it.

Resume protocol (exactly-once per bucket):
  1. read manifest -> completed bucket set
  2. anti-join input against completed buckets (join_anti)
  3. write sinks with partitionBy(sink, bucket) under dynamic partition
     overwrite -> a re-run of a half-written bucket overwrites its own
     partitions and nobody else's
  4. append manifest rows LAST -> a bucket is durable iff its manifest row
     committed; crash between (3) and (4) just re-runs that bucket
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .plans import pipeline

DEFAULT_BUCKETS = 64

ROUTED_SINK_COLS = ["url", "warc_ts", "lang_norm", "domain", "doc_class",
                    "title", "extracted_text", "n_sentences", "n_bytes",
                    "parse_ok", "parse_err", "day", "sink"]


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))


def manifest_rows(routed: DataFrame, run_id: str, wall_sec: float) -> DataFrame:
    """Per-bucket lineage + metrics for one completed pass."""
    return (routed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("parse_failures"),
                 F.sum("n_bytes").alias("bytes"),
                 F.sum("n_sentences").alias("sentences"))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("wall_sec", F.lit(float(wall_sec))))


def completed_buckets(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Buckets already durable; empty frame when no manifest exists yet."""
    try:
        return spark.read.parquet(manifest_dir).select("bucket").distinct()
    except Exception:
        return spark.createDataFrame([], "bucket int")


def run_resumable(spark: SparkSession, pages: DataFrame, out_dir: str,
                  n_buckets: int = DEFAULT_BUCKETS) -> dict:
    """One resumable pass of the full pipeline into fan-out sinks.

    Returns run metrics. Call again after a failure with the same out_dir:
    completed buckets are skipped via anti-join on the manifest."""
    sink_dir = f"{out_dir}/sinks"
    manifest_dir = f"{out_dir}/manifest"

    src = with_bucket(pages, n_buckets)
    done = completed_buckets(spark, manifest_dir)
    todo = src.join(F.broadcast(done), "bucket", "left_anti")

    t0 = time.time()
    routed = with_bucket(
        pipeline.routed_pages(spark, todo.drop("bucket"), dedup=True, full=True),
        n_buckets)

    # one pass, one writer per (sink,bucket) partition; dynamic overwrite
    # makes a bucket re-run idempotent
    (routed.select(*ROUTED_SINK_COLS, "bucket")
     .repartition("sink", "bucket")
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("sink", "bucket")
     .parquet(sink_dir))
    wall = time.time() - t0

    run_id = f"run-{int(t0)}"
    mrows = manifest_rows(routed, run_id, wall)
    mrows.coalesce(1).write.mode("append").parquet(manifest_dir)

    stats = (spark.read.parquet(manifest_dir)
             .agg(F.countDistinct("bucket").alias("buckets"),
                  F.sum("rows").alias("rows"),
                  F.sum("parse_failures").alias("parse_failures"),
                  F.sum("bytes").alias("bytes")).collect()[0])
    return {"run_id": run_id, "wall_sec": round(wall, 2),
            "buckets_done": stats["buckets"], "rows": stats["rows"],
            "parse_failures": stats["parse_failures"], "bytes": stats["bytes"]}
