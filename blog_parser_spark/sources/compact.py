"""Threshold-gated small-file compaction for MULTI-LEVEL partitioned
parquet sinks — the maintenance job every long-lived 100 TB table needs:
repeated incremental appends (resumable runs, streaming foreachBatch,
CDC folds) fragment partitions into many small files, and scan
efficiency dies by open()/footer overhead long before bytes do.

Complements io.compact_partition_dir (offline rename-protocol rewrite of
EVERY partition in a single-level layout): this variant handles nested
layouts like the resumable job's (sink, bucket), touches only partitions
above a fragmentation threshold, and commits through dynamic partition
overwrite instead of directory renames — the right protocol on object
stores, where rename is copy+delete and not atomic.

Shape: metadata pass first (file counts per partition via
input_file_name over a column-pruned scan), then ONE rewrite pass that
touches ONLY partitions above the fragmentation threshold — selected by
literal partition-column filters (partition-prunable) and replaced
atomically-per-partition via dynamic partition overwrite. Healthy
partitions' files are not read, rewritten, or invalidated. The rewrite
repartitions on the partition columns, so each compacted partition
collapses to one writer task -> one file (bucketed layouts bound
per-partition volume by construction, so one file is the right target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..limits import check_driver_list_bound


def partition_file_stats(spark: SparkSession, path: str,
                         partition_cols: list[str]) -> DataFrame:
    """(partition_cols..., n_files, rows) per live partition. Only the
    partition columns are materialized — the scan reads parquet footers +
    the synthetic input_file_name, no data columns."""
    df = spark.read.option("basePath", path).parquet(path)
    return (df.select(*partition_cols, F.input_file_name().alias("_f"))
            .groupBy(*partition_cols)
            .agg(F.countDistinct("_f").alias("n_files"),
                 F.count(F.lit(1)).alias("rows")))


def compact_partitions(spark: SparkSession, path: str,
                       partition_cols: list[str],
                       max_files: int = 4) -> dict:
    """Rewrite every partition holding more than max_files files into a
    single file; leave the rest untouched. Returns {partitions_compacted,
    files_before, rows_rewritten}.

    The fragmented-partition list is collected driver-side: it is bounded
    by the partition count (a layout constant — sinks × buckets — never
    data volume), and the literal filters it buys are the difference
    between scanning the fragmented slice and scanning the table.
    """
    stats = partition_file_stats(spark, path, partition_cols)
    frag = stats.filter(F.col("n_files") > max_files).collect()
    check_driver_list_bound(len(frag), "fragmented_partitions")
    if not frag:
        return {"partitions_compacted": 0, "files_before": 0,
                "rows_rewritten": 0}

    cond = None
    for r in frag:
        this = None
        for c in partition_cols:
            eq = F.col(c) == F.lit(r[c])
            this = eq if this is None else (this & eq)
        cond = this if cond is None else (cond | this)

    df = spark.read.option("basePath", path).parquet(path)
    sliced = df.filter(cond).repartition(*partition_cols)
    # Spark refuses to overwrite a path it is reading from; materializing
    # the fragmented slice first (reliable checkpoint when a checkpoint
    # dir is configured — production; localCheckpoint for local dev, same
    # policy as dedup.connected_components) cuts the plan's tie to the
    # source files before the overwrite.
    reliable = spark.sparkContext.getCheckpointDir() is not None
    sliced = sliced.checkpoint() if reliable else sliced.localCheckpoint()
    (sliced
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(*partition_cols)
     .parquet(path))
    return {"partitions_compacted": len(frag),
            "files_before": sum(r["n_files"] for r in frag),
            "rows_rewritten": sum(r["rows"] for r in frag)}
