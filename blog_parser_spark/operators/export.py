"""Deterministic training-data EXPORT layer: global shuffle into shards
and fixed-token-budget sequence packing — the last mile between a curated
corpus and a training run.

Design for 100 TB:
- The "global shuffle" is NOT a random permutation (irreproducible, and a
  true global sort is an all-to-all): rows are sharded by a pure content
  hash and ordered by (hash, key) WITHIN each shard. One shuffle on the
  shard key; each output shard is written independently; re-running on a
  different cluster size yields byte-identical shards.
- Packing is the standard concat-and-chunk at DOCUMENT granularity: docs
  are laid out in shard order, a running token offset is kept, and a doc
  starts sequence floor(exclusive_prefix / budget). One window cumsum per
  shard — state is O(1) per row, the shuffle is the same shard shuffle.
- Hash idiom shared with sampling/dedup (md5-prefix -> bigint) so every
  assignment reproduces bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import row_hash


def shard_assign(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """df + (shard, pos): shard = hash(key) % n_shards, pos = rank of
    (hash, key) within the shard. Deterministic across runs, retries and
    cluster sizes; the window partitions on shard, so the only shuffle is
    the shard shuffle the export needs anyway. Ties are impossible:
    key_col is unique, and (hash, key) carries the key as tie-break."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = row_hash(F.col(key_col).cast("string"))
    out = df.withColumn("_h", h) \
            .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(),
                                            F.col(key_col).asc())
    return (out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
            .drop("_h"))


def pack_sequences(df: DataFrame, key_col: str, token_col: str,
                   budget: int, n_shards: int) -> DataFrame:
    """Concat-and-chunk packing: lay docs out in deterministic shard order
    and chunk the token stream into sequences of `budget` tokens. Each doc
    gets (shard, seq_id, seq_offset): seq_id = exclusive-prefix-sum of
    tokens // budget, seq_offset = exclusive-prefix % budget — i.e. the
    sequence and intra-sequence position where the doc's tokens START
    (a doc may spill into the next sequence; the trainer's loader reads
    the stream, so only the start coordinate is materialized).

    Cost at scale: the same single shard shuffle as shard_assign plus a
    running-sum window per shard — no extra pass, no driver state."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    sharded = shard_assign(df, key_col, n_shards)
    w = (Window.partitionBy("shard")
         .orderBy(F.col("pos").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    # integer `div`, not double `/`: exact at any prefix magnitude
    return (sharded
            .withColumn("_prefix", prefix)
            .withColumn("seq_id", F.expr(f"_prefix div {int(budget)}"))
            .withColumn("seq_offset",
                        F.pmod(F.col("_prefix"), F.lit(budget)).cast("long"))
            .drop("_prefix"))


def chunk_overlap(df: DataFrame, id_col: str, text_col: str,
                  chunk_size: int, stride: int) -> DataFrame:
    """Overlapping token-window chunking (RAG / context-window prep):
    split `text_col` on spaces and emit one row per window of
    `chunk_size` tokens starting every `stride` tokens (overlap =
    chunk_size - stride). Chunk starts are 0, stride, 2*stride, ... while
    start < n_tokens, so every token lands in >= 1 chunk and the final
    chunk may be short.

    Pure narrow plan: split + sequence + posexplode + slice, all JVM
    expressions inside whole-stage codegen — no shuffle, no Python. At
    100 TB this runs as a map-only stage over the scan; output order is a
    pure function of the input row, so chunk ids are reproducible on any
    cluster size."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if not 0 < stride <= chunk_size:
        raise ValueError(
            f"stride must be in (0, chunk_size={chunk_size}], got {stride}")
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0),
                        F.greatest(F.size(toks) - 1, F.lit(0)),
                        F.lit(stride))
    rows = (df.withColumn("_toks", toks)
            .select(F.col(id_col), "_toks",
                    F.posexplode(starts).alias("chunk_idx", "chunk_start")))
    chunk = F.slice(F.col("_toks"), F.col("chunk_start") + 1, chunk_size)
    return rows.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"))
