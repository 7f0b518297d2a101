"""Count-min sketch: a fixed-size mergeable frequency sketch for
heavy-hitter estimation over unbounded key spaces — the streaming/
federated counterpart to exact `text_heavy_hitters` and to the HLL
cardinality sketches already in the registry.

The sketch is a depth x width grid of counters; each occurrence of a
key increments one counter per depth row (bucket = row-salted hash of
the key mod width). Point estimate = MIN over the depth cells — always
an OVERESTIMATE (collisions only add), with error <= 2N/width at
probability 1 - 2^-depth. Cells are plain additive partials, so
per-partition (or per-day, per-cluster) sketches MERGE by cell-wise
sum — asserted by tests/test_sketches.py — which is what makes the
operator useful at the 100 TB tier: the full stream collapses to
depth*width rows via one map-side-combined aggregate, no per-key state.

Determinism: the row-salted hash is the repo's cross-engine md5-prefix
BIGINT (operators/sampling.row_hash), a pure function of the data —
both engines place every increment in the same cell, so estimates are
bit-identical (CLAUDE.md salt convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import row_hash

DEPTH = 4
WIDTH = 1024


def _bucket(key_str, r_col, width: int):
    return F.pmod(
        row_hash(F.concat(r_col.cast("string"), F.lit(":"), key_str)),
        F.lit(width))


def count_min_cells(df: DataFrame, key_col: str,
                    depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Build the sketch: (r, b, n) cell counts, <= depth*width rows.
    One explode (factor `depth`) + one map-side-combined aggregate."""
    rows = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r"))
    return (rows.select("r", _bucket(F.col("k"), F.col("r"), width)
                        .alias("b"))
            .groupBy("r", "b").agg(F.count(F.lit(1)).alias("n")))


def count_min_estimate(cells: DataFrame, probes: DataFrame, key_col: str,
                       depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Point-estimate counts for a set of probe keys: explode each probe
    to its depth cells, broadcast-join the (bounded, <= depth*width-row)
    sketch, take the per-key MIN. Missing cells count 0 (the key never
    hashed there)."""
    keyed = probes.select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r"))
    lookups = keyed.select(key_col, "r",
                           _bucket(F.col("k"), F.col("r"), width).alias("b"))
    hit = lookups.join(F.broadcast(cells), ["r", "b"], "left")
    return (hit.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0).cast("long")))
                 .alias("est")))
