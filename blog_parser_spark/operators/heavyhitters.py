"""Exact heavy hitters over unbounded key cardinality: the two-pass
Misra-Gries candidates + exact-recount pattern.

`text_heavy_hitters` (operators/textstats.py) answers exact top-k with
a full groupBy — correct, but at the 100 TB tier a naive groupBy on a
key with BILLIONS of distinct values (urls, user ids, query strings)
shuffles |distinct keys| x partitions rows just to discard all but a
handful. The classic fix (Misra-Gries '82; Agarwal et al. "Mergeable
Summaries", PODS'12) is two passes:

  pass 1 — each partition maintains a Misra-Gries summary of at most
    `capacity` counters (Arrow-batched mapInPandas, vectorized
    value_counts per batch, O(capacity) state). The union of the
    per-partition summaries is a GUARANTEED SUPERSET of every key with
    global frequency > N/(capacity+1): if a key is absent from a
    partition's summary, its frequency there is <= n_p/(capacity+1)
    (each MG reduction subtracts delta from >= capacity+1 counters, so
    total decrement <= n_p/(capacity+1)); summing over partitions
    bounds the global frequency by N/(capacity+1).
  pass 2 — a SECOND SCAN recounts ONLY the candidates (left-semi join
    against the broadcast candidate set, <= capacity x partitions keys)
    and keeps keys whose EXACT count clears the threshold.

The output is therefore exact and partition-layout-independent (the
candidate set varies with partitioning; the final filter does not) —
asserted by tests/test_webops.py under three different layouts — while
the shuffle carries at most |candidates| x partitions rows instead of
|distinct keys| x partitions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CAPACITY = 64

_CAND_SCHEMA = StructType([StructField("hh_key", StringType())])


def mg_candidates(df: DataFrame, key_col: str,
                  capacity: int = CAPACITY) -> DataFrame:
    """Per-partition Misra-Gries summaries -> distinct candidate keys.

    Batch-merge variant: fold each Arrow batch's value_counts into the
    running counter dict, then reduce to <= capacity counters by
    subtracting the (capacity+1)-th largest count from every counter
    and dropping the non-positive ones (the mergeable-summaries
    reduction — one subtraction per overflow, not one per arrival).
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for key, c in pdf["hh_key"].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > capacity:
                vals = sorted(counts.values(), reverse=True)
                delta = vals[capacity]
                counts = {k: v - delta
                          for k, v in counts.items() if v > delta}
        yield pd.DataFrame({"hh_key": list(counts.keys())})

    keyed = df.select(F.col(key_col).cast("string").alias("hh_key"))
    return keyed.mapInPandas(fn, _CAND_SCHEMA).distinct()


def exact_heavy_hitters(df: DataFrame, key_col: str,
                        capacity: int = CAPACITY) -> DataFrame:
    """Keys with exact count * (capacity+1) > N, via candidates+recount.

    Pass 2 semi-joins the stream against the BROADCAST candidate set
    (bounded by capacity x partitions rows by construction — never
    collected to the driver), recounts exactly with map-side combine,
    and thresholds against the in-plan one-row total. Output:
    (hh_key string, cnt bigint, n_total bigint) — all exact integers.

    NULL keys are EXCLUDED (from the counts and from n_total): pandas
    value_counts drops NaN, so a null-heavy stream would silently lose
    its null group in pass 1 while a direct groupBy reports it — the
    explicit filter makes both formulations agree by contract instead
    of by fixture luck (tests/test_webops.py pins it).
    """
    keyed = (df.select(F.col(key_col).cast("string").alias("hh_key"))
             .filter(F.col("hh_key").isNotNull()))
    cand = mg_candidates(df, key_col, capacity)
    total = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    counts = (keyed.join(F.broadcast(cand), "hh_key", "left_semi")
              .groupBy("hh_key").agg(F.count(F.lit(1)).alias("cnt")))
    return (counts.crossJoin(F.broadcast(total))
            .where(F.col("cnt") * (capacity + 1) > F.col("n_total"))
            .select("hh_key", "cnt", "n_total"))
