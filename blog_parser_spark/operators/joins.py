"""Join operators that need explicit scale engineering (SURVEY.md §2.3):
the salted skew join and the bin-bucketed range join. Broadcast/semi/
anti/as-of joins are plain DataFrame calls and live inline in
plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join_on(fact: DataFrame, dim: DataFrame, key: str, unique_col: str,
                   salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join on `key`: the hot key's fact rows spread over
    `salt_buckets` reducers.

    - fact side: salt = pmod(xxhash64(unique_col), buckets) — a pure
      function of the row (deterministic under retries, SURVEY.md §7b).
    - dim side: exploded x buckets (dims are small; the blow-up is bounded).
    - join on (key, salt): co-location preserved, hot key split.

    Result equals the unsalted join exactly (tests + oracle assert)."""
    salt = F.pmod(F.xxhash64(unique_col), F.lit(salt_buckets)).cast("int")
    f = fact.withColumn("_salt", salt)
    d = (dim.withColumn("_salt", F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>"))))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def range_join_binned(a: DataFrame, b: DataFrame, a_start: str, b_ts: str,
                      window_sec: int, how: str = "inner") -> DataFrame:
    """Scale formulation of the range join `a.start <= b.ts <
    a.start + window_sec`: bucketize the time axis into window-sized
    bins and equi-join on the bin, then re-apply the exact predicate.
    Turns an O(|A|x|B|) nested-loop into a shuffled hash join on _bin.

    Binning uses F.floor (true floor division), NOT a long cast — cast
    truncates toward zero, so for negative epochs (pre-1970) trunc !=
    floor and the at-most-2-bins invariant would silently drop pairs.
    With floor, a window [s, s+W) of width W == bin width spans at most
    2 bins, so each anchor row is duplicated into exactly those 2.

    `a_start`/`b_ts` are epoch-seconds (long/double) columns.

    Inner join only: the bin-explode duplicates each left row into its 2
    candidate bins and the exact predicate is re-applied AFTER the join,
    so outer semantics would be wrong twice over (unmatched rows are
    dropped by the NULL-valued post-filter, matched rows would carry a
    spurious null-partner duplicate from their other bin)."""
    if how != "inner":
        raise ValueError(
            f"range_join_binned supports how='inner' only, got {how!r}; "
            "outer range joins need the unbinned formulation")
    bin_sec = int(window_sec)
    if bin_sec < 1:
        raise ValueError(f"window_sec must be >= 1, got {window_sec}")
    a_bin = F.floor(F.col(a_start) / bin_sec).cast("long")
    a2 = a.withColumn("_bin", F.explode(F.array(a_bin, a_bin + 1)))
    b2 = b.withColumn("_bin", F.floor(F.col(b_ts) / bin_sec).cast("long"))
    cond = (F.col(b_ts) >= F.col(a_start)) & (
        F.col(b_ts) < F.col(a_start) + window_sec)
    return a2.join(b2, "_bin", how).filter(cond).drop("_bin")
