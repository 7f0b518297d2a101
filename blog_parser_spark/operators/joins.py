"""Join operators that need explicit scale engineering (SURVEY.md §2.3):
the salted skew join. Broadcast/semi/anti/range/as-of joins are plain
DataFrame calls and live inline in plans/queries.py.
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
