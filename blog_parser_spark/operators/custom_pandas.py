"""Grouped pandas-UDF surfaces (SURVEY.md §2.3 UDF/UDAF table): the two
vectorized group-wise shapes the engine supports beyond scalar UDFs.

Both are Arrow-batched — no per-row Python anywhere — and both are
deterministic (integer arithmetic, explicit intra-group ordering), so
results are exactly reproducible under retries and vs the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


# DataType object, not a DDL string: string return types are parsed at
# import time and would require an active SparkSession just to import this
# module (the driver imports before building its session).
@pandas_udf(LongType())
def checked_sum_udaf(v: pd.Series) -> int:
    """Grouped-agg pandas UDAF: exact int64 sum with an overflow guard.

    pandas' int64 sum wraps silently on overflow; at 10^12-row scale a
    per-group byte total CAN exceed 2^63 if keys are degenerate, and a
    wrapped negative total would corrupt downstream capacity planning.
    Summing through Python ints (arbitrary precision) and range-checking
    makes the failure loud instead. An all-NULL group returns NULL, the
    SQL SUM semantics the DuckDB oracle implements — returning 0 there
    would be a silent contract mismatch on nullable data."""
    vals = v.dropna()
    if vals.empty:
        return None
    total = int(vals.astype(object).sum())
    if not (-(1 << 63) <= total < (1 << 63)):
        raise OverflowError(f"group sum {total} exceeds int64")
    return total


def checked_byte_sums(df: DataFrame, key: str, value: str) -> DataFrame:
    """groupBy(key).agg(checked_sum(value)) via the grouped-agg UDAF."""
    return (df.groupBy(key)
            .agg(checked_sum_udaf(F.col(value)).alias("total")))


def group_cumsum(df: DataFrame, key: str, order: str, value: str,
                 out: str = "cum") -> DataFrame:
    """Grouped-map applyInPandas: per-group running total of `value`
    ordered by `order` (both spark-side ints -> exact).

    The window-function equivalent (SUM OVER rowsBetween) is preferred in
    SQL-expressible plans; this is the escape hatch shape for group-wise
    logic Catalyst cannot express, kept deliberately simple so the
    driver's oracle can verify the plumbing."""
    schema = ", ".join(
        [f"{key} {dict(df.dtypes)[key]}", f"{order} {dict(df.dtypes)[order]}",
         f"{value} {dict(df.dtypes)[value]}", f"{out} long"])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out] = pdf[value].astype("int64").cumsum()
        return pdf[[key, order, value, out]]

    return df.select(key, order, value).groupBy(key).applyInPandas(fn, schema)
