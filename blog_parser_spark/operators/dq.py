"""Data-quality expectations — the Great-Expectations-shaped audit a
landing zone runs before promoting a batch: declarative row-level rules
(not-null, range, set membership, regex) plus a key-uniqueness check,
reported as one row per rule with checked/violation counts.

Scale shape: ALL row-level rules evaluate in ONE pass — a single global
conditional aggregate (map-side-combined, one scalar row) that then
explodes into the per-rule report, so adding a rule adds a codegen
expression, never a scan. The uniqueness rule is inherently a second
aggregate (count vs count-distinct over the key) and unions in as one
more one-row plan. No row-level data leaves the executors — only the
per-rule counters.

Rule conditions must be NULL-safe: a NULL predicate result counts as a
VIOLATION (coalesce(cond, false)), matching the audit intuition that an
un-evaluable rule is a failing rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def run_expectations(df: DataFrame,
                     rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate row-level rules in one pass.

    rules: list of (rule_name, boolean Column); a row violates a rule
    when the condition is false OR null. Returns
    (rule, n_checked, n_violations, passed)."""
    aggs = [F.count(F.lit(1)).alias("n_checked")]
    for i, (_, cond) in enumerate(rules):
        aggs.append(
            F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))
            .alias(f"v{i}"))
    one = df.agg(*aggs)
    report = one.select(F.explode(F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col("n_checked"),
                 F.col(f"v{i}").alias("n_violations"))
        for i, (name, _) in enumerate(rules)])).alias("r")).select("r.*")
    return report.withColumn(
        "passed", (F.col("n_violations") == 0).cast("long"))


def expect_unique(df: DataFrame, key: str,
                  rule_name: str | None = None) -> DataFrame:
    """Key-uniqueness expectation: violations = rows beyond the first
    per key (n - distinct), so one duplicated pair counts 1."""
    name = rule_name or f"unique_{key}"
    one = df.agg(F.count(F.lit(1)).alias("n_checked"),
                 (F.count(F.lit(1)) - F.count_distinct(F.col(key)))
                 .alias("n_violations"))
    return one.select(F.lit(name).alias("rule"), "n_checked",
                      "n_violations",
                      (F.col("n_violations") == 0).cast("long")
                      .alias("passed"))
