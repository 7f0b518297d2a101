"""Formatted-plan helpers shared by the plan tests and tools/plan_audit.py
— one copy of the explainString call and the node-name parsing, so a Spark
formatted-plan syntax change can't silently desynchronize the two."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NODE_RE = re.compile(r"^\(\d+\) (\w+)", re.M)


def plan_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def plan_nodes(plan: str) -> list[str]:
    """Physical node names from the detail section — each node exactly once."""
    return _NODE_RE.findall(plan)
