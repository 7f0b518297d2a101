"""CI guard for the input_hint's hard constraint: vectorized
pandas/Arrow UDFs only — NO per-row Python in the engine (SURVEY §7
hard part (d)). A row-at-a-time `@udf`/`F.udf` or an `.rdd` escape
hatch is 10-100x slower than the Arrow path at 100 TB and must not
slip in silently; this test fails the suite if one appears outside the
documented allowlist."""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "blog_parser_spark")

# (relative path, line-substring) pairs for any vetted exception
ALLOWED: set[tuple[str, str]] = set()

ROW_UDF = re.compile(r"(?<![\w.])udf\s*\(|@udf\b")
RDD = re.compile(r"\.rdd\b")


def _violations(pattern: re.Pattern) -> list[str]:
    out = []
    for root, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if "pandas_udf" in line or line.lstrip().startswith("#"):
                        continue
                    if pattern.search(line) and not any(
                            rel == p and s in line for p, s in ALLOWED):
                        out.append(f"{rel}:{i}: {line.strip()}")
    return out


def test_no_row_at_a_time_udf():
    assert _violations(ROW_UDF) == []


def test_no_rdd_escape_hatch():
    assert _violations(RDD) == []
