"""CDC merge semantics: latest-change-wins replay equivalence, delete
semantics, broadcast anti-join plan shape, SCD2 intervals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blog_parser_spark.operators import cdc
from blog_parser_spark.sources import io

from .conftest import SF_DIR

CH_SCHEMA = "doc_id long, text string, op string, seq int"


def _base(spark):
    return (io.read_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").filter("doc_id < 200"))


def _changes(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def test_apply_changes_matches_sequential_replay(spark):
    base = _base(spark)
    rows = []
    for d in range(0, 200, 3):
        rows.append((d, f"v1-{d}", "u", 1))
    for d in range(0, 200, 6):
        rows.append((d, f"v2-{d}", "u", 2))
    for d in range(0, 200, 9):
        rows.append((d, None, "d", 3))
    rows.append((9999, "insert", "u", 1))
    merged = cdc.apply_changes(base, _changes(spark, rows), "doc_id")

    # brute-force replay in plain python, ordered by seq
    state = {r.doc_id: r.text for r in base.collect()}
    for d, text, op, _seq in sorted(rows, key=lambda r: r[3]):
        if op == "u":
            state[d] = text
        else:
            state.pop(d, None)
    got = {r.doc_id: r.text for r in merged.collect()}
    assert got == state


def test_apply_changes_empty_delta_is_identity(spark):
    base = _base(spark)
    merged = cdc.apply_changes(base, _changes(spark, []), "doc_id")
    assert sorted(merged.collect()) == sorted(base.collect())


def test_apply_changes_rejects_unknown_op(spark):
    base = _base(spark)
    bad = _changes(spark, [(1, "x", "??", 1)])
    with pytest.raises(Exception, match="unknown CDC op"):
        cdc.apply_changes(base, bad, "doc_id").collect()


def test_apply_changes_broadcasts_delta(spark):
    base = _base(spark)
    delta = _changes(spark, [(1, "x", "u", 1)])
    merged = cdc.apply_changes(base, delta, "doc_id",
                               broadcast_changes=True)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scd2_intervals_chain(spark):
    hist = _changes(spark, [
        (1, "a", "u", 1), (1, "b", "u", 4), (1, None, "d", 9),
        (2, "x", "u", 2),
    ])
    out = {(r.doc_id, r.valid_from_seq):
           (r.valid_to_seq, r.op, r.is_current)
           for r in cdc.scd2_intervals(hist, "doc_id").collect()}
    assert out == {
        (1, 1): (4, "u", False),
        (1, 4): (9, "u", False),
        (1, 9): (None, "d", False),   # delete closes the history
        (2, 2): (None, "u", True),
    }
