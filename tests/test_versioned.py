"""Versioned snapshot tables (sources/versioned.py): append/overwrite
commits, time travel, rollback, crash-orphan tolerance, vacuum."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blog_parser_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("val"))


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_commit_append_overwrite_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = V.commit(_df(spark, 0, 10), root)            # append (initial)
    v2 = V.commit(_df(spark, 10, 15), root)           # append
    v3 = V.commit(_df(spark, 100, 103), root, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert V.current_version(root) == 3
    # snapshot reads: every version stays readable
    assert _ids(V.read_version(spark, root, 1)) == list(range(10))
    assert _ids(V.read_version(spark, root, 2)) == list(range(15))
    assert _ids(V.read_version(spark, root)) == [100, 101, 102]
    # schema preserved through the manifest indirection
    assert V.read_version(spark, root).columns == ["id", "val"]


def test_rollback_is_pointer_swap_and_appends_fork(spark, tmp_path):
    root = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), root)
    V.commit(_df(spark, 5, 8), root)
    V.rollback(root, 1)
    assert V.current_version(root) == 1
    assert _ids(V.read_version(spark, root)) == list(range(5))
    # a new append parents off the ROLLED-BACK version, not the abandoned tip
    V.commit(_df(spark, 50, 52), root)
    assert _ids(V.read_version(spark, root)) == [0, 1, 2, 3, 4, 50, 51]
    # the abandoned version is still time-travelable
    assert _ids(V.read_version(spark, root, 2)) == list(range(8))


def test_crash_orphan_ignored_and_vacuumed(spark, tmp_path):
    root = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), root)
    # simulate a crash after step 1 (data down, no manifest): orphan dir
    _df(spark, 90, 95).write.parquet(f"{root}/data/v2")
    # readers are unaffected
    assert _ids(V.read_version(spark, root)) == list(range(5))
    # next commit skips the orphan's slot (no write collision) and succeeds
    v = V.commit(_df(spark, 5, 7), root)
    assert v == 3
    assert _ids(V.read_version(spark, root)) == list(range(7))
    # vacuum collects the orphan but keeps live data
    V.vacuum(root, keep_versions=2)
    assert not os.path.isdir(f"{root}/data/v2")
    assert _ids(V.read_version(spark, root)) == list(range(7))


def test_vacuum_drops_old_versions_keeps_current(spark, tmp_path):
    root = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), root)
    V.commit(_df(spark, 100, 102), root, mode="overwrite")
    V.commit(_df(spark, 200, 203), root, mode="overwrite")
    deleted = V.vacuum(root, keep_versions=1)
    assert deleted  # v1+v2 data dirs and manifests went away
    assert _ids(V.read_version(spark, root)) == [200, 201, 202]
    # vacuum again is a no-op (idempotent; truncated parent chain is fine)
    assert V.vacuum(root, keep_versions=1) == []


def test_diff_versions_append_fast_path_and_overwrite_compare(spark, tmp_path):
    """CDF between versions: an append chain diffs by reading ONLY the
    new data dirs (verified by content); an overwrite in the chain
    falls back to the key-joined compare and classifies
    insert/delete/update with pre+post images."""
    from pyspark.sql import Row, functions as F
    root = str(tmp_path / "t")
    v1 = V.commit(spark.createDataFrame(
        [Row(k=1, val="a"), Row(k=2, val="b")]), root)
    v2 = V.commit(spark.createDataFrame(
        [Row(k=3, val="c")]), root, mode="append")

    d12 = V.diff_versions(spark, root, v1, v2, ["k"]).collect()
    assert [(r["k"], r["val"], r["_change_type"]) for r in d12] \
        == [(3, "c", "insert")]

    # overwrite: k=1 kept, k=2 changed, k=3 dropped, k=4 new
    v3 = V.commit(spark.createDataFrame(
        [Row(k=1, val="a"), Row(k=2, val="B"), Row(k=4, val="d")]),
        root, mode="overwrite")
    d23 = {(r["k"], r["_change_type"]): r["val"] for r in
           V.diff_versions(spark, root, v2, v3, ["k"]).collect()}
    assert d23 == {(4, "insert"): "d", (3, "delete"): "c",
                   (2, "update_preimage"): "b",
                   (2, "update_postimage"): "B"}
    # unchanged k=1 emits nothing
    assert not any(k == 1 for k, _ in d23)

    # same-version diff on the append path is empty
    assert V.diff_versions(spark, root, v1, v1, ["k"]).count() == 0

    # duplicate keys make the compare path refuse
    V.commit(spark.createDataFrame(
        [Row(k=9, val="x"), Row(k=9, val="y")]), root, mode="overwrite")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="duplicate keys"):
        V.diff_versions(spark, root, v3,
                                V.current_version(root), ["k"])
