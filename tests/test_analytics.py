"""Funnel sequence matching, heavy hitters, quality classifier."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row, functions as F

from blog_parser_spark.operators import funnel, textstats


def _ev(user, sec, etype, us=0):
    return Row(user_id=user,
               ts=dt.datetime(2024, 1, 1, 0, 0, sec, us),
               event_type=etype)


def test_funnel_hand_computed(spark):
    rows = [
        # u1: full funnel in order -> stage 4
        _ev(1, 1, "signup"), _ev(1, 2, "view"), _ev(1, 3, "click"),
        _ev(1, 4, "purchase"),
        # u2: purchase BEFORE the click -> stops at 2? no: signup, view,
        # purchase(3), click(4) -> click at 4 advances to 3; no purchase
        # after 4 -> stage 3
        _ev(2, 1, "signup"), _ev(2, 2, "view"), _ev(2, 3, "purchase"),
        _ev(2, 4, "click"),
        # u3: same-timestamp step must NOT advance (strict >):
        # signup and view share t=1 -> view doesn't count; view at 2 does
        _ev(3, 1, "signup"), _ev(3, 1, "view"), _ev(3, 2, "view"),
        # u4: never signs up -> stage 0 despite later steps
        _ev(4, 1, "view"), _ev(4, 2, "click"), _ev(4, 3, "purchase"),
        # u5: non-step events are ignored entirely
        _ev(5, 1, "error"), _ev(5, 2, "signup"),
        # u6: greedy-earliest is optimal — signup(1), view(2), view(5),
        # click(3): taking view@2 lets click@3 land -> stage 3
        _ev(6, 1, "signup"), _ev(6, 2, "view"), _ev(6, 5, "view"),
        _ev(6, 3, "click"),
    ]
    out = {r["user_id"]: r["funnel_stage"]
           for r in funnel.funnel_stages(spark.createDataFrame(rows)).collect()}
    assert out == {1: 4, 2: 3, 3: 2, 4: 0, 5: 1, 6: 3}


def test_funnel_ts_is_last_stage_time(spark):
    rows = [_ev(1, 1, "signup"), _ev(1, 2, "view"), _ev(2, 9, "error"),
            _ev(2, 10, "signup")]
    got = {r["user_id"]: r for r in
           funnel.funnel_stages(spark.createDataFrame(rows)).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert got[1]["funnel_ts_us"] == (base + 2) * 1_000_000
    assert got[2]["funnel_ts_us"] == (base + 10) * 1_000_000


def test_funnel_deterministic_under_repartition(spark):
    ev = (spark.range(0, 2000)
          .select((F.col("id") % 37).alias("user_id"),
                  F.timestamp_seconds(1704067200 + (F.col("id") * 7919) % 86400)
                   .alias("ts"),
                  F.element_at(
                      F.array(*[F.lit(s) for s in
                                ("signup", "view", "click", "purchase", "error")]),
                      ((F.xxhash64("id") % 5 + 5) % 5 + 1).cast("int"))
                  .alias("event_type")))
    a = sorted(funnel.funnel_stages(ev).collect())
    b = sorted(funnel.funnel_stages(ev.repartition(13, "event_type")).collect())
    assert a == b


def test_heavy_hitters_topk_plan_and_values(spark):
    docs = spark.createDataFrame(
        [Row(text="a a a b b c"), Row(text="b a d")])
    out = textstats.heavy_hitters(docs, k=3).collect()
    assert [(r["word"], r["cnt"]) for r in out] == [("a", 4), ("b", 3), ("c", 1)]
    # top-k must be TakeOrderedAndProject (per-partition heaps), never a
    # global Sort + Limit
    plan = textstats.heavy_hitters(docs, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_quality_classifier_threshold_consistency(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the a of to and the a"),   # stop-heavy -> high
         Row(doc_id=2, text="x x x x x x x x x x")])    # repetitive -> low
    rows = {r["doc_id"]: r for r in
            textstats.quality_classifier(docs).collect()}
    for r in rows.values():
        sig = 1.0 / (1.0 + math.exp(-r["logit"]))
        assert abs(sig - r["quality_prob"]) < 1e-9
        assert r["keep"] == (r["logit"] > 0)
    assert rows[1]["quality_prob"] > rows[2]["quality_prob"]


def test_dedup_canonical_plan_is_pure_jvm(spark, tmp_path):
    """Canonical extraction must never pay an Arrow round trip — it is a
    single JVM regexp fused into the scan (operators/urlnorm.py)."""
    from blog_parser_spark.operators import urlnorm
    from blog_parser_spark.sources import io
    from tests.conftest import SF_DIR

    # parquet round trip drops the fixture-render UDF from the measured
    # plan: what remains is scan -> JVM regexp extract -> one hash agg
    pages = io.synth_pages(spark, SF_DIR, with_canonical=True)
    pages.write.mode("overwrite").parquet(str(tmp_path / "p"))
    out = urlnorm.canonical_groups(spark.read.parquet(str(tmp_path / "p")))
    assert out.count() > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_compression_signal_exact_and_structural(spark):
    """Spark output == direct python zlib for every fixture doc (the
    no-SQL-oracle op's exactness gate), plus the structural property the
    signal exists for: repetitive boilerplate compresses far below
    natural prose."""
    import zlib

    from blog_parser_spark.operators import textstats
    from blog_parser_spark.sources import io
    from tests.conftest import SF_DIR

    docs = io.read_table(spark, SF_DIR, "documents")
    got = {r.doc_id: (r.raw_bytes, r.compressed_bytes)
           for r in textstats.compression_signal(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        raw = row.text.encode("utf-8")
        assert got[row.doc_id] == (
            len(raw), len(zlib.compress(raw, textstats.ZLIB_LEVEL)))

    from pyspark.sql import Row
    pair = spark.createDataFrame([
        Row(doc_id=1, text="click here click here click here " * 60),
        Row(doc_id=2, text=" ".join(f"w{i * 7919 % 5077}" for i in range(360))),
    ])
    r = {x.doc_id: x.compressed_bytes / x.raw_bytes
         for x in textstats.compression_signal(pair).collect()}
    assert r[1] < 0.1 < r[2]  # boilerplate << varied text
