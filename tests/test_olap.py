"""OLAP-breadth + log-analytics operator tests: URL canonicalization
(hand cases, idempotence), join-based triangle counting (hand graphs),
anomaly z-score (planted spike), and incremental partial-aggregate
merge (persisted day-by-day fold == full recompute)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from blog_parser_spark.operators import graph, urlnorm
from blog_parser_spark.plans import queries_olap


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(urlnorm.canonicalize(F.col("url")).alias("c")).first()["c"]


def test_url_canonicalize_hand_cases(spark):
    cases = {
        # scheme/host lowering + default-port strip + utm drop + sort
        "HTTPS://Ex.COM:443/a/?utm_source=x&b=2&a=1":
            "https://ex.com/a?a=1&b=2",
        # http default port, fragment drop
        "http://EX.com:80/p#frag": "http://ex.com/p",
        # non-default port survives
        "https://ex.com:8443/p": "https://ex.com:8443/p",
        # :80 on https is NOT default — survives
        "https://ex.com:80/p": "https://ex.com:80/p",
        # root path normalizes to '/', empty query vanishes
        "https://ex.com?": "https://ex.com/",
        "https://ex.com///": "https://ex.com/",
        # only-utm query vanishes entirely
        "https://ex.com/p?utm_a=1&utm_b=2": "https://ex.com/p",
    }
    for url, want in cases.items():
        assert _canon(spark, url) == want, url


def test_url_canonicalize_idempotent(spark):
    urls = ["HTTPS://Ex.COM:443/a/?utm_source=x&b=2&a=1",
            "http://EX.com:80/p#frag", "https://ex.com?z=1&y=2"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(urlnorm.canonicalize(F.col("url")).alias("c"))
    twice = once.select(urlnorm.canonicalize(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


def test_triangle_count_hand_graphs(spark):
    # K4 has C(4,3)=4 triangles; canonical a<b edges
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "a int, b int")
    assert graph.triangle_count(df).first()["n_triangles"] == 4
    # path graph: zero triangles
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "a int, b int")
    assert graph.triangle_count(path).first()["n_triangles"] == 0
    # one triangle + a pendant edge
    tri = spark.createDataFrame([(0, 1), (0, 2), (1, 2), (2, 3)],
                                "a int, b int")
    assert graph.triangle_count(tri).first()["n_triangles"] == 1


def test_anomaly_zscore_planted_spike(spark, tmp_path):
    # 20 hours of 5 events + one spike hour of 60 -> only the spike flags
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(20):
        n = 60 if h == 7 else 5
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i % 60),
                         eid % 13, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    out = queries_olap.q_log_anomaly_zscore(spark, sf).collect()
    assert len(out) == 1
    row = out[0]
    assert row["cnt"] == 60 and row["hr"] == base + dt.timedelta(hours=7)
    # z-score matches the closed-form population-of-21 sample stddev calc
    cnts = [60 if h == 7 else 5 for h in range(20)]
    mean = sum(cnts) / len(cnts)
    var = sum((c - mean) ** 2 for c in cnts) / (len(cnts) - 1)
    assert abs(row["zscore"] - round((60 - mean) / math.sqrt(var), 6)) < 1e-9


def test_incremental_partials_fold_equals_recompute(spark, tmp_path):
    """The MV-maintenance story: persist per-day partials parquet
    day-by-day (incremental refresh), then merge the accumulated
    snapshots — totals must equal a direct aggregate over all raw rows."""
    base = dt.datetime(2024, 3, 1)
    rows = [(i, base + dt.timedelta(days=i % 5, minutes=i % 90), i % 7,
             ["click", "view"][i % 2], float(i % 11) * 0.25, "{}")
            for i in range(2000)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    pdir = f"{tmp_path}/partials"
    # incremental: one refresh per day appends that day's partial rows
    for d in range(5):
        day = (base + dt.timedelta(days=d)).date()
        day_rows = ev.filter(F.to_date("ts") == F.lit(day.isoformat()))
        queries_olap.daily_partials(day_rows).write.mode("append").parquet(pdir)
    merged = {r["event_type"]: r for r in
              queries_olap.merge_partials(spark.read.parquet(pdir)).collect()}
    direct = {r["event_type"]: r for r in
              ev.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("value").cast("decimal(18,4)"))
                      .cast("double").alias("tv")).collect()}
    assert set(merged) == set(direct)
    for k, row in merged.items():
        assert row["n_events"] == direct[k]["n"]
        assert row["total_value"] == direct[k]["tv"]  # decimal-exact: bit-equal
        assert row["n_days"] == 5


def test_fuzzy_jaccard_join_hand_cases(spark):
    from blog_parser_spark.operators import joins
    left = spark.createDataFrame(
        [(1, ["a", "b", "c", "d", "e"]),      # vs r1: inter 4, union 5 -> 0.8
         (2, ["p", "q", "r", "s"]),           # vs r2: inter 2, union 4 -> 0.5
         (3, ["x"])],                         # no partner
        "id_l long, toks_l array<string>")
    right = spark.createDataFrame(
        [(10, ["a", "b", "c", "d"]),
         (20, ["p", "q", "z", "w"]),
         (30, ["m", "n"])],
        "id_r long, toks_r array<string>")
    got = {(r["id_l"], r["id_r"]): r["jacc"]
           for r in joins.fuzzy_jaccard_join(left, right, 0.8).collect()}
    assert got == {(1, 10): 0.8}
    # losslessness vs brute force on a denser corpus (every subset pair)
    import itertools
    univ = ["t%d" % i for i in range(8)]
    lrows = [(i, sorted(set(c))) for i, c in enumerate(
        itertools.combinations(univ, 6))]
    rrows = [(100 + i, sorted(set(c))) for i, c in enumerate(
        itertools.combinations(univ, 5))]
    ldf = spark.createDataFrame(lrows, "id_l long, toks_l array<string>")
    rdf = spark.createDataFrame(rrows, "id_r long, toks_r array<string>")
    got = {(r["id_l"], r["id_r"]) for r in
           joins.fuzzy_jaccard_join(ldf, rdf, 0.7).collect()}
    want = set()
    for i, lt in lrows:
        for j, rt in rrows:
            inter = len(set(lt) & set(rt))
            if inter and inter / (len(lt) + len(rt) - inter) >= 0.7:
                want.add((i, j))
    assert got == want and len(want) > 50


def test_fuzzy_jaccard_prefix_survives_integer_threshold_product(spark):
    """threshold*n landing on an exact integer (0.8*5=4) is where FP
    rounding pushes the double product just above the integer and a bare
    ceil overshoots, shortening the prefix by one token. Constructed
    miss: y={z,a,b,c,d} with z globally rarest and unique to y — the
    overshoot prefix {z} shares nothing with x={a,b,c,d}'s prefix {a},
    so the jacc=0.8 pair vanishes; the epsilon-guarded prefix {z,a}
    keeps it."""
    from blog_parser_spark.operators import joins
    left = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]),
         (2, ["b", "c", "d"]),      # fillers push df(b,c,d) above df(a)
         (3, ["b", "c", "d"])],
        "id_l long, toks_l array<string>")
    right = spark.createDataFrame(
        [(10, ["z", "a", "b", "c", "d"])],
        "id_r long, toks_r array<string>")
    got = {(r["id_l"], r["id_r"]): r["jacc"]
           for r in joins.fuzzy_jaccard_join(left, right, 0.8).collect()}
    assert got == {(1, 10): 0.8}


def test_parse_grok_logs_conservation(spark):
    """Every synthesized log line must round-trip through the grok regex:
    request/byte totals equal the direct computation over events, i.e. no
    line is silently dropped or misparsed by the extraction."""
    from tests.conftest import SF_DIR

    out = queries_olap.q_parse_grok_logs(spark, SF_DIR).collect()
    assert {r["method"] for r in out} <= {"GET", "POST", "PUT", "DELETE"}
    assert {r["status"] for r in out} <= {"200", "404", "500"}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100)).alias("b")).first()
    assert sum(r["requests"] for r in out) == want["n"]
    assert sum(r["total_bytes"] for r in out) == want["b"]


def test_parse_grok_miss_semantics(spark):
    """The single-pass rewrite must keep regexp_extract's contract on
    BOTH sides: non-matching lines yield "" for string fields and NULL
    for numeric ones (not an ANSI cast error), and matching lines with
    brackets/quotes INSIDE ip or path still extract exactly — the
    right-anchored token picks cannot be fooled by field contents the
    way global ']' / '"' searches would be."""
    from blog_parser_spark.operators import groklog

    rows = [
        ('1.2.3.4 - - [100] "GET /a/1 HTTP/1.1" 200 42',),   # clean hit
        ('a[9]b - - [77] "GET /x HTTP/1.1" 200 5',),         # ']' inside ip
        ('1.2.3.4 - - [88] "PUT /we"ird]x HTTP/1.1" 404 9',),  # '"' in path
        ("not a log line",),                                  # plain miss
        ('1.2.3.4 - - [x] "GET /a HTTP/1.1" 200 zz',),       # near miss
    ]
    out = groklog.parse_lines(
        spark.createDataFrame(rows, "line string")).collect()
    hit, adv1, adv2, miss1, miss2 = out
    assert tuple(hit) == ("1.2.3.4", 100, "GET", "/a/1", "200", 42)
    assert tuple(adv1) == ("a[9]b", 77, "GET", "/x", "200", 5)
    assert tuple(adv2) == ("1.2.3.4", 88, "PUT", '/we"ird]x', "404", 9)
    for r in (miss1, miss2):
        assert (r["ip"], r["method"], r["path"], r["status"]) == ("",) * 4
        assert r["epoch"] is None and r["n_bytes"] is None


def test_mine_templates_hand_case(spark):
    """Positional-agreement rule: digits collapse to <NUM>, a position
    where the group disagrees becomes <*>, groups split on
    (token_count, first-two-token prefix)."""
    from blog_parser_spark.operators import logmine
    lines = spark.createDataFrame(
        [("job 17 finished in 40 ms",),
         ("job 99 finished in 7 ms",),
         ("job 3 crashed in 9 ms",),     # pos 3 varies -> <*>
         ("disk full on sda",),          # shared 2-token prefix,
         ("disk full on sdb",),          # last token varies -> <*>
         ("disk offline now",)],         # 2nd token differs -> own group
        "line string")
    got = {r["template"]: r["n_lines"]
           for r in logmine.mine_templates(lines).collect()}
    assert got == {"job <NUM> <*> in <NUM> ms": 3,
                   "disk full on <*>": 2,
                   "disk offline now": 1}


def test_assemble_multiline_hand_case(spark):
    """Continuation lines adopt the nearest preceding parent in their
    file; a torn head (continuation before any parent) groups under a
    NULL record_start instead of vanishing."""
    from blog_parser_spark.operators import logmine
    rows = [(1, 10, "ERROR boom"), (1, 11, "  at a"), (1, 12, "  at b"),
            (1, 13, "INFO ok"), (2, 5, "  orphan tail"), (2, 6, "INFO x")]
    df = spark.createDataFrame(rows, "file long, line_no long, line string")
    got = {(r["file"], r["record_start"]): (r["record"], r["n_lines"])
           for r in logmine.assemble_multiline(df).collect()}
    assert got == {
        (1, 10): ("ERROR boom\n  at a\n  at b", 3),
        (1, 13): ("INFO ok", 1),
        (2, None): ("  orphan tail", 1),
        (2, 6): ("INFO x", 1)}


def test_ip_cidr_enrich_hand_cases(spark):
    """ip_to_long arithmetic, malformed-IP degradation to NULL (never a
    crash), non-overlap containment, and left-join row conservation."""
    from blog_parser_spark.operators import enrich
    facts = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.1.255",), ("not.an.ip.x",), ("999",),
         ("10.0.3.7",)], "ip string")
    dim = spark.createDataFrame(
        [("a", 167772160, 167772415),          # 10.0.0.0 - 10.0.0.255
         ("b", 167772416, 167772671)],         # 10.0.1.0 - 10.0.1.255
        "label string, start_ip long, end_ip long")
    out = {r["ip"]: r["label"]
           for r in enrich.join_ip_ranges(facts, dim).collect()}
    # every fact row survives; malformed and uncovered IPs keep NULL
    assert out == {"10.0.0.1": "a", "10.0.1.255": "b",
                   "not.an.ip.x": None, "999": None, "10.0.3.7": None}
    lng = facts.select(enrich.ip_to_long("ip").alias("v")).collect()
    assert [r["v"] for r in lng] == [167772161, 167772671, None, None,
                                     167772935]


def test_bloom_routed_anti_join_exact(spark):
    """Routing == plain anti join EXACTLY, including the cases that break
    a naive bloom-anti: saturated bloom (everything 'maybe'), empty build
    (everything 'definite miss'), NULL probe keys, duplicate probe rows
    (row identity preserved, not just key membership)."""
    from pyspark.sql import Row
    from blog_parser_spark.operators import joins

    probe = spark.createDataFrame(
        [Row(url=f"u{i}", v=i) for i in range(200)]
        + [Row(url="u7", v=999), Row(url=None, v=-1)])  # dup row + null key
    build = spark.createDataFrame(
        [Row(url=f"u{i}") for i in range(0, 200, 3)])

    def rows(df):
        return sorted((r.url or "", r.v) for r in df.collect())

    expected = rows(probe.join(build, "url", "left_anti"))
    for bits in (64, 1 << 20):   # 64 = fully saturated bloom, all maybe
        got = rows(joins.bloom_routed_anti_join(probe, build, "url",
                                                num_bits=bits))
        assert got == expected, f"num_bits={bits}"

    empty = spark.createDataFrame([], "url string")
    assert rows(joins.bloom_routed_anti_join(probe, empty, "url")) == rows(probe)
