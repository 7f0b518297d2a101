"""Tests for the web-operations operators: exact heavy hitters
(Misra-Gries candidates + recount), robots politeness audit, and the
k-anonymity generalization census."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row, functions as F

from blog_parser_spark.operators import anonymity, heavyhitters, robots


def _skewed_stream(spark, n=5000):
    # 50% of rows on 3 hot keys, the rest over a 512-key tail.
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 512).cast("string")))
        .alias("k"))


def test_heavy_hitters_exact_and_partition_invariant(spark):
    df = _skewed_stream(spark)
    rows = df.collect()
    n = len(rows)
    cnt = Counter(r["k"] for r in rows)
    cap = heavyhitters.CAPACITY
    expected = sorted((k, c, n) for k, c in cnt.items()
                      if c * (cap + 1) > n)
    for layout in (df, df.repartition(1), df.repartition(13, "k"),
                   df.repartition(32)):
        got = sorted(tuple(r) for r in
                     heavyhitters.exact_heavy_hitters(layout, "k").collect())
        assert got == expected


def test_mg_candidates_are_a_superset_of_true_heavy_hitters(spark):
    df = _skewed_stream(spark)
    rows = df.collect()
    n = len(rows)
    cnt = Counter(r["k"] for r in rows)
    true_hh = {k for k, c in cnt.items()
               if c * (heavyhitters.CAPACITY + 1) > n}
    for layout in (df.repartition(1), df.repartition(7)):
        cand = {r["hh_key"] for r in
                heavyhitters.mg_candidates(layout, "k").collect()}
        assert true_hh <= cand


def test_mg_tiny_capacity_still_exact(spark):
    # capacity 2 over a stream where one key has > n/3: candidates are a
    # tight superset, yet the recount output stays exact.
    df = spark.createDataFrame(
        [Row(k=x) for x in
         ["a"] * 40 + ["b"] * 10 + [f"z{i}" for i in range(30)]])
    out = {(r["hh_key"], r["cnt"]) for r in
           heavyhitters.exact_heavy_hitters(
               df.repartition(5), "k", capacity=2).collect()}
    assert out == {("a", 40)}  # 40*3 > 80; b: 10*3 < 80


def _python_robots_verdict(path, rules):
    best = None
    for prefix, rule in rules:
        if path.startswith(prefix):
            key = (len(prefix), rule == "allow", prefix)
            if best is None or key > best[0]:
                best = (key, rule)
    return best[1] if best else "allow"


def test_robots_politeness_matches_python_reference(spark):
    fetches = spark.range(400).select(
        F.concat(F.lit("site"), (F.col("id") % 20).cast("string"),
                 F.lit(".example")).alias("host"),
        F.concat(F.lit("/sec"), (F.col("id") % 9).cast("string"),
                 F.lit("/"),
                 F.when(F.col("id") % 3 == 0, F.lit("pub"))
                 .when(F.col("id") % 3 == 1, F.lit("priv"))
                 .otherwise(F.lit("page")),
                 (F.col("id") % 31).cast("string")).alias("path"))
    got = {r["host"]: (r["fetches"], r["blocked"]) for r in
           robots.politeness_audit(
               fetches, robots.rules_df(spark)).collect()}

    by_host: dict[str, list[tuple[str, str]]] = {}
    for h, p, r in robots.robots_rules():
        by_host.setdefault(h, []).append((p, r))
    exp: dict[str, list[int]] = {}
    for row in fetches.collect():
        e = exp.setdefault(row["host"], [0, 0])
        e[0] += 1
        if _python_robots_verdict(row["path"],
                                  by_host.get(row["host"], [])) == "disallow":
            e[1] += 1
    assert got == {h: (f, b) for h, (f, b) in exp.items()}


def test_robots_fetch_stream_stays_map_only(spark):
    # The winning-rule pick is pure higher-order functions over the
    # broadcast rule arrays, so the FETCH stream sees no exchange until
    # the final per-host rollup: the whole plan carries exactly two
    # hash exchanges — the tiny rules-side collect_list and that rollup.
    fetches = spark.range(100).select(
        F.lit("site0.example").alias("host"),
        F.concat(F.lit("/sec0/p"), F.col("id").cast("string")).alias("path"))
    out = robots.politeness_audit(fetches, robots.rules_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 2, plan
    assert "BroadcastExchange" in final, plan


def test_k_anonymity_census_exact_and_monotone(spark):
    docs = spark.createDataFrame(
        [Row(lang=f"l{i % 3}", source=f"s{i % 2}", n_chars=17 * i % 700)
         for i in range(200)])
    got = {r["width"]: r for r in
           anonymity.k_anonymity_census(docs).collect()}
    assert set(got) == set(anonymity.WIDTHS)

    pdf = docs.toPandas()
    for w in anonymity.WIDTHS:
        g = pdf.groupby(
            [pdf["lang"], pdf["source"],
             pdf["n_chars"] // (w * anonymity.BASE_BUCKET)]).size()
        assert got[w]["n_classes"] == len(g)
        assert got[w]["risky_classes"] == int((g < anonymity.K).sum())
        assert got[w]["rows_at_risk"] == int(g[g < anonymity.K].sum())

    for a, b in zip(anonymity.WIDTHS, anonymity.WIDTHS[1:]):
        assert got[b]["rows_at_risk"] <= got[a]["rows_at_risk"]
        assert got[b]["risky_classes"] <= got[a]["risky_classes"]
        assert got[b]["n_classes"] <= got[a]["n_classes"]


def test_path_template_generalization(spark):
    from blog_parser_spark.operators import urlnorm
    rows = spark.createDataFrame(
        [Row(path=p) for p in
         ["/s1/item/4821", "/s1/item/7", "/s1/list", "/u/99/profile",
          "/mixed/ab12/3", "/", ""]])
    got = {r["path"]: r["template"] for r in rows.select(
        "path", urlnorm.path_template(F.col("path")).alias("template"))
        .collect()}
    assert got["/s1/item/4821"] == "/s1/item/{id}"
    assert got["/s1/item/7"] == "/s1/item/{id}"
    assert got["/s1/list"] == "/s1/list"
    assert got["/u/99/profile"] == "/u/{id}/profile"
    # alnum segments are NOT ids; pure-digit ones are
    assert got["/mixed/ab12/3"] == "/mixed/ab12/{id}"
    assert got["/"] == "/" and got[""] == ""


def test_template_census_two_stage(spark):
    from blog_parser_spark.operators import urlnorm
    rows = spark.createDataFrame(
        [Row(path=p) for p in
         ["/a/1", "/a/2", "/a/2", "/b", "/b"]])
    got = {r["template"]: (r["requests"], r["distinct_paths"])
           for r in urlnorm.template_census(rows).collect()}
    assert got == {"/a/{id}": (3, 2), "/b": (2, 1)}
    plan = urlnorm.template_census(rows)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" not in plan


def test_crawl_delay_audit_gap_semantics(spark):
    fetches = spark.createDataFrame(
        [Row(event_id=i, host=h, ts_s=t, delay_s=2) for i, (h, t) in
         enumerate([("h1", 100), ("h1", 101), ("h1", 105), ("h1", 105),
                    ("h2", 50)])])
    got = {r["host"]: (r["fetches"], r["violations"], r["min_gap_s"])
           for r in robots.crawl_delay_audit(fetches).collect()}
    # h1 gaps: 1 (violation), 4, 0 (same-second fetch, violation)
    assert got["h1"] == (4, 2, 0)
    # single-fetch host: no gap, no violation, NULL min gap
    assert got["h2"] == (1, 0, None)


def test_degenerate_inputs(spark):
    from blog_parser_spark.operators import links
    empty = spark.range(0).select(F.col("id").cast("string").alias("k"))
    assert heavyhitters.exact_heavy_hitters(empty, "k").collect() == []
    one = spark.range(1).select(F.lit("only").alias("k"))
    assert [tuple(r) for r in
            heavyhitters.exact_heavy_hitters(one, "k").collect()] \
        == [("only", 1, 1)]
    # a host with no rules defaults to allow, not a dropped row
    f = spark.createDataFrame([("unknown.example", "/x", 1)],
                              "host string, path string, event_id int")
    assert [tuple(r) for r in robots.politeness_audit(
        f, robots.rules_df(spark)).collect()] == [("unknown.example", 1, 0)]
    assert links.resolve_redirects(
        spark.createDataFrame([], "src string, dst string")).collect() == []


def test_parse_robots_txt_roundtrips_the_rule_fixture(spark):
    parsed = {tuple(r) for r in
              robots.parse_robots_txt(robots.bodies_df(spark)).collect()}
    assert parsed == set(robots.robots_rules())
    # and the audit over parsed rules equals the audit over the table
    fetches = spark.range(300).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("site"), (F.col("id") % 20).cast("string"),
                 F.lit(".example")).alias("host"),
        F.concat(F.lit("/sec"), (F.col("id") % 9).cast("string"),
                 F.lit("/pub"), (F.col("id") % 7).cast("string"))
        .alias("path"))
    a = sorted(tuple(r) for r in robots.politeness_audit(
        fetches, robots.rules_df(spark)).collect())
    b = sorted(tuple(r) for r in robots.politeness_audit(
        fetches, robots.parse_robots_txt(robots.bodies_df(spark))).collect())
    assert a == b


def test_heavy_hitters_null_keys_excluded_by_contract(spark):
    # a null-heavy stream: nulls are excluded from counts AND n_total
    # (documented contract — pandas value_counts would silently drop the
    # null group from the candidate pass otherwise)
    df = spark.createDataFrame(
        [Row(k=None)] * 60 + [Row(k="a")] * 30 + [Row(k="b")] * 10,
        "k string")
    got = sorted(tuple(r) for r in
                 heavyhitters.exact_heavy_hitters(
                     df.repartition(5), "k", capacity=3).collect())
    # non-null stream has 40 rows: a=30 (30*4>40), b=10 (40 not >40)
    assert got == [("a", 30, 40)]


def test_sitemap_coverage_hand_computed(spark):
    """parse_sitemap + coverage rollup: hosts with phantom locs, unlisted
    fetches, a host with no sitemap at all, and a sitemap whose host was
    never fetched."""
    from pyspark.sql import Row
    from blog_parser_spark.operators import robots

    sitemaps = spark.createDataFrame([
        Row(host="a.com", sitemap_xml=(
            "<urlset>"
            "<url><loc>https://a.com/1</loc></url>"
            "<url><loc>https://a.com/2</loc></url>"
            "<url><loc>https://a.com/ghost</loc></url>"
            "</urlset>")),
        # sitemap exists, host never fetched
        Row(host="c.com", sitemap_xml=
            "<urlset><url><loc>https://c.com/1</loc></url></urlset>"),
    ])
    fetched = spark.createDataFrame([
        Row(url="https://a.com/1"),
        Row(url="https://a.com/2"),
        Row(url="https://a.com/3"),       # unlisted
        Row(url="https://b.com/1"),       # host with no sitemap
    ])
    got = {r.host: r for r in robots.sitemap_coverage(sitemaps, fetched).collect()}
    assert (got["a.com"].n_listed, got["a.com"].n_fetched,
            got["a.com"].n_missing, got["a.com"].n_unlisted) == (3, 2, 1, 1)
    assert (got["b.com"].n_listed, got["b.com"].n_unlisted) == (0, 1)
    assert (got["c.com"].n_listed, got["c.com"].n_missing) == (1, 1)
    assert len(got) == 3

    # parse is pure JVM: no Python stage anywhere in the audit plan
    out = robots.sitemap_coverage(sitemaps, fetched)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_budget_allocation_properties(spark):
    """Hamilton apportionment invariants: quotas sum EXACTLY to the
    budget, every quota is floor-or-ceil of its exact share, ties are
    host-deterministic, and BIGINT-scale weights don't lose precision."""
    from pyspark.sql import Row
    from blog_parser_spark.operators import recrawl

    hosts = spark.createDataFrame(
        [Row(host=f"h{i:02d}", weight=(i * 37 + 1) % 101 + 1)
         for i in range(23)])
    budget = 997  # prime: guarantees remainders
    out = recrawl.allocate_budget(hosts, budget).collect()
    w_total = sum(r.weight for r in out)
    assert sum(r.quota for r in out) == budget
    for r in out:
        exact = budget * r.weight / w_total
        assert r.quota in (int(exact), int(exact) + 1)

    # degenerate: budget smaller than host count -> only top remainders get 1
    tiny = recrawl.allocate_budget(hosts, 3).collect()
    assert sum(r.quota for r in tiny) == 3
    assert all(r.quota in (0, 1) for r in tiny)

    # huge weights: (B * w) stays exact in BIGINT (would corrupt in doubles)
    big = spark.createDataFrame(
        [Row(host="a", weight=(1 << 40) + 1), Row(host="b", weight=(1 << 40) - 1)])
    out2 = {r.host: r.quota for r in recrawl.allocate_budget(big, 1001).collect()}
    assert out2["a"] + out2["b"] == 1001 and abs(out2["a"] - out2["b"]) <= 1
