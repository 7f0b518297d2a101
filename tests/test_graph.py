"""Graph-layer checks: PageRank vs a numpy reference, bit-determinism
under repartitioning, degree/mass invariants."""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from blog_parser_spark.operators import graph
from blog_parser_spark.plans.queries_graph import _edges

from .conftest import SF_DIR

DAMPING = 0.85
N_ITER = 10


def _ref_pagerank(edge_list, n_iter=N_ITER, d=DAMPING):
    nodes = sorted({s for s, _ in edge_list} | {t for _, t in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = Counter(s for s, _ in edge_list)
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, t in edge_list:
            contrib[idx[t]] += pr[idx[s]] / outdeg[s]
        pr = (1.0 - d) / n + d * contrib
    return {v: pr[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_reference(spark):
    edges = _edges(spark, SF_DIR)
    edge_list = [(r.src, r.dst) for r in edges.collect()]
    assert len(edge_list) > 50
    ref = _ref_pagerank(edge_list)
    got = {r.node: r.pr for r in graph.pagerank(edges).collect()}
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) <= 1e-9 * max(ref[v], 1e-12), v


def test_pagerank_bit_deterministic_under_repartition(spark):
    edges = _edges(spark, SF_DIR)
    a = {r.node: r.pr for r in graph.pagerank(edges).collect()}
    b = {r.node: r.pr
         for r in graph.pagerank(edges.repartition(13)).collect()}
    # decimal-exact contribution sums: EXACT equality, not approximate
    assert a == b


def test_degrees_invariants(spark):
    edges = _edges(spark, SF_DIR)
    n_edges = edges.count()
    deg = graph.degrees(edges)
    sums = deg.agg(F.sum("out_degree").alias("o"),
                   F.sum("in_degree").alias("i")).collect()[0]
    assert sums.o == n_edges == sums.i
    assert deg.filter("out_degree < 0 OR in_degree < 0").count() == 0


def test_resolve_redirects_deep_chain_and_failures(spark):
    import pytest
    from pyspark.sql import Row, functions as F
    from blog_parser_spark.operators import links

    # one 50-deep chain + a 2-chain: log-round doubling must resolve
    # both to their terminals with exact hop counts
    edges = spark.createDataFrame(
        [Row(src=f"c{i}", dst=f"c{i+1}") for i in range(50)]
        + [Row(src="a", dst="b")])
    got = {r["src"]: (r["final_url"], r["hops"]) for r in
           links.resolve_redirects(edges, max_chain=64).collect()}
    assert got["c0"] == ("c50", 50)
    assert got["c25"] == ("c50", 25)
    assert got["a"] == ("b", 1)
    assert len(got) == 51

    # a cycle must refuse loudly, never return a mid-cycle node
    cyc = spark.createDataFrame(
        [Row(src="x", dst="y"), Row(src="y", dst="x")])
    with pytest.raises(ValueError, match="cycle or deeper"):
        links.resolve_redirects(cyc, max_chain=8)

    # two outgoing edges from one src = nondeterministic walk -> refuse
    dup = spark.createDataFrame(
        [Row(src="x", dst="y"), Row(src="x", dst="z")])
    with pytest.raises(ValueError, match="multiple outgoing"):
        links.resolve_redirects(dup, max_chain=8)
