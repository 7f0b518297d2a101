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
