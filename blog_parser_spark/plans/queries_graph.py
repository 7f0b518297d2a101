"""Driver-contract queries for the link-graph layer: degree stats
(oracle-checked) and fixed-iteration PageRank (rows-only; the numpy
cross-check and bit-determinism live in tests/test_graph.py).

The edge set is a pure function of `documents.doc_id` (200-node directed
graph), so both engines derive the identical graph with no extra
fixture: src = doc_id % 200, dst = (doc_id * 31 + 7) % 200, self-loops
dropped, duplicate edges collapsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import graph
from ..sources import io
from .registry import register

_N_NODES = 200

_EDGES_SQL = f"""
SELECT DISTINCT doc_id % {_N_NODES} AS src,
       (doc_id * 31 + 7) % {_N_NODES} AS dst
FROM documents
WHERE doc_id % {_N_NODES} != (doc_id * 31 + 7) % {_N_NODES}
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id")
    return (docs.select((F.col("doc_id") % _N_NODES).alias("src"),
                        ((F.col("doc_id") * 31 + 7) % _N_NODES).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


@register("graph_degree", f"""
WITH e AS ({_EDGES_SQL}),
o AS (SELECT src AS node, count(*) AS out_degree FROM e GROUP BY 1),
i AS (SELECT dst AS node, count(*) AS in_degree FROM e GROUP BY 1)
SELECT COALESCE(o.node, i.node) AS node,
  CAST(COALESCE(out_degree, 0) AS BIGINT) AS out_degree,
  CAST(COALESCE(in_degree, 0) AS BIGINT) AS in_degree
FROM o FULL OUTER JOIN i ON o.node = i.node
""")
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node out/in degree of the derived link graph."""
    return graph.degrees(_edges(spark, sf_dir))


@register("graph_pagerank")  # iterative; numpy-verified in pytest
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-iteration PageRank (damping 0.85) over the derived link graph.
    No SQL oracle: the double arithmetic is iteration-ordered, so the
    cross-check is a numpy reference (rel err < 1e-9) plus an exact
    determinism-under-repartition assertion in tests/test_graph.py."""
    return graph.pagerank(_edges(spark, sf_dir), damping=0.85, n_iter=10)


# ---------------------------------------------------------------------------
# url_redirect_resolve — final redirect target per url by pointer
# doubling (operators/links.py): ceil(log2(max_chain))+1 join rounds
# instead of one join per hop, early exit when no pointer advances,
# loud failure on cycles. The redirect table is a pure function of
# doc_id (chains u0→u1→u2→u3, terminal every 4th url); the oracle walks
# the same chains with a recursive CTE and keeps each src's deepest
# reach.
# ---------------------------------------------------------------------------

_REDIRECT_SQL = """
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS src,
         'u' || CAST(doc_id + 1 AS VARCHAR) AS dst
  FROM documents WHERE doc_id < 200 AND doc_id % 4 <> 3
"""


@register("url_redirect_resolve", f"""
WITH RECURSIVE e AS ({_REDIRECT_SQL}),
walk(src, cur, hops) AS (
  SELECT src, dst, 1 FROM e
  UNION ALL
  SELECT w.src, e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.cur)
SELECT src, arg_max(cur, hops) AS final_url,
       CAST(MAX(hops) AS BIGINT) AS hops
FROM walk GROUP BY src
""")
def q_url_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import links
    docs = io.read_table(spark, sf_dir, "documents")
    edges = (docs.filter("doc_id < 200 AND doc_id % 4 != 3")
             .select(F.concat(F.lit("u"), F.col("doc_id").cast("string"))
                     .alias("src"),
                     F.concat(F.lit("u"), (F.col("doc_id") + 1)
                              .cast("string")).alias("dst")))
    return links.resolve_redirects(edges, max_chain=8)
