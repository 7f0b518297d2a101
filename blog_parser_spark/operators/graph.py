"""Link-graph analytics over a web corpus: degree stats and a
fixed-iteration PageRank — the crawl-frontier / domain-authority signals
a webtext pipeline derives from its link structure.

Scale shape (the same discipline as dedup.connected_components):
- each PageRank iteration is ONE join (ranks onto edge sources) + ONE
  aggregate (contributions by destination) + one left join back onto the
  node set — all shuffles on the node id, so a pre-partitioned edge/node
  layout reuses its exchange across iterations;
- contribution sums use DECIMAL(38,18) partials: decimal addition is
  associative, so the per-iteration result is bit-identical regardless
  of partitioning / task order — double sums would drift with the
  reduction tree and break retry determinism;
- lineage is truncated with checkpoint/localCheckpoint every few
  iterations exactly as connected_components does (reliable checkpoint
  when the context has a checkpoint dir — required on a real cluster).

Dangling nodes (no out-links) lose their mass, the classic "leaky"
formulation; the pytest numpy reference implements the identical rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,18)"


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node out/in degree of a (src, dst) edge table: one aggregate
    per direction, outer-merged so isolated-direction nodes show 0."""
    out_d = edges.groupBy(F.col(src).alias("node")) \
        .agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("node")) \
        .agg(F.count(F.lit(1)).alias("in_degree"))
    return (out_d.join(in_d, "node", "full_outer")
            .select("node",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree")))


def pagerank(edges: DataFrame, damping: float = 0.85, n_iter: int = 10,
             src: str = "src", dst: str = "dst",
             checkpoint_every: int = 3) -> DataFrame:
    """Fixed-iteration PageRank over a (src, dst) edge table; returns
    (node, pr). Deterministic: decimal-exact contribution sums make each
    iteration independent of partitioning, so repeated runs (and retried
    stages) produce bit-identical doubles."""
    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable else df.localCheckpoint()

    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    nodes = _cut(nodes)
    n = nodes.count()  # driver-side scalar (node count), not data
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    base = (1.0 - damping) / n

    out_deg = edges.groupBy(F.col(src).alias("node")) \
        .agg(F.count(F.lit(1)).alias("deg"))
    # edges annotated once with source out-degree; reused every iteration
    ed = _cut(edges.select(F.col(src).alias("node"),
                           F.col(dst).alias("_dst"))
              .join(out_deg, "node"))

    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for it in range(n_iter):
        contribs = (ed.join(ranks, "node")
                    .select("_dst",
                            (F.col("pr") / F.col("deg")).cast(_DEC)
                            .alias("c")))
        summed = (contribs.groupBy(F.col("_dst").alias("node"))
                  .agg(F.sum("c").alias("csum")))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce(F.col("csum").cast("double"),
                                       F.lit(0.0))).alias("pr")))
        if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
            ranks = _cut(ranks)
    return ranks


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle count of an undirected graph given canonical
    (a < b) deduplicated edges — the standard a<b<c join enumeration so
    every triangle is produced exactly once.

    Plan shape: two shuffled hash joins on vertex keys (wedge build
    e1(a,b)⋈e2(b,c), then closure probe against e3(a,c)). The wedge
    intermediate grows as sum-of-degree²; at web scale run this behind a
    k-core / degree-cap prefilter, or orient edges by degree (the
    "degree ordering" trick) to bound the wedge side."""
    e1 = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    e2 = edges.select(F.col(a).alias("b"), F.col(b).alias("c"))
    e3 = edges.select(F.col(a).alias("a3"), F.col(b).alias("c3"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, (F.col("a") == F.col("a3"))
                      & (F.col("c") == F.col("c3")), "inner")
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
