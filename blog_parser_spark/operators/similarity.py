"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, sign-LSH bucketed ANN as the scale
path.

Scale design: queries are broadcast (top-k searches are few-vs-many); the
corpus never moves. Dot products run in JVM higher-order functions
(zip_with + aggregate) — no Python, no collect. The LSH variant prunes the
corpus to matching sign-buckets before scoring, turning O(Q x N) into
O(Q x N / 2^planes) on hash-uniform data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

N_PLANES = 6   # sign-LSH hyperplanes per table -> 64 buckets/table
N_TABLES = 4   # independent tables; candidates = union (standard L-tables
               # construction: recall compounds, 1-(1-r)^L)
DIM = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query vector. Broadcast the (small) query
    side; rank on rounded score + id tie-break so results are stable."""
    from pyspark.sql import Window
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("cand_id"))
              .select("query_id", "cand_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _plane_weight(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane weights (pure function of indices)."""
    return 1 if ((plane * 131 + dim * 137) % 7) % 2 == 0 else -1


def lsh_bucket_col(vec_col: str = "embedding", n_planes: int = N_PLANES,
                   dim: int = DIM, table: int = 0) -> Column:
    """Sign-LSH bucket id for one hash table: bit p = sign of <v, plane_p>
    with fixed ±1 planes (plane set disjoint per table). Pure JVM
    arithmetic, no Python, reproducible everywhere."""
    bucket = F.lit(0).cast("long")
    v = F.col(vec_col)
    for p in range(n_planes):
        coeffs = [_plane_weight(table * 100 + p, d) for d in range(dim)]
        warr = F.array(*[F.lit(float(c)) for c in coeffs])
        s = F.aggregate(F.zip_with(v, warr, lambda x, wgt: x.cast("double") * wgt),
                        F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(
            F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long"))
    return bucket


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only candidates sharing a sign-bucket with the
    query in ANY of the N_TABLES hash tables (union-of-tables recall).
    Approximate (recall measured in tests vs brute force) but each scored
    pair is exact cosine."""
    from pyspark.sql import Window
    tables = F.array(*[
        F.struct(F.lit(t).alias("t"),
                 lsh_bucket_col(vec_col, table=t).alias("b"))
        for t in range(N_TABLES)])
    def tagged(df, idc, vc):
        return (df.select(F.col(id_col).alias(idc), F.col(vec_col).alias(vc),
                          F.explode(tables).alias("tb"))
                .select(idc, vc, F.col("tb.t").alias("t"), F.col("tb.b").alias("b")))
    q = tagged(queries, "query_id", "qv")
    c = tagged(corpus, "cand_id", "cv")
    scored = (F.broadcast(q).join(c, ["t", "b"])
              .filter(F.col("query_id") != F.col("cand_id"))
              .select("query_id", "cand_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"))
              .distinct())
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# --- IVF (inverted-file) ANN -------------------------------------------------

N_CENTROIDS = 16
N_PROBE = 4


def ivf_centroids(corpus: DataFrame, n_centroids: int = N_CENTROIDS,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid pick: the n_centroids corpus vectors with the
    smallest xxhash64(id) — a pure function of the data (stable across
    retries/partitionings), standing where a k-means refinement would go;
    the IVF plumbing (assign, probe, list-join) is identical either way.
    TakeOrdered on the hash, so no full sort and no driver collect of data
    beyond the K centroids themselves."""
    return (corpus
            .select(F.col(id_col).alias("cid_src"), F.col(vec_col).alias("centroid"))
            .withColumn("_h", F.xxhash64(F.col("cid_src").cast("string")))
            .orderBy("_h", "cid_src").limit(n_centroids)
            .withColumn("centroid_id", F.row_number().over(
                Window.orderBy("_h", "cid_src")) - 1)
            .select("centroid_id", "centroid"))


def ivf_centroids_refined(corpus: DataFrame, n_centroids: int = N_CENTROIDS,
                          n_iter: int = 1, id_col: str = "vec_id",
                          vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Deterministic k-means (Lloyd) refinement of the hash-picked seeds:
    assign every vector to its nearest centroid (broadcast, struct-max
    tie-break), then recompute each centroid as the per-dimension mean of
    its list. Per-dimension sums use DECIMAL(28,12) partials — decimal
    addition is exact, so the mean is independent of partition order and
    the refined centroids are a pure function of the data (float sums
    would drift with partitioning). Centroids that attract no vectors
    keep their previous position. Each iteration is one broadcast
    assignment + one K-row aggregate; the result is collected (K rows,
    bounded by config) and rebuilt as a local frame so downstream probes
    don't re-execute the refinement subplan."""
    spark = corpus.sparkSession
    seeds = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    cents = spark.createDataFrame(seeds.collect(), seeds.schema)
    for _ in range(n_iter):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        sums = assigned.groupBy("centroid_id").agg(
            *[F.sum(F.element_at(F.col(vec_col), d + 1).cast("decimal(28,12)"))
              .alias(f"s_{d}") for d in range(dim)],
            F.count(F.lit(1)).alias("n"))
        refined = sums.select(
            "centroid_id",
            F.array(*[(F.col(f"s_{d}") / F.col("n")).cast("double")
                      for d in range(dim)]).alias("centroid"))
        merged = (cents.select("centroid_id",
                               F.col("centroid").alias("_seed"))
                  .join(refined, "centroid_id", "left")
                  .select("centroid_id",
                          F.coalesce(
                              F.col("centroid"),
                              F.transform("_seed", lambda x: x.cast("double")))
                          .alias("centroid")))
        cents = spark.createDataFrame(merged.collect(), merged.schema)
    return cents


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Inverted lists: each corpus vector goes to its nearest centroid
    (max cosine; (score, -centroid_id) struct-max for a deterministic
    tie-break). Centroids are broadcast — the corpus never shuffles for
    assignment; the only shuffle is the N-row groupBy(id) with map-side
    combine."""
    scored = (corpus.select(F.col(id_col), F.col(vec_col))
              .crossJoin(F.broadcast(centroids))
              .select(id_col, vec_col,
                      F.struct(
                          F.round(cosine(F.col(vec_col), F.col("centroid")), 9)
                          .alias("s"),
                          (-F.col("centroid_id")).alias("neg_cid"))
                      .alias("sc")))
    return (scored.groupBy(id_col, vec_col)
            .agg(F.max("sc").alias("best"))
            .select(id_col, vec_col,
                    (-F.col("best.neg_cid")).cast("int").alias("centroid_id")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = N_CENTROIDS, n_probe: int = N_PROBE,
             refine_iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF ANN top-k: each query probes its n_probe nearest centroids and
    scores ONLY those inverted lists (equi-join on centroid_id), turning
    O(Q x N) into O(Q x N x n_probe / n_centroids) on balanced lists.
    Centroids are hash-picked seeds refined by `refine_iters` exact
    deterministic Lloyd steps (real IVF training; set 0 for raw seeds;
    2 steps lift fixture recall 0.48 -> 0.56 at the default probe
    fraction, pinned in tests).
    Exact cosine on every scored pair; with n_probe == n_centroids this
    degenerates to exact brute force for ANY centroid set (asserted in
    tests). At corpus scale the lists are a bucketed layout: write the
    assignment once (partitionBy centroid_id), and every query batch
    prunes to its probed partitions."""
    # centroids are K driver-sized rows by construction — materialize ONCE
    # and rebuild as a local frame, otherwise the full-corpus TakeOrdered
    # subplan re-executes in both the assignment branch and the query-
    # probe branch of the same job (uncached plan reuse is re-execution)
    spark = corpus.sparkSession
    if refine_iters > 0:
        cents = ivf_centroids_refined(corpus, n_centroids, refine_iters,
                                      id_col, vec_col)
    else:
        cents_df = ivf_centroids(corpus, n_centroids, id_col, vec_col)
        cents = spark.createDataFrame(cents_df.collect(), cents_df.schema)
    lists = ivf_assign(corpus, cents, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_scored = (q.crossJoin(F.broadcast(cents))
                .select("query_id", "qv", "centroid_id",
                        F.round(cosine(F.col("qv"), F.col("centroid")), 9)
                        .alias("cs")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("centroid_id"))
    probes = (q_scored.withColumn("r", F.row_number().over(wq))
              .filter(F.col("r") <= n_probe)
              .select("query_id", "qv", "centroid_id"))

    cand = (F.broadcast(probes)
            .join(lists.select(F.col(id_col).alias("cand_id"),
                               F.col(vec_col).alias("cv"), "centroid_id"),
                  "centroid_id")
            .filter(F.col("query_id") != F.col("cand_id"))
            .select("query_id", "cand_id",
                    F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
