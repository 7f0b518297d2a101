"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design: every stage is a DataFrame op (explode -> hash -> groupBy ->
band-bucket self-join); nothing collects to the driver. Hashes are pure
functions of content (md5-derived), so results are deterministic across
engines, retries, and partitionings — the DuckDB oracles reproduce them
bit-for-bit.

MinHash math: h0 = 60-bit word-hash of a shingle; permutation i is
(A[i] * (h0 % P) + B[i]) % P with P = 2^31 - 1 (products stay < 2^62,
no int64 overflow in either engine). A/B are fixed constants derived
from the Knuth multiplicative constant — inlined identically into the
Spark expressions and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textstats import word_hash

MINHASH_P = (1 << 31) - 1
N_PERM = 16
# 16 bands x 1 row: P(candidate | j=0.6) = 1-(1-0.6)^16 ~ 1-4e-7 — total
# recall at the default threshold; exact-verify prunes the (larger) false-
# candidate set. At production scale trade recall for candidate volume by
# raising LSH_ROWS (s-curve steepens, candidates shrink).
LSH_BANDS = 16
LSH_ROWS = 1
PERM_A = [(i * 2654435761 + 1) % MINHASH_P for i in range(1, N_PERM + 1)]
PERM_B = [(i * 40503 + 12345) % MINHASH_P for i in range(1, N_PERM + 1)]

SHINGLE_K = 3
SIMHASH_BITS = 32


def shingles_col(text_col: str = "text", k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles of a text column (JVM higher-order
    fns; empty when the doc has < k words)."""
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    return F.array_distinct(F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
    )).otherwise(F.array()))


# --- exact dedup -------------------------------------------------------------

def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content hash: keeper = min id, n_copies.
    One hash-shuffle; map-side combine collapses duplicates early."""
    return (docs
            .withColumn("text_md5", F.md5(F.col(text_col).cast("binary")))
            .groupBy("text_md5")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Drop exact duplicates, keeping the min-id row per content hash."""
    keep = exact_dedup_groups(docs, id_col, text_col).select(
        F.col("keeper_id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


# --- minhash + LSH -----------------------------------------------------------

def minhash_signature(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, sig_0..sig_{N_PERM-1}) — map-only.

    sig_i = min over a doc's shingles of perm_i(word_hash(shingle)), and
    a per-row `array_min(transform(...))` computes that minimum without
    ever leaving the row — no 62x shingle explode, no groupBy shuffle,
    no sort-aggregate. (The original explode+groupBy formulation spent
    ~half the 1M-doc pipeline's executor time in exactly those stages.)
    The md5-based shingle hashes are bound in their own projection so
    Catalyst computes them once per row, not once per permutation
    (CollapseProject never duplicates non-trivial expressions). Docs
    with < SHINGLE_K words have no shingles and produce no signature —
    identical to the explode formulation, where they emit no rows."""
    h = F.transform(shingles_col(text_col), lambda s: word_hash(s) % MINHASH_P)
    hashed = (docs.select(id_col, h.alias("_h0"))
              .filter(F.size("_h0") > 0))
    sigs = [F.array_min(F.transform(
                F.col("_h0"),
                lambda x: (F.lit(PERM_A[i]) * x + F.lit(PERM_B[i])) % MINHASH_P))
            .alias(f"sig_{i}") for i in range(N_PERM)]
    return hashed.select(id_col, *sigs)


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id",
                        max_bucket_size: int | None = None) -> DataFrame:
    """Band the signatures and self-join on (band, band_key): only docs
    sharing a full band collide — the classic LSH bucket join. Output
    distinct (id_a < id_b) candidate pairs.

    max_bucket_size is the 100 TB skew guard: a band bucket with B
    members emits B^2 candidate pairs, and web corpora have degenerate
    buckets (boilerplate/template pages sharing a band) that turn the
    self-join quadratic. Capping drops buckets larger than the limit
    BEFORE the join — a bounded, documented recall trade (docs colliding
    only via a hot bucket are missed; truly similar pairs still collide
    in their other 15 bands). Run exact dedup first so identical docs
    (which share every band) never form hot buckets. Default None keeps
    the operator exact-recall and oracle-reproducible."""
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat_ws(",", *[
                     F.col(f"sig_{b * LSH_ROWS + r}").cast("string")
                     for r in range(LSH_ROWS)]).cast("binary")).alias("band_key"))
        for b in range(LSH_BANDS)])
    exploded = (sig.select(id_col, F.explode(bands).alias("bk"))
                .select(id_col, "bk.band", "bk.band_key"))
    if max_bucket_size is not None:
        from pyspark.sql import Window
        # one count-over-window on the same (band, band_key) partitioning
        # the join shuffles on anyway — no extra shuffle stage
        w = Window.partitionBy("band", "band_key")
        exploded = (exploded
                    .withColumn("_bsz", F.count(F.lit(1)).over(w))
                    .filter(F.col("_bsz") <= max_bucket_size).drop("_bsz"))
    a = exploded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = exploded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (a.join(b, ["band", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def exact_jaccard(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Verify candidate pairs with shingle-set Jaccard computed over the
    60-bit `word_hash` of each shingle rather than the shingle strings.

    Why hashes: the verify step joins every candidate pair with both
    docs' shingle sets, and whatever the first join attaches is shuffled
    again by the second join's key — so the per-doc payload width
    multiplies the single biggest exchange in the whole LSH pipeline. A
    64-word doc's word-3-gram strings are ~3.5 KB; their int64 hashes are
    ~0.5 KB (7x narrower; measured 37 GB -> ~5 GB shuffle at 1M docs).
    Set semantics are preserved: shingle strings are distinct before
    hashing and a 60-bit collision inside one pair's ~2k-element union
    has probability < 1e-11, so inter/union counts — and the rounded
    jaccard — equal the string-set computation (the DuckDB oracles,
    which compute string-set Jaccard exhaustively, stay bit-identical)."""
    sh = docs.select(F.col(id_col).alias("_id"),
                     F.transform(shingles_col(text_col),
                                 lambda s: word_hash(s)).alias("_sh"))
    j = (pairs
         .join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
         .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a", "id_b",
        F.round(inter.cast("double") / union, 6).alias("jaccard"))


def near_dup_pairs_minhash(docs: DataFrame, threshold: float = 0.6,
                           id_col: str = "doc_id", text_col: str = "text",
                           max_bucket_size: int | None = None) -> DataFrame:
    """MinHash-LSH candidates -> exact-Jaccard verify -> threshold filter.
    Set max_bucket_size at corpus scale (see lsh_candidate_pairs)."""
    cand = lsh_candidate_pairs(minhash_signature(docs, id_col, text_col),
                               id_col, max_bucket_size)
    return (exact_jaccard(cand, docs, id_col, text_col)
            .filter(F.col("jaccard") >= threshold))


# --- simhash -----------------------------------------------------------------

def simhash_col(text_col: str = "text", bits: int = SIMHASH_BITS) -> Column:
    """32-bit SimHash from word hashes, pure JVM expressions: bit j of the
    fingerprint is set iff sum over words of (+1 if bit j of word_hash else
    -1) > 0. One fold over the word array; bit masks are Python-side
    literals (shift amounts cannot be Columns)."""
    w = F.split(F.col(text_col), " ")
    # per word: 32-vector of ±1 by hash bit
    votes = F.transform(w, lambda x: _bit_votes(word_hash(x), bits))
    acc0 = F.array(*[F.lit(0).cast("long")] * bits)
    sums = F.aggregate(votes, acc0,
                       lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b))
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(sums.getItem(j) > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return fp


def _bit_votes(h: Column, bits: int) -> Column:
    return F.array(*[
        F.when(h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1).cast("long"))
        .otherwise(F.lit(-1).cast("long")) for j in range(bits)])


def near_dup_pairs_simhash(docs: DataFrame, max_hamming: int = 6,
                           id_col: str = "doc_id", text_col: str = "text",
                           bands: int = 4) -> DataFrame:
    """SimHash near-dup: band the fingerprint into `bands` slices (pigeonhole:
    hamming <= bands-1 guarantees a shared band; larger distances found
    with high probability), bucket-join, verify exact hamming distance."""
    bits_per = SIMHASH_BITS // bands
    fp = docs.select(F.col(id_col), simhash_col(text_col).alias("fp"))
    slices = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright("fp", b * bits_per)
                 .bitwiseAND(F.lit((1 << bits_per) - 1)).alias("band_key"))
        for b in range(bands)])
    ex = fp.select(id_col, "fp", F.explode(slices).alias("s")).select(
        id_col, "fp", "s.band", "s.band_key")
    a = ex.select(F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a"), "band", "band_key")
    b = ex.select(F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b"), "band", "band_key")
    cand = (a.join(b, ["band", "band_key"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "fp_a", "fp_b").distinct())
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (cand.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


# --- n-gram jaccard over known pairs -----------------------------------------

def connected_components(nodes: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id", max_iter: int = 50) -> DataFrame:
    """Dedup clustering: connected components over a near-duplicate pair
    graph via iterative min-label propagation — the standard MapReduce CC.

    Returns (id_col, component) where component = min node id reachable.
    Each iteration is one join + one aggregate (both shuffle on node id);
    iterations needed = graph diameter in label-hops, which for dedup
    graphs (small dense clusters) is single digits. Per-iteration
    materialization truncates lineage so plans don't grow unboundedly; the
    convergence check is an exact count of changed labels (driver-side
    scalar, not a collect of data).

    Durability: when the SparkContext has a checkpoint dir configured
    (`sc.setCheckpointDir(...)`) every materialization is a RELIABLE
    checkpoint — an executor loss mid-iteration recovers from storage.
    Without one (local dev) it falls back to localCheckpoint, whose
    blocks die with their executor; a production cluster run MUST set a
    checkpoint dir, and the label frame per iteration is just
    (node, component) — two ids/row — so the write is cheap relative to
    the iteration's own shuffle."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sc = nodes.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        # checkpoint() is eager in PySpark (materializes now), matching
        # localCheckpoint's behavior here
        return df.checkpoint() if reliable else df.localCheckpoint()

    edges = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .unionByName(pairs.select(F.col("id_b").alias("src"),
                                       F.col("id_a").alias("dst"))))
    # materialize once: edges are re-joined every iteration, and their
    # upstream lineage (LSH banding + exact-Jaccard verify) must not be
    # re-executed per round
    edges = _cut(edges)
    labels = nodes.select(F.col(id_col).alias("node"),
                          F.col(id_col).alias("component"))
    labels = _cut(labels)
    # Frontier (delta) propagation: a node's label can only drop via a
    # neighbor whose label dropped in the PREVIOUS round (inductively:
    # round 1 starts with every node in the frontier, so any stable
    # neighbor label has already been offered). Joining edges against the
    # frontier instead of the full label frame means iterations after the
    # first touch only the still-converging tail — for dedup graphs
    # (small dense clusters, single-digit diameter) that is a few rows,
    # not the whole corpus, and at 10^12 nodes it is the difference
    # between O(E) and O(frontier-incident E) shuffle per round.
    frontier = labels
    for _ in range(max_iter):
        neigh_min = (edges.join(frontier, edges.dst == frontier.node)
                     .groupBy("src").agg(F.min("component").alias("n_min")))
        # carry old+new labels through one join so the convergence count
        # needs no second join
        step = (labels.join(neigh_min, labels.node == neigh_min.src, "left")
                .select("node", F.col("component").alias("_old"),
                        F.least("component", F.coalesce("n_min", "component"))
                        .alias("component")))
        step = _cut(step)
        # both are cheap scans of the just-materialized step frame
        frontier = step.filter(F.col("component") != F.col("_old")) \
                       .select("node", "component")
        changed = frontier.count()
        labels = step.drop("_old")
        if changed == 0:
            break
    else:
        # silent non-convergence would split true components and keep
        # duplicates downstream — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise max_iter "
            f"for graphs with label-hop diameter > {max_iter}")
    return labels.select(F.col("node").alias(id_col), "component")


def containment_pairs(docs: DataFrame, threshold: float = 0.9,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_df: int | None = None) -> DataFrame:
    """Asymmetric near-dup detection: pairs (a, b) with shingle-set
    CONTAINMENT |S(a) ∩ S(b)| / |S(a)| >= threshold — the metric that
    catches a short document quoted/embedded inside a long one, where
    symmetric Jaccard stays low (|S(a)|/|S(b)| bounds it) and the pair
    never surfaces in the minhash pipeline.

    Scale shape: each doc's DISTINCT shingles hash to int64 (the
    exact_jaccard width argument) and explode ONCE; the self equi-join
    on shingle emits only co-occurring pairs — never all pairs — and
    the per-pair intersection count is one map-side-combinable
    aggregate; |S(a)| attaches by a join on the (small) per-doc size
    table. Ultra-common shingles fan out quadratically; `max_df` drops
    them via a windowed count on the join's own partitioning (the
    hot-bucket-cap precedent). Dropping shingles only LOWERS inter —
    the guard biases containment down, never up, so it can suppress a
    borderline pair but cannot invent one.
    """
    hashed = (docs.select(F.col(id_col).alias("_id"),
                          F.transform(shingles_col(text_col),
                                      lambda s: word_hash(s)).alias("_sh"))
              .filter(F.size("_sh") > 0))
    sizes = hashed.select("_id", F.size("_sh").alias("_n"))
    ex = hashed.select("_id", F.explode("_sh").alias("_s"))
    if max_df is not None:
        from pyspark.sql import Window
        dfc = F.count(F.lit(1)).over(Window.partitionBy("_s"))
        ex = ex.withColumn("_df", dfc).filter(
            F.col("_df") <= max_df).drop("_df")
    pairs = (ex.alias("a").join(ex.alias("b"), "_s")
             .where(F.col("a._id") != F.col("b._id"))
             .groupBy(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("_inter")))
    cont = F.round(F.col("_inter").cast("double") / F.col("_n"), 6)
    return (pairs.join(sizes.withColumnRenamed("_id", "id_a"), "id_a")
            .select("id_a", "id_b", cont.alias("containment"))
            .filter(F.col("containment") >= threshold))


def pairwise_ngram_jaccard(docs_a: DataFrame, docs_b: DataFrame,
                           on: str = "pair_id") -> DataFrame:
    """Exact word-3-gram Jaccard for aligned pairs (a.pair_id == b.pair_id)."""
    a = docs_a.select(F.col(on), shingles_col().alias("sh_a"))
    b = docs_b.select(F.col(on), shingles_col().alias("sh_b"))
    j = a.join(b, on)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(on, F.round(inter.cast("double") / union, 6).alias("jaccard"))
