"""Deterministic corpus sampling for training-data pipelines.

Random sampling (df.sample, TABLESAMPLE) is non-reproducible across
retries/partitionings and impossible to oracle-check; these operators
sample by a pure hash of the data instead, so the SAME rows are chosen on
every engine, every run, every cluster size — and a sample can be widened
later (p=1% ⊂ p=10% with the same hash) without resampling, which random
sampling cannot do.

Hash idiom shared with the dedup/textstats family: md5-hex prefix ->
bigint (reproducible bit-for-bit in DuckDB as
CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

HASH_MOD = 1_000_000  # ppm granularity for sample fractions


def row_hash(col: Column) -> Column:
    """60-bit stable row hash of a string column (cross-engine)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10) \
        .cast("long")


def sample_fraction(df: DataFrame, key_col: str, ppm: int) -> DataFrame:
    """Keep rows whose hash lands in the first `ppm` parts-per-million of
    hash space. Scan + filter only — no shuffle, no state; filters push
    into the scan when key_col is a stored column. Samples NEST: the
    ppm=10_000 sample is a subset of the ppm=100_000 one."""
    if not 0 <= ppm <= HASH_MOD:
        raise ValueError(f"ppm must be in [0, {HASH_MOD}], got {ppm}")
    return df.filter(
        F.pmod(row_hash(F.col(key_col).cast("string")), F.lit(HASH_MOD)) < ppm)


def sample_exact_k(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exactly-k deterministic global sample: the k rows with the
    smallest row hashes (key ascending breaks the astronomically-rare
    hash tie, keeping the order total). orderBy+limit plans as
    TakeOrderedAndProject — per-partition k-heaps merged on the driver,
    never a global sort (asserted in tests/test_ml_ops.py).

    This is bottom-k / consistent sampling: the bottom-k of a UNION is
    computable from the per-shard bottom-k alone, so per-day samples
    merge into a per-month sample without touching the raw data, and
    the same row set comes back at any cluster size or retry."""
    h = F.pmod(row_hash(F.col(key_col).cast("string")), F.lit(HASH_MOD))
    return df.orderBy(h.asc(), F.col(key_col).asc()).limit(k)


def sample_mixture(df: DataFrame, key_col: str, group_col: str,
                   weights_ppm: dict[str, int],
                   default_ppm: int = 0) -> DataFrame:
    """Data-mixture reweighting: keep a different deterministic fraction
    per group (e.g. downsample English, keep all of the rare languages).
    `weights_ppm` maps group value -> parts-per-million kept; groups not
    listed fall back to `default_ppm`.

    The per-group fraction is a literal-map lookup — pure JVM expression,
    scan + filter only, no join and no shuffle; like sample_fraction the
    same rows are chosen on every engine/cluster size, and per-group
    samples NEST as a group's weight grows (so a mixture can be re-tuned
    upward without resampling the rows already exported)."""
    for g, ppm in weights_ppm.items():
        if not 0 <= ppm <= HASH_MOD:
            raise ValueError(f"weight for {g!r} must be in [0, {HASH_MOD}],"
                             f" got {ppm}")
    if not 0 <= default_ppm <= HASH_MOD:
        raise ValueError(f"default_ppm must be in [0, {HASH_MOD}],"
                         f" got {default_ppm}")
    pairs: list = []
    for g, ppm in weights_ppm.items():
        pairs += [F.lit(g), F.lit(int(ppm))]
    frac = F.coalesce(F.create_map(*pairs)[F.col(group_col)],
                      F.lit(int(default_ppm))) if pairs \
        else F.lit(int(default_ppm))
    return df.filter(
        F.pmod(row_hash(F.col(key_col).cast("string")), F.lit(HASH_MOD))
        < frac)


def sample_stratified_topn(df: DataFrame, group_col: str, key_col: str,
                           n_per_group: int) -> DataFrame:
    """Exactly n rows per group (fewer if the group is smaller), chosen by
    smallest hash — a deterministic stratified sample. row_number over
    (group, hash) is rewritten by Spark 4 to WindowGroupLimit, so
    non-winning rows collapse map-side before the shuffle: the shuffle
    carries O(groups x n), not O(rows)."""
    h = F.pmod(row_hash(F.col(key_col).cast("string")), F.lit(HASH_MOD))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per_group).drop("_rn"))


def split_assign(df: DataFrame, key_col: str,
                 cuts: list[tuple[str, int]], last: str,
                 out_col: str = "split") -> DataFrame:
    """Deterministic multi-way split by hash of key_col: cuts is an
    ascending list of (name, upper_ppm) — a row whose hash (ppm space)
    falls below the first upper bound gets that name; the remainder
    gets `last`. Scan + projection only, no shuffle, retry-stable.

    LEAKAGE NOTE: for train/val/test splits of a corpus with near
    duplicates, key_col must be the near-dup CLUSTER id (component),
    not the document id — hashing the component puts every member of a
    near-dup cluster in the SAME split, so a test document can never
    have a training-set twin. See training_data_leakage_safe_split."""
    bounds = [ppm for _, ppm in cuts]
    if bounds != sorted(bounds) or any(
            not 0 <= p <= HASH_MOD for p in bounds):
        raise ValueError(f"cuts must ascend within [0, {HASH_MOD}]: {cuts}")
    h = F.pmod(row_hash(F.col(key_col).cast("string")), F.lit(HASH_MOD))
    expr = F.lit(last)
    for name, ppm in reversed(cuts):
        expr = F.when(h < ppm, name).otherwise(expr)
    return df.withColumn(out_col, expr)
