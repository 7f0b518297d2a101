"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All JVM-side expressions (higher-order array functions) — no Python in
the hot path; every op has an exact DuckDB oracle.

Cross-engine primitives (validated):
  word_hash(w) = bigint(first 15 hex chars of md5(w))   -- identical in
  Spark (conv/substring/md5) and DuckDB (CAST '0x..' AS BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# deterministic marker sets over the fixture vocabulary (word-salad corpus:
# the heuristic is about the OPERATOR, not linguistics)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "small", "big"),
    "fr": ("table", "part", "value", "line", "merge"),
    "de": ("window", "stream", "group", "hash", "key"),
    "es": ("data", "row", "batch", "filter", "scan"),
    "zh": ("spark", "query", "join", "sort", "slow"),
}
LANG_ORDER = ("en", "fr", "de", "es", "zh")  # deterministic argmax tie order

STOPWORDS = ("the", "a", "of", "to", "and")


def word_hash(col: Column) -> Column:
    """60-bit stable word hash, reproducible in DuckDB."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def words_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def marker_hits(words: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax of marker-set hits, first-match tie
    order = LANG_ORDER (greatest + when-chain, fully deterministic)."""
    w = words_col()
    scored = docs.select(
        "doc_id", "lang",
        *[marker_hits(w, LANG_MARKERS[lg]).alias(f"s_{lg}") for lg in LANG_ORDER])
    best = F.greatest(*[F.col(f"s_{lg}") for lg in LANG_ORDER])
    pred = F.lit(None)
    chain = None
    for lg in LANG_ORDER:
        cond = F.col(f"s_{lg}") == best
        chain = F.when(cond, F.lit(lg)) if chain is None else chain.when(cond, F.lit(lg))
    return scored.select("doc_id", "lang",
                         *[f"s_{lg}" for lg in LANG_ORDER],
                         chain.alias("lang_pred"))


def quality(docs: DataFrame) -> DataFrame:
    """Quality features + score. Score arithmetic is exact-int / single
    double division so it reproduces bit-exactly in the oracle."""
    w = words_col()
    n_words = F.size(w)
    n_chars = F.length("text")
    stop_hits = marker_hits(w, STOPWORDS)
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_words
    mean_word_len = (n_chars - (n_words - 1)).cast("double") / n_words
    stop_ratio = stop_hits.cast("double") / n_words
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars2"),
        stop_hits.alias("stop_hits"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(distinct_ratio * 0.5 + stop_ratio * 0.3
                + F.least(n_words, F.lit(100)).cast("double") / 200, 6).alias("quality_score"))


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / digit runs /
    single other char) + byte count."""
    return docs.select(
        "doc_id",
        F.size(words_col()).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .alias("re_tokens"),
        F.octet_length("text").alias("text_bytes"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Canonical content fingerprints: md5 of the sorted distinct word set
    (robust to word order) and min word-hash (a 1-perm minhash)."""
    w = words_col()
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(w)))
    return docs.select(
        "doc_id",
        F.md5(canon.cast("binary")).alias("canon_md5"),
        F.array_min(F.transform(w, lambda x: word_hash(x))).alias("min_word_hash"))


def with_features(docs: DataFrame) -> DataFrame:
    """docs + quality_score + lang_pred appended in ONE pass (no
    self-joins): the enrich step of the composite training-data pipeline.
    At corpus scale a join of quality(docs) back onto docs would rescan
    and reshuffle the corpus; this is a pure projection — same arithmetic
    as `quality` and `lang_id` (both oracle-verified), so the outputs are
    bit-identical to theirs."""
    w = words_col()
    n_words = F.size(w)
    stop_hits = marker_hits(w, STOPWORDS)
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_words
    stop_ratio = stop_hits.cast("double") / n_words
    qscore = F.round(distinct_ratio * 0.5 + stop_ratio * 0.3
                     + F.least(n_words, F.lit(100)).cast("double") / 200, 6)
    tmp = docs.select(
        "*", qscore.alias("quality_score"),
        *[marker_hits(w, LANG_MARKERS[lg]).alias(f"_s_{lg}")
          for lg in LANG_ORDER])
    best = F.greatest(*[F.col(f"_s_{lg}") for lg in LANG_ORDER])
    chain = None
    for lg in LANG_ORDER:
        cond = F.col(f"_s_{lg}") == best
        chain = (F.when(cond, F.lit(lg)) if chain is None
                 else chain.when(cond, F.lit(lg)))
    return (tmp.withColumn("lang_pred", chain)
            .drop(*[f"_s_{lg}" for lg in LANG_ORDER]))
