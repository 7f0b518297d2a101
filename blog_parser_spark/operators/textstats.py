"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All JVM-side expressions (higher-order array functions) — no Python in
the hot path; every op has an exact DuckDB oracle.

Cross-engine primitives (validated):
  word_hash(w) = bigint(first 15 hex chars of md5(w))   -- identical in
  Spark (conv/substring/md5) and DuckDB (CAST '0x..' AS BIGINT).
"""

from __future__ import annotations

import pandas as pd
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


# Gopher/C4-style repetition signals: heavily repeated n-grams mark
# boilerplate / spam / low-quality machine text. The per-gram count is an
# explode + groupBy — the shuffle carries gram rows, which map-side
# combine collapses per (doc, gram) before the exchange.
def repetition(docs: DataFrame) -> DataFrame:
    """Per doc: total word 2-grams, the top 2-gram's count, its fraction
    of all 2-grams, and the duplicate-word ratio (1 - distinct/total).
    Docs with < 2 words have no grams and drop out (both engines)."""
    w = words_col()
    n = F.size(w)
    grams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
    )).otherwise(F.array())
    exploded = docs.select(
        "doc_id", n.alias("_n_words"),
        F.size(F.array_distinct(w)).alias("_n_distinct"),
        F.explode(grams).alias("gram"))
    per_gram = (exploded
                .groupBy("doc_id", "_n_words", "_n_distinct", "gram")
                .agg(F.count(F.lit(1)).alias("_cnt")))
    return (per_gram
            .groupBy("doc_id", "_n_words", "_n_distinct")
            .agg(F.sum("_cnt").alias("n_grams"),
                 F.max("_cnt").alias("max_gram_count"))
            .select("doc_id", "n_grams", "max_gram_count",
                    F.round(F.col("max_gram_count").cast("double")
                            / F.col("n_grams"), 6).alias("top_gram_frac"),
                    F.round(F.lit(1.0)
                            - F.col("_n_distinct").cast("double")
                            / F.col("_n_words"), 6).alias("dup_word_ratio")))


# PII scrubbing: the redaction pass a webtext corpus runs before export.
# Patterns are deliberately RE2-safe (no backrefs/lookaround) so Spark's
# Java regex and the DuckDB oracle's RE2 match identical spans.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+"
NUMBER_RE = "[0-9]+"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Replace emails then remaining digit runs with placeholder tokens;
    emails first so their digits aren't double-counted. Pure JVM regex
    projection — no shuffle, pushes through any downstream plan."""
    no_email = F.regexp_replace("text", EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(no_email, NUMBER_RE, "<NUM>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(NUMBER_RE), 0))
        .cast("long").alias("n_numbers"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"))


# CCNet-style duplicated-line removal: drop text segments that recur
# across too many documents (navigation chrome, cookie banners, boiler-
# plate). Real webtext segments on '\n'; the fixture corpus has no
# newlines, so the segmenter here is fixed-width word windows — the
# distributed shape (segment → global doc-frequency → rebuild) is
# identical either way.
def segments_col(text_col: str = "text", seg_len: int = 3) -> Column:
    """Consecutive non-overlapping seg_len-word segments (the trailing
    remainder forms a final shorter segment, so the doc reconstructs)."""
    w = F.split(F.col(text_col), " ")
    n_segs = F.floor((F.size(w) + F.lit(seg_len - 1)) / F.lit(seg_len)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda g: F.concat_ws(" ", F.slice(w, g * seg_len + 1, seg_len)))


def segment_dedup(docs: DataFrame, seg_len: int = 3, max_docs: int = 4) -> DataFrame:
    """Drop segments whose document frequency (distinct docs containing
    the exact segment text) exceeds max_docs; reassemble each doc from
    its surviving segments in order. Two shuffles at scale: one keyed by
    segment (doc-frequency count, partial-agg combinable; the join back
    reuses that partitioning), one keyed by doc_id (reassembly). Every
    doc keeps its row even when all segments drop (kept_md5 = md5(''))."""
    segs = docs.select(
        "doc_id",
        F.posexplode(segments_col("text", seg_len)).alias("seg_idx", "seg"))
    docfreq = segs.groupBy("seg").agg(
        F.countDistinct("doc_id").alias("docfreq"))
    flagged = (segs.join(docfreq, "seg")
               .select("doc_id", "seg_idx", "seg",
                       (F.col("docfreq") <= max_docs).alias("keep")))
    kept = F.array_sort(F.collect_list(            # (seg_idx, seg) structs:
        F.when(F.col("keep"), F.struct("seg_idx", "seg"))))  # sort = doc order
    return (flagged.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_segs"),
                 F.sum(F.col("keep").cast("int")).alias("n_kept"),
                 kept.alias("_kept"))
            .select("doc_id",
                    F.col("n_segs").cast("long").alias("n_segs"),
                    F.col("n_kept").cast("long").alias("n_kept"),
                    F.md5(F.concat_ws(
                        " ", F.transform(F.col("_kept"), lambda s: s["seg"]))
                        .cast("binary")).alias("kept_md5")))


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Corpus-unigram-LM surprisal per doc (the cheap perplexity proxy a
    webtext quality filter runs before a real LM): neg mean log p(word)
    under the corpus's own unigram distribution. Shape at scale: one
    map-side-combinable groupBy(doc, word), one groupBy(word) for the
    model, then a join of per-doc-word counts (<< token count) against
    the vocab table — broadcast here (Zipf vocab << corpus; drop the
    hint and AQE picks the strategy when vocab outgrows the threshold).
    Cross-engine determinism: log p rounded to 12 digits then held as
    DECIMAL(18,12) (<= 15 significant digits, so the double→decimal
    round-trip is exact); partial sums are exact decimals; ONE final
    double division + round(12). The plan's one BroadcastNestedLoopJoin
    is the crossJoin attaching the SINGLE-row corpus-total scalar to the
    vocab table — bounded by construction (1 x vocab), the standard
    scalar-broadcast shape; a global window would instead drag the whole
    vocab through one partition."""
    tok = docs.select("doc_id", F.explode(words_col()).alias("word"))
    dw = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt_dw"))
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = wc.agg(F.sum("cnt").alias("total"))
    lp = (wc.crossJoin(F.broadcast(total))
          .select("word",
                  F.round(F.log(F.col("cnt").cast("double")
                                / F.col("total").cast("double")), 12)
                  .cast("decimal(18,12)").alias("lp")))
    return (dw.join(F.broadcast(lp), "word")
            .groupBy("doc_id")
            .agg(F.sum("cnt_dw").alias("n_words"),
                 F.sum(F.col("cnt_dw").cast("decimal(10,0)")
                       * F.col("lp")).alias("_sum_lp"))
            .select("doc_id",
                    F.col("n_words").cast("long").alias("n_words"),
                    F.round(-(F.col("_sum_lp").cast("double"))
                            / F.col("n_words"), 12).alias("neg_mean_logprob")))


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


def heavy_hitters(docs: DataFrame, k: int = 50) -> DataFrame:
    """Exact corpus-wide top-k most frequent words.

    explode -> hash-agg (map-side partial combine keeps the shuffle at
    |vocab| x partitions, not |tokens|) -> TakeOrderedAndProject top-k
    (per-partition heaps + driver merge of k rows — never a global
    sort). Tie-break: word ascending (unique per group, so the full
    ordering is total and the result deterministic at any parallelism).
    """
    words = docs.select(F.explode(words_col()).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("word")).limit(k)


# Fixed public weights for the linear quality classifier (a stand-in for
# a trained fasttext/LR quality filter — the OPERATOR is the point).
CLASSIFIER_WEIGHTS = {"bias": -1.5, "stop": 2.0, "distinct": 1.25,
                      "lenfrac": 0.75}


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Linear-model document scoring (the curation-pipeline 'quality
    classifier' stage): logit = w . [stop_ratio, distinct_ratio,
    len_frac] + b, score = sigmoid(logit), keep = logit > 0.

    Pure-JVM projection — the features and the logit are fixed-order
    double arithmetic (bit-identical across engines); only the sigmoid
    is transcendental, so it is rounded to 12 places on both sides, and
    the keep decision thresholds the EXACT logit (logit > 0 is the same
    predicate as sigmoid >= 0.5), never the rounded score.
    """
    w = words_col()
    n_words = F.size(w)
    stop_ratio = marker_hits(w, STOPWORDS).cast("double") / n_words
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_words
    len_frac = F.least(n_words, F.lit(400)).cast("double") / F.lit(400.0)
    c = CLASSIFIER_WEIGHTS
    logit = (F.lit(c["bias"]) + F.lit(c["stop"]) * stop_ratio
             + F.lit(c["distinct"]) * distinct_ratio
             + F.lit(c["lenfrac"]) * len_frac)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return docs.select(
        "doc_id",
        logit.alias("logit"),
        F.round(score, 12).alias("quality_prob"),
        (logit > 0).alias("keep"))


# Entity patterns shared verbatim with the DuckDB oracle (both RE2- and
# Java-regex-compatible: no lookaround, no \b — word boundaries differ
# subtly between engines).
ENTITY_PATTERNS = {
    "email": "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}",
    "ipv4": "(?:[0-9]{1,3}[.]){3}[0-9]{1,3}",
    "hashtag": "#[a-z0-9_]+",
}


def entity_census(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Entity-mention census over raw text: regexp_extract_all per
    entity type (JVM-side, one scan — the per-type extracts are
    parallel expressions on the same row, not separate passes), double
    explode to (type, mention), then a map-side-combined count.
    Returns (entity_type, n_mentions, n_distinct)."""
    ents = (docs.select(F.explode(F.array(*[
        F.struct(F.lit(t).alias("entity_type"),
                 F.regexp_extract_all(F.col(text_col), F.lit(rx),
                                      F.lit(0)).alias("ms"))
        for t, rx in ENTITY_PATTERNS.items()])).alias("e"))
        .select(F.col("e.entity_type").alias("entity_type"),
                F.explode("e.ms").alias("entity")))
    return (ents.groupBy("entity_type")
            .agg(F.count(F.lit(1)).alias("n_mentions"),
                 F.count_distinct("entity").alias("n_distinct")))


# --- compression-ratio quality signal (Gopher-style) --------------------------

ZLIB_LEVEL = 6  # pinned: the signal must be retry/engine deterministic


def compressed_len_udf():
    """Arrow-batched zlib length — built lazily (pandas_udf needs types,
    and the import-time rule applies). zlib is C-speed under the batch
    loop; level pinned so the byte count is deterministic."""
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _clen(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: None if t is None
            else len(zlib.compress(t.encode("utf-8"), ZLIB_LEVEL)))

    return _clen


def compression_signal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc compression-ratio quality signal (the Gopher/C4-family
    heuristic): boilerplate and template spam compress far harder than
    natural prose, so compressed/raw is a cheap single-pass quality
    feature — and unlike token heuristics it needs no language model.
    Exact BIGINT byte counts out (ratio left to the consumer: a double
    division here would make the output engine-comparison-hostile).
    Map-only: one Arrow stage, no shuffle."""
    return docs.select(
        "doc_id",
        F.octet_length(text_col).cast("long").alias("raw_bytes"),
        compressed_len_udf()(F.col(text_col)).alias("compressed_bytes"))
