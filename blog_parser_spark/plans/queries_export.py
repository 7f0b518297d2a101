"""Driver-contract queries for the training-data EXPORT layer and the
remaining curation signals: repetition scoring, PII scrubbing, benchmark
decontamination, deterministic shard shuffle, sequence packing.

Oracle-compat notes (same conventions as queries_ml):
- hash idiom: md5-hex prefix -> bigint, identical in both engines;
- ratios: exact-int numerator/denominator, ONE division, round(.,6);
- BIGINT casts on DuckDB sums (HUGEINT by default) to match Spark long;
- regexes are RE2-safe (no backrefs/lookaround) so Java and RE2 agree;
  DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import decontam, export, sampling, textstats
from ..sources import io
from .queries_ml import _SHINGLES_SQL
from .registry import register

WORDS = "string_split(text, ' ')"


# ---------------------------------------------------------------------------
# repetition signals (Gopher/C4-style boilerplate detection)
# ---------------------------------------------------------------------------

# corpus plants 10 heavily-repetitive docs (first 6 words repeated 10x) so
# top_gram_frac actually separates boilerplate from the word-salad base
_REP_CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 3000000 AS doc_id,
       array_to_string(list_transform(range(10),
           i -> array_to_string(string_split(text, ' ')[1:6], ' ')), ' ') AS text
FROM documents WHERE doc_id < 10
"""


def _rep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    first6 = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 6))
    rep = (docs.filter("doc_id < 10")
           .select((F.col("doc_id") + 3000000).alias("doc_id"),
                   F.concat_ws(" ", F.array_repeat(first6, 10)).alias("text")))
    return docs.unionByName(rep)


@register("text_repetition", f"""
WITH corpus AS ({_REP_CORPUS_SQL}),
g AS (
  SELECT doc_id,
         len({WORDS}) AS n_words,
         len(list_distinct({WORDS})) AS n_distinct,
         unnest(list_transform(range(len({WORDS}) - 1),
             i -> {WORDS}[i+1] || ' ' || {WORDS}[i+2])) AS gram
  FROM corpus
),
pg AS (SELECT doc_id, n_words, n_distinct, gram, count(*) AS cnt
       FROM g GROUP BY 1, 2, 3, 4)
SELECT doc_id,
  CAST(sum(cnt) AS BIGINT) AS n_grams,
  CAST(max(cnt) AS BIGINT) AS max_gram_count,
  round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT), 6) AS top_gram_frac,
  round(CAST(n_words - n_distinct AS DOUBLE) / n_words, 6) AS dup_word_ratio
FROM pg GROUP BY doc_id, n_words, n_distinct
""")
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate signals per doc: top 2-gram fraction and
    duplicate-word ratio — the Gopher-style quality gates a webtext
    curation pipeline filters on."""
    return textstats.repetition(_rep_corpus(spark, sf_dir))


# ---------------------------------------------------------------------------
# PII scrubbing (redaction before export)
# ---------------------------------------------------------------------------

_PII_CORPUS_SQL = """
SELECT doc_id,
  CASE WHEN doc_id % 7 = 0
       THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail.example or 5551234'
       ELSE text END AS text
FROM documents
"""

_EMAIL = textstats.EMAIL_RE
_NUM = textstats.NUMBER_RE


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = F.concat(F.col("text"), F.lit(" contact user"),
                       F.col("doc_id").cast("string"),
                       F.lit("@mail.example or 5551234"))
    return docs.withColumn(
        "text", F.when(F.col("doc_id") % 7 == 0, planted)
                 .otherwise(F.col("text")))


@register("text_pii_scrub", f"""
WITH corpus AS ({_PII_CORPUS_SQL}),
s AS (
  SELECT doc_id, text,
         regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g') AS ne
  FROM corpus
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(ne, '{_NUM}')) AS BIGINT) AS n_numbers,
  CAST(length(regexp_replace(ne, '{_NUM}', '<NUM>', 'g')) AS BIGINT) AS scrubbed_len,
  md5(regexp_replace(ne, '{_NUM}', '<NUM>', 'g')) AS scrubbed_md5
FROM s
""")
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email + digit-run redaction over a corpus with planted contact
    lines (1 in 7 docs); output carries the scrubbed-text md5 so the
    oracle checks the full replacement, not just the counts."""
    return textstats.pii_scrub(_pii_corpus(spark, sf_dir))


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

# eval set = docs 0..19; training corpus = the rest PLUS 5 planted
# verbatim copies of eval docs (the contamination the check must catch)
_DECONTAM_TRAIN_SQL = """
SELECT doc_id, text FROM documents WHERE doc_id >= 20
UNION ALL
SELECT doc_id + 4000000 AS doc_id, text FROM documents WHERE doc_id < 5
"""


@register("decontam_ngram_overlap", f"""
WITH train AS ({_DECONTAM_TRAIN_SQL}),
eg AS (
  SELECT list_distinct(flatten(list(s))) AS grams
  FROM (SELECT {_SHINGLES_SQL} AS s FROM documents WHERE doc_id < 20)
),
t AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM train)
SELECT t.doc_id,
  CAST(len(t.s) AS BIGINT) AS n_grams,
  CAST(len(list_intersect(t.s, eg.grams)) AS BIGINT) AS n_overlap,
  round(CAST(len(list_intersect(t.s, eg.grams)) AS DOUBLE)
        / greatest(len(t.s), 1), 6) AS overlap_frac
FROM t, eg
""")
def q_decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination check: per training doc, the count and
    fraction of its distinct 3-grams that also occur in the eval set.
    The 5 planted verbatim copies surface with overlap_frac = 1.0."""
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.filter("doc_id < 20")
    train = docs.filter("doc_id >= 20").unionByName(
        docs.filter("doc_id < 5")
        .select((F.col("doc_id") + 4000000).alias("doc_id"), "text"))
    return decontam.contamination(train, eval_docs)


# ---------------------------------------------------------------------------
# deterministic export shuffle + sequence packing
# ---------------------------------------------------------------------------

_HASH_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
_N_SHARDS = 8
_BUDGET = 256


@register("export_shard_assign", f"""
WITH h AS (SELECT doc_id, lang, n_chars, {_HASH_SQL} AS hh FROM documents)
SELECT doc_id, lang, n_chars,
  CAST(hh % {_N_SHARDS} AS INT) AS shard,
  CAST(row_number() OVER (PARTITION BY hh % {_N_SHARDS}
       ORDER BY hh ASC, doc_id ASC) - 1 AS BIGINT) AS pos
FROM h
""")
def q_export_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 shards: hash-sharded,
    hash-ordered within shard — reproducible on any cluster size, unlike
    a random permutation."""
    docs = io.read_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "n_chars")
    return export.shard_assign(docs, "doc_id", _N_SHARDS)


@register("export_pack_sequences", f"""
WITH h AS (
  SELECT doc_id, len({WORDS}) AS n_tokens, {_HASH_SQL} AS hh FROM documents
),
sh AS (
  SELECT doc_id, n_tokens,
    CAST(hh % {_N_SHARDS} AS INT) AS shard,
    CAST(row_number() OVER (PARTITION BY hh % {_N_SHARDS}
         ORDER BY hh ASC, doc_id ASC) - 1 AS BIGINT) AS pos
  FROM h
),
p AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY pos ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM sh
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard, pos,
  CAST(prefix // {_BUDGET} AS BIGINT) AS seq_id,
  CAST(prefix % {_BUDGET} AS BIGINT) AS seq_offset
FROM p
""")
def q_export_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing at a 256-token budget over the
    deterministic shard order: each doc's (shard, seq_id, seq_offset)
    start coordinate in the packed token stream."""
    docs = io.read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    return export.pack_sequences(toks, "doc_id", "n_tokens",
                                 budget=_BUDGET, n_shards=_N_SHARDS)


# ---------------------------------------------------------------------------
# overlapping chunking + mixture-weighted sampling
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 32, 24


@register("export_chunk_overlap", f"""
WITH t AS (SELECT doc_id, {WORDS} AS toks FROM documents),
s AS (SELECT doc_id, toks,
             unnest(range(0, len(toks), {_STRIDE})) AS start
      FROM t)
SELECT doc_id,
  CAST(start // {_STRIDE} AS INT) AS chunk_idx,
  CAST(start AS BIGINT) AS chunk_start,
  CAST(len(list_slice(toks, start + 1, start + {_CHUNK})) AS BIGINT)
    AS chunk_tokens,
  array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' ')
    AS chunk_text
FROM s
""")
def q_export_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking ({_CHUNK}-token windows every
    {_STRIDE} tokens): one row per (doc, window) with the chunk's start
    offset, length and text. Map-only narrow plan — split + sequence +
    posexplode + slice, no shuffle."""
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return export.chunk_overlap(docs, "doc_id", "text",
                                chunk_size=_CHUNK, stride=_STRIDE)


# upweight rare languages, downsample the en-heavy head — the standard
# data-mixture step before export. ppm per lang:
_MIX = {"en": 150_000, "fr": 600_000, "de": 600_000,
        "es": 800_000, "zh": 1_000_000}
_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{g}' THEN {p}" for g, p in _MIX.items()) + " ELSE 0 END"


@register("sample_mixture_weighted", f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {_HASH_SQL} % 1000000 < {_MIX_CASE}
""")
def q_sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted deterministic sampling: per-language keep
    fractions (en downsampled to 15%, zh kept whole) applied as a
    literal-map lookup + hash filter — scan + filter only, no join, no
    shuffle, reproducible on any cluster size."""
    docs = io.read_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "source", "n_chars")
    return sampling.sample_mixture(docs, "doc_id", "lang", _MIX)
