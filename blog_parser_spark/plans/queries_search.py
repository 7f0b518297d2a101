"""Batch-10 driver-contract queries: full-text retrieval over the
documents corpus — inverted-index build, Okapi BM25 ranked search,
per-document TF-IDF top terms — plus suffix-chain domain blocklist
filtering (the crawl-hygiene step every webtext pipeline runs before
anything else).

Determinism: idf lns are round(12) both sides (fn_math precedent);
per-document score sums fold LEFT over term-sorted contribution lists
(DuckDB list_reduce folds left from the first element, Spark
F.aggregate folds left from 0.0, and 0.0 + x == x exactly); postings
lists are sort_array/list_sort so list order is data-determined;
top-k orderings tie-break on doc_id/term. NO DECIMAL output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import enrich, search
from ..sources import io
from .registry import register

_TOKENS = "list_filter(string_split(text, ' '), w -> w <> '')"

_QUERY_TERMS = ["spark", "query", "hash", "scan"]
_TERMS_SQL = ", ".join(f"'{t}'" for t in _QUERY_TERMS)


@register("search_inverted_index", f"""
WITH dt AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKENS}) AS term FROM documents)
  GROUP BY doc_id, term)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM dt GROUP BY term HAVING COUNT(*) >= 50
""")
def q_search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Contract boundary: the operator's postings stay array<bigint> (the
    # streaming index and closed-form pytests consume them), but the
    # registered query serializes them to a comma-joined string — the
    # agg_collect convention — because the driver harness's pandas
    # canonicalizer cannot sort rows containing list cells (the r4 red
    # row). The sort happens on the BIGINT array (numeric order), then
    # each id casts to string; DuckDB's list_sort/array_to_string does
    # the same.
    docs = io.read_table(spark, sf_dir, "documents")
    idx = search.inverted_index(docs, min_df=50)
    return idx.select(
        "term", "df", "total_tf",
        F.array_join(F.transform("postings", lambda d: d.cast("string")),
                     ",").alias("postings"))


@register("search_bm25_topk", f"""
WITH words AS (
  SELECT doc_id, {_TOKENS} AS ws FROM documents),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM words),
dl AS (SELECT doc_id, len(ws) AS dl FROM words),
matched AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM words)
  WHERE term IN ({_TERMS_SQL})
  GROUP BY doc_id, term),
dft AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY term),
idf AS (
  SELECT term,
         round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 12) AS idf
  FROM dft, stats),
contrib AS (
  SELECT m.doc_id, m.term,
         round(idf * CAST(tf AS DOUBLE) * (1.2 + 1)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 12) AS w
  FROM matched m JOIN idf USING (term) JOIN dl USING (doc_id), stats)
SELECT doc_id,
       list_reduce(list(w ORDER BY term), (a, b) -> a + b) AS score,
       COUNT(*) AS n_terms
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
""")
def q_search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    return search.bm25_topk(docs, _QUERY_TERMS, k=10)


@register("text_tfidf_topterms", f"""
WITH dt AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKENS}) AS term FROM documents)
  GROUP BY doc_id, term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS (
  SELECT term, round(ln(n_docs / COUNT(*)), 12) AS idf
  FROM dt, n GROUP BY term, n_docs)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT dt.doc_id, dt.term, dt.tf * idf.idf AS tfidf,
         row_number() OVER (PARTITION BY dt.doc_id
                            ORDER BY dt.tf * idf.idf DESC, dt.term) AS rank
  FROM dt JOIN idf USING (term))
WHERE rank <= 3
""")
def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    return search.tfidf_top_terms(docs, k=3)


_BLOCKED = ["src3.example.com", "src7.example.com",
            "src11.example.com", "ads.example.org"]
_BLOCKED_SQL = ", ".join(f"'{b}'" for b in _BLOCKED)


@register("filter_domain_blocklist", f"""
WITH urls AS (
  SELECT 'https://' || source || '.example.com/post/'
           || CAST(doc_id AS VARCHAR) AS url,
         source || '.example.com' AS domain
  FROM documents),
blocked AS (
  SELECT DISTINCT url FROM (
    SELECT url,
           unnest(list_transform(
             range(len(string_split(domain, '.'))),
             i -> array_to_string(string_split(domain, '.')[i+1:], '.')))
             AS sfx
    FROM urls)
  WHERE sfx IN ({_BLOCKED_SQL}))
SELECT url, domain FROM urls
WHERE url NOT IN (SELECT url FROM blocked)
""")
def q_filter_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = enrich.with_domain(
        io.synth_pages(spark, sf_dir).select("url")).select("url", "domain")
    block = spark.createDataFrame([(b,) for b in _BLOCKED], "blocked string")
    return search.blocklist_filter(pages, block)


# ---------------------------------------------------------------------------
# text_pmi_bigrams — corpus collocation mining: pointwise mutual
# information of adjacent word pairs. All counts are integer-exact
# (bigram count, unigram counts, total bigrams); the only float work is
# one ln on an integer-derived ratio, round(12) both engines. The
# unigram side is a broadcast join (vocab ≪ corpus); min-count filter
# prunes the bigram tail BEFORE the joins.
# ---------------------------------------------------------------------------

@register("text_pmi_bigrams", f"""
WITH words AS (SELECT doc_id, {_TOKENS} AS ws FROM documents),
bigrams AS (
  SELECT w1, w2, COUNT(*) AS c_ab FROM (
    SELECT unnest(list_transform(range(len(ws) - 1),
                                 i -> struct_pack(w1 := ws[i+1],
                                                  w2 := ws[i+2]))) AS bg
    FROM words WHERE len(ws) >= 2)
    , LATERAL (SELECT bg.w1 AS w1, bg.w2 AS w2)
  GROUP BY w1, w2 HAVING COUNT(*) >= 20),
uni AS (
  SELECT term, COUNT(*) AS c FROM (
    SELECT unnest(ws) AS term FROM words) GROUP BY term),
tot AS (SELECT SUM(c_ab) AS n_bi FROM (
  SELECT COUNT(*) AS c_ab FROM (
    SELECT unnest(list_transform(range(len(ws) - 1),
                                 i -> ws[i+1] || ' ' || ws[i+2])) AS bg
    FROM words WHERE len(ws) >= 2) GROUP BY bg))
SELECT w1, w2, c_ab,
       round(ln(CAST(n_bi * c_ab AS DOUBLE)
                / CAST(ua.c * ub.c AS DOUBLE)), 12) AS pmi
FROM bigrams JOIN uni ua ON ua.term = w1
             JOIN uni ub ON ub.term = w2, tot
ORDER BY pmi DESC, w1, w2 LIMIT 25
""")
def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    bg = F.transform(F.sequence(F.lit(0), F.size(ws) - 2),
                     lambda i: F.struct(F.element_at(ws, i + 1).alias("w1"),
                                        F.element_at(ws, i + 2).alias("w2")))
    pairs = (docs.filter(F.size(ws) >= 2)
             .select(F.explode(bg).alias("bg"))
             .select("bg.w1", "bg.w2"))
    bigrams = (pairs.groupBy("w1", "w2")
               .agg(F.count(F.lit(1)).alias("c_ab"))
               .filter(F.col("c_ab") >= 20))
    uni = (docs.select(F.explode(ws).alias("term"))
           .groupBy("term").agg(F.count(F.lit(1)).alias("c")))
    tot = pairs.agg(F.count(F.lit(1)).alias("n_bi"))
    ua = uni.select(F.col("term").alias("_t1"), F.col("c").alias("_c1"))
    ub = uni.select(F.col("term").alias("_t2"), F.col("c").alias("_c2"))
    pmi = F.round(F.log((F.col("n_bi") * F.col("c_ab")).cast("double")
                        / (F.col("_c1") * F.col("_c2")).cast("double")), 12)
    return (bigrams
            .join(F.broadcast(ua), F.col("w1") == F.col("_t1"))
            .join(F.broadcast(ub), F.col("w2") == F.col("_t2"))
            .join(F.broadcast(tot))
            .select("w1", "w2", "c_ab", pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), "w1", "w2").limit(25))


# ---------------------------------------------------------------------------
# agg_embedding_centroid — per-label mean vector over the embeddings
# table (the class-prototype computation every labeled-embedding store
# runs). posexplode gives (label, dim, value); per cell the sum folds
# LEFT over vec_id-sorted values so both engines add the same doubles
# in the same order (bit-identical; same convention as the ANN/BM25
# oracles). The ordered fold needs the cell's values collected — fine
# at per-(label, dim) group sizes; the 100 TB variant swaps the fold
# for decimal partial sums (order-free) and accepts quantization at
# ingest, as documented in operators/similarity.py's Lloyd step.
# ---------------------------------------------------------------------------

@register("agg_embedding_centroid", """
SELECT label, dim,
       list_reduce(list(v ORDER BY vec_id), (a, b) -> a + b)
         / n AS centroid
FROM (
  SELECT label, vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v,
         COUNT(*) OVER (PARTITION BY label) / 64 AS n
  FROM embeddings, LATERAL unnest(range(1, 65)) AS t(i))
GROUP BY label, dim, n
""")
def q_agg_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = io.read_table(spark, sf_dir, "embeddings")
    cell = (emb.select(
        "label", "vec_id",
        F.posexplode(F.transform("embedding",
                                 lambda x: x.cast("double")))
        .alias("dim", "v")))
    fold = F.aggregate(
        F.sort_array(F.collect_list(F.struct("vec_id", "v"))),
        F.lit(0.0).cast("double"), lambda acc, s: acc + s["v"])
    return (cell.groupBy("label", "dim")
            .agg((fold / F.count(F.lit(1))).alias("centroid"))
            .select("label", F.col("dim").cast("long").alias("dim"),
                    "centroid"))


# ---------------------------------------------------------------------------
# crawl_frontier_schedule — politeness scheduling for a fetch frontier:
# each host's URLs are assigned to consecutive fetch rounds (one URL per
# host per round) in a deterministic hash order, so any round's
# worklist hits every host at most once. One shuffle (hash by domain),
# a per-host window numbering — no global sort; rounds come out
# balanced because hosts are numbered independently. Tie-break: the
# url hash is unique per host (md5 of the full url).
# ---------------------------------------------------------------------------

@register("crawl_frontier_schedule", """
WITH urls AS (
  SELECT 'https://' || source || '.example.com/post/'
           || CAST(doc_id AS VARCHAR) AS url,
         source || '.example.com' AS domain
  FROM documents)
SELECT url, domain,
       row_number() OVER (PARTITION BY domain ORDER BY md5(url))
         AS fetch_round
FROM urls
""")
def q_crawl_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = enrich.with_domain(
        io.synth_pages(spark, sf_dir).select("url")).select("url", "domain")
    from pyspark.sql import Window
    w = Window.partitionBy("domain").orderBy(F.md5(F.col("url").cast("binary")))
    return pages.withColumn("fetch_round", F.row_number().over(w))


# ---------------------------------------------------------------------------
# search_sentences_bm25 — the reference's literal use case end-to-end:
# parse html → sentence index → ranked retrieval. Sentences come out of
# the SAME fused parse UDF the flagship uses (one Python stage); each
# sentence becomes a retrieval unit keyed url#para_idx and the BM25
# ranking runs over the sentence corpus. A user of the reference's
# sentence index switches to this one query. The oracle reproduces the
# sentence extraction (PAGES_SQL, byte-identical by the parse spec) and
# the full BM25 arithmetic.
# ---------------------------------------------------------------------------

from .queries import PAGES_SQL as _PAGES_SQL  # noqa: E402

_SENT_TERMS = ["spark", "query", "hash", "scan"]
_SENT_TERMS_SQL = ", ".join(f"'{t}'" for t in _SENT_TERMS)

@register("search_sentences_bm25", _PAGES_SQL + f"""
, sent AS (
  SELECT url || '#' || CAST(i AS VARCHAR) AS doc_id,
         array_to_string(string_split(text,' ')[17 + 40*i : 16 + 40*(i+1)],
                         ' ') AS text
  FROM (SELECT url, text, unnest(range(k)) AS i
        FROM routed_sink WHERE k > 0)),
words AS (SELECT doc_id, {_TOKENS} AS ws FROM sent),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM words),
dl AS (SELECT doc_id, len(ws) AS dl FROM words),
matched AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM words)
  WHERE term IN ({_SENT_TERMS_SQL})
  GROUP BY doc_id, term),
dft AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY term),
idf AS (
  SELECT term,
         round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 12) AS idf
  FROM dft, stats),
contrib AS (
  SELECT m.doc_id, m.term,
         round(idf * CAST(tf AS DOUBLE) * (1.2 + 1)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 12) AS w
  FROM matched m JOIN idf USING (term) JOIN dl USING (doc_id), stats)
SELECT doc_id,
       list_reduce(list(w ORDER BY term), (a, b) -> a + b) AS score,
       COUNT(*) AS n_terms
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
""")
def q_search_sentences_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import parse
    sents = parse.sentences_from_pages(io.synth_pages(spark, sf_dir))
    units = sents.select(
        F.concat_ws("#", "url", F.col("para_idx").cast("string"))
        .alias("doc_id"),
        F.col("sentence").alias("text"))
    return search.bm25_topk(units, _SENT_TERMS, k=10)


# ---------------------------------------------------------------------------
# search_phrase_match — exact consecutive-phrase query via the
# positional index: the posexploded stream filters to the phrase's
# terms BEFORE any shuffle, each candidate doc collapses to one
# term→positions map, and occurrences are counted with higher-order
# functions (no token re-scan). The oracle walks the token list
# directly — same counts, different road.
# ---------------------------------------------------------------------------

_PHRASE = ["table", "hash"]


@register("search_phrase_match", f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
o AS (
  SELECT doc_id,
         CAST(len(list_filter(range(1, len(toks) - {len(_PHRASE) - 2}),
              i -> {" AND ".join(f"toks[i + {j}] = '{w}'"
                                 for j, w in enumerate(_PHRASE))}))
           AS BIGINT) AS occurrences
  FROM t)
SELECT doc_id, occurrences FROM o WHERE occurrences > 0
""")
def q_search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    return search.phrase_match(docs, _PHRASE)
