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
SELECT term, COUNT(*) AS df, SUM(tf) AS total_tf,
       list_sort(list(doc_id)) AS postings
FROM dt GROUP BY term HAVING COUNT(*) >= 50
""")
def q_search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    return search.inverted_index(docs, min_df=50)


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
