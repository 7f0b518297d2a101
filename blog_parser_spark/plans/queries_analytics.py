"""Driver-contract queries for the log-analytics additions: ordered
funnel sequence matching, exact corpus heavy hitters, and the linear
quality-classifier scoring stage.

Oracle notes:
- funnel_sequence's oracle is the chained-min formulation (one CTE per
  step, each min() constrained strictly after the previous step's time)
  — semantically identical to the Spark one-shuffle greedy fold (see
  operators/funnel.py docstring for the equivalence argument).
  Timestamps compare at microsecond precision (epoch_us/unix_micros).
- text_quality_classifier: features and logit are fixed-order double
  arithmetic (bit-identical, emitted raw); the sigmoid is transcendental
  so it is round(...,12) on BOTH sides; `keep` thresholds the exact
  logit (> 0), never the rounded probability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import funnel, links, textstats
from ..sources import io
from .registry import register

_WORDS = "string_split(text, ' ')"

_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
  FROM events
  WHERE event_type IN ('signup', 'view', 'click', 'purchase')
),
s1 AS (SELECT user_id, min(ts_us) AS t FROM e
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts_us) AS t FROM e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'view' AND e.ts_us > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts_us) AS t FROM e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'click' AND e.ts_us > s2.t GROUP BY 1),
s4 AS (SELECT e.user_id, min(e.ts_us) AS t FROM e
       JOIN s3 ON e.user_id = s3.user_id
       WHERE e.event_type = 'purchase' AND e.ts_us > s3.t GROUP BY 1),
u AS (SELECT DISTINCT user_id FROM e)
SELECT u.user_id,
  CAST(CASE WHEN s4.t IS NOT NULL THEN 4
            WHEN s3.t IS NOT NULL THEN 3
            WHEN s2.t IS NOT NULL THEN 2
            WHEN s1.t IS NOT NULL THEN 1
            ELSE 0 END AS INT) AS funnel_stage,
  CAST(COALESCE(s4.t, s3.t, s2.t, s1.t) AS BIGINT) AS funnel_ts_us
FROM u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
LEFT JOIN s4 ON u.user_id = s4.user_id
"""


@register("funnel_sequence", _FUNNEL_SQL)
def q_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user strict-order funnel progression over the event log."""
    ev = io.read_table(spark, sf_dir, "events")
    return funnel.funnel_stages(ev)


@register("text_heavy_hitters", f"""
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest({_WORDS}) AS word FROM documents)
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 50
""")
def q_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-50 most frequent corpus words (tie-break word asc)."""
    docs = io.read_table(spark, sf_dir, "documents").select("text")
    return textstats.heavy_hitters(docs, k=50).select(
        "word", F.col("cnt").cast("long").alias("cnt"))


@register("text_quality_classifier", f"""
WITH f AS (
  SELECT doc_id,
    len({_WORDS}) AS n_words,
    len(list_filter({_WORDS},
        x -> list_contains(['the','a','of','to','and'], x))) AS stop_hits,
    len(list_distinct({_WORDS})) AS n_distinct
  FROM documents
),
z AS (
  SELECT doc_id,
    -1.5 + 2.0 * (CAST(stop_hits AS DOUBLE) / n_words)
         + 1.25 * (CAST(n_distinct AS DOUBLE) / n_words)
         + 0.75 * (CAST(least(n_words, 400) AS DOUBLE) / 400.0) AS logit
  FROM f
)
SELECT doc_id, logit,
  round(1.0 / (1.0 + exp(-(logit))), 12) AS quality_prob,
  logit > 0 AS keep
FROM z
""")
def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring stage over documents."""
    docs = io.read_table(spark, sf_dir, "documents")
    return textstats.quality_classifier(docs)


@register("parse_links_domains", """
WITH t AS (
  SELECT source, unnest([
    (doc_id * 31 + 7)  % 100000,
    (doc_id * 57 + 13) % 100000,
    (doc_id * 91 + 23) % 100000]) AS tgt
  FROM documents
)
SELECT source || '.example.com' AS src_domain,
       'site' || CAST(tgt % 17 AS VARCHAR) || '.example.com' AS dst_domain,
       CAST(count(*) AS BIGINT) AS links
FROM t
GROUP BY src_domain, dst_domain
""")
def q_parse_links_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level crawl link graph extracted from the RAW HTML BYTES:
    render pages with the deterministic <nav> outlink block, regex-scan
    hrefs via the Arrow-batched UDF, aggregate src_domain x dst_domain.
    The oracle derives the same graph in closed form from doc_id
    (spec.link_targets), so it verifies the full byte-level render ->
    extract -> parse -> aggregate path, not just the arithmetic."""
    pages = io.synth_pages(spark, sf_dir, with_links=True)
    return links.domain_link_counts(pages)
