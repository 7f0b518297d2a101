"""Web-log behavioral analytics queries — driver-contract entries for
operators/weblog.py (user-agent classification, clickpath transitions,
interval coalescing). Fixtures synthesize deterministically from the
events table in BOTH engines; oracles mirror the synthesis expression
for expression, so the pairs cannot drift.

Determinism notes (CLAUDE.md conventions): every output column is
BIGINT/VARCHAR/DOUBLE-from-exact-integer-division — no decimals, no
transcendentals; orderings inside windows carry the event_id unique
tie-break; is_bot is exported as BIGINT 0/1 (not BOOLEAN) so value
hashing is engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import weblog
from ..sources import io
from .registry import register

# Mirrors weblog.synth_useragents — one source of truth per engine,
# asserted equal by tests/test_weblog.py round-trip.
_UA_SYNTH_SQL = """
  SELECT user_id, CASE event_type
    WHEN 'view' THEN 'Mozilla/5.0 (Windows NT 10.0) Chrome/'
        || CAST(100 + event_id % 20 AS VARCHAR) || '.0 Safari/537.36'
    WHEN 'click' THEN 'Mozilla/5.0 (Macintosh) Version/17.'
        || CAST(event_id % 10 AS VARCHAR) || ' Safari/605.1'
    WHEN 'purchase' THEN 'Mozilla/5.0 (X11; Linux x86_64) Firefox/'
        || CAST(90 + event_id % 15 AS VARCHAR) || '.0'
    WHEN 'signup' THEN CASE WHEN event_id % 3 = 0
        THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)'
        ELSE 'curl/8.' || CAST(event_id % 5 AS VARCHAR) END
    ELSE 'python-requests/2.' || CAST(event_id % 9 AS VARCHAR) END AS ua
  FROM events
"""


# ---------------------------------------------------------------------------
# parse_useragent — UA family/OS/bot classification, the router between
# "human traffic" and "automation" every web-log pipeline needs before
# any behavioral metric. Map-only CASE ladder (bot first, Chrome before
# Safari) fused into the scan; the count is map-side-combined. Both
# engines run RE2-compatible '(?i)(bot|...)' for the bot test.
# ---------------------------------------------------------------------------

@register("parse_useragent", f"""
WITH ua AS ({_UA_SYNTH_SQL}),
cls AS (
  SELECT user_id, ua,
         regexp_matches(ua, '(?i)(bot|crawl|spider|curl|python-requests)')
           AS is_bot
  FROM ua),
fam AS (
  SELECT user_id, CAST(is_bot AS BIGINT) AS is_bot,
         CASE WHEN is_bot THEN 'bot'
              WHEN contains(ua, 'Chrome/') THEN 'chrome'
              WHEN contains(ua, 'Safari/') THEN 'safari'
              WHEN contains(ua, 'Firefox/') THEN 'firefox'
              ELSE 'other' END AS family,
         CASE WHEN contains(ua, 'Windows') THEN 'windows'
              WHEN contains(ua, 'Macintosh') THEN 'macos'
              WHEN contains(ua, 'Linux') THEN 'linux'
              ELSE 'unknown' END AS os
  FROM cls)
SELECT family, os, is_bot, CAST(COUNT(*) AS BIGINT) AS requests,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniq_users
FROM fam GROUP BY family, os, is_bot
""")
def q_parse_useragent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    cls = weblog.classify_useragent(weblog.synth_useragents(ev))
    return (cls.groupBy("family", "os",
                        F.col("is_bot").cast("long").alias("is_bot"))
            .agg(F.count(F.lit(1)).alias("requests"),
                 F.count_distinct("user_id").alias("uniq_users")))


# ---------------------------------------------------------------------------
# clickpath_transitions — the Markov transition matrix over each user's
# event sequence (lag per user ordered by ts with the event_id unique
# tie-break; first event transitions from 'START'). The per-source
# probability window runs on the aggregate's |types|^2-row output, not
# the fact stream; prob divides two exact BIGINTs (IEEE division is
# correctly rounded -> bit-identical across engines).
# ---------------------------------------------------------------------------

@register("clickpath_transitions", """
WITH seq AS (
  SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                  'START') AS prev_type,
         event_type
  FROM events),
t AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq GROUP BY prev_type, event_type)
SELECT prev_type, event_type, n_trans,
       CAST(n_trans AS DOUBLE)
         / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
FROM t
""")
def q_clickpath_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    return weblog.transition_counts(ev)


# ---------------------------------------------------------------------------
# interval_coalesce — gaps-and-islands merge of overlapping per-user
# activity intervals (running-MAX-of-ends island rule, so
# fully-contained intervals merge correctly). Integer-second interval
# math on both sides; windows partition by user_id (per-key parallel,
# no global sort).
# ---------------------------------------------------------------------------

@register("interval_coalesce", """
WITH iv AS (
  -- epoch_us // 1e6 = floor, matching Spark's truncating TIMESTAMP->LONG
  -- cast on positive epochs (CAST(epoch(ts) AS BIGINT) would ROUND the
  -- fixtures' microsecond-bearing timestamps and drift by 1 s).
  SELECT user_id, event_id,
         epoch_us(ts) // 1000000 AS start_s,
         epoch_us(ts) // 1000000 + 60 + event_id % 240 AS end_s
  FROM events),
flagged AS (
  SELECT user_id, event_id, start_s, end_s,
         CASE WHEN MAX(end_s) OVER w IS NULL
                OR start_s > MAX(end_s) OVER w THEN 1 ELSE 0 END AS new_island
  FROM iv
  WINDOW w AS (PARTITION BY user_id ORDER BY start_s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
isl AS (
  SELECT user_id, start_s, end_s,
         SUM(new_island) OVER (PARTITION BY user_id
             ORDER BY start_s, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged),
g AS (
  SELECT user_id, island, MIN(start_s) AS i_start, MAX(end_s) AS i_end
  FROM isl GROUP BY user_id, island)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(i_end - i_start) AS BIGINT) AS covered_s,
       CAST(MAX(i_end - i_start) AS BIGINT) AS longest_s
FROM g GROUP BY user_id
""")
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    return weblog.coalesce_intervals(ev)
