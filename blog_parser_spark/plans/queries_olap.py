"""Batch-7 driver-contract queries: TPC-H-shaped optimizer breadth
(correlated EXISTS agg, argmin-per-group, conditional aggregates,
ratio-of-sums, HAVING top-k, disjunctive pushdown), log-analytics
anomaly scoring, join-based triangle counting, mergeable partial
aggregates, and URL canonicalization (the log-pipeline normalize step).

Determinism notes follow queries.py: identical aliases both sides,
double sums via DECIMAL(18,4) partials cast back to double, every
top-k ordering carries a unique tie-break, z-scores/ratios computed
from integer-exact partials with identical double expressions then
round(6). NO DECIMAL-typed output columns (CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import enrich, graph, groklog, logmine, urlnorm
from ..sources import io
from .registry import register


def _dsum(col):
    return F.sum(col.cast("decimal(18,4)")).cast("double")


def _disc_price():
    # exact decimal BEFORE the multiply — double*double cast after the
    # product puts the rounding boundary on a half-ULP engines disagree on
    return (F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)")
               - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")


_DISC_SQL = ("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * "
             "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) "
             "AS DECIMAL(18,4))")


# ---------------------------------------------------------------------------
# tpch_q4_order_priority — correlated EXISTS folded into an aggregate:
# orders in a quarter that had at least one lineitem shipped after the
# order date, counted per priority. Spark plan: the EXISTS becomes a
# LEFT SEMI sort-merge join with the non-equi ship>order predicate as
# the join condition's residual — lineitem is never widened, duplicates
# never multiply the count (semi-join semantics, not inner+distinct).
# ---------------------------------------------------------------------------

@register("tpch_q4_order_priority", """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""")
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (io.read_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))))
    li = io.read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (orders.join(li, (F.col("l_orderkey") == F.col("o_orderkey"))
                        & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


# ---------------------------------------------------------------------------
# tpch_q2_min_cost_supplier — argmin-per-group through a join: the
# cheapest (supplier, price) ever observed per part. The classic
# correlated-scalar-subquery shape, expressed as one aggregation plus
# a window argmin — no re-scan of the fact table, no correlated loop.
# Ties (equal min cost) break on s_suppkey so both engines pick the
# same row.
# ---------------------------------------------------------------------------

@register("tpch_q2_min_cost_supplier", """
SELECT l_partkey AS part_key, l_suppkey AS supp_key,
       CAST(cost AS DOUBLE) AS min_cost
FROM (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY min(l_extendedprice), l_suppkey) AS rn
  FROM lineitem GROUP BY l_partkey, l_suppkey)
WHERE rn = 1
""")
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    per_supp = (li.groupBy("l_partkey", "l_suppkey")
                .agg(F.min("l_extendedprice").alias("cost")))
    w = Window.partitionBy("l_partkey").orderBy("cost", "l_suppkey")
    return (per_supp.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("l_partkey").alias("part_key"),
                    F.col("l_suppkey").alias("supp_key"),
                    F.col("cost").cast("double").alias("min_cost")))


# ---------------------------------------------------------------------------
# tpch_q12_priority_by_flag — conditional aggregates (the CASE-inside-
# SUM pattern): per return flag, how many lineitems belong to
# high-priority vs low-priority orders. One join, one agg, both
# conditional sums computed in the same pass (no double scan).
# ---------------------------------------------------------------------------

@register("tpch_q12_priority_by_flag", """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
""")
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


# ---------------------------------------------------------------------------
# tpch_q14_promo_revenue — ratio of two conditional decimal sums over
# one month (promo revenue share). Both sums land in the same
# aggregate; the ratio is computed on the exact-decimal results cast
# to double, then round(6) — the division inputs are bit-identical
# across engines so the quotient is too.
# ---------------------------------------------------------------------------

@register("tpch_q14_promo_revenue", f"""
SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         THEN {_DISC_SQL} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM({_DISC_SQL}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
""")
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))))
    part = io.read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,4)"))
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.round(F.lit(100.0) * _dsum(promo) / _dsum(disc), 6)
                 .alias("promo_revenue_pct")))


# ---------------------------------------------------------------------------
# tpch_q18_large_orders — HAVING over a fact-side aggregate, then a
# dimension join only for the survivors (aggregate-before-join: the
# 60k-row lineitem collapses to ~100 qualifying orders BEFORE touching
# customer), then deterministic top-k.
# ---------------------------------------------------------------------------

@register("tpch_q18_large_orders", """
SELECT c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS total_price,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300)
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
""")
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    orders = io.read_table(spark, sf_dir, "orders")
    cust = io.read_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
           .filter(F.col("sum_qty") > 300))
    return (big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .select("c_name", "o_orderkey", "o_orderdate",
                    F.col("o_totalprice").cast("double").alias("total_price"),
                    F.col("sum_qty").cast("double").alias("sum_qty"))
            .orderBy(F.desc("total_price"), "o_orderkey").limit(20))


# ---------------------------------------------------------------------------
# tpch_q19_disjunctive — OR-of-ANDs predicate spanning both join sides
# (the "discounted revenue" shape). Catalyst extracts the common
# l_quantity <= 30 / p_size >= 1 bounds and pushes brand/size IN-lists
# to the part scan; the residual disjunction evaluates post-join in
# codegen. One broadcast join, no UNION-of-three-scans rewrite needed.
# ---------------------------------------------------------------------------

@register("tpch_q19_disjunctive", f"""
SELECT CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""")
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    part = io.read_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    pred = (((F.col("p_brand") == "Brand#12") & size.between(1, 5)
             & qty.between(1, 11))
            | ((F.col("p_brand") == "Brand#3") & size.between(1, 10)
               & qty.between(10, 20))
            | ((F.col("p_brand") == "Brand#15") & size.between(1, 15)
               & qty.between(20, 30)))
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .filter(pred)
            .agg(_dsum(_disc_price()).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


# ---------------------------------------------------------------------------
# log_anomaly_zscore — per-(event_type, hour) volume anomalies: hourly
# counts, then a per-type z-score computed from integer-exact partials
# (SUM(cnt), SUM(cnt^2), COUNT — all BIGINT, so mean/variance inputs
# are bit-identical across engines; the double expression is evaluated
# identically and sqrt is IEEE-correctly-rounded). |z| > 2 flags the
# spike hours. At 100 TB this is two map-side-combined aggregations —
# the hourly rollup collapses the raw events before the tiny
# per-type-window pass.
# ---------------------------------------------------------------------------

@register("log_anomaly_zscore", """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
stats AS (
  SELECT event_type, hr, cnt,
         SUM(cnt)     OVER (PARTITION BY event_type) AS s,
         SUM(cnt*cnt) OVER (PARTITION BY event_type) AS sq,
         COUNT(*)     OVER (PARTITION BY event_type) AS n
  FROM hourly)
SELECT event_type, hr, cnt,
       round((CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE)/n)
             / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE)*s/n)/(n-1)), 6)
         AS zscore
FROM stats
WHERE n >= 2
  AND abs((CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE)/n)
          / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE)*s/n)/(n-1))) > 2.0
""")
def q_log_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("event_type")
    stats = hourly.select(
        "event_type", "hr", "cnt",
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("sq"),
        F.count(F.lit(1)).over(w).alias("n"))
    mean = F.col("s").cast("double") / F.col("n")
    var = ((F.col("sq").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n"))
           / (F.col("n") - 1))
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return (stats.filter((F.col("n") >= 2) & (F.abs(z) > 2.0))
            .select("event_type", "hr", "cnt", F.round(z, 6).alias("zscore")))


# ---------------------------------------------------------------------------
# graph_triangle_count — join-based triangle counting on an undirected
# graph (edges canonicalized a<b, the standard a<b<c enumeration so
# every triangle counts exactly once). The graph derives
# deterministically from orders (mod-97 projection) so the oracle can
# rebuild it in closed form. The two self-joins are plain shuffled hash
# joins on vertex keys — the same plan GraphFrames' triangleCount
# lowers to, with the wedge side (e1⋈e2) growing as sum-of-degree² —
# at web scale you'd pre-filter to the k-core before this join.
# ---------------------------------------------------------------------------

@register("graph_triangle_count", """
WITH e0 AS (
  SELECT DISTINCT least(o_custkey % 97, o_orderkey % 97) AS a,
                  greatest(o_custkey % 97, o_orderkey % 97) AS b
  FROM orders WHERE o_custkey % 97 <> o_orderkey % 97)
SELECT COUNT(*) AS n_triangles
FROM e0 e1
JOIN e0 e2 ON e2.a = e1.b
JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
""")
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = io.read_table(spark, sf_dir, "orders")
    u = F.col("o_custkey") % 97
    v = F.col("o_orderkey") % 97
    e0 = (o.filter(u != v)
          .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
          .distinct())
    return graph.triangle_count(e0)


# ---------------------------------------------------------------------------
# agg_incremental_partials — the mergeable-partial-aggregate pattern
# behind incremental materialized views: per-(event_type, day) partials
# (COUNT + exact DECIMAL sum) roll up to per-type totals by SUMming the
# partials — never re-touching raw rows. The pytest in test_olap.py
# persists the daily partials to parquet and folds them in day by day
# (the incremental refresh); this registered query proves the two-level
# plan itself is exact. At 100 TB the first level is the only pass over
# raw data; refreshes merge yesterday's partial file with today's.
# ---------------------------------------------------------------------------

@register("agg_incremental_partials", """
WITH partials AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS cnt, SUM(CAST(value AS DECIMAL(18,4))) AS sval
  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE))
SELECT event_type,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST(SUM(sval) AS DOUBLE) AS total_value,
       COUNT(*) AS n_days
FROM partials GROUP BY event_type
""")
def q_agg_incremental_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    partials = daily_partials(ev)
    return merge_partials(partials)


def daily_partials(events: DataFrame) -> DataFrame:
    """Level 1: per-(event_type, day) mergeable partials — the only pass
    that touches raw rows. DECIMAL sum partials are order-independent."""
    return (events.groupBy("event_type",
                           F.date_trunc("day", "ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum(F.col("value").cast("decimal(18,4)")).alias("sval")))


def merge_partials(partials: DataFrame) -> DataFrame:
    """Level 2: fold partials to totals — SUM of counts, SUM of decimal
    sums. Works identically whether `partials` came from one query or
    from N incremental parquet snapshots unioned together."""
    return (partials.groupBy("event_type")
            .agg(F.sum("cnt").cast("bigint").alias("n_events"),
                 F.sum("sval").cast("double").alias("total_value"),
                 F.count(F.lit(1)).alias("n_days")))


# ---------------------------------------------------------------------------
# url_canonicalize — the normalize step every web-log pipeline runs
# before dedup/join: lowercase scheme+host, strip default ports, drop
# fragments, drop utm_* tracking params, sort surviving query params,
# trim trailing slashes. Messy inputs are synthesized deterministically
# from doc_id (4 variants) so the oracle rebuilds byte-identical inputs
# and the whole normalize path is value-checked, not just counted.
# Pure JVM expressions (regexp + array ops) — see operators/urlnorm.py.
# ---------------------------------------------------------------------------

@register("url_canonicalize", """
WITH messy AS (
  SELECT doc_id,
         'HTTPS://' || upper(source) || '.Example.COM:443/post/' ||
         CAST(doc_id AS VARCHAR) ||
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN '/?utm_source=feed&b=2&a=1'
           WHEN 1 THEN '?z=9&utm_campaign=x&a=1#frag'
           WHEN 2 THEN ''
           ELSE '#top' END AS url
  FROM documents)
SELECT doc_id, url,
       lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
       regexp_replace(
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
         ':443$', '') ||
       CASE WHEN regexp_replace(
                   regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                   '/+$', '') = ''
            THEN '/'
            ELSE regexp_replace(
                   regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                   '/+$', '') END ||
       CASE WHEN COALESCE(array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                    x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '') = ''
            THEN ''
            ELSE '?' || COALESCE(array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                    x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '') END
         AS canon_url
FROM messy
""")
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    variant = (F.col("doc_id") % 4).cast("int")
    messy = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.COM:443/post/"),
            F.col("doc_id").cast("string"),
            F.when(variant == 0, F.lit("/?utm_source=feed&b=2&a=1"))
             .when(variant == 1, F.lit("?z=9&utm_campaign=x&a=1#frag"))
             .when(variant == 2, F.lit(""))
             .otherwise(F.lit("#top"))).alias("url"))
    return messy.select("doc_id", "url",
                        urlnorm.canonicalize(F.col("url")).alias("canon_url"))


# ---------------------------------------------------------------------------
# cohort_retention — the product-analytics retention matrix: users
# cohorted by first-seen day, then counted by (cohort_day, day_offset)
# of later activity. Two aggregations over the events table (first-seen
# per user, distinct user-days) joined on user_id — both shuffles hash
# on user_id, so AQE can reuse one exchange. DISTINCT before the join
# keeps the join input at |user×day|, not |events|.
# ---------------------------------------------------------------------------

@register("cohort_retention", """
WITH firstday AS (
  SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS act_day
  FROM events)
SELECT cohort_day,
       CAST(datediff('day', cohort_day, act_day) AS INTEGER) AS day_offset,
       COUNT(*) AS active_users
FROM activity JOIN firstday USING (user_id)
GROUP BY cohort_day, CAST(datediff('day', cohort_day, act_day) AS INTEGER)
""")
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    firstday = (ev.groupBy("user_id")
                .agg(F.min(day).alias("cohort_day")))
    activity = ev.select("user_id", day.alias("act_day")).distinct()
    return (activity.join(firstday, "user_id")
            .groupBy("cohort_day",
                     F.datediff("act_day", "cohort_day").cast("int")
                     .alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("active_users")))


# ---------------------------------------------------------------------------
# agg_ohlc_resample — telemetry downsampling to per-(series, day) OHLC
# bars: open/close via min_by/max_by on the (ts, event_id) struct (ONE
# hash aggregate — no per-group window sort; event_id uniquifies equal
# timestamps so both engines pick the same row), high/low plain min/max.
# The oracle expresses identical semantics with row_number windows.
# ---------------------------------------------------------------------------

@register("agg_ohlc_resample", """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, value,
         row_number() OVER (PARTITION BY event_type,
                            CAST(date_trunc('day', ts) AS DATE)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type,
                            CAST(date_trunc('day', ts) AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events)
SELECT event_type, day,
       CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE) AS open,
       CAST(MAX(value) AS DOUBLE) AS high,
       CAST(MIN(value) AS DOUBLE) AS low,
       CAST(MAX(CASE WHEN rn_d = 1 THEN value END) AS DOUBLE) AS close,
       COUNT(*) AS n_events
FROM daily GROUP BY event_type, day
""")
def q_agg_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (ev.groupBy("event_type",
                       F.date_trunc("day", "ts").cast("date").alias("day"))
            .agg(F.min_by("value", key).cast("double").alias("open"),
                 F.max("value").cast("double").alias("high"),
                 F.min("value").cast("double").alias("low"),
                 F.max_by("value", key).cast("double").alias("close"),
                 F.count(F.lit(1)).alias("n_events")))


# ---------------------------------------------------------------------------
# tpch_q10_returned_revenue — the returned-item report: 3-way join with
# the date filter pushed to orders and the returnflag filter pushed to
# the lineitem scan, nation broadcast, deterministic top-20.
# ---------------------------------------------------------------------------

@register("tpch_q10_returned_revenue", f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.read_table(spark, sf_dir, "customer")
    orders = (io.read_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))))
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R"))
    nation = io.read_table(spark, sf_dir, "nation")
    return (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(_dsum(_disc_price()).alias("revenue"))
            .orderBy(F.desc("revenue"), "c_custkey").limit(20))


# ---------------------------------------------------------------------------
# tpch_q16_supplier_cnt — NOT IN as a broadcast anti-join (suppkeys are
# non-null, so anti-join == NOT IN) + COUNT(DISTINCT) per group +
# deterministic top-k. The IN-list size filter pushes to the part scan.
# ---------------------------------------------------------------------------

@register("tpch_q16_supplier_cnt", """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 15
""")
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    part = (io.read_table(spark, sf_dir, "part")
            .filter(F.col("p_size").isin(1, 5, 9, 13)))
    bad = (io.read_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                  "left_anti")
            .groupBy("p_brand", "p_type")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type").limit(15))


# ---------------------------------------------------------------------------
# tpch_q22_dormant_customers — scalar-subquery threshold + anti-join:
# high-balance customers with no recent orders, per market segment. The
# global average stays IN the plan (one-row aggregate crossJoin-broadcast
# back onto customer — no driver collect), and is computed from a
# DECIMAL-exact sum so both engines derive the identical double threshold
# (a plain AVG(double) differs in the last ULP with partitioned
# summation, and a half-ULP threshold flips boundary rows).
# ---------------------------------------------------------------------------

@register("tpch_q22_dormant_customers", """
WITH avgbal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           AS avg_bal
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer, avgbal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_mktsegment
""")
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.read_table(spark, sf_dir, "customer")
    avgbal = (cust.filter(F.col("c_acctbal") > 0)
              .agg((F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                    .cast("double") / F.count(F.lit(1))).alias("avg_bal")))
    recent = (io.read_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
              .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(avgbal))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 _dsum(F.col("c_acctbal")).alias("totacctbal")))


# ---------------------------------------------------------------------------
# join_fuzzy_jaccard — exact fuzzy record linkage: token-set Jaccard
# >= 0.8 between documents and a perturbed copy (each right-side doc
# drops its 2 lexically-last tokens, so planted matches sit at
# (n-2)/n and docs with <10 distinct tokens fall below threshold).
# Spark runs the PREFIX-FILTERED join (operators/joins.py
# fuzzy_jaccard_join — candidates from rarest-token prefixes only);
# the oracle computes EXHAUSTIVE all-pairs Jaccard, so a green row
# proves the prefix filter is lossless, not approximate. jacc is one
# IEEE division of identical integers — no rounding needed.
# ---------------------------------------------------------------------------

_TOKS_SQL = ("list_sort(list_distinct(list_filter("
             "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')))")

@register("join_fuzzy_jaccard", f"""
WITH lt AS (
  SELECT doc_id AS id_l, {_TOKS_SQL} AS t FROM documents),
rt AS (
  SELECT doc_id + 100000 AS id_r,
         list_slice({_TOKS_SQL}, 1, len({_TOKS_SQL}) - 2) AS t
  FROM documents),
pairs AS (
  SELECT id_l, id_r,
         len(list_filter(l.t, x -> list_contains(r.t, x))) AS inter,
         len(l.t) AS nl, len(r.t) AS nr
  FROM lt l CROSS JOIN rt r)
SELECT id_l, id_r, CAST(inter AS DOUBLE) / (nl + nr - inter) AS jacc
FROM pairs
WHERE inter > 0 AND CAST(inter AS DOUBLE) / (nl + nr - inter) >= 0.8
""")
def q_join_fuzzy_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import joins
    docs = io.read_table(spark, sf_dir, "documents")
    toks = F.array_sort(F.array_distinct(F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")))
    left = docs.select(F.col("doc_id").alias("id_l"), toks.alias("toks_l"))
    right = docs.select(
        (F.col("doc_id") + 100000).alias("id_r"),
        # clamp: Spark's slice throws on negative length for docs with
        # <2 tokens (DuckDB's list_slice degrades to empty instead)
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        .alias("toks_r"))
    return joins.fuzzy_jaccard_join(left, right, threshold=0.8)


# ---------------------------------------------------------------------------
# join_point_in_time — the feature-store lookup: each fact row joins the
# dimension VERSION that was valid at the fact's timestamp (SCD2
# intervals from operators/cdc.scd2_intervals, [valid_from, valid_to)
# in a unique seq space). Spark shape: equi-join on the key with the
# interval predicate as SMJ residual — never a time-axis cross join;
# each fact matches exactly one version because the intervals partition
# the seq axis per key. Dimension = per-customer priority history built
# from orders (seq = epoch·10^5 + orderkey mod 10^5, unique); facts =
# lineitems at ship time (end-of-second rule: fact_seq gets the max
# sub-second rank, so same-timestamp changes are visible).
# ---------------------------------------------------------------------------

@register("join_point_in_time", """
WITH changes AS (
  SELECT o_custkey AS custkey, o_orderpriority AS prio,
         CAST(epoch(o_orderdate) AS BIGINT) * 100000
           + o_orderkey % 100000 AS seq
  FROM orders),
dim AS (
  SELECT custkey, prio, seq AS valid_from_seq,
         lead(seq) OVER (PARTITION BY custkey ORDER BY seq) AS valid_to_seq
  FROM changes),
fact AS (
  SELECT o_custkey AS custkey,
         CAST(epoch(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) * 100000
           + 99999 AS fact_seq,
         CAST(l_extendedprice AS DECIMAL(18,4)) AS price
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT prio AS asof_priority, COUNT(*) AS n_lines,
       CAST(SUM(price) AS DOUBLE) AS revenue
FROM fact JOIN dim
  ON fact.custkey = dim.custkey
 AND fact_seq >= valid_from_seq
 AND (valid_to_seq IS NULL OR fact_seq < valid_to_seq)
GROUP BY prio
""")
def q_join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import cdc
    orders = io.read_table(spark, sf_dir, "orders")
    seq = (F.col("o_orderdate").cast("timestamp").cast("long") * 100000
           + F.col("o_orderkey") % 100000)
    changes = orders.select(F.col("o_custkey").alias("custkey"),
                            F.col("o_orderpriority").alias("prio"),
                            seq.alias("seq"), F.lit("u").alias("op"))
    dim = (cdc.scd2_intervals(changes, "custkey")
           .select("custkey", "prio", "valid_from_seq", "valid_to_seq"))
    li = io.read_table(spark, sf_dir, "lineitem")
    fact = (li.join(orders.select("o_orderkey", "o_custkey"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .select(F.col("o_custkey").alias("fcustkey"),
                    (F.col("l_shipdate").cast("timestamp").cast("long")
                     * 100000 + 99999).alias("fact_seq"),
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    .alias("price")))
    joined = fact.join(
        dim, (F.col("fcustkey") == F.col("custkey"))
        & (F.col("fact_seq") >= F.col("valid_from_seq"))
        & (F.col("valid_to_seq").isNull()
           | (F.col("fact_seq") < F.col("valid_to_seq"))))
    return (joined.groupBy(F.col("prio").alias("asof_priority"))
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("price").cast("double").alias("revenue")))


# ---------------------------------------------------------------------------
# parse_grok_logs — the log/telemetry half of the north rule's "grok/regex
# parse": synthesize Apache-combined-style access-log lines
# deterministically from events (both engines build byte-identical
# strings), then parse them BACK with one anchored regex
# (grok's COMMONAPACHELOG shape) and aggregate per (method, status).
# The regex runs JVM-side inside whole-stage codegen (regexp_extract),
# never Python — at 100 TB this is a map-only scan feeding one
# map-side-combined aggregation, the same shape as the HTML parse
# flagship but with zero Arrow hops. All outputs are strings/BIGINTs:
# exact across engines.
# ---------------------------------------------------------------------------

@register("parse_grok_logs", """
WITH raw AS (
  SELECT '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.1 - - ['
         || CAST(CAST(extract(epoch FROM ts) AS BIGINT) AS VARCHAR) || '] "'
         || CASE event_type WHEN 'view' THEN 'GET' WHEN 'click' THEN 'POST'
                 WHEN 'purchase' THEN 'PUT' WHEN 'signup' THEN 'POST'
                 ELSE 'DELETE' END
         || ' /' || event_type || '/' || CAST(event_id % 100 AS VARCHAR)
         || ' HTTP/1.1" '
         || CASE WHEN event_id % 10 < 7 THEN '200'
                 WHEN event_id % 10 < 9 THEN '404' ELSE '500' END
         || ' ' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR)
           AS line
  FROM events),
parsed AS (
  SELECT regexp_extract(line, '{rx}', 1) AS ip,
         regexp_extract(line, '{rx}', 3) AS method,
         regexp_extract(line, '{rx}', 5) AS status,
         CAST(regexp_extract(line, '{rx}', 6) AS BIGINT) AS n_bytes
  FROM raw)
SELECT method, status, COUNT(*) AS requests,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, COUNT(DISTINCT ip) AS uniq_ips
FROM parsed GROUP BY method, status
""".replace("{rx}", groklog.GROK_RX))
def q_parse_grok_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    return groklog.requests_by_method_status(
        groklog.parse_lines(groklog.synth_lines(ev)))


# ---------------------------------------------------------------------------
# parse_log_templates — Drain-style template mining: digit runs collapse
# to <NUM>, lines group by (token_count, first two normalized tokens)
# (the depth-2 Drain prefix key), and a position where the group
# disagrees becomes the <*> wildcard. Two map-side-combined shuffles;
# the (key,pos) cardinality is O(templates x positions), so the plan is
# scan-bound at any corpus size. Fixture lines are synthesized
# deterministically from events in BOTH engines (logmine.synth_app_lines
# mirrored below); the click shape varies a WORD (button color) so the
# wildcard path is exercised, not just digit collapse.
# ---------------------------------------------------------------------------

@register("parse_log_templates", """
WITH raw AS (
  SELECT CASE event_type
    WHEN 'view' THEN 'INFO user ' || CAST(user_id AS VARCHAR)
        || ' opened page ' || CAST(event_id % 100 AS VARCHAR) || ' in '
        || CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR) || ' ms'
    WHEN 'click' THEN 'INFO user ' || CAST(user_id AS VARCHAR)
        || ' clicked button '
        || CASE event_id % 3 WHEN 0 THEN 'red' WHEN 1 THEN 'blue'
           ELSE 'green' END
        || ' ' || CAST(event_id % 10 AS VARCHAR)
    WHEN 'purchase' THEN 'WARN payment retry '
        || CAST(event_id % 5 AS VARCHAR)
        || ' for user ' || CAST(user_id AS VARCHAR)
    WHEN 'signup' THEN 'INFO user ' || CAST(user_id AS VARCHAR)
        || ' created account'
    ELSE 'ERROR session ' || CAST(event_id AS VARCHAR) || ' aborted'
    END AS line
  FROM events),
keyed AS (
  SELECT list_transform(string_split(line, ' '),
                        t -> regexp_replace(t, '[0-9]+', '<NUM>', 'g')) AS tk
  FROM raw),
pos AS (
  SELECT n_toks, gkey, s.pos AS pos, s.tok AS tok FROM (
    SELECT len(tk) AS n_toks, tk[1] || chr(1) || tk[2] AS gkey,
           unnest(list_transform(range(len(tk)),
               i -> struct_pack(pos := i + 1, tok := tk[i + 1]))) AS s
    FROM keyed)),
per_pos AS (
  SELECT n_toks, gkey, pos,
         COUNT(DISTINCT tok) AS n_distinct, MIN(tok) AS tok,
         COUNT(*) AS n_rows
  FROM pos GROUP BY 1, 2, 3)
SELECT string_agg(CASE WHEN n_distinct = 1 THEN tok ELSE '<*>' END,
                  ' ' ORDER BY pos) AS template,
       CAST(MAX(n_rows) AS BIGINT) AS n_lines
FROM per_pos GROUP BY n_toks, gkey
""")
def q_parse_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    return logmine.mine_templates(logmine.synth_app_lines(ev))


# ---------------------------------------------------------------------------
# parse_multiline_stack — multiline record assembly: continuation lines
# (leading whitespace) fold into the nearest preceding non-continuation
# line of the same file via a running-max window PER FILE (the natural
# parallel unit of a log landing zone — no global sort), then records
# re-assemble with an in-group array sort. Fixture: events with
# value < 0.1 emit an ERROR parent + two indented frames
# (logmine.synth_stack_lines, mirrored below).
# ---------------------------------------------------------------------------

@register("parse_multiline_stack", """
WITH fanout AS (
  SELECT user_id % 8 AS file, event_id, value,
         unnest(CASE WHEN value < 0.1 THEN [0, 1, 2] ELSE [0] END) AS k
  FROM events),
raw AS (
  SELECT file, event_id * 4 + k AS line_no,
         CASE WHEN k = 0 THEN
             CASE WHEN value < 0.1
                  THEN 'ERROR boom ' || CAST(event_id AS VARCHAR)
                  ELSE 'INFO ok ' || CAST(event_id AS VARCHAR) END
         ELSE '  at frame' || CAST(k AS VARCHAR) || ' of '
              || CAST(event_id AS VARCHAR) END AS line
  FROM fanout),
tagged AS (
  SELECT file, line_no, line,
         MAX(CASE WHEN LEFT(line, 1) <> ' ' THEN line_no END)
           OVER (PARTITION BY file ORDER BY line_no
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS record_start
  FROM raw)
SELECT file, record_start,
       string_agg(line, chr(10) ORDER BY line_no) AS record,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM tagged GROUP BY file, record_start
""")
def q_parse_multiline_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    return logmine.assemble_multiline(logmine.synth_stack_lines(ev))


# ---------------------------------------------------------------------------
# enrich_ip_cidr — the geo-IP/ASN "lookup enrich" step of the log
# pipeline: dotted-quad -> int64, then attach the (non-overlapping)
# range row containing each IP. The dim is config-sized so it
# BROADCASTS and the containment predicate runs map-side — zero shuffle
# of the fact stream; a multi-million-range GeoIP table would switch to
# the binned joins.range_join instead (documented on the operator).
# One cuts list generates BOTH the Spark dim and the SQL VALUES, so the
# two engines cannot drift.
# ---------------------------------------------------------------------------

_IP_BASE = 10 * 16_777_216  # 10.0.0.0
_IP_CUTS = [(0, 36), (37, 80), (81, 99), (100, 170), (171, 200),
            (201, 250), (251, 255)]
_IP_DIM_SQL = ",\n  ".join(
    f"('blk{i}', {_IP_BASE + lo * 256}, {_IP_BASE + hi * 256 + 255})"
    for i, (lo, hi) in enumerate(_IP_CUTS))


@register("enrich_ip_cidr", f"""
WITH ips AS (
  SELECT '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.1' AS ip,
         {_IP_BASE} + (user_id % 256) * 256 + 1 AS ip_long
  FROM events),
dim(label, start_ip, end_ip) AS (VALUES
  {_IP_DIM_SQL})
SELECT label, CAST(COUNT(*) AS BIGINT) AS requests,
       CAST(COUNT(DISTINCT ip) AS BIGINT) AS uniq_ips
FROM ips LEFT JOIN dim ON ip_long BETWEEN start_ip AND end_ip
GROUP BY label
""")
def q_enrich_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    ips = groklog.parse_lines(groklog.synth_lines(ev)).select("ip")
    dim = spark.createDataFrame(
        [(f"blk{{i}}".format(i=i), _IP_BASE + lo * 256,
          _IP_BASE + hi * 256 + 255)
         for i, (lo, hi) in enumerate(_IP_CUTS)],
        "label string, start_ip long, end_ip long")
    return (enrich.join_ip_ranges(ips, dim)
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("requests"),
                 F.count_distinct("ip").alias("uniq_ips")))
