"""Batch-4 driver-contract queries: raw scan pushdown, struct functions,
and embedding-cosine near-duplicate detection (SURVEY.md §2.3 scans +
training-data ops).

Determinism notes follow queries.py: identical aliases both sides, doubles
rounded after identical double-precision arithmetic, unique tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import custom_pandas, joins
from ..sources import io
from .registry import register


# ---------------------------------------------------------------------------
# win_sessionize — full batch sessionization: gap>30min starts a session;
# session_id = cumulative count of session starts per user (lag + cumsum,
# one shuffle). The batch dual of F.session_window / stream_session.
# ---------------------------------------------------------------------------

@register("win_sessionize", """
SELECT event_id, user_id, ts,
       CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events)
""")
def q_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fixture timestamps are NTZ; NTZ->long needs the timestamp hop (UTC session)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    is_start = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (ev.withColumn("is_start", is_start)
            .select("event_id", "user_id", "ts",
                    F.sum("is_start").over(cum).alias("session_id")))


# ---------------------------------------------------------------------------
# join_range — DEFAULT formulation of the range join, the SCALE one:
# bucketize the time axis into 7-day bins and equi-join on the bin
# (anchor rows are duplicated into the two bins their window can
# overlap), then re-apply the exact range predicate. A shuffled hash
# join on (bin) instead of the O(|A|x|B|) broadcast-nested-loop kept as
# `join_range_bnl` (queries.py) for comparison; identical oracle SQL.
# ---------------------------------------------------------------------------

@register("join_range", """
SELECT a.o_orderkey AS anchor_key, COUNT(*) AS n_following
FROM orders a JOIN orders b
  ON b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
WHERE a.o_orderkey % 100 = 0
GROUP BY 1
""")
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = io.read_table(spark, sf_dir, "orders")
    a = (o.filter("o_orderkey % 100 = 0")
         .select(F.col("o_orderkey").alias("anchor_key"),
                 F.col("o_orderdate").cast("timestamp").cast("long")
                 .alias("a_s")))
    b = o.select(F.col("o_orderdate").cast("timestamp").cast("long")
                 .alias("b_s"))
    return (joins.range_join_binned(a, b, "a_s", "b_s", 7 * 86400)
            .groupBy("anchor_key").agg(F.count(F.lit(1)).alias("n_following")))


# ---------------------------------------------------------------------------
# grouped pandas-UDF surfaces — the UDAF / grouped-map rows of the §2.3
# UDF table, each verified against a plain-SQL oracle (the UDF computes
# exactly what the SQL window/aggregate computes, so any mismatch is a
# plumbing bug, not a semantics choice).
# ---------------------------------------------------------------------------

@register("udaf_grouped_agg", """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total
FROM documents GROUP BY lang
""")
def q_udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    return custom_pandas.checked_byte_sums(docs, "lang", "n_chars")


@register("grouped_map_cumsum", """
SELECT source, doc_id, n_chars,
       CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
FROM documents
""")
def q_grouped_map_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    return custom_pandas.group_cumsum(docs, "source", "doc_id", "n_chars")


# ---------------------------------------------------------------------------
# scan_parquet — the §2.3 raw-scan entry. The Spark plan must show the
# filter as PushedFilters and the projection as a 4-column ReadSchema
# (asserted in tests/test_plans.py); the oracle is the same relational op.
# ---------------------------------------------------------------------------

@register("scan_parquet", """
SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity < 10
""")
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
                      & (F.col("l_quantity") < 10))
            .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate"))


# ---------------------------------------------------------------------------
# fn_struct — StructType create / field access / nested sort key.
# ---------------------------------------------------------------------------

@register("fn_struct", """
SELECT doc_id,
       s.src AS src, s.n AS n,
       CASE WHEN s.n >= 300 THEN 'long' ELSE 'short' END AS bucket
FROM (SELECT doc_id, struct_pack(src := source, n := n_chars) AS s
      FROM documents)
""")
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.read_table(spark, sf_dir, "documents")
    s = F.struct(F.col("source").alias("src"), F.col("n_chars").alias("n"))
    return (docs.withColumn("s", s)
            .select("doc_id",
                    F.col("s.src").alias("src"),
                    F.col("s.n").alias("n"),
                    F.when(F.col("s.n") >= 300, "long").otherwise("short")
                     .alias("bucket")))


# ---------------------------------------------------------------------------
# Composite analytics (TPC-H-shaped) — multi-join + aggregate plans that
# exercise join strategy selection, pushdown through joins, and top-k.
# Double sums go through DECIMAL(18,4) partials (exact, order-independent)
# per the repo determinism convention; top-k carries a unique tie-break.
# ---------------------------------------------------------------------------

def _dsum(col):
    return F.sum(col.cast("decimal(18,4)")).cast("double")


@register("tpch_q1_pricing", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")))
    # exact decimal BEFORE the multiply — double*double cast after the
    # product puts the rounding boundary on a half-ULP engines disagree on
    disc = (F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)")
               - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(_dsum(F.col("l_quantity")).alias("sum_qty"),
                 _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
                 _dsum(disc).alias("sum_disc_price"),
                 F.round(_dsum(F.col("l_quantity"))
                         / F.count(F.lit(1)), 6).alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order")))


@register("tpch_q3_shipping", """
SELECT l_orderkey,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (io.read_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING"))
    orders = (io.read_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")))
    # exact decimal BEFORE the multiply — double*double cast after the
    # product puts the rounding boundary on a half-ULP engines disagree on
    disc = (F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)")
               - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(_dsum(disc).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), "l_orderkey").limit(10))


@register("tpch_q5_local_supplier", """
SELECT n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""")
def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.read_table(spark, sf_dir, "customer")
    orders = (io.read_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))))
    li = io.read_table(spark, sf_dir, "lineitem")
    supp = io.read_table(spark, sf_dir, "supplier")
    nation = io.read_table(spark, sf_dir, "nation")
    region = io.read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # exact decimal BEFORE the multiply — double*double cast after the
    # product puts the rounding boundary on a half-ULP engines disagree on
    disc = (F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)")
               - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(_dsum(disc).alias("revenue")))


# ---------------------------------------------------------------------------
# dedup_embedding_cosine — embedding-space near-duplicate pairs.
#
# Corpus: embeddings ∪ planted near-copies (vec_id+100000, every component
# +0.01 — cosine vs the original ≈ 0.9999). Blocking on `label` (the
# cluster key) turns the O(n²) all-pairs into per-block pairs — the same
# blocked-join shape that scales to 10^9 vectors when the blocking key is
# an LSH bucket (see ann_lsh_bucketed). Threshold 0.99 cleanly separates:
# max natural same-label cosine in the fixture is 0.475.
#
# Both engines compute cosine in double precision over the identical
# sequential sum, then round(6): results are bit-deterministic.
# ---------------------------------------------------------------------------

_EMB_CORPUS_SQL = """
SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
FROM embeddings
UNION ALL
SELECT vec_id + 100000 AS vec_id, label,
       list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.01) AS v
FROM embeddings WHERE vec_id < 25
"""


def _emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = io.read_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    planted = (emb.filter("vec_id < 25").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label",
        F.transform("embedding", lambda x: x.cast("double") + 0.01).alias("v")))
    return base.unionByName(planted)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


@register("dedup_embedding_cosine", f"""
WITH corpus AS ({_EMB_CORPUS_SQL})
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.99
""")
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _emb_corpus(spark, sf_dir)
    a = corpus.select(F.col("vec_id").alias("id_a"), "label",
                      F.col("v").alias("va"))
    b = corpus.select(F.col("vec_id").alias("id_b"),
                      F.col("label").alias("label_b"), F.col("v").alias("vb"))
    pairs = a.join(b, (F.col("label") == F.col("label_b"))
                   & (F.col("id_a") < F.col("id_b")))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va")))
        * F.sqrt(_dot(F.col("vb"), F.col("vb"))))
    return (pairs.withColumn("cos", F.round(cos, 6))
            .filter(F.col("cos") >= 0.99)
            .select("id_a", "id_b", "cos"))


@register("tpch_q6_forecast_revenue", """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                     * CAST(l_discount AS DECIMAL(18,4))
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pushdown-economy query: every predicate reaches the parquet
    scan (PushedFilters), the read schema is 4 columns, and the whole
    plan is scan -> partial agg -> single-row exchange -> final agg —
    no join, no wide shuffle. Revenue in exact decimal per convention."""
    li = io.read_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * F.col("l_discount").cast("decimal(18,4)")).cast("decimal(18,4)")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.sum(rev).cast("double").alias("revenue")))


@register("join_bloom_prefilter", """
SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
       CAST(l.l_quantity AS DOUBLE) AS quantity,
       o.o_orderpriority, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
""")
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered equi-join: urgent orders' keys collapse into one
    broadcast bloom filter that drops non-matching lineitem rows BEFORE
    the join shuffle (~80% of probe volume here). The result is exactly
    the plain join's — no false negatives, false positives removed by
    the real join — so the oracle is the unfiltered join SQL."""
    li = io.read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey",
        F.col("l_quantity").cast("double").alias("quantity"))
    orders = (io.read_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_orderkey").alias("l_orderkey"),
                      "o_orderpriority",
                      F.col("o_totalprice").cast("double")
                      .alias("o_totalprice")))
    return joins.bloom_prefiltered_join(li, orders, "l_orderkey",
                                        num_bits=1 << 20)
