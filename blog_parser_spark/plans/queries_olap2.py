"""Batch-9 driver-contract queries: the remaining TPC-H optimizer
shapes the registry didn't yet cover — two-sided dimension routing
(q7), ratio-of-conditional-sums per group (q8), multi-dim profit
rollup (q9), scalar-subquery HAVING (q11), left-outer count
distribution (q13), argmax-vs-global-scalar (q15), correlated
per-group average (q17), and the only-late-supplier multi-semi/anti
shape (q21). q9/q11 are adapted to this corpus' schema (no partsupp
table): supplier→part linkage goes through lineitem and supply cost
is proxied by p_retailprice — the JOIN/AGG shape, which is what the
optimizer sees, is unchanged.

Determinism notes follow queries_olap.py: identical aliases both
sides, double sums via DECIMAL(18,4) partials cast back to double,
averages as exact-decimal-sum / count (never engine AVG over
doubles), ratios divided AFTER both operands are bit-identical
doubles, every top-k ordering carries a unique tie-break. NO
DECIMAL-typed output columns (CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import io
from .registry import register


def _dsum(col):
    return F.sum(col.cast("decimal(18,4)")).cast("double")


def _disc_price():
    return (F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)")
               - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,4)")


_DISC_SQL = ("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * "
             "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) "
             "AS DECIMAL(18,4))")


# ---------------------------------------------------------------------------
# tpch_q7_nation_volume — shipping volume between two nations, grouped
# by (supplier nation, customer nation, ship year). The nation pair
# predicate is a symmetric OR evaluated AFTER both dimension joins;
# both nation lookups broadcast, so the only shuffles are the
# lineitem⋈orders join and the final aggregate. The supplier/customer
# nation filters are pushed into the broadcast sides (2-row dims), so
# the big join's probe side is pre-shrunk.
# ---------------------------------------------------------------------------

@register("tpch_q7_nation_volume", f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         {_DISC_SQL} AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01')
GROUP BY supp_nation, cust_nation, l_year
""")
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))))
    orders = io.read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = io.read_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    supp = (io.read_table(spark, sf_dir, "supplier")
            .join(nation.filter(F.col("n_name").isin(pair)),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (io.read_table(spark, sf_dir, "customer")
            .join(nation.filter(F.col("n_name").isin(pair)),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    return (li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg(_dsum(_disc_price()).alias("revenue")))


# ---------------------------------------------------------------------------
# tpch_q8_market_share — per-year ratio of a conditional decimal sum
# over the total decimal sum (one nation's share of an ASIA market for
# STANDARD parts). Both sums land in ONE aggregate; the quotient is
# computed on exact-decimal results cast to double, round(6). The
# part/nation/region dims broadcast; only orders⋈lineitem shuffles.
# ---------------------------------------------------------------------------

@register("tpch_q8_market_share", f"""
SELECT o_year,
       round(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {_DISC_SQL} AS volume, n2.n_name AS nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01')
GROUP BY o_year
""")
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    part = (io.read_table(spark, sf_dir, "part")
            .filter(F.col("p_type") == "STANDARD").select("p_partkey"))
    orders = (io.read_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1998-01-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    nation = io.read_table(spark, sf_dir, "nation")
    region = io.read_table(spark, sf_dir, "region")
    cust_asia = (io.read_table(spark, sf_dir, "customer")
                 .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
                 .join(region.filter(F.col("r_name") == "ASIA"),
                       F.col("n_regionkey") == F.col("r_regionkey"))
                 .select("c_custkey"))
    supp = (io.read_table(spark, sf_dir, "supplier")
            .join(nation.select(F.col("n_nationkey").alias("sn_key"),
                                F.col("n_name").alias("nation")),
                  F.col("s_nationkey") == F.col("sn_key"))
            .select("s_suppkey", "nation"))
    vol = _disc_price()
    share_num = F.when(F.col("nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast("decimal(18,4)"))
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(cust_asia), F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(_dsum(share_num) / _dsum(vol), 6).alias("mkt_share")))


# ---------------------------------------------------------------------------
# tpch_q9_profit_rollup — profit per (nation, year) across every part
# whose name contains 'red'. partsupp doesn't exist in
# this corpus, so supply cost is proxied as 1% of p_retailprice per
# unit (exact at 4 decimals: qty integral, retailprice 2 decimals);
# the plan shape — fact ⋈ two broadcast dims ⋈ orders, then a
# two-key rollup — is q9's. contains() can't push to parquet, but the
# broadcast part side is pre-filtered before the join.
# ---------------------------------------------------------------------------

@register("tpch_q9_profit_rollup", f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST({_DISC_SQL}
              - CAST(l_quantity AS DECIMAL(18,4))
                * CAST(p_retailprice AS DECIMAL(18,4))
                * CAST(0.01 AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN orders   ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%red%')
GROUP BY nation, o_year
""")
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    part = (io.read_table(spark, sf_dir, "part")
            .filter(F.col("p_name").contains("red"))
            .select("p_partkey", "p_retailprice"))
    supp = (io.read_table(spark, sf_dir, "supplier")
            .join(io.read_table(spark, sf_dir, "nation"),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("nation")))
    orders = io.read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    amount = (_disc_price()
              - F.col("l_quantity").cast("decimal(18,4)")
              * F.col("p_retailprice").cast("decimal(18,4)")
              * F.lit(0.01).cast("decimal(18,4)")).cast("decimal(18,4)")
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(_dsum(amount).alias("sum_profit")))


# ---------------------------------------------------------------------------
# tpch_q11_value_concentration — the scalar-subquery HAVING shape:
# per-part traded value for one nation's suppliers, keeping parts whose
# value exceeds 0.1% of the nation's total. The global total is a
# one-row aggregate cross-joined (broadcast) into the per-part stream —
# NEVER a driver-side collect; both operands of the comparison are
# exact-decimal sums cast to double, so the predicate is deterministic.
# ---------------------------------------------------------------------------

@register("tpch_q11_value_concentration", """
WITH nation_lines AS (
  SELECT l_partkey,
         CAST(CAST(l_quantity AS DECIMAL(18,4))
              * CAST(l_extendedprice AS DECIMAL(18,4))
              AS DECIMAL(18,4)) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3')
SELECT l_partkey AS partkey, CAST(SUM(value) AS DOUBLE) AS part_value
FROM nation_lines
GROUP BY l_partkey
HAVING CAST(SUM(value) AS DOUBLE)
       > (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM nation_lines)
""")
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    supp = (io.read_table(spark, sf_dir, "supplier")
            .join(io.read_table(spark, sf_dir, "nation")
                  .filter(F.col("n_name") == "NATION_3"),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    value = (F.col("l_quantity").cast("decimal(18,4)")
             * F.col("l_extendedprice").cast("decimal(18,4)")
             ).cast("decimal(18,4)")
    lines = (li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
             .select(F.col("l_partkey").alias("partkey"),
                     value.alias("value")))
    per_part = lines.groupBy("partkey").agg(_dsum(F.col("value"))
                                            .alias("part_value"))
    total = lines.agg((_dsum(F.col("value")) * F.lit(0.001))
                      .alias("_threshold"))
    return (per_part.join(F.broadcast(total))
            .filter(F.col("part_value") > F.col("_threshold"))
            .select("partkey", "part_value"))


# ---------------------------------------------------------------------------
# tpch_q13_order_distribution — the left-outer count-distribution
# shape: customers LEFT JOIN a filtered orders side, count per
# customer (COUNT(o_orderkey) so no-order customers count 0), then the
# histogram of those counts. Two shuffles by construction: the outer
# join's key shuffle doubles as the first groupBy's partitioning
# (same key), then one small shuffle on the count value.
# ---------------------------------------------------------------------------

@register("tpch_q13_order_distribution", """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
""")
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = io.read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    joined = cust.join(
        orders, (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"), "left_outer")
    per_cust = (joined.groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# tpch_q15_top_supplier — argmax against a global scalar: per-supplier
# 3-month revenue, keep the supplier(s) hitting the maximum. The max
# is a one-row aggregate broadcast back onto the per-supplier stream
# (the classic "view + scalar subquery" plan without a second scan of
# the fact table — Spark reuses the aggregated exchange under AQE).
# Revenue doubles come from exact decimal sums, so the equality join
# on a double is engine-stable.
# ---------------------------------------------------------------------------

@register("tpch_q15_top_supplier", f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_DISC_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(_dsum(_disc_price()).alias("total_revenue")))
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    supp = io.read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (revenue.join(F.broadcast(top))
            .filter(F.col("total_revenue") == F.col("_max_rev"))
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name", "total_revenue"))


# ---------------------------------------------------------------------------
# tpch_q17_small_quantity — the correlated per-group average: lines of
# one brand's small parts whose quantity is under 20% of that part's
# own average quantity. The correlated scalar subquery becomes a
# self-aggregate of lineitem on partkey joined back to the fact — the
# avg is exact (decimal sum / bigint count), the 0.2× threshold is a
# deterministic double product, and the final sum is a decimal
# partial. avg_yearly = sum/7 matches TPC-H's phrasing.
# ---------------------------------------------------------------------------

@register("tpch_q17_small_quantity", """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(*)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey)
  ON a_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size <= 5
  AND l_quantity < qty_threshold
""")
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem")
    part = (io.read_table(spark, sf_dir, "part")
            .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5))
            .select("p_partkey"))
    avg_qty = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
               .agg((F.lit(0.2)
                     * (_dsum(F.col("l_quantity"))
                        / F.count(F.lit(1)))).alias("qty_threshold")))
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .join(avg_qty, F.col("a_partkey") == F.col("l_partkey"))
            .filter(F.col("l_quantity") < F.col("qty_threshold"))
            .agg(F.round(_dsum(F.col("l_extendedprice")) / F.lit(7.0), 6)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_lines")))


# ---------------------------------------------------------------------------
# tpch_q21_only_late_supplier — the multi-semi/anti shape on one fact
# table under three aliases: suppliers in one nation whose line was
# late (shipped >60 days after order), where the order had ANOTHER
# supplier (EXISTS → left semi) but NO OTHER late supplier (NOT EXISTS
# → left anti). Both the semi and anti are equi-joins on orderkey with
# the suppkey inequality as residual — never a cartesian. Top-20 with
# s_name as its own unique tie-break (supplier names are unique).
# ---------------------------------------------------------------------------

@register("tpch_q21_only_late_supplier", """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""")
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = (io.read_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    late = (li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey"))
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    suspect = (late
               .join(l2, (F.col("k2") == F.col("l_orderkey"))
                     & (F.col("s2") != F.col("l_suppkey")), "left_semi")
               .join(l3, (F.col("k3") == F.col("l_orderkey"))
                     & (F.col("s3") != F.col("l_suppkey")), "left_anti"))
    supp = io.read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (suspect.join(F.broadcast(supp),
                         F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name").limit(20))


# ---------------------------------------------------------------------------
# tpch_q20_excess_shippers — the nested IN/semi-join chain (suppliers
# whose 1996 shipments of 'red' parts exceed 16% of their shipments of
# all parts): supplier ⟕semi (per-supplier agg HAVING a cross-aggregate
# predicate). Completes TPC-H shape coverage q1–q22 (q20 adapted like
# q9/q11 — no partsupp, demand measured from lineitem itself; the
# nested-aggregate semi-join shape is unchanged). Both aggregates land
# in ONE pass over the filtered fact (conditional decimal sums), so the
# "subquery inside the subquery" costs one shuffle, not two scans.
# ---------------------------------------------------------------------------

@register("tpch_q20_excess_shippers", """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_suppkey,
           CAST(SUM(CASE WHEN p_partkey IS NOT NULL
                    THEN CAST(l_quantity AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             AS red_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS all_qty
    FROM lineitem
    LEFT JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') p
      ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey)
  WHERE red_qty > 0.16 * all_qty)
ORDER BY s_suppkey
""")
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (io.read_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))))
    red = (io.read_table(spark, sf_dir, "part")
           .filter(F.col("p_name").contains("red")).select("p_partkey"))
    qty = F.col("l_quantity").cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    per_supp = (li.join(F.broadcast(red),
                        F.col("p_partkey") == F.col("l_partkey"), "left")
                .groupBy("l_suppkey")
                .agg(F.sum(F.when(F.col("p_partkey").isNotNull(), qty)
                           .otherwise(zero)).cast("double").alias("red_qty"),
                     F.sum(qty).cast("double").alias("all_qty")))
    excess = (per_supp
              .filter(F.col("red_qty") > F.lit(0.16) * F.col("all_qty"))
              .select("l_suppkey"))
    supp = io.read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (supp.join(excess, F.col("l_suppkey") == F.col("s_suppkey"),
                      "left_semi")
            .orderBy("s_suppkey"))
