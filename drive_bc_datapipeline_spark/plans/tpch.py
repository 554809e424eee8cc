"""Core OLAP plans (SURVEY §2 C): TPC-H-style scan/agg/join/window.

These exercise the engine's relational core the way the reference's
Athena SQL layer does (reference: athena.sql:19-29 — grouped counts
over the event table), but at proper analytical complexity.

Scale notes (100 TB): every plan is declarative; Catalyst pushes the
filters into the parquet scan and prunes columns. Joins against
region/nation/customer/supplier are broadcast (dims are tiny relative
to facts at any SF); lineitem↔orders is the one genuine shuffle and
would be bucketed on orderkey in a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from drive_bc_datapipeline_spark.plans.registry import query, t

# --------------------------------------------------------------------------
# C1 — flagship: TPC-H Q1 pricing summary.
# One scan, filter pushed to parquet, map-side partial aggregation into a
# 4-group result: the canonical "agg that never shuffles much" plan.
# --------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
  ROUND(AVG(l_discount), 4)                                          AS avg_disc,
  COUNT(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# C2 — TPC-H Q3 shipping priority: selective filters on both join sides,
# 3-way join, agg, deterministic top-10.
# --------------------------------------------------------------------------

Q3_ORACLE = """
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.to_timestamp(F.lit("1998-03-15"))
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer side is small after the segment filter → broadcast.
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# C3 — TPC-H Q5-style local-supplier revenue: 6-way star join where every
# dimension is broadcast; the only shuffle is lineitem↔orders.
# --------------------------------------------------------------------------

Q5_ORACLE = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@query("q5_local_supplier", Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# C4 — window rank: top-3 customers by spend per nation.
# Rank over rounded spend with custkey tiebreak so both engines agree.
# --------------------------------------------------------------------------

WINDOW_RANK_ORACLE = """
WITH spend AS (
  SELECT c_nationkey,
         c_custkey,
         c_name,
         ROUND(SUM(o_totalprice), 2) AS total_spend
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_nationkey, c_custkey, c_name
), ranked AS (
  SELECT n_name, c_custkey, c_name, total_spend,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY total_spend DESC, c_custkey
         ) AS rank_in_nation
  FROM spend JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, c_custkey, c_name, total_spend,
       CAST(rank_in_nation AS BIGINT) AS rank_in_nation
FROM ranked
WHERE rank_in_nation <= 3
"""


@query("window_rank_customers", WINDOW_RANK_ORACLE)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return (
        spend.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            "total_spend",
            F.col("rank_in_nation").cast("long").alias("rank_in_nation"),
        )
    )
