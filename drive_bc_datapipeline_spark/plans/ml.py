"""ML feature plans (SURVEY §2 E1): the reference's label/feature
engineering as a declarative query.

Reference parity: ml-sparkml.py:22-30 derives ``duration`` =
(updated - created) in days plus count features (num_roads/num_areas)
and categorical columns. Here: order fulfillment duration =
days(o_orderdate → max(l_shipdate)), item counts, categoricals.

The trained pipeline itself (StringIndexer/VectorAssembler/
StandardScaler → RF/GBT with CV — E2/E3) lives in
``operators/ml.py`` and is exercised by tests, not by the oracle gate
(model fitting is not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans.registry import query, t

DURATION_FEATURES_ORACLE = """
SELECT o.o_orderkey,
       o.o_orderstatus,
       o.o_orderpriority,
       CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                      CAST(MAX(l.l_shipdate) AS DATE)) AS INTEGER)
         AS duration_days,
       COUNT(*) AS num_items,
       ROUND(SUM(l.l_quantity), 2) AS total_qty,
       ROUND(SUM(l.l_extendedprice), 2) AS total_price
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderstatus, o.o_orderpriority, o.o_orderdate
"""


@query("ml_duration_features", DURATION_FEATURES_ORACLE)
def ml_duration_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(F.max("l_shipdate"), F.col("o_orderdate"))
            .cast("int")
            .alias("duration_days"),
            F.count(F.lit(1)).alias("num_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .drop("o_orderdate")
    )
