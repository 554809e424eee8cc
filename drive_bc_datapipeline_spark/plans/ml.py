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


# --------------------------------------------------------------------------
# E5 — ridge regression by distributed normal equations: value ~
# hour + isodow, λ=0.1 on the slope diagonal, solved in CLOSED FORM.
# The scale-correct shape for linear models: ONE map-side-combined
# pass accumulates the 9 sufficient moments (XᵀX, Xᵀy — dimension²,
# not data, sized), the 3×3 system is solved by Cramer's rule as a
# column expression on that single-row frame (no driver round-trip,
# no iteration), and a second pass scores RMSE. The solver arithmetic
# is ONE shared SQL fragment evaluated by both engines, so the only
# cross-engine noise is moment summation order (absorbed by r6/r4).
#
# This is the driver-gated face of the E-section: what ml-sparkml.py
# does with an iterative fitter, expressed as algebra Catalyst can run.
# --------------------------------------------------------------------------

RIDGE_LAMBDA = 0.1

# shared solver fragments over moment aliases (n sx1 sx2 sy s11 s12
# s22 s1y s2y) — valid in Spark SQL and DuckDB alike
_A22 = f"(s11 + {RIDGE_LAMBDA})"
_A33 = f"(s22 + {RIDGE_LAMBDA})"
_DET = (
    f"(n * ({_A22} * {_A33} - s12 * s12)"
    f" - sx1 * (sx1 * {_A33} - s12 * sx2)"
    f" + sx2 * (sx1 * s12 - {_A22} * sx2))"
)
_D0 = (
    f"(sy * ({_A22} * {_A33} - s12 * s12)"
    f" - sx1 * (s1y * {_A33} - s12 * s2y)"
    f" + sx2 * (s1y * s12 - {_A22} * s2y))"
)
_D1 = (
    f"(n * (s1y * {_A33} - s12 * s2y)"
    f" - sy * (sx1 * {_A33} - s12 * sx2)"
    f" + sx2 * (sx1 * s2y - s1y * sx2))"
)
_D2 = (
    f"(n * ({_A22} * s2y - s1y * s12)"
    f" - sx1 * (sx1 * s2y - s1y * sx2)"
    f" + sy * (sx1 * s12 - {_A22} * sx2))"
)

_MOMENTS_SQL = """
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
         SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
         SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y
  FROM feats
"""


def _ridge_oracle() -> str:
    from drive_bc_datapipeline_spark.plans.registry import r4_sql, r6_sql

    return f"""
WITH feats AS (
  SELECT CAST(hour(ts) AS DOUBLE) AS x1,
         CAST(isodow(ts) AS DOUBLE) AS x2,
         value AS y
  FROM events WHERE value IS NOT NULL
),
m AS ({_MOMENTS_SQL}),
betas AS (
  SELECT n, {_D0} / {_DET} AS b0, {_D1} / {_DET} AS b1,
         {_D2} / {_DET} AS b2
  FROM m
)
SELECT CAST(b.n AS BIGINT) AS n,
       {r6_sql('b.b0')} AS beta0,
       {r6_sql('b.b1')} AS beta_hour,
       {r6_sql('b.b2')} AS beta_dow,
       {r4_sql(
           "SQRT(AVG((f.y - (b.b0 + b.b1 * f.x1 + b.b2 * f.x2))"
           " * (f.y - (b.b0 + b.b1 * f.x1 + b.b2 * f.x2))))"
       )} AS rmse
FROM feats f CROSS JOIN betas b
GROUP BY b.n, b.b0, b.b1, b.b2
"""


@query("ridge_value_model", _ridge_oracle())
def ridge_value_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from drive_bc_datapipeline_spark.plans.registry import r4, r6

    e = t(spark, sf_dir, "events")
    feats = e.filter(F.col("value").isNotNull()).select(
        F.hour("ts").cast("double").alias("x1"),
        (F.expr("weekday(ts)") + 1).cast("double").alias("x2"),
        F.col("value").alias("y"),
    )
    m = feats.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    # the SAME Cramer fragments the oracle runs — one source of truth
    betas = m.selectExpr(
        "n",
        f"{_D0} / {_DET} AS b0",
        f"{_D1} / {_DET} AS b1",
        f"{_D2} / {_DET} AS b2",
    )
    res = F.col("y") - (
        F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2")
    )
    return (
        feats.crossJoin(F.broadcast(betas))
        .groupBy("n", "b0", "b1", "b2")
        .agg(r4(F.sqrt(F.avg(res * res))).alias("rmse"))
        .select(
            F.col("n").cast("bigint").alias("n"),
            r6(F.col("b0")).alias("beta0"),
            r6(F.col("b1")).alias("beta_hour"),
            r6(F.col("b2")).alias("beta_dow"),
            "rmse",
        )
    )
