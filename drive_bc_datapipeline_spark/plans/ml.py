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


# --------------------------------------------------------------------------
# E6 driver gate — exact distributed ROC-AUC via the Mann-Whitney
# rank-sum identity with midrank ties (sklearn.roc_auc_score
# semantics), promoted from tests-only in round 9 (the registry slot
# ceded by the counts_by_day_month_year near-twin). Label: the event
# is a purchase; score: value. Same algebra as operators/ml.py's
# auc_rank_sum, but the AUC lands as a COLUMN on a 1-row frame — no
# driver round-trip beyond L4's |partitions|-row offsets collect.
#
# Cross-engine exactness: rank_mid = below + (1 + m)/2 is always an
# exact multiple of 0.5 (below/m are integers), so SUM(pos * rank_mid)
# is exact in doubles below 2^53 on both engines regardless of
# summation order; the single final division is then deterministic and
# r6's epsilon-nudged rounding absorbs nothing but true half-boundary
# noise.
#
# 100 TB: one hash aggregate on score value (map-side combined), the
# L4 two-phase prefix scan over the |distinct scores| frame (bounded
# for quantized model outputs; at worst the same shuffle any exact
# global rank pays), one 1-row aggregate. The fact table is scanned
# ONCE; nothing sorts globally in a single task.
# --------------------------------------------------------------------------


def _auc_oracle() -> str:
    from drive_bc_datapipeline_spark.plans.registry import r6_sql

    return f"""
WITH per AS (
  SELECT value AS s,
         COUNT(*) AS m,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events
  WHERE value IS NOT NULL
  GROUP BY value
),
ranked AS (
  SELECT pos, m,
         COALESCE(SUM(m) OVER (ORDER BY s
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)
           + (1.0 + m) / 2.0 AS rank_mid
  FROM per
)
SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(m - pos) AS BIGINT) AS n_neg,
       {r6_sql(
           "(SUM(pos * rank_mid)"
           " - CAST(SUM(pos) AS DOUBLE) * (SUM(pos) + 1) / 2.0)"
           " / (CAST(SUM(pos) AS DOUBLE) * SUM(m - pos))"
       )} AS auc
FROM ranked
"""


@query("exact_auc_purchase", _auc_oracle())
def exact_auc_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from drive_bc_datapipeline_spark.operators.prefix import (
        exclusive_prefix_sum,
    )
    from drive_bc_datapipeline_spark.plans.registry import r6

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = e.groupBy(F.col("value").alias("s")).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("pos"),
    )
    ranked = exclusive_prefix_sum(per, "s", "m", out_col="below").withColumn(
        "rank_mid", F.col("below") + (F.lit(1.0) + F.col("m")) / 2.0
    )
    npos = F.sum("pos")
    nneg = F.sum(F.col("m") - F.col("pos"))
    return ranked.agg(
        npos.cast("bigint").alias("n_pos"),
        nneg.cast("bigint").alias("n_neg"),
        r6(
            (
                F.sum(F.col("pos") * F.col("rank_mid"))
                - npos.cast("double") * (npos + 1) / 2.0
            )
            / (npos.cast("double") * nneg)
        ).alias("auc"),
    )


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
