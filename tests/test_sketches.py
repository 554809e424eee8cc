"""Approximate-aggregate tests (SURVEY B11, C8): both sketch queries
now emit exact values plus a Spark-side `sketch_ok` error-bound flag
(the driver oracle asserts the same shape); these tests pin the flag
AND independently re-derive the bound so a loosened query can't
self-certify."""

from __future__ import annotations

from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans import registry
from drive_bc_datapipeline_spark.plans.registry import QUERIES

registry.load_all_plans()

SF = "/root/testdata/sf0.01"


def test_approx_quantiles_close_to_exact(spark):
    rows = QUERIES["approx_value_quantiles"](spark, SF).collect()
    assert rows, "no groups returned"
    assert all(r.sketch_ok == 1 for r in rows), [
        (r.event_type, r.sketch_ok) for r in rows
    ]
    # independent re-derivation: exact percentile vs raw sketch
    e = registry.t(spark, SF, "events")
    check = (
        e.groupBy("event_type")
        .agg(
            F.expr("percentile(value, array(0.25, 0.5, 0.9, 0.99))").alias("qx"),
            F.percentile_approx("value", [0.25, 0.5, 0.9, 0.99], 10_000).alias(
                "qa"
            ),
            (F.max("value") - F.min("value")).alias("span"),
        )
        .collect()
    )
    assert {r.event_type for r in check} == {r.event_type for r in rows}
    for r in check:
        for a, x in zip(r.qa, r.qx):
            assert abs(a - x) <= 0.02 * r.span, (r.event_type, a, x, r.span)


def test_approx_distinct_users_close_to_exact(spark):
    rows = QUERIES["approx_distinct_users"](spark, SF).collect()
    assert rows, "no groups returned"
    assert all(r.sketch_ok == 1 for r in rows), [
        (r.event_type, r.sketch_ok) for r in rows
    ]
    e = registry.t(spark, SF, "events")
    check = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("na"),
        )
        .collect()
    )
    exact = {r.event_type: r.n for r in check}
    assert exact == {r.event_type: r.n_users for r in rows}
    for r in check:
        rel_err = abs(r.na - r.n) / max(r.n, 1)
        assert rel_err < 0.1, (r.event_type, r.na, r.n)
