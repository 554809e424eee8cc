"""Approximate-aggregate tests: sketches have no SQL oracle, so bound
their error against exact computations instead (SURVEY B11, C8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans import registry
from drive_bc_datapipeline_spark.plans.registry import QUERIES

registry.load_all_plans()

SF = "/root/testdata/sf0.01"


def test_approx_quantiles_close_to_exact(spark):
    approx = {
        r.event_type: r.q_approx
        for r in QUERIES["approx_value_quantiles"](spark, SF).collect()
    }
    e = registry.t(spark, SF, "events")
    stats = {
        r.event_type: (r.lo, r.hi)
        for r in e.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    exact = {
        r.event_type: r.q
        for r in e.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.25, 0.5, 0.9, 0.99))").alias("q"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for etype, qs in approx.items():
        lo, hi = stats[etype]
        span = hi - lo
        for a, x in zip(qs, exact[etype]):
            assert abs(a - x) <= 0.02 * span, (etype, a, x)


def test_approx_distinct_users_close_to_exact(spark):
    approx = {
        r.event_type: r.n_users_approx
        for r in QUERIES["approx_distinct_users"](spark, SF).collect()
    }
    exact = {
        r.event_type: r.n
        for r in registry.t(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for etype in exact:
        rel_err = abs(approx[etype] - exact[etype]) / max(exact[etype], 1)
        assert rel_err < 0.1, (etype, approx[etype], exact[etype])
