"""Tests for the generic as-of join operator: checked against a naive
O(L*R) reference implementation on a small frame with duplicate
timestamps, missing keys, and both directions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from drive_bc_datapipeline_spark.operators.asof import asof_join


def ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=ts(10), l_val=1),
            Row(k="a", ts=ts(20), l_val=2),
            Row(k="a", ts=ts(5), l_val=3),
            Row(k="b", ts=ts(15), l_val=4),
            Row(k="c", ts=ts(30), l_val=5),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=ts(8), r_val=100.0),
            Row(k="a", ts=ts(10), r_val=200.0),  # equal-ts: inclusive match
            Row(k="a", ts=ts(19), r_val=300.0),
            Row(k="b", ts=ts(40), r_val=400.0),  # only AFTER left's row
        ]
    )
    return left, right


def naive(left_rows, right_rows, direction):
    out = {}
    for lr in left_rows:
        cands = [
            rr
            for rr in right_rows
            if rr.k == lr.k
            and (rr.ts <= lr.ts if direction == "backward" else rr.ts >= lr.ts)
        ]
        if direction == "backward":
            best = max(cands, key=lambda r: r.ts, default=None)
        else:
            best = min(cands, key=lambda r: r.ts, default=None)
        out[(lr.k, lr.ts)] = (best.ts, best.r_val) if best else (None, None)
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_naive(spark, frames, direction):
    left, right = frames
    got = {
        (r.k, r.ts): (r.ts_r, r.r_val_r)
        for r in asof_join(left, right, "k", direction=direction).collect()
    }
    want = naive(left.collect(), right.collect(), direction)
    assert got == want


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    got = {
        (r.k, r.ts): r.r_val_r
        for r in asof_join(
            left, right, "k", tolerance_seconds=120.0
        ).collect()
    }
    # a@10 matches right@10 (0s gap); a@20 matches right@19 (60s);
    # a@5 has no prior; b@15's only candidate is in the future
    assert got[("a", ts(10))] == 200.0
    assert got[("a", ts(20))] == 300.0
    assert got[("a", ts(5))] is None
    assert got[("b", ts(15))] is None
    # but a@20's match to right@8 would be 720s — verify tolerance bites
    tight = {
        (r.k, r.ts): r.r_val_r
        for r in asof_join(left, right, "k", tolerance_seconds=30.0).collect()
    }
    assert tight[("a", ts(20))] is None  # 60s gap > 30s tolerance
    assert tight[("a", ts(10))] == 200.0


def test_asof_rejects_bad_direction(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, "k", direction="nearest")


def test_asof_query_consistency(spark):
    """The registered asof query (C7) agrees with the generic operator."""
    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.plans.registry import QUERIES

    registry.load_all_plans()
    sf = "/root/testdata/sf0.001"
    via_query = {
        (r.event_id): r.last_click_ts
        for r in QUERIES["asof_join_orders_events"](spark, sf).collect()
    }
    e = registry.t(spark, sf, "events")
    import pyspark.sql.functions as F

    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    via_op = {
        r.event_id: r.ts_r
        for r in asof_join(purchases, clicks, "user_id").collect()
    }
    assert via_query == via_op
