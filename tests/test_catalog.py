"""Catalog serving layer: DDL roundtrip + partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans.catalog import (
    CATALOG_TABLE,
    catalog_table_roundtrip,
)
from drive_bc_datapipeline_spark.plans.registry import t
from tests.conftest import SF_SMOKE


def test_catalog_roundtrip_counts(spark):
    out = catalog_table_roundtrip(spark, SF_SMOKE).collect()
    src = t(spark, SF_SMOKE, "events")
    expected = {
        r.event_type: r.n
        for r in src.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r.event_type: r.n_events for r in out}
    assert got == expected and len(got) == 2


def test_catalog_partition_pruning(spark):
    catalog_table_roundtrip(spark, SF_SMOKE)  # ensures the table exists
    pruned = spark.table(CATALOG_TABLE).filter(
        F.col("event_type").isin("click", "purchase")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the partition-value predicate must land INSIDE the
    # PartitionFilters brackets (plan-time directory prune) — matching
    # the whole line would pass vacuously, since the scan line also
    # carries event_type in its output column list
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*event_type", plan), plan


def test_catalog_schema_preserved(spark):
    catalog_table_roundtrip(spark, SF_SMOKE)
    src = t(spark, SF_SMOKE, "events")
    cat = spark.table(CATALOG_TABLE)
    # partitionBy moves the partition column to the end; the SET of
    # (name, type) pairs must survive the roundtrip
    assert {(f.name, f.dataType) for f in cat.schema.fields} == {
        (f.name, f.dataType) for f in src.schema.fields
    }
    assert cat.count() == src.count()


def test_bucketed_gate_join_has_no_exchange(spark):
    """The bucketed fact-fact join must plan with ZERO Exchange: the
    bucket layout IS the shuffle, paid once at write time."""
    from drive_bc_datapipeline_spark.plans.catalog import (
        BUCKETED_TABLES,
        _write_gate_buckets,
    )

    _write_gate_buckets(spark, SF_SMOKE)
    lb = spark.table(BUCKETED_TABLES[0])
    ob = spark.table(BUCKETED_TABLES[1])
    # at test SF the planner (correctly) prefers a broadcast and skips
    # bucketing; force the sort-merge path the contract is about
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucket_write_memoized_per_sf(spark, monkeypatch):
    """Bucketing is write-once-join-many: within a session the gate
    tables are written once per sf_dir; switching sf_dir invalidates
    (the shared table names now hold other data) and rewrites."""
    from drive_bc_datapipeline_spark.operators import joins as J
    from drive_bc_datapipeline_spark.plans import catalog as C

    calls = []
    real = J.write_bucketed
    monkeypatch.setattr(
        J, "write_bucketed",
        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1],
    )
    C._GATE_BUCKETS_WRITTEN.clear()
    C._write_gate_buckets(spark, SF_SMOKE)
    assert len(calls) == 2  # both tables written
    C._write_gate_buckets(spark, SF_SMOKE)
    assert len(calls) == 2  # memo hit: no rewrite
    C._write_gate_buckets(spark, "/root/testdata/sf0.01")
    assert len(calls) == 4  # sf switch: rewritten
    C._write_gate_buckets(spark, SF_SMOKE)
    assert len(calls) == 6  # stale entry was dropped: rewritten again
