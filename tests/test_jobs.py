"""End-to-end pipeline runner test: the reference's ETL → analyses →
parquet-outputs flow in one call, outputs re-readable and partitioned."""

from __future__ import annotations

import json
import os

import pytest

from drive_bc_datapipeline_spark.jobs import run_pipeline

SF = "/root/testdata/sf0.001"


def test_run_pipeline_writes_all_outputs(spark, tmp_path):
    out = str(tmp_path / "out")
    manifest = run_pipeline(spark, SF, out)
    assert set(manifest["jobs"]) == {
        "etl_events_clean",
        "counts_by_type",
        "counts_by_type_month_year",
        "counts_by_day_month_year",
        "counts_by_hour",
        "top_users_by_events",
        "hourly_timeseries",
        "event_value_stats",
    }
    # every output is non-empty, re-readable parquet
    for name, info in manifest["jobs"].items():
        assert info["rows"] > 0, name
        assert spark.read.parquet(info["path"]).count() == info["rows"]
    # the big ETL output is partitioned for pruning
    etl_dir = os.path.join(out, "etl_events_clean")
    assert any(d.startswith("year=") for d in os.listdir(etl_dir))
    # manifest persisted
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk["jobs"].keys() == manifest["jobs"].keys()


def test_run_pipeline_rejects_unknown_job(spark, tmp_path):
    with pytest.raises(KeyError):
        run_pipeline(spark, SF, str(tmp_path / "x"), jobs=["nope"])


def test_run_pipeline_subset_and_rerun_overwrites(spark, tmp_path):
    out = str(tmp_path / "out2")
    m1 = run_pipeline(spark, SF, out, jobs=["counts_by_type"])
    m2 = run_pipeline(spark, SF, out, jobs=["counts_by_type"])
    assert m1["jobs"]["counts_by_type"]["rows"] == m2["jobs"]["counts_by_type"]["rows"]


def test_incremental_etl_is_idempotent(spark, tmp_path):
    from drive_bc_datapipeline_spark.jobs import run_incremental_events

    src = f"{SF}/events.parquet"
    out = str(tmp_path / "inc_out")
    state = str(tmp_path / "state.json")

    r1 = run_incremental_events(spark, src, out, state)
    assert r1["processed"] > 0
    n_after_first = spark.read.parquet(out).count()
    assert n_after_first == r1["processed"]

    # unchanged input → nothing reprocessed, nothing duplicated
    r2 = run_incremental_events(spark, src, out, state)
    assert r2["processed"] == 0
    assert spark.read.parquet(out).count() == n_after_first
    # date-partitioned layout for pruning
    import os as _os

    assert any(d.startswith("event_date=") for d in _os.listdir(out))


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    """K16: watermark-incremental (type, day) rollup == full groupBy
    after every refresh; refresh with no new data is a no-op."""
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.jobs import run_incremental_rollup
    from drive_bc_datapipeline_spark.tables import read_events

    full = read_events(spark, f"{SF}/events.parquet").dropna(
        subset=["event_id", "ts"]
    )
    ts_cut = full.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)")
    ).first()[0]

    src1 = str(tmp_path / "src1")
    full.filter(F.unix_micros("ts") <= ts_cut).write.parquet(src1)
    rollup = str(tmp_path / "rollup")
    state = str(tmp_path / "wm.json")

    r1 = run_incremental_rollup(spark, src1, rollup, state)
    assert r1["merged_rows"] > 0

    def expected(df):
        return {
            (r["event_type"], r["day"]): (r["n"], round(r["s"] or 0.0, 6))
            for r in df.groupBy(
                "event_type", F.to_date("ts").cast("string").alias("day")
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }

    def got():
        # partition-column type inference reads the string day back as
        # DATE — normalize for comparison
        return {
            (r["event_type"], str(r["day"])): (
                r["n_events"],
                round(r["sum_value"] or 0.0, 6),
            )
            for r in spark.read.parquet(rollup).collect()
        }

    assert got() == expected(full.filter(F.unix_micros("ts") <= ts_cut))

    # second batch: the full dataset lands in the same source dir
    src2 = str(tmp_path / "src2")
    full.write.parquet(src2)
    r2 = run_incremental_rollup(spark, src2, rollup, state)
    assert r2["merged_rows"] > 0
    assert got() == expected(full)

    # idempotent: nothing new → no-op
    r3 = run_incremental_rollup(spark, src2, rollup, state)
    assert r3["merged_rows"] == 0
    assert got() == expected(full)
