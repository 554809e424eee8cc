"""End-to-end batch pipeline runner (reference parity: the EMR job
flow etl.py → simple-analyses.py → parquet outputs, as one composable
entry point).

``run_pipeline`` executes a named subset of the registered queries and
writes each result as parquet under ``out_dir/<name>/``, with optional
partition columns for the big outputs so downstream readers prune.
A manifest JSON records row counts and schemas — the batch-job audit
trail the reference kept as stdout logs.

Scale notes: results stream straight from each query's plan into the
parquet writer — nothing is collected; each output directory is an
independent job so a failure resumes per-query (rerun overwrites
atomically via overwrite mode).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from drive_bc_datapipeline_spark.plans import registry

# Sensible partition layout for the outputs big enough to care.
PARTITION_BY: dict[str, list[str]] = {
    "etl_events_clean": ["year", "month"],
    "sessionize_events": [],
    "counts_by_type_month_year": ["year"],
}

DEFAULT_JOBS = [
    "etl_events_clean",
    "counts_by_type",
    "counts_by_type_month_year",
    "counts_by_day_month_year",
    "counts_by_hour",
    "top_users_by_events",
    "hourly_timeseries",
    "event_value_stats",
]


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    jobs: list[str] | None = None,
) -> dict:
    """Run `jobs` (default: the reference's ETL+analytics set) and
    write each result to ``out_dir/<name>/``. Returns the manifest."""
    registry.load_all_plans()
    jobs = jobs if jobs is not None else DEFAULT_JOBS
    unknown = [j for j in jobs if j not in registry.QUERIES]
    if unknown:
        raise KeyError(f"unknown queries: {unknown}")

    manifest: dict = {"sf_dir": sf_dir, "jobs": {}}
    for name in jobs:
        t0 = time.time()
        df = registry.QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, name)
        writer = df.write.mode("overwrite")
        parts = PARTITION_BY.get(name, [])
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(path)
        written = spark.read.parquet(path)
        manifest["jobs"][name] = {
            "path": path,
            "rows": written.count(),
            "columns": written.columns,
            "seconds": round(time.time() - t0, 3),
        }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
