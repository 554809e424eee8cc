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

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

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
    # Pipeline constituents that are no longer registry keys (their
    # gate slot was ceded under the 200-key cap) still run here — the
    # K7 runner is name-based, so resolve them from this fallback.
    from drive_bc_datapipeline_spark.plans import events as _events_plans

    extra_plans = {
        "counts_by_type_month_year": _events_plans.counts_by_type_month_year,
        "counts_by_day_month_year": _events_plans.counts_by_day_month_year,
        "counts_by_hour": _events_plans.counts_by_hour,
    }
    jobs = jobs if jobs is not None else DEFAULT_JOBS
    unknown = [
        j for j in jobs if j not in registry.QUERIES and j not in extra_plans
    ]
    if unknown:
        raise KeyError(f"unknown queries: {unknown}")

    manifest: dict = {"sf_dir": sf_dir, "jobs": {}}
    for name in jobs:
        t0 = time.time()
        df = (registry.QUERIES.get(name) or extra_plans[name])(spark, sf_dir)
        # Row counts via an Observation attached to the WRITE pass —
        # the metric rides the job that writes the parquet, so the
        # manifest costs zero extra jobs (the previous version
        # re-read every output directory and ran a second count scan
        # per job; at 100 TB that doubles the pipeline's read I/O).
        obs = Observation(f"rows_{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        path = os.path.join(out_dir, name)
        writer = df.write.mode("overwrite")
        parts = PARTITION_BY.get(name, [])
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(path)
        # Manifest columns = the READ-BACK schema (footer-only scan, no
        # data I/O): partitionBy moves partition columns to the end of
        # the on-disk schema, so recording df.columns would disagree
        # with what readers see — and the re-read doubles as a smoke
        # check that the written output is loadable.
        manifest["jobs"][name] = {
            "path": path,
            "rows": obs.get["rows"],
            "columns": spark.read.parquet(path).columns,
            "seconds": round(time.time() - t0, 3),
        }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def run_incremental_events(
    spark: SparkSession,
    source_path: str,
    out_dir: str,
    state_path: str,
) -> dict:
    """Incremental batch ETL with a persisted high-watermark.

    Processes only events with ts strictly beyond the stored watermark,
    appends them date-partitioned, then advances the watermark to the
    max ts seen — re-running against unchanged input is a no-op, so the
    scheduled-batch version of the streaming pipeline (J1) is
    idempotent without a checkpoint store. At 100 TB the ts filter
    prunes to the new date partitions; everything before the watermark
    is never re-read (predicate pushdown on the partition/sort column).
    """
    from pyspark.sql import functions as F

    wm_us = -1
    if os.path.exists(state_path):
        with open(state_path) as f:
            wm_us = json.load(f)["watermark_us"]

    from drive_bc_datapipeline_spark.tables import read_events

    raw = read_events(spark, source_path)
    fresh = raw.filter(F.unix_micros("ts") > wm_us).dropna(
        subset=["event_id", "ts"]
    )
    batch = fresh.withColumn("event_date", F.to_date("ts")).withColumn(
        "hour", F.hour("ts").cast("int")
    )
    n = batch.count()
    if n > 0:
        batch.write.mode("append").partitionBy("event_date").parquet(out_dir)
        new_wm = batch.agg(F.max(F.unix_micros("ts"))).first()[0]
        with open(state_path, "w") as f:
            json.dump({"watermark_us": int(new_wm)}, f)
    return {"processed": n, "watermark_us": wm_us}


def run_incremental_rollup(
    spark: SparkSession,
    source_path: str,
    rollup_dir: str,
    state_path: str,
) -> dict:
    """K16: incremental aggregate maintenance — a (event_type, day)
    rollup table kept current from the high-watermark ETL WITHOUT
    recomputing history.

    Each run aggregates only rows beyond the stored watermark into
    day-partial sums, then MERGES them into the rollup via the K13
    upsert: existing (type, day) rows are replaced by old ⊕ delta
    (sum/count are mergeable, avg is re-derived at read), new days
    insert, and untouched day partitions are never rewritten (dynamic
    partition overwrite). Re-running with no new data is a no-op.

    This is incremental materialized-view maintenance in raw Spark:
    at 100 TB the daily refresh costs O(new data + touched rollup
    partitions), not O(history). Non-mergeable aggregates (distinct,
    exact quantiles) need sketch state instead — see hll_weekly_rollup
    (B25) / bitmap_distinct_users (B26) for the mergeable forms.
    """
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.sources.io import upsert_partitioned
    from drive_bc_datapipeline_spark.tables import read_events

    wm_us = -1
    if os.path.exists(state_path):
        with open(state_path) as f:
            wm_us = json.load(f)["watermark_us"]

    raw = read_events(spark, source_path)
    fresh = raw.filter(F.unix_micros("ts") > wm_us).dropna(
        subset=["event_id", "ts"]
    )
    delta = fresh.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    if delta.isEmpty():
        return {"merged_rows": 0, "watermark_us": wm_us}

    if os.path.exists(rollup_dir):
        # the stored table carries the upsert's __ver ordering column;
        # it is dead weight for the merge arithmetic
        old = spark.read.parquet(rollup_dir).drop("__ver")
        touched = delta.select("event_type", "day")
        # old ⊕ delta on touched keys only; upsert replaces those rows
        merged = (
            old.join(F.broadcast(touched), ["event_type", "day"], "left_semi")
            .unionByName(delta)
            .groupBy("event_type", "day")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
    else:
        merged = delta
    merged = merged.withColumn("__ver", F.lit(1))
    stats = upsert_partitioned(
        spark,
        rollup_dir,
        merged,
        keys=["event_type", "day"],
        order_col="__ver",
        partition_col="day",
    )
    new_wm = fresh.agg(F.max(F.unix_micros("ts"))).first()[0]
    with open(state_path, "w") as f:
        json.dump({"watermark_us": int(new_wm)}, f)
    return {"merged_rows": stats["rows_written"], "watermark_us": int(new_wm)}


def run_curation_pipeline(
    spark: SparkSession,
    docs,
    seeds,
    target,
    out_dir: str,
    *,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    n_buckets: int = 4096,
    n_rounds: int = 30,
    lr: float = 0.5,
    min_precision: float = 0.9,
    curve_bins: int = 1000,
    dsir_buckets: int = 4096,
    seed: int = 0,
    n_shards: int = 16,
) -> dict:
    """The full curation recipe as ONE runnable job (the K7 runner's
    operational sibling for the E9/E10/E7 + H47 + L13 chain the
    composition test pins): train the quality gate on ``seeds``
    (labeled), pick the highest-recall threshold meeting
    ``min_precision`` from the seed PR curve, score + filter
    ``docs``, fit DSIR against ``target``, draw ``k`` docs without
    replacement ∝ softmax(log importance), assign the reproducible
    L13 shard/order, and write ``out_dir/selected/`` partitioned by
    shard with a manifest JSON.

    Everything downstream of the driver-sized model state streams
    plan→writer (nothing corpus-scale is collected); the manifest
    carries the decisions (threshold, counts, seed) so a rerun is
    auditable — and byte-identical apart from timings, which the
    test pins.
    """
    from drive_bc_datapipeline_spark.operators.classifier import (
        classifier_pr_curve,
        score_hashed_linear,
        train_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.dsir import (
        dsir_bucket_counts,
        dsir_importance_weights,
        dsir_log_ratio,
        dsir_resample,
    )
    from drive_bc_datapipeline_spark.operators.sampling import (
        seeded_shuffle,
    )

    t0 = time.time()
    w, b = train_hashed_linear(
        spark,
        seeds,
        label_col=label_col,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        n_rounds=n_rounds,
        lr=lr,
    )
    seed_scored = score_hashed_linear(
        spark, seeds, w, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, bias=b,
    ).join(seeds.select(id_col, label_col), id_col)
    curve = classifier_pr_curve(
        seed_scored, label_col=label_col, n_bins=curve_bins
    ).collect()
    eligible = [r for r in curve if r["precision"] >= min_precision]
    if not eligible:
        best = max(r["precision"] for r in curve)
        raise ValueError(
            f"no threshold reaches precision {min_precision} on the "
            f"seed set (best {best:.3f}): the gate is not usable — "
            "train longer, add seeds, or lower min_precision"
        )
    threshold = min(r["threshold"] for r in eligible)

    scored = score_hashed_linear(
        spark, docs, w, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, bias=b,
    )
    kept_ids = scored.filter(F.col("score") >= threshold).select(id_col)
    kept = docs.join(kept_ids, id_col)

    table, default = dsir_log_ratio(
        dsir_bucket_counts(target, text_col=text_col, n_buckets=dsir_buckets),
        dsir_bucket_counts(kept, text_col=text_col, n_buckets=dsir_buckets),
        n_buckets=dsir_buckets,
    )
    weights = dsir_importance_weights(
        spark, kept, table, default,
        text_col=text_col, id_col=id_col, n_buckets=dsir_buckets,
    )
    sample = dsir_resample(weights, k, id_col=id_col, seed=seed)

    selected = seeded_shuffle(
        docs.join(sample.select(id_col), id_col),
        id_col,
        seed=seed,
        n_shards=n_shards,
    )
    out_path = os.path.join(out_dir, "selected")
    obs = Observation("rows_selected")
    (
        selected.observe(obs, F.count(F.lit(1)).alias("rows"))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_path)
    )
    manifest = {
        "n_docs": docs.count(),
        "n_kept": kept_ids.count(),
        "n_selected": obs.get["rows"],
        "threshold": threshold,
        "min_precision": min_precision,
        "k": k,
        "seed": seed,
        "n_shards": n_shards,
        "n_buckets": n_buckets,
        "dsir_buckets": dsir_buckets,
        "path": out_path,
        "seconds": round(time.time() - t0, 3),
    }
    with open(os.path.join(out_dir, "curation_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
