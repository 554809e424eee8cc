#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "bench_total", "value": <sum-sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is fully materialized through the ``noop`` sink (no driver
collect, no disk write — pure execution time).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    # core OLAP
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_exists",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_idle_customers",
    "window_rank_customers",
    "rollup_orders",
    # events ETL + analytics
    "etl_events_clean",
    "hourly_timeseries",
    "sessionize_events",
    "session_window_stats",
    "asof_join_orders_events",
    "pivot_type_by_hour",
    "cube_type_hourbucket",
    "sliding_hourly_counts",
    "cohort_retention",
    "funnel_signup_click_purchase",
    "range_join_clicks_near_errors",
    # LLM-pipeline: dedup + text
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_quality_score",
    "token_count",
    # similarity search
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    # geo + ml features
    "geo_grid_cluster",
    "ml_duration_features",
    # round-4 additions (keep totals comparable: r1-r3 ran the 37 keys
    # above; subtract the keys below when comparing across rounds)
    "dedup_keep_canonical",
    "term_relevance_topk",
    "embedding_quantize_int8",
    "ann_recall_at_k",
    "q9_profit_by_nation",
    "q13_custdist",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    # round-5 additions (r4 totals cover the keys above this line)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_promotable_parts",
    "q21_waiting_supplier",
    "top_bigrams_corpus",
    "quality_filter_funnel",
    "cross_source_content_overlap",
    "embedding_label_centroids",
    "hll_weekly_rollup",
    "bitmap_distinct_users",
    "etl_variant_extract",
    "semantic_dedup_canonical",
    "text_feature_hashing",
    "user_activity_streaks",
    "geo_bbox_contains",
    "shard_packing",
]
# Round-6 onward: every registered key not named above is benched too
# (appended sorted at runtime in main()) — a query the bench can't see
# is a perf regression the driver can't see. The explicit list above
# preserves cross-round comparability of the historical subsets; the
# r5-comparable total is the sum over the first 62 names.


def needs_retry(current: float, prior: float | None) -> bool:
    """Contention-defense trigger: retry a key whose min-of-two-steady
    time exceeds 2x its previous round's retained value plus a 0.25s
    absolute slack (so sub-100ms keys never retry on scheduler jitter).
    Keys with no prior (debuts, sf change) never retry — there is
    nothing to defend against."""
    return prior is not None and current > 2.0 * prior + 0.25


def artifact_path(full_path: str, sf: float) -> str:
    """Where this run's full per-query payload is written: the TRACKED
    BENCH_full.json only at the canonical sf=0.1 (r12 verdict Next
    #6); any other SF goes to an untracked BENCH_smoke_<sf>.json so a
    contract smoke at sf0.001 can't clobber the sf0.1 record (and its
    retry priors) in the working tree."""
    if abs(sf - 0.1) < 1e-9:
        return full_path
    return os.path.join(
        os.path.dirname(full_path), f"BENCH_smoke_{sf}.json"
    )


def load_prior_queries(full_path: str, sf: float) -> dict[str, float]:
    """Per-query retry priors from the tracked BENCH_full.json of a
    previous run, empty when absent/unreadable or recorded at a
    different SF. Prefers the ``retry_priors`` map (the running MIN
    across rounds — see main()); falls back to the measured
    ``queries`` map for files written before r10."""
    try:
        with open(full_path) as fh:
            prior = json.load(fh)
        if abs(float(prior.get("sf", -1.0)) - sf) < 1e-9:
            src = prior.get("retry_priors") or prior.get("queries", {})
            return {k: float(v) for k, v in src.items()}
    except (OSError, ValueError):
        pass
    return {}


def apply_prior_refresh(
    prior_q: dict[str, float], names: list[str], spec: str
) -> tuple[dict[str, float], list[str]]:
    """Drop re-baselined keys from the prior map (r10 ADVICE): ``spec``
    is a comma-separated key list (or ``all``) from
    ``$SPARK_GRAFT_REFRESH_PRIORS``. A dropped key skips the retry this
    run and its written prior becomes this run's measured value —
    the explicit reset path for keys an ACCEPTED replan made slower,
    which would otherwise retry on every future invocation forever.
    Returns (filtered priors, unknown keys for the caller to warn on).
    """
    refresh = (
        set(names)
        if spec.strip().lower() == "all"
        else {k.strip() for k in spec.split(",") if k.strip()}
    )
    kept = {k: v for k, v in prior_q.items() if k not in refresh}
    return kept, sorted(refresh - set(names))


def main() -> None:
    load_start = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark

    registry.load_all_plans()
    names = HEADLINE + sorted(set(registry.QUERIES) - set(HEADLINE))
    spark = get_spark("bench")

    # Warm the JVM + parquet footers with one cheap action (not timed).
    registry.t(spark, sf_dir, "lineitem").count()
    # Pre-fork the reusable Python workers so the first Pandas-UDF query
    # doesn't pay worker spawn + Arrow import (~5s across 32 threads).
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # Pass 1 pays codegen/janino compile and JIT (reported as cold_value
    # for transparency); passes 2-3 are steady state, and the per-query
    # MIN of the two is reported — this box shares hardware and a single
    # noisy pass otherwise dominates the total.
    cold: dict[str, float] = {}
    steady1: dict[str, float] = {}
    steady2: dict[str, float] = {}
    for pass_timings in (cold, steady1, steady2):
        for name in names:
            fn = registry.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            pass_timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()  # plans re-run their own .cache() fills
    timings = {n: min(steady1[n], steady2[n]) for n in names}

    # Contention defense (r8 verdict): this box shares hardware, and one
    # externally-loaded window can inflate BOTH steady passes (r8's
    # artifact showed dedup_embedding_cosine at 9.8s where three clean
    # re-runs measured 0.8s). Any key whose min-steady exceeds 2x its
    # previous round's retained value (from the tracked BENCH_full.json)
    # gets ONE more run and keeps the min — a regression must now
    # reproduce in a later window to survive into the artifact. The
    # +0.25s absolute slack keeps sub-100ms keys from retrying on
    # scheduler jitter.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"
    )
    prior_q = load_prior_queries(full_path, sf)
    # Prior-refresh escape hatch (r10 ADVICE): a key made DELIBERATELY
    # slower by an accepted replan would otherwise trip the 2x trigger
    # and pay an extra timed run on every future invocation (the
    # min-retained prior never rises). Run once with
    #   SPARK_GRAFT_REFRESH_PRIORS=key1,key2   (or =all)
    # on an idle box to re-baseline those keys' priors to THIS run's
    # measured value; they skip the retry this run (there is no honest
    # floor to defend) and the written retry_priors carries the fresh
    # baseline. Use only for accepted slowdowns, never to quiet noise.
    prior_q, unknown_refresh = apply_prior_refresh(
        prior_q, names, os.environ.get("SPARK_GRAFT_REFRESH_PRIORS", "")
    )
    if unknown_refresh:
        print(
            f"  WARNING: SPARK_GRAFT_REFRESH_PRIORS names unknown keys: "
            f"{unknown_refresh}",
            file=sys.stderr,
        )
    retried: dict[str, float] = {}
    for name in names:
        if needs_retry(timings[name], prior_q.get(name)):
            fn = registry.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            retried[name] = round(time.time() - t0, 3)
            timings[name] = min(timings[name], retried[name])
    if retried:
        spark.catalog.clearCache()

    # Retry priors retain the running MIN across rounds (r9 verdict):
    # a contended run can inflate the MEASURED map (kept honest below)
    # but must never desensitize the 2x trigger — min(new, prior) means
    # thresholds only tighten. A key made structurally slower by a
    # deliberate replan will retry once per run (visible as a standing
    # n_retried entry) rather than silently raising its own bar.
    retry_priors = {
        n: round(min(timings[n], prior_q[n]), 3) if n in prior_q
        else timings[n]
        for n in names
    }

    for name in names:
        print(f"  {name}: {timings[name]}s (cold {cold[name]}s)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Context for reading the numbers: this box shares hardware and
    # single-pass timings swing 2-3x under external load; the 1-minute
    # load average at start and end lets a reader discount a noisy run.
    #
    # Key order is deliberate: the driver archives only the TAIL of
    # long artifacts, and with 186 queries the per-query map overflowed
    # the r6 window and truncated away `value`. The big map now leads
    # and every headline number trails it, so a tail-truncated artifact
    # still carries the totals and the slowest-query digest. The map
    # itself is sorted FASTEST-first (r7 verdict: only ~57/200 entries
    # survived tail truncation, and alphabetical order made the
    # surviving suffix arbitrary) — with truncation eating the head,
    # the slowest, most informative keys sit at the surviving tail,
    # adjacent to slowest_10 and the totals.
    payload = {
        # retry_priors leads: it's consumed from the TRACKED file only
        # (never truncated), so it must not push the headline numbers
        # out of the stdout artifact's surviving tail.
        "retry_priors": dict(sorted(retry_priors.items())),
        "queries": dict(sorted(timings.items(), key=lambda kv: kv[1])),
        "slowest_10": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        ),
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "cold_value": round(sum(cold.values()), 3),
        "r5_comparable_value": round(
            sum(timings[n] for n in HEADLINE[:62]), 3
        ),
        "sf": sf,
        "n_queries": len(names),
        "n_retried": len(retried),
        "retried": dict(sorted(retried.items())),
        "load_avg_start": load_start,
        "load_avg_end": round(os.getloadavg()[0], 2),
    }
    # The FULL per-query map goes to a tracked file BEFORE stdout: the
    # driver archives only the tail of long artifacts (~145/200 map
    # entries were lost to truncation in r7/r8), so cross-round
    # per-query comparison — and the retry reference above — lives in
    # git history instead of depending on what survives truncation.
    out_path = artifact_path(full_path, sf)
    try:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=False)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the totals
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
