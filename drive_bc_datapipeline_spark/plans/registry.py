"""Named-query registry: the single source of truth for the engine's
query surface.

Every capability row in SURVEY.md §2 registers here as
``(name, spark_fn, oracle_sql)``; ``__spark_entry__.py`` re-exports it
for the driver. Oracle SQL is ANSI DuckDB-runnable against the same
parquet tables (pre-registered views).

Cross-engine determinism rules (so the driver's order-insensitive
value-hash matches):
- alias every computed column identically on both sides;
- round double aggregates (``round(x, 2)`` money, ``round(x, 4)``
  ratios/averages) — both engines round half-away-from-zero for
  positive doubles;
- cast calendar parts (year/month/day/hour) to INT on both sides;
- make every top-k / rank deterministic with an explicit key tiebreak.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# Driver-gate ordering.
#
# The round driver's CORRECTNESS gate checks only the FIRST 50 keys of
# ``queries()`` in dict order. Registration order alone left slots
# 51-76 (all TPC-H, geo, ML, B18-B20, multimodal) without a driver
# correctness row for two rounds. GATE_PRIORITY pins the window
# explicitly: never-driver-verified keys first, then the sketch queries
# that just gained error-bounded oracles, then a representative keeper
# set; everything else (green in rounds 1-2) follows after slot 50.
# Keys listed here but not (yet) registered are ignored; registered
# keys not listed keep their registration order after the listed ones.
# ---------------------------------------------------------------------------

GATE_PRIORITY: list[str] = [
    # -- never driver-verified through round 2 (registry slots 51-76) --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_rank_customers",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_idle_customers",
    "q8_market_share",
    "geo_grid_cluster",
    "haversine_distance_buckets",
    "linestring_centroid",
    "ml_duration_features",
    "user_event_sequences",
    "event_type_transitions",
    "user_latest_snapshot",
    "multimodal_bytes_meta",
    "multimodal_image_stub",
    "multimodal_resize_stub",
    "multimodal_frame_sample_stub",
    "multimodal_audio_features_stub",
    # -- sketches: formerly err:no_oracle, now error-bounded oracles --
    "approx_value_quantiles",
    "approx_distinct_users",
    # -- new this round --
    "catalog_table_roundtrip",
    # -- keepers: high-value queries re-verified every round (also the
    #    ones whose code this round touches) --
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_connected_components",
    "decontaminate_eval",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "asof_join_orders_events",
    "range_join_clicks_near_errors",
    "etl_events_clean",
    "sessionize_events",
    "rollup_orders",
    "cube_type_hourbucket",
    "cohort_retention",
    "funnel_signup_click_purchase",
    "sliding_hourly_counts",
    "session_window_stats",
]


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES re-keyed so GATE_PRIORITY occupies the first slots."""
    out = {k: QUERIES[k] for k in GATE_PRIORITY if k in QUERIES}
    out.update((k, v) for k, v in QUERIES.items() if k not in out)
    return out

# ---------------------------------------------------------------------------
# Cross-engine safe rounding.
#
# Aggregates of decimal-grid data can land EXACTLY on a rounding half
# (e.g. a centroid of -25.25625): the unrounded doubles then differ
# between engines by summation-order noise (~1e-13) and round() flips
# the last digit. The fix: nudge by an epsilon far above fp noise but
# far below the output precision, identically in both engines, so no
# true value can sit on a boundary. Use the _sql twins in oracle text.
# ---------------------------------------------------------------------------

EPS2 = 1e-5  # for ROUND(x, 2): >> cross-engine noise, << 0.005 boundary gap
EPS4 = 1e-9  # for ROUND(x, 4) and ROUND(x, 6)


def r2(col):
    from pyspark.sql import functions as F

    return F.round(col + EPS2, 2)


def r4(col):
    from pyspark.sql import functions as F

    return F.round(col + EPS4, 4)


def r6(col):
    from pyspark.sql import functions as F

    return F.round(col + EPS4, 6)


def r2_sql(expr: str) -> str:
    return f"ROUND(({expr}) + {EPS2!r}, 2)"


def r4_sql(expr: str) -> str:
    return f"ROUND(({expr}) + {EPS4!r}, 4)"


def r6_sql(expr: str) -> str:
    return f"ROUND(({expr}) + {EPS4!r}, 6)"


def query(name: str, oracle: str | None = None):
    """Register a named query (and optionally its DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as raw nanos (``nanosAsLong``) and
    truncate to microseconds — bit-identical to DuckDB's ns→µs
    truncation, so oracles stay exact.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return spark.read.parquet(path).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def load_all_plans() -> None:
    """Import every plans module so registration side-effects run."""
    from drive_bc_datapipeline_spark.plans import (  # noqa: F401
        catalog,
        documents,
        embeddings,
        events,
        geo,
        ml,
        multimodal,
        tpch,
    )
