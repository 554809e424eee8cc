"""Data-layout helpers for write-time clustering (z-order).

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan saving is SKIPPING: parquet keeps min/max stats per file
and row group, and a reader prunes any unit whose stat range misses
the predicate. A linear sort gives perfect skipping on ONE column;
z-ordering (Morton curve) interleaves the bits of several columns so
file ranges stay compact in EVERY interleaved dimension — multi-column
predicates then prune files the way single-column predicates prune a
sorted table. (Same technique Delta/Iceberg expose as OPTIMIZE ZORDER;
here it's plain Spark: range-partition + sort on the interleaved key.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton (z-curve) key: interleave the low ``bits`` bits of each
    column, column j owning bit positions j, j+n, j+2n, ...

    Pure JVM bit arithmetic (shiftright/shiftleft + bitwise &/|) — no
    UDF, stays inside whole-stage codegen. Inputs must be non-negative
    integers; values ≥ 2^bits wrap (mask) — normalize or bucket first
    if the domain is wider. n_cols · bits must fit a BIGINT (≤ 63).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds BIGINT range")
    parts: list[Column] = []
    for j, c in enumerate(cols):
        v = F.col(c).cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zkey")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    target_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered along the z-curve of ``cols``.

    repartitionByRange on the z-key gives each output file a contiguous
    z-range (one range shuffle — the same cost a plain sorted write
    pays); sortWithinPartitions keeps row groups compact inside the
    file. Readers need no special support: parquet min/max stats on the
    ORIGINAL columns do the pruning.
    """
    z = df.withColumn("__z", zorder_key(cols, bits))
    (
        z.repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_bucket(cols: list[str], bits: int, bucket_bits: int) -> Column:
    """Deterministic z-curve bucket: the TOP ``bucket_bits`` bits of
    the Morton key — a fixed-width hyperbox of the interleaved domain
    (2^bucket_bits buckets).

    Versus ``repartitionByRange`` on the z-key (which balances file
    sizes under skew but SAMPLES its boundaries, so the file→range map
    varies run to run), fixed-width buckets are a pure function of the
    row — reproducible across executions and engines, so layout
    effects (per-file min/max spans, files-pruned counts) can be
    verified exactly. Use range partitioning for production writes on
    skewed data; use this when determinism is the contract.
    """
    n = len(cols)
    if bucket_bits > n * bits:
        raise ValueError(f"bucket_bits {bucket_bits} exceeds key width")
    return F.shiftright(zorder_key(cols, bits), n * bits - bucket_bits).alias(
        "zbucket"
    )
