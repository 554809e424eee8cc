"""Z-order layout: key correctness + the skipping property it buys."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def test_zorder_key_interleaves_bits(spark):
    from drive_bc_datapipeline_spark.functions.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x INT, y INT"
    )
    got = {
        (r["x"], r["y"]): r["zkey"]
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=4)).collect()
    }

    def morton(x: int, y: int) -> int:
        out = 0
        for i in range(4):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == {(x, y): morton(x, y) for (x, y) in got}


def test_zorder_key_rejects_overflow(spark):
    import pytest

    from drive_bc_datapipeline_spark.functions.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)


def _mean_file_span(path: str, col: str) -> float:
    """Mean (max-min) width of `col` across the dataset's files, from
    parquet footer stats only."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append(hi - lo)
    assert spans
    return sum(spans) / len(spans)


def test_zordered_write_narrows_file_stats(spark, tmp_path, sf_dir):
    """The point of z-order: per-file min/max ranges stay narrow on
    EVERY interleaved dimension, so multi-column predicates can skip
    files. Compare footer-stat spans vs an unclustered write."""
    from drive_bc_datapipeline_spark.functions.layout import write_zordered

    # two independent uniform dimensions in [0, 1024) — at testdata SF
    # the natural columns' domains are too narrow to measure skipping
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.pmod(F.xxhash64("event_id"), F.lit(1024)).alias("dim_a"),
            F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(1024)).alias(
                "dim_b"
            ),
        )
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    e.repartition(8).write.parquet(plain)
    write_zordered(e, zpath, ["dim_a", "dim_b"], target_files=8, bits=10)

    assert spark.read.parquet(zpath).count() == e.count()
    for col in ["dim_a", "dim_b"]:
        z_span = _mean_file_span(zpath, col)
        p_span = _mean_file_span(plain, col)
        # round-robin files cover ~the full domain; z-ordered files
        # must be materially narrower on BOTH dimensions
        assert z_span < 0.8 * p_span, (col, z_span, p_span)
