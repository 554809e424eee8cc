"""K15: the paged-API Python DataSource — executor-parallel ingestion."""

from __future__ import annotations

import pytest

import json


def _write_pages(tmp_path, n_pages=6, rows_per_page=5):
    d = tmp_path / "dump"
    d.mkdir()
    for p in range(n_pages):
        lines = []
        for i in range(rows_per_page):
            lines.append(json.dumps({
                "event_id": f"e{p}_{i}", "user_id": f"u{i % 3}",
                "event_type": "click", "value": float(p * 10 + i),
            }))
        (d / f"page_{p}.json").write_text("\n".join(lines))
    return str(d)


@pytest.mark.slow
def test_paged_source_reads_all_pages_in_parallel(spark, tmp_path):
    from drive_bc_datapipeline_spark.sources.paged_api import (
        PagedJsonDataSource,
    )

    spark.dataSource.register(PagedJsonDataSource)
    src = _write_pages(tmp_path, n_pages=6, rows_per_page=5)
    df = (
        spark.read.format("paged_json")
        .option("dir", src)
        .option("total_pages", "6")
        .option("pages_per_partition", "2")
        .load()
    )
    # partition planning: 6 pages / 2 per range = 3 concurrent tasks
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 30
    assert all(r["_corrupt"] is None for r in rows)
    assert {r["event_id"] for r in rows} == {
        f"e{p}_{i}" for p in range(6) for i in range(5)
    }


def test_paged_source_quarantines_bad_rows_and_skips_missing_pages(
    spark, tmp_path
):
    from drive_bc_datapipeline_spark.sources.paged_api import (
        PagedJsonDataSource,
    )

    spark.dataSource.register(PagedJsonDataSource)
    d = tmp_path / "dump2"
    d.mkdir()
    (d / "page_0.json").write_text(
        json.dumps({"event_id": "ok", "user_id": "u", "event_type": "t",
                    "value": 1.0})
        + "\n" + json.dumps({"user_id": "missing-id"})
    )
    # page_1 absent entirely (deleted dump chunk) — skipped, not fatal
    (d / "page_2.json").write_text("{not json at all")
    # page_3: one malformed line SANDWICHED between valid records — the
    # per-row dead-letter contract (K10) requires the good rows to
    # survive; an eager page-level parse would drop all three.
    (d / "page_3.json").write_text(
        json.dumps({"event_id": "g1", "user_id": "u", "event_type": "t",
                    "value": 2.0})
        + "\n{broken json line\n"
        + json.dumps({"event_id": "g2", "user_id": "u", "event_type": "t",
                      "value": 3.0})
    )

    df = (
        spark.read.format("paged_json")
        .option("dir", str(d))
        .option("total_pages", "4")
        .load()
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert sorted(r["event_id"] for r in good) == ["g1", "g2", "ok"]
    assert len(bad) == 3  # missing-key row + unparseable line x2
    assert any("page 2" in r["_corrupt"] for r in bad)
    assert any("page 3" in r["_corrupt"] for r in bad)
