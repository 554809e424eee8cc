"""Collector tests: a fake API with throttling and a poison record
exercises the backoff + bisect-skip protocol end-to-end, then the
collected JSONL parts are read back through the Spark source layer."""

from __future__ import annotations

import json
import re

from drive_bc_datapipeline_spark.sources.collector import PagedCollector

N_TOTAL = 1337
POISON = 603  # absolute record index that 500s whenever its window is requested


class FakeAPI:
    def __init__(self, poison: int | None = POISON, throttle_every: int = 7):
        self.calls = 0
        self.poison = poison
        self.throttle_every = throttle_every

    def __call__(self, url: str) -> tuple[int, str]:
        self.calls += 1
        m = re.search(r"limit=(\d+)&offset=(\d+)", url)
        limit, offset = int(m.group(1)), int(m.group(2))
        if self.throttle_every and self.calls % self.throttle_every == 0:
            return 429, ""
        if self.poison is not None and offset <= self.poison < offset + limit:
            return 500, "internal error"  # any window touching it, even limit=1
        events = [
            {"event_id": f"e{i}", "value": float(i)}
            for i in range(offset, min(offset + limit, N_TOTAL))
        ]
        return 200, json.dumps({"events": events})


def test_collector_happy_path(tmp_path):
    api = FakeAPI(poison=None, throttle_every=0)
    c = PagedCollector(
        "http://x", api, str(tmp_path / "out"), limit=100, chunk_size=400,
        sleep_fn=lambda s: None,
    )
    res = c.collect()
    assert res.n_records == N_TOTAL
    assert res.skipped_offsets == []
    assert res.final_offset == N_TOTAL
    # 1337 records in chunks of 400 → 4 part files (400,400,400,137)
    assert len(res.part_files) == 4


def test_collector_bisects_poison_and_backs_off(tmp_path):
    api = FakeAPI()
    c = PagedCollector(
        "http://x", api, str(tmp_path / "out"), limit=100, chunk_size=10_000,
        sleep_fn=lambda s: None,
    )
    res = c.collect()
    # the poison record is isolated by halving, skipped, and logged
    assert res.skipped_offsets == [POISON]
    assert res.n_records == N_TOTAL - 1
    assert res.n_throttles > 0
    ids = set()
    for p in res.part_files:
        with open(p) as f:
            ids.update(json.loads(line)["event_id"] for line in f)
    assert len(ids) == N_TOTAL - 1
    assert f"e{POISON}" not in ids
    term = json.load(open(f"{tmp_path}/out/termination.json"))
    assert term["offset"] == N_TOTAL


def test_collector_output_readable_by_spark(spark, tmp_path):
    api = FakeAPI(poison=None, throttle_every=0)
    out = str(tmp_path / "landing")
    PagedCollector(
        "http://x", api, out, limit=500, chunk_size=1000, sleep_fn=lambda s: None
    ).collect()
    df = spark.read.schema("event_id string, value double").json(
        f"{out}/part-*.jsonl"
    )
    assert df.count() == N_TOTAL
    assert df.where("value = 42.0").count() == 1
