"""K15: executor-parallel paged-API ingestion as a Python DataSource.

The driver-side REST collector (K6, sources/collector.py) is the
single-node shape: one process walks pages 0..N. At 100 TB that serial
walk IS the bottleneck, so this DataSource moves the paging onto the
executors: the reader plans one InputPartition per page RANGE and each
task fetches its own range concurrently — ingestion bandwidth scales
with the cluster, subject to the API's rate limits (cap parallelism
with ``pages_per_partition``).

Registered like any source:

    spark.dataSource.register(PagedJsonDataSource)
    df = (spark.read.format("paged_json")
          .option("dir", dump_dir)          # page_<i>.json files
          .option("total_pages", "64")
          .option("pages_per_partition", "8")
          .load())

Transport is file-based (``dir`` option: one ``page_<i>.json`` per
page — the layout the K6 collector writes). An HTTP transport drops in
by replacing ``_read_page``; everything else (partition planning,
schema, malformed-row quarantining to ``_corrupt``) is transport-
agnostic. Rows with missing/invalid JSON are emitted with
``_corrupt`` set instead of killing the task — the K10 dead-letter
contract, applied at the source.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGED_SCHEMA = (
    "event_id STRING, user_id STRING, event_type STRING, "
    "value DOUBLE, _corrupt STRING"
)


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PagedJsonDataSource(DataSource):
    """``format("paged_json")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self) -> str:
        return PAGED_SCHEMA

    def reader(self, schema) -> "PagedJsonReader":
        return PagedJsonReader(self.options)


class PagedJsonReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options["dir"]
        self.total_pages = int(options["total_pages"])
        self.per_part = int(options.get("pages_per_partition", "8"))

    def partitions(self):
        return [
            _PageRange(s, min(s + self.per_part, self.total_pages))
            for s in range(0, self.total_pages, self.per_part)
        ]

    def _read_page(self, page: int) -> list[str] | None:
        """Transport: one page → list of raw JSONL lines (None =
        missing). Swap for an HTTP GET (with K6's backoff) for a live
        API. Lines are returned UNPARSED so a single malformed line
        dead-letters only itself — parsing the page eagerly here would
        quarantine the whole page and silently drop its valid records,
        breaking the per-row K10 contract."""
        path = os.path.join(self.dir, f"page_{page}.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return [line for line in fh if line.strip()]

    def read(self, partition: _PageRange):
        for page in range(partition.start, partition.end):
            try:
                lines = self._read_page(page)
            except OSError as exc:
                yield (None, None, None, None, f"page {page}: {exc}")
                continue
            if lines is None:
                continue
            for line in lines:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError as exc:
                    yield (None, None, None, None, f"page {page}: {exc}")
                    continue
                try:
                    yield (
                        str(rec["event_id"]),
                        str(rec["user_id"]),
                        str(rec["event_type"]),
                        float(rec["value"]) if rec.get("value") is not None
                        else None,
                        None,
                    )
                except (KeyError, TypeError, ValueError) as exc:
                    yield (None, None, None, None, f"page {page}: {exc!r}")
