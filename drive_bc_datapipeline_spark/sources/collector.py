"""Resilient paged REST collector (reference parity:
api_event_collector.py — paged ingestion with throttle backoff and
bisect-on-server-error; re-expressed clean-room with an injectable
transport so it is testable offline and swappable to any HTTP client).

Semantics mirrored from the reference's observed behavior:
- page through ``offset`` with a window of ``limit`` records;
- HTTP 429 (throttle) → sleep and retry the same window;
- HTTP 5xx or undecodable body → a *poison record* may hide in the
  window: halve the limit and retry (binary search); at limit 1 the
  poison offset is logged, skipped, and the limit resets once the scan
  passes the end of the degraded window;
- flush collected records to a JSONL part file every
  ``chunk_size`` records (JSONL, not a JSON array: splittable, so
  Spark parallelizes a big part file — the one deliberate departure);
- on exhaustion, persist the final offset for incremental resume.

Scale note: the collector is edge ingestion — it feeds the landing dir
that ``streaming.pipeline.read_event_stream`` watches. Parallelism at
scale comes from running one collector per shard/region; each is I/O
bound and intentionally sequential (the bisect protocol is stateful in
``offset``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

# transport: url -> (status_code, body_text). Injectable for tests and
# for whatever HTTP client the deployment uses.
Transport = Callable[[str], tuple[int, str]]


@dataclass
class CollectorResult:
    n_records: int = 0
    part_files: list[str] = field(default_factory=list)
    skipped_offsets: list[int] = field(default_factory=list)
    final_offset: int = 0
    n_throttles: int = 0


class PagedCollector:
    def __init__(
        self,
        base_url: str,
        transport: Transport,
        out_dir: str,
        limit: int = 500,
        chunk_size: int = 5000,
        throttle_sleep_s: float = 10.0,
        sleep_fn: Callable[[float], None] | None = None,
        max_errors: int = 1000,
    ) -> None:
        self.base_url = base_url
        self.transport = transport
        self.out_dir = out_dir
        self.init_limit = limit
        self.chunk_size = chunk_size
        self.throttle_sleep_s = throttle_sleep_s
        self.sleep_fn = sleep_fn if sleep_fn is not None else _default_sleep
        self.max_errors = max_errors
        os.makedirs(out_dir, exist_ok=True)

    def _url(self, limit: int, offset: int) -> str:
        return f"{self.base_url}/events?limit={limit}&offset={offset}"

    def _flush(self, buf: list[dict], part_num: int, res: CollectorResult) -> int:
        if not buf:
            return part_num
        path = os.path.join(self.out_dir, f"part-{part_num:05d}.jsonl")
        with open(path, "w") as f:
            for rec in buf:
                f.write(json.dumps(rec) + "\n")
        res.part_files.append(path)
        buf.clear()
        return part_num + 1

    def collect(self, offset: int = 0) -> CollectorResult:
        res = CollectorResult()
        buf: list[dict] = []
        part_num = 0
        limit = self.init_limit
        reset_at: int | None = None  # end of the degraded window
        errors = 0

        while True:
            if reset_at is not None and offset > reset_at:
                limit = self.init_limit
                reset_at = None

            status, body = self.transport(self._url(limit, offset))

            if status == 429:  # throttled: back off, same window
                res.n_throttles += 1
                self.sleep_fn(self.throttle_sleep_s)
                continue

            records = None
            if status == 200:
                try:
                    records = json.loads(body).get("events", [])
                except (json.JSONDecodeError, AttributeError):
                    records = None  # undecodable == poisoned window

            if records is None:  # 5xx or bad body: bisect the window
                errors += 1
                if errors > self.max_errors:
                    raise RuntimeError(
                        f"collector exceeded {self.max_errors} errors at offset {offset}"
                    )
                if limit == 1:  # poison record isolated: log + skip
                    res.skipped_offsets.append(offset)
                    offset += 1
                    limit = self.init_limit
                    reset_at = None
                else:
                    reset_at = offset + limit
                    limit //= 2
                continue

            buf.extend(records)
            res.n_records += len(records)
            offset += len(records)

            if len(buf) >= self.chunk_size:
                part_num = self._flush(buf, part_num, res)

            if not records:  # exhausted
                break

        part_num = self._flush(buf, part_num, res)
        res.final_offset = offset
        with open(os.path.join(self.out_dir, "termination.json"), "w") as f:
            json.dump({"offset": offset}, f)
        return res


def _default_sleep(seconds: float) -> None:
    import time

    time.sleep(seconds)
