#!/usr/bin/env python
"""A/B a plan's use of tables.spread(): time each named query with the
helper active vs patched to identity, in ONE session, min-of-N passes.

The r10 finding this tool codifies: spread() pays only where the
scan-side work is heavy (fan-out explodes, multi-regex, multi-consumer
pinned token relations); for light tokenize + partial-agg keys the
extra exchange costs more than single-core tokenize. Before applying
spread to a key in a rotation batch, run:

    PYTHONPATH=. python tools/ab_spread.py <key> [<key> ...] \
        [--sf-dir /root/testdata/sf0.1] [--passes 3]

and keep the treatment only where `on` beats `off` clearly. Harness
(session, warm-up, interleaved arms, module discovery, restore) lives
in tools/ab_common.py — ONE copy shared with ab_spread_by.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from ab_common import run_spread_ab
    from drive_bc_datapipeline_spark.tables import spread as real_spread

    identity = lambda df, min_parts=None, by=None: df  # noqa: E731
    run_spread_ab(
        args.keys,
        args.sf_dir,
        args.passes,
        arms=[("on", real_spread), ("off", identity)],
        verdict=lambda mins: (
            "KEEP" if mins["on"] < mins["off"] * 0.9 else "revert"
        ),
        app_name="ab-spread",
    )


if __name__ == "__main__":
    main()
