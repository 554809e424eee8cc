#!/usr/bin/env python
"""A/B the spread() partitioning ARM for named keys: hash-partition
(``by=<col>`` as written at the call site) vs round-robin (``by``
forced to None), in ONE session, interleaved min-of-N passes.

tools/ab_spread.py answers "spread vs no spread"; this answers the
r14-verdict question "WHICH spread" — the ``by=`` switch landed in r14
on priors measured pre-switch, so the call is settled here with a
tracked interleaved run at the current HEAD:

    PYTHONPATH=. python tools/ab_spread_by.py embedding_pca_projection \
        [--sf-dir /root/testdata/sf0.1] [--passes 3]

`hash` runs the plan exactly as committed; `rr` patches the
module-level ``spread`` in every plans module with a wrapper that
strips the ``by`` kwarg, so the same call site degrades to
round-robin. Keep ``by=`` only where `hash` beats `rr` clearly.
Harness lives in tools/ab_common.py — ONE copy shared with
ab_spread.py.
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

    def rr_spread(df, min_parts=None, by=None):
        return real_spread(df, min_parts=min_parts, by=None)

    def verdict(mins: dict) -> str:
        if mins["hash"] < mins["rr"] * 0.95:
            return "KEEP by="
        if mins["rr"] < mins["hash"] * 0.95:
            return "revert to rr"
        return "wash"

    run_spread_ab(
        args.keys,
        args.sf_dir,
        args.passes,
        arms=[("hash", real_spread), ("rr", rr_spread)],
        verdict=verdict,
        app_name="ab-spread-by",
    )


if __name__ == "__main__":
    main()
