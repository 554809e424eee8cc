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
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark
    from drive_bc_datapipeline_spark.tables import spread as real_spread

    registry.load_all_plans()
    unknown = [k for k in args.keys if k not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    spark = get_spark("ab-spread-by")
    registry.t(spark, args.sf_dir, "lineitem").count()  # warm JVM

    # every loaded plans module holding a spread reference — derived,
    # not hardcoded, so a key whose plan lives in a module outside an
    # enumerated list can't silently run hash-vs-hash and print a
    # credible "wash" (review catch)
    import sys

    modules = [
        m
        for name, m in list(sys.modules.items())
        if name.startswith("drive_bc_datapipeline_spark.plans.")
        and m is not None
        and getattr(m, "spread", None) is real_spread
    ]
    assert modules, "no plans module imports spread — nothing to A/B"

    def time_once(key: str) -> float:
        t0 = time.time()
        registry.QUERIES[key](spark, args.sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    def rr_spread(df, min_parts=None, by=None):
        return real_spread(df, min_parts=min_parts, by=None)

    try:
        for key in args.keys:
            vals: dict[str, list[float]] = {"hash": [], "rr": []}
            for p in range(args.passes):
                order = (("hash", real_spread), ("rr", rr_spread))
                if p % 2:
                    order = order[::-1]
                for label, fn in order:
                    for m in modules:
                        m.spread = fn
                    vals[label].append(time_once(key))
            res = {lbl: [round(x, 3) for x in v] for lbl, v in vals.items()}
            mins = {lbl: min(v) for lbl, v in vals.items()}
            verdict = "KEEP by=" if mins["hash"] < mins["rr"] * 0.95 else (
                "revert to rr" if mins["rr"] < mins["hash"] * 0.95 else "wash"
            )
            print(
                f"{key}: hash={res['hash']} min={mins['hash']:.3f} | "
                f"rr={res['rr']} min={mins['rr']:.3f} -> {verdict}"
            )
    finally:
        for m in modules:
            m.spread = real_spread
    spark.stop()


if __name__ == "__main__":
    main()
