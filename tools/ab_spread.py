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

and keep the treatment only where `on` beats `off` clearly. The tool
patches the module-level `spread` reference in every plans module, so
it works for keys whose plans import it at module scope.
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

    spark = get_spark("ab-spread")
    registry.t(spark, args.sf_dir, "lineitem").count()  # warm JVM

    # every loaded plans module holding a spread reference — derived,
    # not hardcoded, so a key planned in a module outside an
    # enumerated list can't silently run on-vs-on and print a
    # credible "revert" (same gap ab_spread_by.py had; review catch)
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

    identity = lambda df, min_parts=None, by=None: df  # noqa: E731
    try:
        for key in args.keys:
            # Interleave arms and alternate which goes first per pass,
            # so warm-session effects (JIT, page cache) don't
            # systematically favor the second arm.
            vals: dict[str, list[float]] = {"on": [], "off": []}
            for p in range(args.passes):
                order = (("on", real_spread), ("off", identity))
                if p % 2:
                    order = order[::-1]
                for label, fn in order:
                    for m in modules:
                        m.spread = fn
                    vals[label].append(time_once(key))
            res = {lbl: round(min(v), 3) for lbl, v in vals.items()}
            verdict = "KEEP" if res["on"] < res["off"] * 0.9 else "revert"
            print(f"{key}: on={res['on']}s off={res['off']}s -> {verdict}")
    finally:
        # Restore the real helper even if a run() raises, so an aborted
        # A/B can't leave the plans modules patched to the wrong arm.
        for m in modules:
            m.spread = real_spread
    spark.stop()


if __name__ == "__main__":
    main()
