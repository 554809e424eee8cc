#!/usr/bin/env python
"""A/B a RUNTIME-settable SQL conf per key, interleaved in ONE session.

The r17 SHJ conf evidence was process-level (tools/ab_conf.py) because
the round treated session confs as JVM-start-only; but
``spark.sql.join.preferSortMergeJoin`` (and most planner confs) are
runtime SQLConf entries, so both arms can run interleaved in one
session — the contention-robust methodology the per-key spread A/Bs
already use. This answers the r17 verdict's Next #2/#5 directly:

    PYTHONPATH=. python tools/ab_runtime_conf.py \
        --conf spark.sql.join.preferSortMergeJoin --a false --b true \
        <key> [<key> ...] [--passes 3] [--sf-dir /root/testdata/sf0.1]

Arms alternate order per pass; min-of-N per arm; the conf is restored
even if a pass raises.
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
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True, help="arm A value (current)")
    ap.add_argument("--b", required=True, help="arm B value (alternative)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark

    registry.load_all_plans()
    unknown = [k for k in args.keys if k not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    spark = get_spark("ab-runtime-conf")
    registry.t(spark, args.sf_dir, "lineitem").count()  # warm JVM
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    orig = spark.conf.get(args.conf, None)

    def time_once(key: str) -> float:
        t0 = time.time()
        registry.QUERIES[key](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    arms = [("A=" + args.a, args.a), ("B=" + args.b, args.b)]
    try:
        for key in args.keys:
            vals: dict[str, list[float]] = {lbl: [] for lbl, _ in arms}
            for p in range(args.passes):
                order = arms if p % 2 == 0 else arms[::-1]
                for label, value in order:
                    spark.conf.set(args.conf, value)
                    vals[label].append(time_once(key))
            mins = {lbl: min(v) for lbl, v in vals.items()}
            detail = " | ".join(
                f"{lbl}={[round(x, 3) for x in v]} min={mins[lbl]:.3f}"
                for lbl, v in vals.items()
            )
            a_lbl, b_lbl = arms[0][0], arms[1][0]
            if mins[a_lbl] < mins[b_lbl] * 0.9:
                v = "A clearly"
            elif mins[b_lbl] < mins[a_lbl] * 0.9:
                v = "B clearly"
            else:
                v = "wash"
            print(f"{key}: {detail} -> {v}", flush=True)
    finally:
        if orig is not None:
            spark.conf.set(args.conf, orig)
        spark.stop()


if __name__ == "__main__":
    main()
