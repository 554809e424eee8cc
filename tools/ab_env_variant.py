#!/usr/bin/env python
"""A/B plan VARIANTS selected by an in-process env var, interleaved in
ONE session (the ab_spread.py protocol: alternating arm order per
pass, min-of-N per arm, noop sink).

Plans read the variant env var at fn()-BUILD time, so flipping
``os.environ`` between arms inside one process genuinely changes the
built plan — no JVM restart, no cross-process noise.

    PYTHONPATH=. python tools/ab_env_variant.py \
        --var SPARK_GRAFT_NGRAM_VARIANT --arms v1,v2,v3 \
        dedup_ngram_jaccard [--passes 3] [--sf-dir /root/testdata/sf0.1]
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
    ap.add_argument("--var", required=True)
    ap.add_argument("--arms", required=True, help="comma-separated values")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    arm_vals = [v.strip() for v in args.arms.split(",") if v.strip()]

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark

    registry.load_all_plans()
    unknown = [k for k in args.keys if k not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    spark = get_spark("ab-env-variant")
    registry.t(spark, args.sf_dir, "lineitem").count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    orig = os.environ.get(args.var)

    def time_once(key: str) -> float:
        t0 = time.time()
        registry.QUERIES[key](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    try:
        for key in args.keys:
            vals: dict[str, list[float]] = {v: [] for v in arm_vals}
            for p in range(args.passes):
                order = arm_vals if p % 2 == 0 else arm_vals[::-1]
                for v in order:
                    os.environ[args.var] = v
                    vals[v].append(time_once(key))
            mins = {v: min(ts) for v, ts in vals.items()}
            detail = " | ".join(
                f"{v}={[round(x, 3) for x in ts]} min={mins[v]:.3f}"
                for v, ts in vals.items()
            )
            best = min(mins, key=mins.get)
            print(f"{key}: {detail} -> best {best}", flush=True)
    finally:
        if orig is None:
            os.environ.pop(args.var, None)
        else:
            os.environ[args.var] = orig
        spark.stop()


if __name__ == "__main__":
    main()
