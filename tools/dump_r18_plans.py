"""Dump .explain('formatted') for every registry key into plans/r18/.

Usage:
    python tools/dump_r18_plans.py [suffix] [key ...]

Writes plans/r18/<key>_<suffix>.txt (suffix defaults to "before").
With no keys given, dumps every registered key. Build-time side
effects (eager localCheckpoints) run as usual; the dump is the
ANALYZED/initial physical plan (AdaptiveSparkPlan isFinalPlan=false),
which is what plan-shape claims in OPTIMIZATION_r18.md reference.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    keys = args[1:]

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark

    registry.load_all_plans()
    names = keys or sorted(registry.QUERIES)
    spark = get_spark("dump_r18_plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r18",
    )
    os.makedirs(out_dir, exist_ok=True)
    try:
        for name in names:
            t0 = time.time()
            df = registry.QUERIES[name](spark, sf_dir)
            build_s = time.time() - t0
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(f"-- {name} ({suffix}) sf_dir={sf_dir}\n")
                fh.write(f"-- plan-build wall: {build_s:.3f}s\n")
                fh.write(plan)
            print(f"{name}: build {build_s:.3f}s -> {path}", file=sys.stderr)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
