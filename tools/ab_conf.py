#!/usr/bin/env python
"""Time a key subset under the CURRENT session config and print a JSON
per-key map — the per-process half of a config A/B. Session confs are
fixed at JVM start, so each arm is one invocation of this script with
the arm's env overrides, e.g.:

    SPARK_GRAFT_AQE_MIN_PARTITION_SIZE=1m SPARK_GRAFT_PREFER_SMJ=true \
        PYTHONPATH=. python tools/ab_conf.py --out /tmp/arm_base.json q5_local_supplier ...

Methodology matches bench.py: noop sink, one cold pass (discarded)
then two steady passes, per-key MIN reported. Run arms back-to-back on
an idle box and compare the JSON maps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark

    registry.load_all_plans()
    unknown = [k for k in args.keys if k not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    spark = get_spark("ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    registry.t(spark, args.sf_dir, "lineitem").count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    passes: list[dict[str, float]] = [{}, {}, {}]
    for p in passes:
        for key in args.keys:
            t0 = time.time()
            registry.QUERIES[key](spark, args.sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            p[key] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    mins = {k: min(passes[1][k], passes[2][k]) for k in args.keys}
    payload = {
        "total": round(sum(mins.values()), 3),
        "queries": mins,
        "load_end": round(os.getloadavg()[0], 2),
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"total": payload["total"], "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
