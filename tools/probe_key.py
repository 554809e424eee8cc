"""Isolated idle min-of-3 probe for a handful of registry keys.

The r15 verdict's watch item (incremental_dedup_status 1.95->2.65s in
the driver artifact with ZERO plan edits) needs settling the way r15
settled the pca spread: one tracked idle measurement at the current
HEAD. Usage:

    python tools/probe_key.py incremental_dedup_status [more_keys...]

Prints one JSON line per key: {"key", "samples", "min", "load_start"}.
Protocol notes (memory: bench-protocol-gotchas): run only when
`uptime` 1-min load < ~0.5; min-of-3 back-to-back is the arbiter for
contention-vs-regression questions, NOT the interleaved bench samples.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        raise SystemExit("usage: probe_key.py KEY [KEY...]")
    load_start = os.getloadavg()[0]

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark

    registry.load_all_plans()
    spark = get_spark("probe_key")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.t(spark, sf_dir, "lineitem").count()  # warm the JVM
    try:
        for key in keys:
            fn = registry.QUERIES[key]
            samples = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 3))
            print(
                json.dumps(
                    {
                        "key": key,
                        "samples": samples,
                        "min": min(samples),
                        "load_start": round(load_start, 2),
                        "sf_dir": sf_dir,
                    }
                )
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
