"""Run the driver-style Spark-vs-DuckDB parity check at an arbitrary SF.

Usage: python tools/verify_local.py [sf_dir] [key ...]
Defaults to /root/testdata/sf0.01 over every registered oracle key.
Prints one line per key: OK / MISMATCH(detail) / ERROR(exc).
"""

from __future__ import annotations

import math
import sys
import traceback

import duckdb
from pyspark.sql import SparkSession

from drive_bc_datapipeline_spark.plans import registry
from drive_bc_datapipeline_spark.plans.registry import ORACLES, QUERIES
from drive_bc_datapipeline_spark.tables import TABLE_NAMES

registry.load_all_plans()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda tup: tuple(str(x) for x in tup))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    keys = sys.argv[2:] or sorted(ORACLES)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("verify_local")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    bad = 0
    for name in keys:
        try:
            sdf = QUERIES[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            con = duck_con(sf_dir)
            rel = con.sql(ORACLES[name])
            d_cols, d_rows = rel.columns, rel.fetchall()
            if sorted(s_cols) != sorted(d_cols):
                print(f"MISMATCH {name}: cols {sorted(s_cols)} vs {sorted(d_cols)}")
                bad += 1
                continue
            if len(s_rows) != len(d_rows):
                print(f"MISMATCH {name}: rows {len(s_rows)} vs {len(d_rows)}")
                bad += 1
                continue
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            mm = [(a, b) for a, b in zip(ns, nd) if a != b]
            if mm:
                print(f"MISMATCH {name}: {len(mm)} rows differ; first: {mm[0]}")
                bad += 1
            else:
                print(f"OK {name} ({len(s_rows)} rows)")
        except Exception:
            print(f"ERROR {name}: {traceback.format_exc(limit=3)}")
            bad += 1
    print(f"--- {len(keys) - bad}/{len(keys)} keys clean at {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
