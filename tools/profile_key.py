"""Per-job/stage profile of registry keys via the Spark event log.

Usage:
    python tools/profile_key.py KEY [KEY...]

For each key: one warm-up materialization (cold pass, codegen), then a
timed steady pass, both through the noop sink. Afterwards the event
log is parsed and per-job wall time, stage task counts, task-time
sums, and shuffle bytes are printed — the "where does the second go"
readout the UI would give if it were enabled.

Timing caveat: run on an idle box for the steady numbers to mean
anything; the per-stage *breakdown* (which stage dominates) is robust
to moderate contention.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        raise SystemExit("usage: profile_key.py KEY [KEY...]")

    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    # Event-log confs must reach the SparkContext before it starts;
    # PYSPARK_SUBMIT_ARGS composes with get_spark's builder settings.
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.rolling.enabled=false "
        f"--conf spark.eventLog.dir={evdir} pyspark-shell"
    )

    from drive_bc_datapipeline_spark.plans import registry
    from drive_bc_datapipeline_spark.session import get_spark

    spark = get_spark("profile_key")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_plans()
    registry.t(spark, sf_dir, "lineitem").count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    marks: list[tuple[str, str, float, float, float]] = []
    for key in keys:
        fn = registry.QUERIES[key]
        for pas in ("cold", "steady"):
            spark.sparkContext.setJobDescription(f"{key}::{pas}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time()
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time()
            marks.append((key, pas, t0, t_build, t1))
            spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ------------------------------------------
    cands = [p for p in os.listdir(evdir) if app_id in p]
    if not cands:
        raise SystemExit(f"no event log under {evdir}")
    path = os.path.join(evdir, cands[0])
    if os.path.isdir(path):
        # Spark 4 rolling event log v2: a dir of events_N_* part files
        parts = sorted(
            (p for p in os.listdir(path) if p.startswith("events_")),
            key=lambda p: int(p.split("_")[1]),
        )
        if not parts:
            raise SystemExit(f"empty event log dir {path}")
        paths = [os.path.join(path, p) for p in parts]
    else:
        paths = [path]

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_tasks: dict[int, list[dict]] = defaultdict(list)
    def _lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "n_tasks": si["Number of Tasks"],
                    "start": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                stage_tasks[sid].append(
                    {
                        "run": tm.get("Executor Run Time", 0),
                        "cpu": tm.get("Executor CPU Time", 0) / 1e6,
                        "deser": tm.get("Executor Deserialize Time", 0),
                        "gc": tm.get("JVM GC Time", 0),
                        "sr_bytes": sr.get("Remote Bytes Read", 0)
                        + sr.get("Local Bytes Read", 0),
                        "sw_bytes": sw.get("Shuffle Bytes Written", 0),
                        "py": (
                            {
                                a["ID"]: a["Update"]
                                for a in ev.get("Accumulables", [])
                                if "data sent to Python workers"
                                in str(a.get("Name", ""))
                            }
                        ),
                    }
                )

    for key, pas, t0, t_build, t1 in marks:
        if pas != "steady":
            continue
        print(f"\n=== {key} [{pas}] total {t1 - t0:.3f}s "
              f"(plan-build {t_build - t0:.3f}s, exec {t1 - t_build:.3f}s)")
        desc = f"{key}::{pas}"
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("desc") == desc and "end" in j
        ]
        for jid, j in sel:
            wall = (j["end"] - j["start"]) / 1000.0
            print(f"  job {jid}: {wall:6.3f}s")
            for sid in sorted(j["stages"]):
                st = stages.get(sid)
                if st is None or st.get("end") is None:
                    continue
                ts = stage_tasks.get(sid, [])
                run = sum(t["run"] for t in ts) / 1000.0
                mx = max((t["run"] for t in ts), default=0) / 1000.0
                swall = (st["end"] - (st["start"] or st["end"])) / 1000.0
                srb = sum(t["sr_bytes"] for t in ts)
                swb = sum(t["sw_bytes"] for t in ts)
                nm = st["name"].split("\n")[0][:90]
                print(
                    f"    stage {sid}: wall {swall:6.3f}s n={st['n_tasks']:3d} "
                    f"taskSum {run:6.2f}s taskMax {mx:6.3f}s "
                    f"sRead {srb // 1024}K sWrite {swb // 1024}K  {nm}"
                )


if __name__ == "__main__":
    main()
