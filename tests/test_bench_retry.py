"""bench.py contention-defense unit tests (no Spark needed): the
retry trigger and the tracked-prior loader are pure functions, so the
mechanism that guards the driver's perf artifact is itself gated."""

from __future__ import annotations

import json

import bench


def test_needs_retry_threshold():
    assert not bench.needs_retry(1.0, None)  # debut: nothing to defend
    assert not bench.needs_retry(0.5, 0.3)  # 0.5 <= 2*0.3 + 0.25
    assert not bench.needs_retry(0.3, 0.05)  # slack absorbs tiny keys
    assert bench.needs_retry(0.36, 0.05)  # 0.36 > 0.35
    assert bench.needs_retry(9.8, 0.8)  # the r8 artifact case
    assert not bench.needs_retry(1.6, 0.8)  # honest 2x drift: keep it


def test_load_prior_queries_roundtrip(tmp_path):
    p = tmp_path / "BENCH_full.json"
    p.write_text(json.dumps({"sf": 0.1, "queries": {"q1": 1.5, "q2": 0.2}}))
    assert bench.load_prior_queries(str(p), 0.1) == {"q1": 1.5, "q2": 0.2}
    # different SF: priors do not transfer
    assert bench.load_prior_queries(str(p), 0.01) == {}
    # absent / corrupt files degrade to no priors, never raise
    assert bench.load_prior_queries(str(tmp_path / "missing.json"), 0.1) == {}
    p.write_text("{not json")
    assert bench.load_prior_queries(str(p), 0.1) == {}


def test_load_prior_queries_prefers_min_retained_retry_priors(tmp_path):
    """r10: the retry trigger reads the running-MIN retry_priors map
    when present (a contended run inflates the measured `queries` map
    but must never desensitize the 2x threshold); pre-r10 files with
    only `queries` still load."""
    p = tmp_path / "BENCH_full.json"
    p.write_text(
        json.dumps(
            {
                "sf": 0.1,
                "queries": {"q1": 3.1, "q2": 0.9},  # the contended run
                "retry_priors": {"q1": 1.5, "q2": 0.2},  # running min
            }
        )
    )
    assert bench.load_prior_queries(str(p), 0.1) == {"q1": 1.5, "q2": 0.2}
    # the min-retained prior keeps the trigger sensitized where the
    # contended measurement would have let a 5s q1 pass silently
    priors = bench.load_prior_queries(str(p), 0.1)
    assert bench.needs_retry(5.0, priors["q1"])
    assert not bench.needs_retry(5.0, 3.1)


def test_apply_prior_refresh():
    """r11 (r10 ADVICE): an accepted-slowdown key can re-baseline its
    min-retained prior via $SPARK_GRAFT_REFRESH_PRIORS instead of
    retrying on every future bench run forever."""
    priors = {"q1": 1.5, "q2": 0.2, "q3": 0.9}
    names = ["q1", "q2", "q3"]
    # no spec: priors untouched
    kept, unknown = bench.apply_prior_refresh(priors, names, "")
    assert kept == priors and unknown == []
    # named keys drop (whitespace tolerated); others retained
    kept, unknown = bench.apply_prior_refresh(priors, names, " q1, q3 ")
    assert kept == {"q2": 0.2} and unknown == []
    # 'all' clears every prior
    kept, unknown = bench.apply_prior_refresh(priors, names, "all")
    assert kept == {} and unknown == []
    # unknown keys surface for the warning instead of silently no-oping
    kept, unknown = bench.apply_prior_refresh(priors, names, "q2,nope")
    assert kept == {"q1": 1.5, "q3": 0.9} and unknown == ["nope"]
    # a dropped key no longer triggers the retry (no floor to defend)
    assert not bench.needs_retry(5.0, kept.get("q2"))


def test_artifact_path_clobber_guard():
    """r12 verdict Next #6: only the canonical sf=0.1 run writes the
    TRACKED BENCH_full.json; any other SF (a sf0.001 contract smoke)
    diverts to an untracked BENCH_smoke_<sf>.json so the sf0.1 record
    and its retry priors survive in the working tree."""
    full = "/repo/BENCH_full.json"
    assert bench.artifact_path(full, 0.1) == full
    assert bench.artifact_path(full, 0.001) == "/repo/BENCH_smoke_0.001.json"
    assert bench.artifact_path(full, 0.01) == "/repo/BENCH_smoke_0.01.json"
    assert bench.artifact_path(full, -1.0) == "/repo/BENCH_smoke_-1.0.json"
