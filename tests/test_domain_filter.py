"""Per-domain perplexity thresholds (operators/domain_filter.py) —
the CCNet head/middle/tail cut over H25/H37 scores.

Evidence pattern: exact-mode bit-match against a numpy per-group
quantile reference (Spark's ``percentile`` and numpy's default
"linear" method share the same interpolation), approx-mode sanity
(element-of-group, ascending in q), banding/filter semantics against
a hand-rolled sequential twin, ride-along unknown-domain fail-fast,
plan pins (broadcast join, partial-aggregable fit, no Python, no
cartesian), and an H25 composition run on the real documents table.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.operators.domain_filter import (
    apply_domain_bands,
    apply_domain_filter,
    domain_threshold_table,
)

SF = "/root/testdata/sf0.001"


def _scored_rows():
    rng = np.random.RandomState(7)
    rows = []
    i = 0
    for src, mu in [("web", 9.0), ("books", 6.0), ("code", 12.0)]:
        for _ in range(40):
            rows.append((i, src, float(mu + rng.standard_normal())))
            i += 1
    return rows


@pytest.fixture()
def scored(spark):
    return spark.createDataFrame(
        _scored_rows(), "doc_id long, source string, avg_nll double"
    )


def test_exact_thresholds_match_numpy(spark, scored):
    got = {
        (r["source"], round(r["q"], 9)): (r["threshold"], r["n_docs"])
        for r in domain_threshold_table(
            scored, (0.25, 0.5, 0.75), approx=False
        ).collect()
    }
    by_src: dict[str, list[float]] = {}
    for _i, src, s in _scored_rows():
        by_src.setdefault(src, []).append(s)
    assert len(got) == 9
    for src, vals in by_src.items():
        for q in (0.25, 0.5, 0.75):
            t, n = got[(src, round(q, 9))]
            assert n == 40
            assert t == pytest.approx(
                float(np.percentile(vals, q * 100)), abs=1e-12
            )


def test_approx_thresholds_are_group_elements_ascending(spark, scored):
    rows = domain_threshold_table(
        scored, (1 / 3, 2 / 3), approx=True
    ).collect()
    by_src: dict[str, list[float]] = {}
    for _i, src, s in _scored_rows():
        by_src.setdefault(src, []).append(s)
    seen: dict[str, list[tuple[float, float]]] = {}
    for r in rows:
        assert r["threshold"] in by_src[r["source"]]
        seen.setdefault(r["source"], []).append((r["q"], r["threshold"]))
    for src, pairs in seen.items():
        pairs.sort()
        assert pairs[0][1] <= pairs[1][1]  # ascending in q


def test_banding_matches_sequential_reference(spark, scored):
    table = domain_threshold_table(scored, (1 / 3, 2 / 3), approx=False)
    got = {
        r["doc_id"]: r["band"]
        for r in apply_domain_bands(scored, table).collect()
    }
    thr = {
        r["source"]: {} for r in table.collect()
    }
    for r in table.collect():
        thr[r["source"]][round(r["q"], 6)] = r["threshold"]
    lo_q, hi_q = round(1 / 3, 6), round(2 / 3, 6)
    want = {}
    for i, src, s in _scored_rows():
        if s <= thr[src][lo_q]:
            want[i] = "head"
        elif s <= thr[src][hi_q]:
            want[i] = "middle"
        else:
            want[i] = "tail"
    assert got == want
    # per-domain thirds (exact interpolated thresholds → 13/14/13-ish)
    for src in ("web", "books", "code"):
        n_head = sum(
            1 for (i, s, _v) in _scored_rows()
            if s == src and want[i] == "head"
        )
        assert 12 <= n_head <= 15


def test_filter_keeps_per_domain_head(spark, scored):
    table = domain_threshold_table(scored, (0.5,), approx=False)
    kept = apply_domain_filter(scored, table, 0.5).collect()
    by_src: dict[str, list[float]] = {}
    for _i, src, s in _scored_rows():
        by_src.setdefault(src, []).append(s)
    med = {s: float(np.percentile(v, 50)) for s, v in by_src.items()}
    want = {
        i for i, src, s in _scored_rows() if s <= med[src]
    }
    assert {r["doc_id"] for r in kept} == want
    # schema passes through unchanged
    assert sorted(kept[0].asDict()) == ["avg_nll", "doc_id", "source"]
    # every domain keeps its own half — the point of PER-domain cuts:
    # a global median would keep almost none of the high-nll domain
    kept_src = {}
    for r in kept:
        kept_src[r["source"]] = kept_src.get(r["source"], 0) + 1
    assert all(kept_src[s] == 20 for s in ("web", "books", "code"))


def test_unknown_domain_fails_fast_at_execution(spark, scored):
    table = domain_threshold_table(
        scored.filter(F.col("source") != "code"), (1 / 3, 2 / 3),
        approx=False,
    )
    banded = apply_domain_bands(scored, table)  # plan builds fine
    with pytest.raises(Exception, match="never fit"):
        banded.collect()
    one = domain_threshold_table(
        scored.filter(F.col("source") != "code"), (0.5,), approx=False
    )
    with pytest.raises(Exception, match="never fit"):
        apply_domain_filter(scored, one, 0.5).collect()


def test_guards(spark, scored):
    with pytest.raises(ValueError, match="ascending"):
        domain_threshold_table(scored, (0.5, 0.25))
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        domain_threshold_table(scored, (0.0, 0.5))
    with pytest.raises(ValueError, match="ascending"):
        domain_threshold_table(scored, ())
    table = domain_threshold_table(scored, (1 / 3, 2 / 3), approx=False)
    with pytest.raises(ValueError, match="already exists"):
        apply_domain_bands(
            scored.withColumn("band", F.lit("x")), table
        )
    with pytest.raises(ValueError, match="exactly 2"):
        apply_domain_bands(
            scored, domain_threshold_table(scored, (0.5,), approx=False)
        )
    with pytest.raises(ValueError, match="no quantile"):
        apply_domain_filter(scored, table, 0.9)
    bad = spark.createDataFrame(
        [(1, "web", float("nan"))], "doc_id long, source string, avg_nll double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        domain_threshold_table(bad, (0.5,), approx=False).collect()


def test_plan_shapes(spark, scored):
    """The 100 TB contract: the fit is ONE partial-aggregable
    groupBy(source); application is a BroadcastHashJoin + JVM filter;
    no Python, no cartesian anywhere."""
    table = domain_threshold_table(scored, (1 / 3, 2 / 3), approx=True)
    fit_plan = table._jdf.queryExecution().executedPlan().toString()
    assert "percentile" in fit_plan
    assert "CartesianProduct" not in fit_plan
    banded = apply_domain_bands(scored, table)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    for bad in ("CartesianProduct", "BatchEvalPython", "ArrowEval"):
        assert bad not in plan, plan
    # the fit aggregate was collected ONCE into a literal relation —
    # the application plan must carry no trace of it (re-executing
    # the corpus-scale fit per consumer is the re-scan class)
    assert "percentile" not in plan, plan
    filt = apply_domain_filter(
        scored, domain_threshold_table(scored, (0.5,), approx=True), 0.5
    )
    fplan = filt._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in fplan, fplan
    assert "CartesianProduct" not in fplan
    assert "percentile" not in fplan, fplan


def test_composes_with_h25_scores(spark):
    """The operational loop the r13 verdict asked for: H25 scores →
    per-domain thresholds → banding, on the real documents table."""
    from drive_bc_datapipeline_spark.plans.documents import (
        unigram_logprob_score,
    )
    from drive_bc_datapipeline_spark.tables import load_table

    scores = unigram_logprob_score(spark, SF)
    docs = load_table(spark, SF, "documents").select("doc_id", "source")
    scored = docs.join(scores, "doc_id")
    n = scored.count()
    table = domain_threshold_table(scored, (1 / 3, 2 / 3), approx=True)
    banded = apply_domain_bands(scored, table)
    counts = {
        (r["source"], r["band"]): r["n"]
        for r in banded.groupBy("source", "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(counts.values()) == n  # total coverage, no drops
    srcs = {s for s, _b in counts}
    for s in srcs:
        total = sum(v for (s2, _b), v in counts.items() if s2 == s)
        head = counts.get((s, "head"), 0)
        # approx thresholds on real data: head ∈ [20%, 55%] of domain
        assert 0.2 * total <= head <= 0.55 * total, (s, head, total)
