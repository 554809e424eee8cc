"""Target-conditioned LM scoring (operators/lm_score.py) — the CCNet
scorer that feeds domain_filter.

Evidence: a sequential pure-Python reference (same smoothing formula,
dimension-by-dimension accumulation at 1e-9), OOV semantics, the
lower-perplexity-for-reference-like-text property, guards, plan pins
(no Python, no cartesian beyond the 1-row scalar ride), and the full
CCNet-triple composition (reference LM → corpus scores → per-domain
bands) on the real documents table.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.operators.lm_score import (
    score_docs_under_lm,
    unigram_lm_table,
)

SF = "/root/testdata/sf0.001"

REF = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the dog sleeps while the fox runs"),
    (3, "quick brown foxes and lazy dogs"),
]
DOCS = [
    (10, "web", "the quick fox and the lazy dog"),      # reference-like
    (11, "web", "zx9 qq7 blorp gnar wibble"),           # all OOV
    (12, "book", "the the the the"),                    # high-p tokens
    (13, "book", "fox dog unseen1 unseen2"),            # half OOV
]
ALPHA = 0.5


def _seq_lm():
    freq: dict[str, int] = {}
    for _i, t in REF:
        for tok in t.split(" "):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
    N = float(sum(freq.values()))
    V = float(len(freq))
    denom = N + ALPHA * (V + 1.0)
    logp = {t: math.log2((n + ALPHA) / denom) for t, n in freq.items()}
    oov = math.log2(ALPHA / denom)
    return logp, oov


def _seq_score(text: str) -> tuple[int, float]:
    logp, oov = _seq_lm()
    toks = [t for t in text.split(" ") if t]
    s = 0.0
    for t in toks:  # accumulate token-by-token, the repo float rule
        s += logp.get(t, oov)
    return len(toks), -s / len(toks)


@pytest.fixture()
def lm(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    return unigram_lm_table(ref, alpha=ALPHA)


def test_lm_table_matches_sequential(spark, lm):
    logp, oov = _seq_lm()
    rows = lm.collect()
    got = {r["tok"]: r["logp"] for r in rows}
    assert got.pop(None) == pytest.approx(oov, abs=1e-9)
    assert set(got) == set(logp)
    for t, lp in logp.items():
        assert got[t] == pytest.approx(lp, abs=1e-9)
    # the smoothed distribution sums to 1 over V types + OOV
    total = sum(2 ** lp for lp in logp.values()) + 2 ** oov
    assert total == pytest.approx(1.0, abs=1e-9)


def test_scores_match_sequential(spark, lm):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, source string, text string"
    )
    got = {
        r["doc_id"]: (r["n_toks"], r["avg_nll"])
        for r in score_docs_under_lm(docs, lm).collect()
    }
    assert set(got) == {10, 11, 12, 13}
    for i, _src, t in DOCS:
        n, nll = _seq_score(t)
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(nll, abs=1e-9)
    # reference-like text scores LOWER (better) than OOV soup
    assert got[10][1] < got[11][1]
    # the all-OOV doc's nll is exactly the OOV mass
    _lp, oov = _seq_lm()
    assert got[11][1] == pytest.approx(-oov, abs=1e-9)


def test_tokenless_docs_drop_and_guards(spark, lm):
    docs = spark.createDataFrame(
        [(1, ""), (2, "the fox")], "doc_id long, text string"
    )
    got = score_docs_under_lm(docs, lm).collect()
    assert [r["doc_id"] for r in got] == [2]
    with pytest.raises(ValueError, match="alpha"):
        unigram_lm_table(docs, alpha=0.0)
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty reference"):
        unigram_lm_table(empty)
    with pytest.raises(ValueError, match="OOV row"):
        score_docs_under_lm(docs, lm.filter(F.col("tok").isNotNull()))


def test_plan_shapes(spark, lm):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, source string, text string"
    )
    scored = score_docs_under_lm(docs, lm)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BatchEvalPython", "ArrowEval"):
        assert bad not in plan, plan
    # the vocabulary pin: the LM side reads the checkpoint, never a
    # re-tokenization of the reference corpus
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan


def test_ccnet_triple_composes(spark):
    """reference LM → corpus scores → per-domain thresholds → bands,
    on the real documents table: every scored doc gets a band, and
    each domain's head is its own lowest-nll third (the per-domain
    point — heads are per-source, not a global cut)."""
    from drive_bc_datapipeline_spark.operators.domain_filter import (
        apply_domain_bands,
        domain_threshold_table,
    )
    from drive_bc_datapipeline_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    # reference = one source's docs; score EVERYTHING under it
    ref = docs.filter(F.col("source") == "src0").select("text")
    lm = unigram_lm_table(ref)
    scored = score_docs_under_lm(docs, lm).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    n = scored.count()
    table = domain_threshold_table(scored, (1 / 3, 2 / 3), approx=True)
    banded = apply_domain_bands(scored, table)
    rows = banded.collect()
    assert len(rows) == n
    per_src_head_max: dict[str, float] = {}
    per_src_tail_min: dict[str, float] = {}
    for r in rows:
        if r["band"] == "head":
            per_src_head_max[r["source"]] = max(
                per_src_head_max.get(r["source"], -1e9), r["avg_nll"]
            )
        elif r["band"] == "tail":
            per_src_tail_min[r["source"]] = min(
                per_src_tail_min.get(r["source"], 1e9), r["avg_nll"]
            )
    for src in per_src_head_max:
        if src in per_src_tail_min:
            # inside a domain, every head doc beats every tail doc
            assert per_src_head_max[src] <= per_src_tail_min[src]


def test_run_ccnet_prefilter_job(spark, tmp_path):
    """The K7-style operational wrapper for the CCNet triple: one
    call fits the reference LM, scores the corpus once, cuts each
    domain's tail at q, and writes kept/ + a manifest with the
    per-source thresholds. Counts reconcile; token-less docs are
    reported dropped; reruns reproduce the decisions."""
    import json

    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    # 3 domains x 12 docs: half reference-like, half OOV soup, plus
    # one token-less doc that must be dropped-and-counted
    rows = []
    i = 0
    for src in ("web", "books", "code"):
        for j in range(6):
            rows.append((i, src, "the quick fox dog %d" % j)); i += 1
        for j in range(6):
            rows.append((i, src, "zx%d qq%d blorp gnar" % (j, j))); i += 1
    rows.append((i, "web", ""))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out1 = str(tmp_path / "ccnet1")
    m1 = run_ccnet_prefilter(spark, docs, ref, out1, q=0.5)
    assert m1["n_docs"] == 37
    assert m1["n_scored"] == 36
    assert m1["n_tokenless_dropped"] == 1
    assert set(m1["thresholds"]) == {"web", "books", "code"}
    kept = spark.read.parquet(m1["path"])
    assert kept.count() == m1["n_kept"]
    # each domain cut its own tail: every domain keeps ~half, and the
    # kept halves are the reference-like docs (lower nll)
    per_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(6 <= per_src[s] <= 7 for s in ("web", "books", "code"))
    for r in kept.collect():
        assert "fox" in r["text"] or "quick" in r["text"], r["text"]
    # the audit columns ride the kept output
    assert {"n_toks", "avg_nll"} <= set(kept.columns)
    with open(f"{out1}/ccnet_manifest.json") as f:
        assert json.load(f)["thresholds"] == m1["thresholds"]
    # rerun reproduces every decision
    m2 = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "ccnet2"), q=0.5
    )
    for key in ("n_docs", "n_scored", "n_kept", "thresholds"):
        assert m2[key] == m1[key], key
