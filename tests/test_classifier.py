"""Hashed linear classifier inference (E7) vs a sequential reference."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from drive_bc_datapipeline_spark.operators.classifier import (
    hash_bucket,
    score_hashed_linear,
)
from tests.conftest import SF_SMOKE

N_BUCKETS = 512
BIAS = -0.25
# deterministic toy model: odd buckets pull up, every 7th pulls down
WEIGHTS = {b: (0.8 if b % 2 else -0.3) for b in range(0, N_BUCKETS, 7)}


def _bucket_py(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _seq_scores(sf_dir: str) -> dict[int, tuple[int, float]]:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    out = {}
    for doc_id, text in rows:
        toks = [x for x in (text or "").split(" ") if x != ""]
        wsum = sum(WEIGHTS.get(_bucket_py(tk), 0.0) for tk in toks)
        logit = BIAS + (wsum / len(toks) if toks else 0.0)
        out[doc_id] = (len(toks), 1.0 / (1.0 + math.exp(-logit)))
    return out


def test_matches_sequential_reference(spark):
    from drive_bc_datapipeline_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in score_hashed_linear(
            spark, docs, WEIGHTS, n_buckets=N_BUCKETS, bias=BIAS
        ).collect()
    }
    want = _seq_scores(SF_SMOKE)
    assert set(got) == set(want)
    for doc_id, (n, s) in want.items():
        assert got[doc_id][0] == n, doc_id
        assert abs(got[doc_id][1] - s) < 1e-9, doc_id


def test_empty_doc_scores_bias_and_oov_weighs_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    # model that contains NO bucket any token hashes to → wsum 0
    out = {
        r["doc_id"]: r
        for r in score_hashed_linear(
            spark, df, {511: 9.9}, n_buckets=2, bias=0.5
        ).collect()
    }
    sig = 1.0 / (1.0 + math.exp(-0.5))
    assert out[2]["n_tokens"] == 0 and abs(out[2]["score"] - sig) < 1e-12
    assert out[3]["n_tokens"] == 0 and abs(out[3]["score"] - sig) < 1e-12
    # bucket 511 can't exist with n_buckets=2, so tokens weigh 0 too
    assert out[1]["n_tokens"] == 2 and abs(out[1]["score"] - sig) < 1e-12


def test_rejects_empty_model(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        score_hashed_linear(spark, df, {})


def test_model_is_broadcast_and_no_python_udf(spark):
    from drive_bc_datapipeline_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    df = score_hashed_linear(spark, docs, WEIGHTS, n_buckets=N_BUCKETS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_hash_bucket_matches_python_twin(spark):
    toks = ["spark", "table", "merge", "a", "émoji✓"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["b"]
        for r in df.select(
            "tok", hash_bucket(df.tok, N_BUCKETS).alias("b")
        ).collect()
    }
    assert got == {t: _bucket_py(t) for t in toks}
