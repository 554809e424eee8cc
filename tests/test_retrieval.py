"""G19 — reciprocal rank fusion vs a sequential reference."""

from __future__ import annotations

import random

from drive_bc_datapipeline_spark.operators.retrieval import rrf_fuse


def _ref_rrf(rankings, k0):
    """rankings: list of {(q, d): rank}. Returns {(q, d): (score, n)}."""
    fused = {}
    for r in rankings:
        for (q, d), rank in r.items():
            s, n = fused.get((q, d), (0.0, 0))
            fused[(q, d)] = (s + 1.0 / (k0 + rank), n + 1)
    return fused


def _ranking_df(spark, mapping):
    rows = [(q, d, r) for (q, d), r in sorted(mapping.items())]
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_matches_reference_and_orders_deterministically(spark):
    rng = random.Random(11)
    systems = []
    for _ in range(3):  # three retrieval systems, top-10 each
        m = {}
        for q in range(4):
            docs = rng.sample(range(100), 10)
            for i, d in enumerate(docs):
                m[(q, d)] = i + 1
        systems.append(m)
    got = {
        (r["query_id"], r["doc_id"]): (
            r["rrf_score"],
            r["n_rankings"],
            r["fused_rank"],
        )
        for r in rrf_fuse([_ranking_df(spark, m) for m in systems]).collect()
    }
    ref = _ref_rrf(systems, 60)
    assert set(got) == set(ref)
    for key, (score, n) in ref.items():
        assert abs(got[key][0] - score) < 1e-12, key
        assert got[key][1] == n, key
    # fused_rank is a deterministic dense 1..n_q per query, descending
    # score with doc_id tiebreak
    for q in range(4):
        per_q = sorted(
            ((d, v) for (qq, d), v in got.items() if qq == q),
            key=lambda kv: kv[1][2],
        )
        ranks = [v[2] for _, v in per_q]
        assert ranks == list(range(1, len(per_q) + 1))
        keys = [(-v[0], d) for d, v in per_q]
        assert keys == sorted(keys), f"query {q} not score-desc/doc-asc"


def test_rrf_missing_docs_contribute_nothing_and_topk_truncates(spark):
    # doc 1 appears in both rankings, docs 2/3 in one each
    a = {(0, 1): 1, (0, 2): 2}
    b = {(0, 1): 2, (0, 3): 1}
    out = {
        r["doc_id"]: r
        for r in rrf_fuse(
            [_ranking_df(spark, a), _ranking_df(spark, b)], k0=10
        ).collect()
    }
    assert out[1]["n_rankings"] == 2
    assert abs(out[1]["rrf_score"] - (1 / 11 + 1 / 12)) < 1e-12
    assert out[2]["n_rankings"] == 1 and out[3]["n_rankings"] == 1
    # doc 1 (two hits) outranks the single-hit docs; 2 and 3 tie on
    # score (both rank-matched) and break on doc_id
    assert out[1]["fused_rank"] == 1
    assert out[3]["fused_rank"] == 2  # 1/11 > 1/12, so doc 3 before 2
    assert out[2]["fused_rank"] == 3
    top1 = rrf_fuse(
        [_ranking_df(spark, a), _ranking_df(spark, b)], k0=10, top_k=1
    ).collect()
    assert [(r["doc_id"], r["fused_rank"]) for r in top1] == [(1, 1)]
