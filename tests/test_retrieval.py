"""G19 — reciprocal rank fusion + bounded MLT lexical ranking vs
sequential references."""

from __future__ import annotations

import random

import pytest

from drive_bc_datapipeline_spark.operators.retrieval import (
    mlt_token_jaccard_ranking,
    rrf_fuse,
)


def _ref_rrf(rankings, k0):
    """rankings: list of {(q, d): rank}. Returns {(q, d): (score, n)}
    with the score quantized exactly like the operator (QUANT_EPS
    nudge + 6 dp — rrf_score is returned quantized since r10)."""
    fused = {}
    for r in rankings:
        for (q, d), rank in r.items():
            s, n = fused.get((q, d), (0.0, 0))
            fused[(q, d)] = (s + 1.0 / (k0 + rank), n + 1)
    return {k: (round(s + 1e-9, 6), n) for k, (s, n) in fused.items()}


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
        assert abs(got[key][0] - score) < 1e-9, key
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
    assert abs(out[1]["rrf_score"] - round(1 / 11 + 1 / 12 + 1e-9, 6)) < 1e-9
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


# ---------------------------------------------------------------------------
# G19 lexical side — bounded more-like-this token-Jaccard ranking.
# Sequential reference replays the df screen, the rarest-M query-term
# cap, and the Jaccard rank math; corner tests pin the two bounds
# functionally (a universal token never produces a candidate; tokens
# beyond the M rarest never produce one either).
# ---------------------------------------------------------------------------


def _ref_mlt(docsets, n_queries, max_df_frac, max_query_terms, cand_k):
    """docsets: {doc_id: set(tokens)} -> {(q, d): rank}."""
    n = len(docsets)
    df = {}
    for toks in docsets.values():
        for tok in toks:
            df[tok] = df.get(tok, 0) + 1
    keep = {tok for tok, c in df.items() if c <= n * max_df_frac}
    scr = {d: {tok for tok in toks if tok in keep} for d, toks in docsets.items()}
    out = {}
    for q in range(n_queries):
        qtoks = sorted(scr[q], key=lambda tok: (df[tok], tok))[:max_query_terms]
        qset, scored = set(qtoks), []
        for d, ctoks in scr.items():
            if d == q:
                continue
            i = len(qset & ctoks)
            if i:
                scored.append((-(i / (len(qset) + len(ctoks) - i)), d))
        for rnk, (_s, d) in enumerate(sorted(scored)[:cand_k], start=1):
            out[(q, d)] = rnk
    return out


def _toks_df(spark, docsets):
    rows = [(d, tok) for d, toks in docsets.items() for tok in sorted(toks)]
    return spark.createDataFrame(rows, "doc_id long, tok string")


def _run_mlt(spark, docsets, **kw):
    from pyspark.sql import functions as F

    n_queries = kw.pop("n_queries")
    got = mlt_token_jaccard_ranking(
        _toks_df(spark, docsets), F.col("doc_id") < n_queries, **kw
    ).collect()
    return {(r["query_id"], r["doc_id"]): r["rank"] for r in got}


def test_mlt_matches_sequential_reference(spark):
    rng = random.Random(17)
    # Zipf-ish vocabulary: token t has weight ~ 1/(t+1), docs draw 8-20
    # (fixed-width names so Python and Spark tie-break identically)
    vocab = [f"t{t:02d}" for t in range(40)]
    weights = [1.0 / (t + 1) for t in range(40)]
    docsets = {
        d: set(rng.choices(vocab, weights=weights, k=rng.randint(8, 20)))
        for d in range(30)
    }
    kw = dict(max_df_frac=0.6, max_query_terms=5, cand_k=4)
    got = _run_mlt(spark, docsets, n_queries=6, **kw)
    want = _ref_mlt(docsets, 6, **kw)
    assert got == want


def test_mlt_df_screen_drops_universal_tokens(spark):
    # 'stop' is in every doc; docs 3/4 share ONLY 'stop' with query 0,
    # so they must never appear; csz must also exclude 'stop': doc 1
    # {stop, a} has screened size 1, so Jaccard(q0, d1) = 1/2 (not 1/3)
    # and d1 ties d2 ({stop, a, zz} -> 1/2? no: i=1, qsz=1, csz=2 -> 1/2
    # vs d2 i=1, qsz=1, csz=2 -> 1/2) — both 1/2, tiebreak doc_id.
    docsets = {
        0: {"stop", "a"},
        1: {"stop", "a"},
        2: {"stop", "a", "zz"},
        3: {"stop", "b"},
        4: {"stop"},
    }
    got = _run_mlt(
        spark, docsets, n_queries=1, max_df_frac=0.9, max_query_terms=16,
        cand_k=10,
    )
    want = _ref_mlt(docsets, 1, 0.9, 16, 10)
    assert got == want
    assert (0, 3) not in got and (0, 4) not in got
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2


def test_mlt_rarest_m_cap_excludes_common_query_terms(spark):
    # Query 0 holds 3 tokens; with max_query_terms=2 only the two
    # rarest ('r1' df=2, 'r2' df=3) survive — doc 3, sharing only the
    # commonest ('c' df=4), must not be a candidate.
    docsets = {
        0: {"r1", "r2", "c"},
        1: {"r1", "x"},
        2: {"r2", "c", "y"},
        3: {"c", "z"},
        4: {"r2", "c"},
    }
    got = _run_mlt(
        spark, docsets, n_queries=1, max_df_frac=1.0, max_query_terms=2,
        cand_k=10,
    )
    want = _ref_mlt(docsets, 1, 1.0, 2, 10)
    assert got == want
    assert (0, 3) not in got
    assert {d for (_q, d) in got} == {1, 2, 4}


def _ref_bm25_mlt(
    doclists, n_queries, max_df_frac, max_query_terms, cand_k,
    k1=1.2, b=0.75,
):
    """doclists: {doc_id: [tokens with multiplicity]} -> {(q, d): rank}.
    Replays the screen, the rarest-M cap, Okapi scoring against the
    capped query terms, 6-dp quantization, and the rank tiebreak."""
    import math

    docsets = {d: set(t) for d, t in doclists.items()}
    df = {}
    for toks in docsets.values():
        for tok in toks:
            df[tok] = df.get(tok, 0) + 1
    dls = {d: len(t) for d, t in doclists.items() if t}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    keep = {tok for tok, c in df.items() if c <= n_docs * max_df_frac}
    out = {}
    for q in range(n_queries):
        qterms = sorted(
            (tok for tok in docsets[q] if tok in keep),
            key=lambda tok: (df[tok], tok),
        )[:max_query_terms]
        scored = []
        for d, toks in doclists.items():
            if d == q:
                continue
            s = 0.0
            for tok in qterms:
                tf = toks.count(tok)
                if tf:
                    idf = math.log(
                        1.0 + (n_docs - df[tok] + 0.5) / (df[tok] + 0.5)
                    )
                    s += (
                        idf * tf * (k1 + 1.0)
                        / (tf + k1 * (1.0 - b + b * dls[d] / avgdl))
                    )
            if s > 0.0:
                scored.append((-round(s + 1e-9, 6), d))
        for rnk, (_s, d) in enumerate(sorted(scored)[:cand_k], start=1):
            out[(q, d)] = rnk
    return out


def test_bm25_mlt_matches_sequential_reference(spark):
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.operators.retrieval import (
        bm25_mlt_ranking,
        mlt_candidate_terms,
    )

    rng = random.Random(23)
    vocab = [f"t{t:02d}" for t in range(30)]
    weights = [1.0 / (t + 1) for t in range(30)]
    doclists = {
        d: rng.choices(vocab, weights=weights, k=rng.randint(6, 25))
        for d in range(25)
    }
    kw = dict(max_df_frac=0.7, max_query_terms=5)
    # mirror the plan's wiring: distinct stream w/ dl for terms+stats,
    # non-distinct stream for tf
    toks = spark.createDataFrame(
        [
            (d, len(t), tok)
            for d, t in doclists.items()
            for tok in sorted(set(t))
        ],
        "doc_id long, dl int, tok string",
    )
    tf_toks = spark.createDataFrame(
        [(d, len(t), tok) for d, t in doclists.items() for tok in t],
        "doc_id long, dl int, tok string",
    )
    _scr, qt = mlt_candidate_terms(toks, F.col("doc_id") < 5, **kw)
    stats = (
        toks.groupBy("doc_id")
        .agg(F.min("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("__n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias(
                "__avgdl"
            ),
        )
    )
    got = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25_mlt_ranking(tf_toks, qt, stats, cand_k=6).collect()
    }
    want = _ref_bm25_mlt(doclists, 5, cand_k=6, **kw)
    assert got == want


def test_bm25_tf_col_path_matches_default_path(spark):
    """The tf_col fast path trusts a one-row-per-(doc, token) caller
    contract (r11 ADVICE): pin that a correctly pre-aggregated relation
    scores bit-identically to the default occurrence path, and that a
    contract-violating duplicated relation diverges (double-counts) —
    the failure mode the docstring names."""
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.operators.retrieval import (
        bm25_mlt_ranking,
        mlt_candidate_terms,
    )

    rng = random.Random(31)
    vocab = [f"t{t:02d}" for t in range(20)]
    weights = [1.0 / (t + 1) for t in range(20)]
    doclists = {
        d: rng.choices(vocab, weights=weights, k=rng.randint(6, 20))
        for d in range(20)
    }
    occ = spark.createDataFrame(
        [(d, len(t), tok) for d, t in doclists.items() for tok in t],
        "doc_id long, dl int, tok string",
    )
    # the hybrid plan's shape: occurrences collapsed to distinct w/ tf
    pre = occ.groupBy("doc_id", "dl", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    _scr, qt = mlt_candidate_terms(
        pre, F.col("doc_id") < 4, max_df_frac=0.7, max_query_terms=5,
        tokens_distinct=True,
    )
    stats = (
        pre.groupBy("doc_id")
        .agg(F.min("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("__n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias(
                "__avgdl"
            ),
        )
    )

    def ranks(tf_toks, **kws):
        return {
            (r["query_id"], r["doc_id"]): r["rank"]
            for r in bm25_mlt_ranking(
                tf_toks, qt, stats, cand_k=6, **kws
            ).collect()
        }

    default = ranks(occ)
    fast = ranks(pre, tf_col="tf")
    assert fast == default
    # contract violation: duplicating only the even docs' rows doubles
    # THEIR tf (the saturation term grows with tf), so boosted docs
    # must leapfrog at least one rank — proving the path really skips
    # dedup and the caller contract is load-bearing
    dup = ranks(
        pre.unionAll(pre.filter(F.col("doc_id") % 2 == 0)), tf_col="tf"
    )
    assert dup != default


def test_quantization_epsilon_matches_registry():
    """The operator layer's QUANT_EPS must never drift from the plans
    layer's EPS4 — both sides of every oracle comparison quantize with
    the same nudge."""
    from drive_bc_datapipeline_spark.operators import retrieval
    from drive_bc_datapipeline_spark.plans import registry

    assert retrieval.QUANT_EPS == registry.EPS4


def test_mlt_duplicate_rows_do_not_corrupt_scores(spark):
    """r10 review fix: with tokens_distinct=False (default) duplicate
    (doc, tok) rows are deduped up front, so rankings are identical to
    the distinct input — duplicates previously inflated qsz/csz/i."""
    from pyspark.sql import functions as F

    docsets = {
        0: {"a", "b", "c"},
        1: {"a", "b"},
        2: {"b", "c", "d"},
        3: {"d", "e"},
    }
    clean = _toks_df(spark, docsets)
    dup_rows = [(d, tok) for d, toks in docsets.items() for tok in sorted(toks)]
    dup = spark.createDataFrame(
        dup_rows + dup_rows[::2], "doc_id long, tok string"
    )
    kw = dict(max_df_frac=1.0, max_query_terms=2, cand_k=10)
    want = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in mlt_token_jaccard_ranking(
            clean, F.col("doc_id") < 1, **kw
        ).collect()
    }
    got = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in mlt_token_jaccard_ranking(
            dup, F.col("doc_id") < 1, **kw
        ).collect()
    }
    assert got == want and want  # non-empty and duplicate-invariant


def test_mlt_rejects_reserved_columns(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "a", 1)], "doc_id long, tok string, __df long"
    )
    with pytest.raises(ValueError, match="__-prefixed"):
        mlt_token_jaccard_ranking(df, F.col("doc_id") < 1)


def test_hybrid_rrf_plan_pins_the_df_cap(spark):
    """The gated G19 plan must carry the bounded lexical shape: the df
    screen's __df filter rides the capped-query-term pin (qt is
    localCheckpoint'd, so the screen/cap subtree never re-runs per
    consumer), the Jaccard and BM25 sides join broadcast(qt), and no
    cartesian product except the two 1-row stats broadcasts. Parquet
    scans: 2 embeddings (G1's cosine shape) and ZERO documents — the
    r11 single-tokenize replan pins the tf-annotated distinct-token
    relation, so every lexical consumer (screen, Jaccard, BM25, stats)
    reads the checkpoint, never the text again."""
    from drive_bc_datapipeline_spark.plans.embeddings import (
        hybrid_rrf_search_topk,
    )
    from tests.conftest import SF_SMOKE

    df = hybrid_rrf_search_topk(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # the df screen's broadcast filter survives in the Jaccard corpus
    # side (the rarest-M cap lives inside the materialized qt pin and
    # is pinned functionally by the corner tests above)
    assert "__df" in plan, plan
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 2, plan
    assert sum("embeddings" in ln for ln in scans) == 2, plan
    assert sum("documents" in ln for ln in scans) == 0, plan


# ---------------------------------------------------------------------------
# G20 — IVF-PQ composition vs a sequential reference that replays the
# exact integer-grid math (the E6/K20/F16 pattern): coarse cosine cell
# routing (left-assoc double chains), grid quantization, two Lloyd
# rounds with floor((2S+n)/2n) centroid updates, (dist, cluster)
# arg-min codes, query LUTs, and ADC over probed-cell candidates only.
# ---------------------------------------------------------------------------


def _seq_ivfpq(sf_dir: str, nprobe: int):
    import math

    import duckdb

    from drive_bc_datapipeline_spark.plans.embeddings import (
        IVF_NLIST,
        KM_GRID,
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUB_DIM,
        TOP_K,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: emb for vid, emb in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    nrm = {v: math.sqrt(dot(e, e)) for v, e in vecs.items()}

    def cell_rank(vid):
        scores = sorted(
            (-(dot(vecs[vid], vecs[c]) / (nrm[vid] * nrm[c])), c)
            for c in range(IVF_NLIST)
        )
        return [c for _, c in scores]

    assign_cell = {v: cell_rank(v)[0] for v in vecs}
    probes = {qid: cell_rank(qid)[:nprobe] for qid in range(N_QUERIES)}

    grid = {
        v: [math.floor(float(x) * KM_GRID + 0.5) for x in vecs[v]]
        for v in vecs
    }
    sub_pos = {s: range(s * PQ_SUB_DIM, (s + 1) * PQ_SUB_DIM) for s in range(PQ_M)}

    def centroids_from(code_of):
        sums, cnts = {}, {}
        for v in vecs:
            for s in range(PQ_M):
                cl = code_of[(v, s)]
                for p in sub_pos[s]:
                    k = (s, cl, p)
                    sums[k] = sums.get(k, 0) + grid[v][p]
                    cnts[k] = cnts.get(k, 0) + 1
        return {
            k: math.floor((2.0 * sums[k] + cnts[k]) / (2.0 * cnts[k]))
            for k in sums
        }

    def codes_from(cent):
        live = {}
        for (s, cl, _p) in cent:
            live.setdefault(s, set()).add(cl)
        out = {}
        for v in vecs:
            for s in range(PQ_M):
                best = None
                for cl in sorted(live[s]):
                    dist = 0
                    for p in sub_pos[s]:
                        dq = grid[v][p] - cent[(s, cl, p)]
                        dist += dq * dq
                    if best is None or (dist, cl) < best:
                        best = (dist, cl)
                out[(v, s)] = best[1]
        return out

    a0 = {(v, s): v % PQ_K for v in vecs for s in range(PQ_M)}
    c1 = centroids_from(codes_from(centroids_from(a0)))
    codes = codes_from(c1)

    expected = []
    for qid in range(N_QUERIES):
        lut = {}
        for s in range(PQ_M):
            for cl in {cl for (s2, cl, _p) in c1 if s2 == s}:
                lut[(s, cl)] = sum(
                    (grid[qid][p] - c1[(s, cl, p)]) ** 2 for p in sub_pos[s]
                )
        cands = [
            v
            for v in vecs
            if v != qid and assign_cell[v] in probes[qid]
        ]
        scored = sorted(
            (sum(lut[(s, codes[(v, s)])] for s in range(PQ_M)), v)
            for v in cands
        )
        for rnk, (adist, v) in enumerate(scored[:TOP_K], start=1):
            expected.append((qid, v, rnk, math.sqrt(float(adist)) / KM_GRID))
    return expected


def test_ivfpq_matches_sequential_reference(spark):
    from drive_bc_datapipeline_spark.plans.embeddings import (
        IVF_NPROBE,
        ann_ivfpq_topk,
    )
    from tests.conftest import SF_SMOKE

    got = [
        tuple(r)
        for r in ann_ivfpq_topk(spark, SF_SMOKE, nprobe=IVF_NPROBE)
        .orderBy("query_id", "rnk")
        .collect()
    ]
    want = _seq_ivfpq(SF_SMOKE, IVF_NPROBE)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        assert abs(g[3] - w[3]) < 1e-6, (g, w)


def test_ivfpq_prunes_to_probed_cells(spark):
    """The ADC candidate stream must be a strict subset of the
    brute-force pairing: every returned neighbor's assigned cell is in
    the query's probe list, and the final plan keeps the pinned-
    relation discipline (zero parquet re-scans survive, no cartesian)."""
    from drive_bc_datapipeline_spark.plans.embeddings import ann_ivfpq_topk
    from tests.conftest import SF_SMOKE

    df = ann_ivfpq_topk(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert plan.count("FileScan parquet") == 0, plan
    # windows: per-query rank only, never a global sort
    assert "windowspecdefinition(query_id" in plan, plan
