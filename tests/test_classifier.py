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


# ---------------------------------------------------------------------------
# E9 — train_hashed_linear: the seed-label training half of the
# curation loop, vs a sequential numpy-free reference (the E6/K20/F16
# pattern): full-batch GD on the mean log-loss over normalized hashed
# bucket histograms, bias as a constant feature.
# ---------------------------------------------------------------------------


def _ref_train(rows, *, n_buckets, n_rounds, lr, l2=0.0):
    """rows = [(doc_id, label, text)]; replays train_hashed_linear's
    math sequentially: x = bucket histogram / n_tokens, plus a bias
    feature with x = 1; w -= lr*(grad/n + l2*w), bias unregularized."""
    feats = []
    for _id, y, text in rows:
        toks = [x for x in (text or "").split(" ") if x != ""]
        hist: dict[int, float] = {}
        for tk in toks:
            b = int(hashlib.md5(tk.encode()).hexdigest()[:8], 16) % n_buckets
            hist[b] = hist.get(b, 0.0) + 1.0
        x = {b: c / len(toks) for b, c in hist.items()} if toks else {}
        x[-1] = 1.0  # bias feature
        feats.append((float(y), x))
    n = len(feats)
    model = {-1: 0.0}
    for _ in range(n_rounds):
        grad: dict[int, float] = {}
        for y, x in feats:
            logit = sum(v * model.get(b, 0.0) for b, v in x.items())
            r = 1.0 / (1.0 + math.exp(-logit)) - y
            for b, v in x.items():
                grad[b] = grad.get(b, 0.0) + v * r
        for b, g in grad.items():
            w = model.get(b, 0.0)
            reg = 0.0 if b == -1 else l2 * w
            model[b] = w - lr * (g / n + reg)
    bias = model.pop(-1)
    return model, bias


_SEED_ROWS = [
    # positives: "good clean prose" vocabulary; negatives: junk tokens
    (0, 1, "the quick brown fox jumps over the lazy dog"),
    (1, 1, "a clear sentence with ordinary words and meaning"),
    (2, 1, "ordinary prose reads well and carries meaning"),
    (3, 1, "the dog and the fox are ordinary words"),
    (4, 0, "zx9 qq7 zx9 %%% ### qq7"),
    (5, 0, "%%% ### zx9 vv2 vv2 ###"),
    (6, 0, "qq7 vv2 %%% zx9 ### ###"),
    (7, 0, ""),  # token-less doc: bias-only row
]


def test_train_bit_matches_sequential_reference(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    df = spark.createDataFrame(
        _SEED_ROWS, "doc_id long, label int, text string"
    )
    got_w, got_b = train_hashed_linear(
        spark, df, n_buckets=N_BUCKETS, n_rounds=12, lr=0.5, l2=0.01
    )
    want_w, want_b = _ref_train(
        _SEED_ROWS, n_buckets=N_BUCKETS, n_rounds=12, lr=0.5, l2=0.01
    )
    assert abs(got_b - want_b) < 1e-9
    assert set(got_w) == set(want_w)
    for b, w in want_w.items():
        assert abs(got_w[b] - w) < 1e-9, b


@pytest.mark.slow
def test_trained_model_scores_through_e7_and_separates(spark):
    """Round-trip (r12 verdict Next #3): the trained weights feed
    score_hashed_linear verbatim, reproduce the reference's scores,
    and actually separate the seed classes."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    df = spark.createDataFrame(
        _SEED_ROWS, "doc_id long, label int, text string"
    )
    w, b = train_hashed_linear(
        spark, df, n_buckets=N_BUCKETS, n_rounds=40, lr=1.0
    )
    got = {
        r["doc_id"]: r["score"]
        for r in score_hashed_linear(
            spark, df, w, n_buckets=N_BUCKETS, bias=b
        ).collect()
    }
    # reference scoring with the reference-trained model agrees
    rw, rb = _ref_train(_SEED_ROWS, n_buckets=N_BUCKETS, n_rounds=40, lr=1.0)
    for doc_id, _y, text in _SEED_ROWS:
        toks = [x for x in (text or "").split(" ") if x != ""]
        ws = sum(rw.get(_bucket_py(tk), 0.0) for tk in toks)
        logit = rb + (ws / len(toks) if toks else 0.0)
        assert abs(got[doc_id] - 1.0 / (1.0 + math.exp(-logit))) < 1e-9
    # separation: every positive outscores every labeled negative
    pos = [got[i] for i, y, t in _SEED_ROWS if y == 1]
    neg = [got[i] for i, y, t in _SEED_ROWS if y == 0 and t]
    assert min(pos) > max(neg)
    # and unseen same-vocabulary docs rank the right way
    probe = spark.createDataFrame(
        [(100, "the fox reads ordinary prose"), (101, "zx9 ### vv2 qq7")],
        "doc_id long, text string",
    )
    ps = {
        r["doc_id"]: r["score"]
        for r in score_hashed_linear(
            spark, probe, w, n_buckets=N_BUCKETS, bias=b
        ).collect()
    }
    assert ps[100] > ps[101]


def test_train_guards(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        MAX_LR_BUCKETS,
        MAX_LR_ROUNDS,
        train_hashed_linear,
    )

    df = spark.createDataFrame(
        [(0, 1, "a b"), (1, 0, "c d")], "doc_id long, label int, text string"
    )
    with pytest.raises(ValueError, match="n_rounds"):
        train_hashed_linear(spark, df, n_rounds=0)
    with pytest.raises(ValueError, match="n_rounds"):
        train_hashed_linear(spark, df, n_rounds=MAX_LR_ROUNDS + 1)
    with pytest.raises(ValueError, match="n_buckets"):
        train_hashed_linear(spark, df, n_buckets=MAX_LR_BUCKETS + 1)
    with pytest.raises(ValueError, match="lr"):
        train_hashed_linear(spark, df, lr=0.0)
    bad = spark.createDataFrame(
        [(0, 2, "a b")], "doc_id long, label int, text string"
    )
    with pytest.raises(ValueError, match="binary logistic"):
        train_hashed_linear(spark, bad, n_rounds=1)
    nul = spark.createDataFrame(
        [(0, None, "a b")], "doc_id long, label int, text string"
    )
    with pytest.raises(ValueError, match="binary logistic"):
        train_hashed_linear(spark, nul, n_rounds=1)
    empty = df.filter("doc_id < 0")
    with pytest.raises(ValueError, match="non-empty"):
        train_hashed_linear(spark, empty, n_rounds=1)


def test_train_round_is_broadcast_and_no_python_udf(spark):
    """The per-round gradient plan keeps the model on a broadcast join
    and never leaves the JVM (the E7 plan-property twin)."""
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.operators.classifier import (
        _gradient_frame,
    )

    feats = spark.createDataFrame(
        [(0, 3, 0.5), (0, -1, 1.0), (1, -1, 1.0)],
        "__id long, bucket int, x double",
    )
    docs = spark.createDataFrame(
        [(0, 1.0, 2), (1, 0.0, 0)], "__id long, __y double, __nt int"
    )
    wdf = spark.createDataFrame(
        [(-1, 0.1), (3, -0.2)], "bucket int, weight double"
    )
    g = _gradient_frame(feats, docs, wdf)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    # and it computes what the reference math says on this tiny input
    import math as _m

    p0 = 1.0 / (1.0 + _m.exp(-(0.1 + 0.5 * -0.2)))
    p1 = 1.0 / (1.0 + _m.exp(-0.1))
    want = {3: 0.5 * (p0 - 1.0), -1: (p0 - 1.0) + (p1 - 0.0)}
    got = {r["bucket"]: r["g"] for r in g.collect()}
    assert set(got) == set(want)
    for b in want:
        assert abs(got[b] - want[b]) < 1e-12, b


@pytest.mark.slow
def test_train_random_corpora_property(spark):
    """Property check (derandomized, the BPE/H46 pattern): on random
    small corpora with random binary labels — hash collisions, empty
    docs, single-class batches — the distributed trainer matches the
    sequential reference within float tolerance."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    word = st.text(alphabet="abz#", min_size=1, max_size=4)
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)
    corpus = st.lists(
        st.tuples(doc, st.integers(min_value=0, max_value=1)),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=6, deadline=None, derandomize=True)
    @given(corpus)
    def check(docs_labels):
        rows = [
            (i, y, text) for i, (text, y) in enumerate(docs_labels)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, label int, text string"
        )
        # tiny bucket space forces collisions; few rounds keeps float
        # drift far below tolerance
        got_w, got_b = train_hashed_linear(
            spark, df, n_buckets=7, n_rounds=5, lr=0.8, l2=0.05
        )
        want_w, want_b = _ref_train(
            rows, n_buckets=7, n_rounds=5, lr=0.8, l2=0.05
        )
        assert abs(got_b - want_b) < 1e-9
        assert set(got_w) == set(want_w)
        for b, w in want_w.items():
            assert abs(got_w[b] - w) < 1e-9, b

    check()


@pytest.mark.slow
def test_curation_loop_composes_train_score_filter(spark):
    """The E9→E7 seam, composed (the tokenizer-chain pattern): train
    on labeled seeds, score an unlabeled corpus mixing both
    vocabularies, threshold-filter, and check the kept set is exactly
    the clean-vocabulary docs — plus budget conservation through the
    filter (kept + dropped = scored)."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    seeds = spark.createDataFrame(
        _SEED_ROWS, "doc_id long, label int, text string"
    )
    w, b = train_hashed_linear(
        spark, seeds, n_buckets=N_BUCKETS, n_rounds=40, lr=1.0
    )
    corpus = spark.createDataFrame(
        [
            (200, "the fox and the dog read ordinary prose"),
            (201, "zx9 qq7 ### vv2 %%%"),
            (202, "a clear ordinary sentence with meaning"),
            (203, "### %%% zx9 zx9 qq7 vv2"),
        ],
        "doc_id long, text string",
    )
    scored = score_hashed_linear(
        spark, corpus, w, n_buckets=N_BUCKETS, bias=b
    )
    kept = scored.filter("score >= 0.5")
    dropped = scored.filter("score < 0.5")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {200, 202}
    assert kept.count() + dropped.count() == corpus.count()


# ---------------------------------------------------------------------------
# E10 — classifier_pr_curve: quantized precision/recall curve vs a
# sequential reference — the threshold-selection step between E9
# (train) and E7 (score-and-filter).
# ---------------------------------------------------------------------------


def _ref_pr_curve(rows, n_bins):
    """rows = [(score, label)]; mirrors the quantized rule exactly."""
    per: dict[int, list[int]] = {}
    for s, y in rows:
        b = min(max(int(math.floor(s * n_bins)), 0), n_bins - 1)
        acc = per.setdefault(b, [0, 0])
        acc[0] += 1
        acc[1] += y
    total_pos = sum(np for _n, np in per.values())
    out, kept, pos_kept = [], 0, 0
    for b in sorted(per, reverse=True):
        n, np_ = per[b]
        kept += n
        pos_kept += np_
        p = pos_kept / kept
        r = pos_kept / total_pos if total_pos else None
        if pos_kept > 0:
            f1 = 2 * p * r / (p + r)
        else:
            f1 = 0.0 if r is not None else None
        out.append((b / n_bins, kept, pos_kept, p, r, f1))
    return out


def test_pr_curve_matches_sequential_reference(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        classifier_pr_curve,
    )

    rows = [
        (0.91, 1), (0.87, 1), (0.87, 0), (0.55, 1), (0.52, 0),
        (0.31, 0), (0.12, 1), (0.08, 0), (0.08, 0), (1.0, 1),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = classifier_pr_curve(df, n_bins=20).collect()
    want = _ref_pr_curve(rows, 20)
    assert got[0].asDict() and len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g["threshold"] - w[0]) < 1e-12
        assert (g["n_kept"], g["n_pos_kept"]) == (w[1], w[2])
        for gv, wv in zip((g["precision"], g["recall"], g["f1"]), w[3:]):
            if wv is None:
                assert gv is None
            else:
                assert abs(gv - wv) < 1e-12
    # curve sanity: recall is monotone non-decreasing down the curve
    recs = [g["recall"] for g in got]
    assert recs == sorted(recs)


def test_pr_curve_all_negative_and_guards(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        MAX_PR_BINS,
        classifier_pr_curve,
    )

    neg = spark.createDataFrame(
        [(0.9, 0), (0.1, 0)], "score double, label int"
    )
    rows = classifier_pr_curve(neg, n_bins=10).collect()
    assert all(
        r["recall"] is None and r["f1"] is None and r["precision"] == 0.0
        for r in rows
    )
    with pytest.raises(ValueError, match="n_bins"):
        classifier_pr_curve(neg, n_bins=0)
    with pytest.raises(ValueError, match="n_bins"):
        classifier_pr_curve(neg, n_bins=MAX_PR_BINS + 1)
    # fail fast on anything the score >= t corpus filter would treat
    # differently than the binned curve: NULL/NaN/out-of-range scores
    # (they'd silently pollute bin 0) and non-binary/NULL labels
    for rows, schema in [
        ([(0.5, 3)], "score double, label int"),
        ([(0.5, None)], "score double, label int"),
        ([(None, 1)], "score double, label int"),
        ([(float("nan"), 1)], "score double, label int"),
        ([(-0.25, 1)], "score double, label int"),
        ([(1.75, 1)], "score double, label int"),
    ]:
        bad = spark.createDataFrame(rows, schema).unionByName(neg)
        with pytest.raises(ValueError, match="clean the scored"):
            classifier_pr_curve(bad)


@pytest.mark.slow
def test_pr_curve_composes_with_train_and_score(spark):
    """Full loop: train on seeds (E9), score a labeled eval set (E7),
    pick the best-f1 threshold from the curve (E10), and the implied
    filter keeps exactly the clean docs."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        classifier_pr_curve,
        train_hashed_linear,
    )

    seeds = spark.createDataFrame(
        _SEED_ROWS, "doc_id long, label int, text string"
    )
    w, b = train_hashed_linear(
        spark, seeds, n_buckets=N_BUCKETS, n_rounds=40, lr=1.0
    )
    eval_rows = [
        (300, 1, "the fox and the dog read ordinary prose"),
        (301, 0, "zx9 qq7 ### vv2 %%%"),
        (302, 1, "a clear ordinary sentence with meaning"),
        (303, 0, "### %%% zx9 zx9 qq7 vv2"),
    ]
    ev = spark.createDataFrame(
        eval_rows, "doc_id long, label int, text string"
    )
    scored = score_hashed_linear(
        spark, ev, w, n_buckets=N_BUCKETS, bias=b
    ).join(ev.select("doc_id", "label"), "doc_id")
    curve = classifier_pr_curve(scored, n_bins=1000).collect()
    best = max(curve, key=lambda r: (r["f1"], r["threshold"]))
    assert best["f1"] == 1.0  # separable eval set
    # the quantized keep rule bin(s) >= t*n is exactly s >= t
    # (floor(x) >= k <=> x >= k for integer k), so the corpus filter
    # is a plain predicate on the score column
    kept = {
        r["doc_id"]
        for r in scored.filter(scored.score >= best["threshold"]).collect()
    }
    assert kept == {300, 302}


def test_train_rejects_null_ids_and_negative_l2(spark):
    """Same-round review findings: a NULL doc id would drop out of
    every feature join while still inflating the gradient divisor;
    a negative l2 turns decay into amplification. Both fail fast."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    nul_id = spark.createDataFrame(
        [(None, 1, "a b"), (2, 0, "c d")],
        "doc_id long, label int, text string",
    )
    with pytest.raises(ValueError, match="NULL doc_id"):
        train_hashed_linear(spark, nul_id, n_rounds=1)
    ok = spark.createDataFrame(
        [(0, 1, "a b"), (1, 0, "c d")],
        "doc_id long, label int, text string",
    )
    with pytest.raises(ValueError, match="l2"):
        train_hashed_linear(spark, ok, l2=-0.1)


def test_trainer_and_scorer_share_one_token_definition():
    """The CHAR_SPLIT_RE drift class: train and score must build
    features from the SAME gram definition — pin that both call the
    shared word_grams helper (which itself composes doc_tokens)
    rather than re-typing the expression, and that DSIR's _grams is
    the same one copy."""
    import ast
    import inspect

    from drive_bc_datapipeline_spark.operators import classifier, dsir

    for fn in (classifier.train_hashed_linear, classifier.score_hashed_linear):
        tree = ast.parse(inspect.getsource(fn))
        calls = [
            n.func.id
            for n in ast.walk(tree)
            if isinstance(n, ast.Call) and isinstance(n.func, ast.Name)
        ]
        assert "word_grams" in calls, fn.__name__
        # and neither re-types the split+filter inline
        attrs = [
            n.func.attr
            for n in ast.walk(tree)
            if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
        ]
        assert "split" not in attrs, fn.__name__
    # DSIR's gram definition IS the classifier's (one copy, r16)
    tree = ast.parse(inspect.getsource(dsir._grams))
    calls = [
        n.func.id
        for n in ast.walk(tree)
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Name)
    ]
    assert calls == ["word_grams"]


def test_pr_curve_random_inputs_property(spark):
    """Property check (derandomized): on random score/label sets —
    duplicate scores, one-bin pileups, all-one-class — the quantized
    curve matches the sequential reference exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from drive_bc_datapipeline_spark.operators.classifier import (
        classifier_pr_curve,
    )

    rows_strat = st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0,
                      allow_nan=False, allow_infinity=False),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=6, deadline=None, derandomize=True)
    @given(rows_strat)
    def check(rows):
        df = spark.createDataFrame(rows, "score double, label int")
        got = classifier_pr_curve(df, n_bins=8).collect()
        want = _ref_pr_curve(rows, 8)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert abs(g["threshold"] - w[0]) < 1e-12
            assert (g["n_kept"], g["n_pos_kept"]) == (w[1], w[2])
            for gv, wv in zip(
                (g["precision"], g["recall"], g["f1"]), w[3:]
            ):
                if wv is None:
                    assert gv is None
                else:
                    assert abs(gv - wv) < 1e-12

    check()


# ---------------------------------------------------------------------------
# E11 — isotonic_calibration_table / apply_isotonic_calibration:
# quantized PAV calibration vs an independent sequential reference.
# ---------------------------------------------------------------------------


def _ref_pav(rows, n_bins):
    """Independent PAV: bin identically, then repeatedly sweep the
    full block list merging ANY adjacent violator pair until a fixed
    point — O(n^2), structurally different from the operator's
    single-pass stack."""
    per: dict[int, list[float]] = {}
    for s, y in rows:
        b = min(max(int(math.floor(s * n_bins)), 0), n_bins - 1)
        acc = per.setdefault(b, [0.0, 0.0])
        acc[0] += 1
        acc[1] += y
    blocks = [
        [b, b, per[b][0], per[b][1]] for b in sorted(per)
    ]  # [first, last, n, np]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            a, c = blocks[i], blocks[i + 1]
            if a[3] / a[2] >= c[3] / c[2]:
                blocks[i] = [a[0], c[1], a[2] + c[2], a[3] + c[3]]
                del blocks[i + 1]
                changed = True
                break
    out = {}
    for first, last, n, np_ in blocks:
        for b in sorted(per):
            if first <= b <= last:
                out[b] = (int(per[b][0]), int(per[b][1]), np_ / n)
    return out


def _cal_rows():
    """Deterministic scores/labels with real violations: label rate
    dips in the middle bins so PAV must pool."""
    rows = []
    for i in range(400):
        s = (i % 100) / 100.0 + 0.004
        # base trend up, violation band at 0.4-0.6
        if s < 0.4:
            y = 1 if (i * 7) % 10 < 3 else 0
        elif s < 0.6:
            y = 1 if (i * 7) % 10 < 1 else 0  # the dip
        else:
            y = 1 if (i * 7) % 10 < 8 else 0
        rows.append((float(s), y))
    rows.append((1.0, 1))  # score 1.0 joins the top bin
    rows.append((0.0, 0))
    return rows


def test_isotonic_calibration_matches_independent_pav(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        isotonic_calibration_table,
    )

    rows = _cal_rows()
    df = spark.createDataFrame(rows, "score double, label int")
    got = isotonic_calibration_table(df, n_bins=100)
    want = _ref_pav(rows, 100)
    assert {b for b, _n, _np, _c in got} == set(want)
    for b, n, np_, c in got:
        wn, wnp, wc = want[b]
        assert (n, np_) == (wn, wnp), b
        assert abs(c - wc) < 1e-12, b
    # monotone, bounded, mass-conserving
    cals = [c for _b, _n, _np, c in got]
    assert cals == sorted(cals)
    assert all(0.0 <= c <= 1.0 for c in cals)
    mass = sum(n * c for _b, n, _np, c in got)
    assert abs(mass - sum(np_ for _b, _n, np_, _c in got)) < 1e-9


def test_apply_isotonic_calibration_step_function(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        apply_isotonic_calibration,
        isotonic_calibration_table,
    )

    fit = spark.createDataFrame(
        # occupied bins (n_bins=10): 1 -> 0.0, 5 -> 1.0
        [(0.15, 0), (0.15, 0), (0.55, 1), (0.55, 1)],
        "score double, label int",
    )
    table = isotonic_calibration_table(fit, n_bins=10)
    probe = spark.createDataFrame(
        [(1, 0.05), (2, 0.15), (3, 0.35), (4, 0.55), (5, 0.95), (6, 1.0)],
        "doc_id long, score double",
    )
    got = {
        r["doc_id"]: r["calibrated"]
        for r in apply_isotonic_calibration(
            probe, table, n_bins=10
        ).collect()
    }
    # below lowest occupied bin -> its value; unoccupied -> fill-down;
    # score 1.0 -> top bin -> fill-down from bin 5
    assert got == {1: 0.0, 2: 0.0, 3: 0.0, 4: 1.0, 5: 1.0, 6: 1.0}
    # row count conserved (inner join against a COMPLETE bin table)
    assert len(got) == 6


def test_calibration_guards(spark):
    import pytest

    from drive_bc_datapipeline_spark.operators.classifier import (
        apply_isotonic_calibration,
        isotonic_calibration_table,
    )

    bad = spark.createDataFrame(
        [(float("nan"), 1)], "score double, label int"
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        isotonic_calibration_table(bad, n_bins=10)
    empty = spark.createDataFrame([], "score double, label int")
    with pytest.raises(ValueError, match="non-empty"):
        isotonic_calibration_table(empty, n_bins=10)
    ok = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError, match="n_bins"):
        isotonic_calibration_table(ok, n_bins=0)
    table = isotonic_calibration_table(ok, n_bins=10)
    with pytest.raises(ValueError, match="same n_bins"):
        apply_isotonic_calibration(ok, table, n_bins=2)
    with pytest.raises(ValueError, match="empty"):
        apply_isotonic_calibration(ok, [], n_bins=10)
    # a negative or duplicate bin would strand the fill-down iterator
    # and silently mis-calibrate every row — rejected up front
    with pytest.raises(ValueError, match="unique and in"):
        apply_isotonic_calibration(
            ok, [(-1, 10, 5, 0.5), (5, 10, 9, 0.9)], n_bins=10
        )
    with pytest.raises(ValueError, match="unique and in"):
        apply_isotonic_calibration(
            ok, [(5, 10, 5, 0.5), (5, 10, 9, 0.9)], n_bins=10
        )
    # out-of-domain scores are rejected AT EXECUTION, riding the bin
    # projection (a separate count() would scan the corpus twice)
    with pytest.raises(Exception, match="no bin"):
        apply_isotonic_calibration(
            bad.select("score"), table, n_bins=10
        ).collect()
    # a pre-existing __bin would be silently replaced by withColumn
    # and a pre-existing out_col would duplicate ambiguously after
    # the join — both fail loud (r13 ADVICE)
    has_bin = spark.createDataFrame(
        [(0.5, 3)], "score double, __bin int"
    )
    with pytest.raises(ValueError, match="already has column"):
        apply_isotonic_calibration(has_bin, table, n_bins=10)
    has_out = spark.createDataFrame(
        [(0.5, 0.1)], "score double, calibrated double"
    )
    with pytest.raises(ValueError, match="already has column"):
        apply_isotonic_calibration(has_out, table, n_bins=10)
    # ...and a non-clashing out_col rename passes the guard
    ok_renamed = apply_isotonic_calibration(
        has_out, table, n_bins=10, out_col="calibrated2"
    )
    assert "calibrated2" in ok_renamed.columns


def test_calibrated_threshold_to_raw_inverts_the_step(spark):
    """The raw-score predicate from calibrated_threshold_to_raw must
    classify EVERY score bin exactly as the calibrated gate does —
    checked exhaustively against apply's own fill-down on all bins,
    plus the unreachable-threshold and empty-table guards."""
    import pytest

    from drive_bc_datapipeline_spark.operators.classifier import (
        apply_isotonic_calibration,
        calibrated_threshold_to_raw,
    )

    n_bins = 16
    # occupied bins 2, 5, 11 with a plateau and a jump
    table = [(2, 4, 1, 0.25), (5, 4, 1, 0.25), (11, 4, 3, 0.75)]
    scores = spark.createDataFrame(
        [((b + 0.5) / n_bins,) for b in range(n_bins)], "score double"
    )
    cal = {
        round(r["score"] * n_bins - 0.5): r["calibrated"]
        for r in apply_isotonic_calibration(
            scores, table, n_bins=n_bins
        ).collect()
    }
    for t_cal in (0.1, 0.25, 0.5, 0.75):
        raw_t = calibrated_threshold_to_raw(table, t_cal, n_bins=n_bins)
        for b in range(n_bins):
            want = cal[b] >= t_cal
            got = (b + 0.5) / n_bins >= raw_t
            assert got == want, (t_cal, b)
    with pytest.raises(ValueError, match="keeps nothing"):
        calibrated_threshold_to_raw(table, 0.9, n_bins=n_bins)
    with pytest.raises(ValueError, match="empty"):
        calibrated_threshold_to_raw([], 0.5)
    # same fill-down contract as apply: duplicate, negative, or
    # n_bins-mismatched bins would silently yield a WRONG raw
    # threshold (the one the streaming gate filters with) — fail loud
    with pytest.raises(ValueError, match="unique and in"):
        calibrated_threshold_to_raw(
            [(2, 4, 1, 0.25), (2, 4, 3, 0.75)], 0.5, n_bins=n_bins
        )
    with pytest.raises(ValueError, match="unique and in"):
        calibrated_threshold_to_raw(
            [(-1, 4, 1, 0.25)], 0.5, n_bins=n_bins
        )
    with pytest.raises(ValueError, match="unique and in"):
        calibrated_threshold_to_raw(table, 0.5, n_bins=8)  # 11 >= 8


@pytest.mark.slow
def test_calibration_composes_with_trained_model(spark):
    """E9 -> E11 seam: calibrate a REAL trained model's seed scores,
    apply to a corpus — calibrated values must be probabilities,
    non-decreasing in raw score, and the seed-set calibrated mean
    must equal the seed positive rate (mass conservation through the
    fit)."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        apply_isotonic_calibration,
        isotonic_calibration_table,
        train_hashed_linear,
    )

    seeds = spark.createDataFrame(
        _SEED_ROWS, "doc_id long, label int, text string"
    )
    w, b = train_hashed_linear(
        spark, seeds, n_buckets=N_BUCKETS, n_rounds=40, lr=1.0
    )
    scored = score_hashed_linear(
        spark, seeds, w, n_buckets=N_BUCKETS, bias=b
    ).join(seeds.select("doc_id", "label"), "doc_id")
    table = isotonic_calibration_table(scored, n_bins=100)
    out = apply_isotonic_calibration(scored, table, n_bins=100)
    rows = sorted(
        (r["score"], r["calibrated"]) for r in out.collect()
    )
    assert all(0.0 <= c <= 1.0 for _s, c in rows)
    assert [c for _s, c in rows] == sorted(c for _s, c in rows)
    n_pos = sum(r[1] for r in _SEED_ROWS)
    mean_cal = sum(c for _s, c in rows) / len(rows)
    assert abs(mean_cal - n_pos / len(_SEED_ROWS)) < 1e-9


# ---------------------------------------------------------------------------
# E12 — calibration_report / expected_calibration_error: quantized
# reliability audit vs a sequential reference.
# ---------------------------------------------------------------------------


def _ref_reliability(rows, n_bins):
    """rows = [(score, label)] -> {bin: (n, n_pos, mean_s, rate)},
    plus (ece, mce, brier)."""
    per: dict[int, list[float]] = {}
    for s, y in rows:
        b = min(max(int(math.floor(s * n_bins)), 0), n_bins - 1)
        acc = per.setdefault(b, [0.0, 0.0, 0.0])
        acc[0] += 1
        acc[1] += y
        acc[2] += s
    n_total = sum(a[0] for a in per.values())
    table, ece, mce = {}, 0.0, 0.0
    for b, (n, np_, ssum) in per.items():
        gap = abs(ssum / n - np_ / n)
        table[b] = (int(n), int(np_), ssum / n, np_ / n, gap)
        ece += (n / n_total) * gap
        mce = max(mce, gap)
    brier = sum((s - y) ** 2 for s, y in rows) / n_total
    return table, ece, mce, brier


def test_calibration_report_matches_sequential(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        calibration_report,
        expected_calibration_error,
    )

    rows = _cal_rows()
    df = spark.createDataFrame(rows, "score double, label int")
    table, ece, mce, brier = _ref_reliability(rows, 20)
    got = calibration_report(df, n_bins=20).collect()
    assert [r["bin"] for r in got] == sorted(table)
    for r in got:
        n, np_, mean_s, rate, gap = table[r["bin"]]
        assert r["n"] == n and r["n_pos"] == np_, r["bin"]
        assert abs(r["threshold_lo"] - r["bin"] / 20) < 1e-12
        assert abs(r["mean_score"] - mean_s) < 1e-9
        assert abs(r["observed_rate"] - rate) < 1e-12
        assert abs(r["abs_gap"] - gap) < 1e-9
    summary = expected_calibration_error(df, n_bins=20)
    assert summary["n"] == len(rows)
    assert abs(summary["ece"] - ece) < 1e-9
    assert abs(summary["mce"] - mce) < 1e-9
    assert abs(summary["brier"] - brier) < 1e-9


def test_calibration_report_guards(spark):
    import pytest

    from drive_bc_datapipeline_spark.operators.classifier import (
        calibration_report,
        expected_calibration_error,
    )

    bad = spark.createDataFrame(
        [(1.5, 1)], "score double, label int"
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        calibration_report(bad, n_bins=10)
    with pytest.raises(ValueError, match="NULL/NaN"):
        expected_calibration_error(bad, n_bins=10)
    ok = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError, match="n_bins"):
        calibration_report(ok, n_bins=0)
    empty = spark.createDataFrame([], "score double, label int")
    with pytest.raises(ValueError, match="non-empty"):
        expected_calibration_error(empty, n_bins=10)


def test_isotonic_calibration_improves_ece(spark):
    """E11 -> E12 seam: calibrating a trained model's scores must
    reduce ECE and Brier on the fit set (PAV minimizes squared error
    among monotone functions of the bin)."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        apply_isotonic_calibration,
        expected_calibration_error,
        isotonic_calibration_table,
        train_hashed_linear,
    )

    seeds = spark.createDataFrame(
        _SEED_ROWS, "doc_id long, label int, text string"
    )
    w, b = train_hashed_linear(
        spark, seeds, n_buckets=N_BUCKETS, n_rounds=12, lr=0.4
    )
    scored = score_hashed_linear(
        spark, seeds, w, n_buckets=N_BUCKETS, bias=b
    ).join(seeds.select("doc_id", "label"), "doc_id")
    raw = expected_calibration_error(scored, n_bins=20)
    table = isotonic_calibration_table(scored, n_bins=20)
    cal = (
        apply_isotonic_calibration(scored, table, n_bins=20)
        .drop("score")
        .withColumnRenamed("calibrated", "score")
    )
    after = expected_calibration_error(cal, n_bins=20)
    assert after["brier"] <= raw["brier"] + 1e-12
    assert after["ece"] <= raw["ece"] + 1e-12


def test_calibration_random_inputs_property(spark):
    """Derandomized property sweep (the house pattern): on random
    score/label sets — ties, all-one-bin, all-positive, all-negative
    — the PAV table bit-matches the independent O(n²) reference and
    the reliability scalars match their replay."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from drive_bc_datapipeline_spark.operators.classifier import (
        calibration_report,
        expected_calibration_error,
        isotonic_calibration_table,
    )

    score = st.integers(min_value=0, max_value=10).map(lambda i: i / 10)
    row = st.tuples(score, st.integers(min_value=0, max_value=1))
    rows_strategy = st.lists(row, min_size=1, max_size=20)

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(rows_strategy)
    def check(rows):
        df = spark.createDataFrame(rows, "score double, label int")
        got = isotonic_calibration_table(df, n_bins=10)
        want = _ref_pav(rows, 10)
        assert {b for b, _n, _np, _c in got} == set(want)
        for b, n, np_, c in got:
            wn, wnp, wc = want[b]
            assert (n, np_) == (wn, wnp), b
            assert abs(c - wc) < 1e-12, b
        cals = [c for _b, _n, _np, c in got]
        assert cals == sorted(cals)  # monotone on every input
        mass = sum(n * c for _b, n, _np, c in got)
        assert abs(mass - sum(y for _s, y in rows)) < 1e-9
        table, ece, mce, brier = _ref_reliability(rows, 10)
        summary = expected_calibration_error(df, n_bins=10)
        assert abs(summary["ece"] - ece) < 1e-9
        assert abs(summary["mce"] - mce) < 1e-9
        assert abs(summary["brier"] - brier) < 1e-9
        rep = calibration_report(df, n_bins=10).collect()
        assert [r["bin"] for r in rep] == sorted(table)

    check()


# ---------------------------------------------------------------------------
# r16 — word-n-gram features (the r15 verdict's Next #5): the shared
# word_grams builder, bit-match at both orders, the planted
# token-order A/B only order 2 can separate, and the manifest knob.
# ---------------------------------------------------------------------------


def _py_grams(text: str, n_gram: int) -> list[str]:
    toks = [x for x in (text or "").split(" ") if x != ""]
    if n_gram == 1:
        return toks
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_word_grams_matches_python(spark):
    from drive_bc_datapipeline_spark.operators.classifier import word_grams

    texts = [
        "the quick brown fox",
        "single",
        "",
        "   ",
        "a b",
        "x  y   z",  # multi-space runs collapse through the filter
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for use_bg, order in ((False, 1), (True, 2)):
        got = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id", word_grams("text", use_bigrams=use_bg).alias("g")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _py_grams(t, order), (order, t)


def _ref_seq_scores_grams(rows, weights, bias, n_buckets, n_gram):
    out = {}
    for doc_id, text in rows:
        grams = _py_grams(text, n_gram)
        wsum = sum(
            weights.get(
                int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets,
                0.0,
            )
            for g in grams
        )
        logit = bias + (wsum / len(grams) if grams else 0.0)
        out[doc_id] = (len(grams), 1.0 / (1.0 + math.exp(-logit)))
    return out


def test_score_bigram_features_match_sequential(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "fox brown quick the"),
        (3, ""),
        (4, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in score_hashed_linear(
            spark, df, WEIGHTS, n_buckets=N_BUCKETS, bias=BIAS, n_gram=2
        ).collect()
    }
    want = _ref_seq_scores_grams(rows, WEIGHTS, BIAS, N_BUCKETS, 2)
    for doc_id, (n, s) in want.items():
        assert got[doc_id][0] == n, doc_id
        assert abs(got[doc_id][1] - s) < 1e-9, doc_id
    # n_tokens counts GRAMS at order 2: 2n-1 for an n-word doc
    assert got[1][0] == 7 and got[4][0] == 1 and got[3][0] == 0


def _ref_train_grams(rows, *, n_buckets, n_rounds, lr, n_gram, l2=0.0):
    feats = []
    for _id, y, text in rows:
        grams = _py_grams(text, n_gram)
        hist: dict[int, float] = {}
        for g in grams:
            b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
            hist[b] = hist.get(b, 0.0) + 1.0
        x = {b: c / len(grams) for b, c in hist.items()} if grams else {}
        x[-1] = 1.0
        feats.append((float(y), x))
    n = len(feats)
    model = {-1: 0.0}
    for _ in range(n_rounds):
        grad: dict[int, float] = {}
        for y, x in feats:
            logit = sum(v * model.get(b, 0.0) for b, v in x.items())
            r = 1.0 / (1.0 + math.exp(-logit)) - y
            for b, v in x.items():
                grad[b] = grad.get(b, 0.0) + v * r
        for b, g in grad.items():
            w = model.get(b, 0.0)
            reg = 0.0 if b == -1 else l2 * w
            model[b] = w - lr * (g / n + reg)
    bias = model.pop(-1)
    return model, bias


def test_train_bigram_features_bit_match(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    df = spark.createDataFrame(
        _SEED_ROWS, "doc_id long, label int, text string"
    )
    got_w, got_b = train_hashed_linear(
        spark, df, n_buckets=N_BUCKETS, n_rounds=12, lr=0.5, l2=0.01,
        n_gram=2,
    )
    want_w, want_b = _ref_train_grams(
        _SEED_ROWS, n_buckets=N_BUCKETS, n_rounds=12, lr=0.5, l2=0.01,
        n_gram=2,
    )
    assert abs(got_b - want_b) < 1e-9
    assert set(got_w) == set(want_w)
    for b, w in want_w.items():
        assert abs(got_w[b] - w) < 1e-9, b


@pytest.mark.slow
def test_bigram_features_separate_token_order(spark):
    """The r15 verdict's planted A/B: positive and negative classes
    with IDENTICAL unigram multisets that differ only in token order.
    A bag-of-unigrams model provably cannot separate them (identical
    feature vectors -> identical scores); the bigram feature space
    separates them perfectly."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    pos = "alpha beta gamma delta"
    neg = "delta gamma beta alpha"
    assert sorted(pos.split()) == sorted(neg.split())
    seeds = [(i, 1, pos) for i in range(6)] + [
        (10 + i, 0, neg) for i in range(6)
    ]
    df = spark.createDataFrame(seeds, "doc_id long, label int, text string")

    w1, b1 = train_hashed_linear(
        spark, df, n_buckets=256, n_rounds=40, lr=1.0, n_gram=1
    )
    s1 = {
        r["doc_id"]: r["score"]
        for r in score_hashed_linear(
            spark, df, w1, n_buckets=256, bias=b1, n_gram=1
        ).collect()
    }
    # order-1: the two classes are the same point in feature space
    assert abs(s1[0] - s1[10]) < 1e-9

    w2, b2 = train_hashed_linear(
        spark, df, n_buckets=256, n_rounds=150, lr=2.0, n_gram=2
    )
    s2 = {
        r["doc_id"]: r["score"]
        for r in score_hashed_linear(
            spark, df, w2, n_buckets=256, bias=b2, n_gram=2
        ).collect()
    }
    assert s2[0] > 0.85 and s2[10] < 0.15  # clean separation


def test_n_gram_guard(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    df = spark.createDataFrame(
        [(1, 1, "a b")], "doc_id long, label int, text string"
    )
    with pytest.raises(ValueError, match="n_gram"):
        train_hashed_linear(spark, df, n_gram=3)
    with pytest.raises(ValueError, match="n_gram"):
        score_hashed_linear(spark, df, {0: 1.0}, n_gram=0)


@pytest.mark.slow
def test_curation_manifest_records_n_gram(spark, tmp_path):
    """The n_gram knob rides the curation manifest (the curve_bins
    convention: a scorer at the wrong order reads a drifted feature
    space, so the decision must be auditable) and the gate actually
    separates the order classes at n_gram=2."""
    from drive_bc_datapipeline_spark.jobs import run_curation_pipeline

    pos = "alpha beta gamma delta"
    neg = "delta gamma beta alpha"
    seeds = spark.createDataFrame(
        [(i, 1, pos) for i in range(6)]
        + [(10 + i, 0, neg) for i in range(6)],
        "doc_id long, label int, text string",
    )
    docs = spark.createDataFrame(
        [(100 + i, pos) for i in range(5)]
        + [(200 + i, neg) for i in range(5)],
        "doc_id long, text string",
    )
    target = docs.limit(3)
    m = run_curation_pipeline(
        spark, docs, seeds, target, str(tmp_path / "ng"),
        k=3, n_buckets=256, n_rounds=40, lr=1.0, n_gram=2,
        min_precision=0.9, dsir_buckets=64, n_shards=2,
    )
    assert m["n_gram"] == 2
    # the gate kept exactly the reference-ordered half
    assert m["n_kept"] == 5
