"""DSIR importance resampling (H47) vs sequential references.

Every stage bit-matches a plain-Python replay (the E6/K20/F16
pattern): hashed-ngram counts, the smoothed log-ratio fit, per-doc
log weights (1e-9, the repo float-sum tolerance), and the Gumbel
top-k selection — the last replayed from the same xxhash64 draws via
``hash_unit_py``, so the selected SET and ORDER are asserted exactly.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from drive_bc_datapipeline_spark.operators.dsir import (
    U_BELOW_ONE,
    dsir_bucket_counts,
    dsir_importance_weights,
    dsir_log_ratio,
    dsir_resample,
)
from drive_bc_datapipeline_spark.operators.sampling import hash_unit_py
from tests.conftest import SF_SMOKE

N_BUCKETS = 256
SMOOTH = 1.0
# target = two sources; raw = the whole corpus (self-selection setup,
# exactly the DSIR paper's "match a domain inside the big pile")
TARGET_SOURCES = ("src3", "src7")


def _bucket_py(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _grams_py(text: str | None, use_bigrams: bool = True) -> list[str]:
    toks = [x for x in (text or "").split(" ") if x != ""]
    if not use_bigrams:
        return toks
    return toks + [
        f"{a} {b}" for a, b in zip(toks, toks[1:], strict=False)
    ]


def _docs_rows(where: str = "TRUE") -> list[tuple[int, str]]:
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet' "
        f"WHERE {where} ORDER BY doc_id"
    ).fetchall()


def _counts_py(rows) -> dict[int, int]:
    out: dict[int, int] = {}
    for _id, text in rows:
        for g in _grams_py(text):
            b = _bucket_py(g)
            out[b] = out.get(b, 0) + 1
    return out


def _ratio_py(
    t: dict[int, int], q: dict[int, int]
) -> tuple[dict[int, float], float]:
    nt = sum(t.values()) + SMOOTH * N_BUCKETS
    nq = sum(q.values()) + SMOOTH * N_BUCKETS
    default = math.log(SMOOTH / nt) - math.log(SMOOTH / nq)
    table = {
        b: math.log((t.get(b, 0) + SMOOTH) / nt)
        - math.log((q.get(b, 0) + SMOOTH) / nq)
        for b in set(t) | set(q)
    }
    return table, default


def _weights_py(
    rows, table: dict[int, float], default: float
) -> dict[int, tuple[int, float]]:
    out = {}
    for doc_id, text in rows:
        grams = _grams_py(text)
        out[doc_id] = (
            len(grams),
            sum(table.get(_bucket_py(g), default) for g in grams),
        )
    return out


@pytest.fixture(scope="module")
def fitted(spark):
    """(target_rows, raw_rows, spark target/raw counts, ratio)."""
    from drive_bc_datapipeline_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    src_list = ", ".join(f"'{s}'" for s in TARGET_SOURCES)
    target = docs.filter(docs.source.isin(*TARGET_SOURCES))
    tc = dsir_bucket_counts(target, n_buckets=N_BUCKETS)
    qc = dsir_bucket_counts(docs, n_buckets=N_BUCKETS)
    table, default = dsir_log_ratio(
        tc, qc, n_buckets=N_BUCKETS, smoothing=SMOOTH
    )
    return {
        "docs": docs,
        "target_rows": _docs_rows(f"source IN ({src_list})"),
        "raw_rows": _docs_rows(),
        "table": table,
        "default": default,
    }


def test_bucket_counts_match_sequential(spark, fitted):
    got = {
        int(r["bucket"]): int(r["cnt"])
        for r in dsir_bucket_counts(
            fitted["docs"], n_buckets=N_BUCKETS
        ).collect()
    }
    assert got == _counts_py(fitted["raw_rows"])


def test_log_ratio_matches_sequential(fitted):
    t = _counts_py(fitted["target_rows"])
    q = _counts_py(fitted["raw_rows"])
    want_table, want_default = _ratio_py(t, q)
    assert abs(fitted["default"] - want_default) < 1e-12
    assert set(fitted["table"]) == set(want_table)
    for b, v in want_table.items():
        assert abs(fitted["table"][b] - v) < 1e-12, b


def test_weights_match_sequential(spark, fitted):
    got = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_importance_weights(
            spark,
            fitted["docs"],
            fitted["table"],
            fitted["default"],
            n_buckets=N_BUCKETS,
        ).collect()
    }
    want = _weights_py(
        fitted["raw_rows"], fitted["table"], fitted["default"]
    )
    assert set(got) == set(want)
    for doc_id, (n, w) in want.items():
        assert got[doc_id][0] == n, doc_id
        assert abs(got[doc_id][1] - w) < 1e-9, doc_id


def test_target_docs_weigh_heavier_on_average(spark, fitted):
    """The point of the method: the fitted weights must rank the
    target-matching documents above the rest on average."""
    want = _weights_py(
        fitted["raw_rows"], fitted["table"], fitted["default"]
    )
    target_ids = {d for d, _ in fitted["target_rows"]}
    t_mean = sum(
        w for d, (_, w) in want.items() if d in target_ids
    ) / len(target_ids)
    o_mean = sum(
        w for d, (_, w) in want.items() if d not in target_ids
    ) / (len(want) - len(target_ids))
    assert t_mean > o_mean


def test_zero_gram_docs_keep_neutral_weight(spark, fitted):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            spark,
            df,
            fitted["table"],
            fitted["default"],
            n_buckets=N_BUCKETS,
        ).collect()
    }
    for doc_id in (2, 3, 4):
        assert got[doc_id]["n_grams"] == 0
        assert got[doc_id]["log_w"] == 0.0
    assert got[1]["n_grams"] == 3  # 2 unigrams + 1 bigram


def test_unigram_only_mode(spark):
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    got = dsir_bucket_counts(
        df, n_buckets=N_BUCKETS, use_bigrams=False
    ).collect()
    assert sum(int(r["cnt"]) for r in got) == 3  # no bigrams counted


def _gumbel_key_py(h: int, log_w: float) -> float:
    u = min(hash_unit_py(h), U_BELOW_ONE)
    return log_w - math.log(-math.log(u))


def test_resample_matches_sequential_gumbel_topk(spark, fitted):
    k, seed = 25, 42
    wdf = dsir_importance_weights(
        spark,
        fitted["docs"],
        fitted["table"],
        fitted["default"],
        n_buckets=N_BUCKETS,
    )
    got = [
        r["doc_id"]
        for r in dsir_resample(wdf, k, seed=seed)
        .orderBy("doc_id")
        .collect()
    ]
    # sequential replay: same xxhash64 draws (fetched once from the
    # engine — hash_unit_py takes the raw signed hash), same weights
    from pyspark.sql import functions as F

    hashes = {
        r["doc_id"]: r["h"]
        for r in fitted["docs"]
        .select("doc_id", F.xxhash64("doc_id", F.lit(seed)).alias("h"))
        .collect()
    }
    want_w = _weights_py(
        fitted["raw_rows"], fitted["table"], fitted["default"]
    )
    ranked = sorted(
        want_w,
        key=lambda d: (-_gumbel_key_py(hashes[d], want_w[d][1]), d),
    )
    assert got == sorted(ranked[:k])
    # determinism: a second run selects the identical set
    again = [
        r["doc_id"]
        for r in dsir_resample(wdf, k, seed=seed)
        .orderBy("doc_id")
        .collect()
    ]
    assert again == got
    # a different seed draws a different sample (same weights)
    other = [
        r["doc_id"]
        for r in dsir_resample(wdf, k, seed=seed + 1)
        .orderBy("doc_id")
        .collect()
    ]
    assert other != got


def test_resample_selected_set_skews_toward_weight(spark, fitted):
    """With the fixed seed, the selected docs' mean log_w must exceed
    the corpus mean — deterministic given the seeded draws."""
    wdf = dsir_importance_weights(
        spark,
        fitted["docs"],
        fitted["table"],
        fitted["default"],
        n_buckets=N_BUCKETS,
    )
    rows = {r["doc_id"]: r["log_w"] for r in wdf.collect()}
    sel = [
        r["doc_id"] for r in dsir_resample(wdf, 50, seed=7).collect()
    ]
    sel_mean = sum(rows[d] for d in sel) / len(sel)
    all_mean = sum(rows.values()) / len(rows)
    assert sel_mean > all_mean


def test_resample_is_partial_topk_not_global_sort(spark, fitted):
    """The selection plan must be TakeOrderedAndProject (per-partition
    partial top-k + k-row merge), never a full Sort + Limit."""
    wdf = dsir_importance_weights(
        spark,
        fitted["docs"],
        fitted["table"],
        fitted["default"],
        n_buckets=N_BUCKETS,
    )
    plan = (
        dsir_resample(wdf, 10, seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_validation_errors(spark, fitted):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_bucket_counts(df, n_buckets=0)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_bucket_counts(df, n_buckets=10_000_000)
    tc = dsir_bucket_counts(df, n_buckets=8)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_log_ratio(tc, tc, n_buckets=8, smoothing=0.0)
    with pytest.raises(ValueError, match="outside"):
        # a counts relation fitted at a wider bucket count than the
        # ratio claims — bucket 300 can't exist under n_buckets=8
        big = spark.createDataFrame(
            [(300, 5)], "bucket int, cnt bigint"
        )
        dsir_log_ratio(big, big, n_buckets=8)
    with pytest.raises(ValueError, match="outside"):
        dsir_importance_weights(
            spark, df, {300: 0.1}, 0.0, n_buckets=8
        )
    # NULL and NaN weights are rejected AT EXECUTION, riding the key
    # projection (NULL would sort last and never select; NaN sorts
    # ABOVE every double descending and would always select)
    wdf = spark.createDataFrame(
        [(1, 0.5), (2, None)], "doc_id long, log_w double"
    )
    with pytest.raises(Exception, match="NULL/NaN log_w"):
        dsir_resample(wdf, 1).collect()
    nan_wdf = spark.createDataFrame(
        [(1, 0.5), (2, float("nan"))], "doc_id long, log_w double"
    )
    with pytest.raises(Exception, match="NULL/NaN log_w"):
        dsir_resample(nan_wdf, 1).collect()
    with pytest.raises(ValueError, match="k must be"):
        dsir_resample(wdf.filter("log_w IS NOT NULL"), 0)
    # NULL doc ids fail fast in the weights projection — they would
    # silently take the neutral weight (grams group under NULL, the
    # re-attach join never matches)
    null_id = spark.createDataFrame(
        [(None, "spark shuffle broadcast")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        dsir_importance_weights(
            spark, null_id, {0: 0.1}, 0.0, n_buckets=8
        ).collect()


@pytest.mark.slow
def test_dsir_random_corpora_property(spark):
    """Derandomized property check (the H44/H46 house pattern): on
    random target/raw corpora — OOV-ish grams, empty and NULL texts,
    single-word docs (no bigrams) — the fitted ratio and every
    per-doc weight bit-match the sequential reference, and the
    Gumbel selection returns exactly min(k, n) distinct kept ids."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="xyz@", min_size=1, max_size=4)
    doc = st.one_of(
        st.none(), st.lists(word, min_size=0, max_size=5).map(" ".join)
    )
    corpus = st.lists(doc, min_size=1, max_size=8)

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(corpus, corpus)
    def check(t_rows, q_rows):
        nb = 32
        tdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(t_rows)],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(q_rows)],
            "doc_id long, text string",
        )
        table, default = dsir_log_ratio(
            dsir_bucket_counts(tdf, n_buckets=nb),
            dsir_bucket_counts(qdf, n_buckets=nb),
            n_buckets=nb,
        )

        def bucket(g):
            return (
                int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % nb
            )

        def counts(rows):
            out = {}
            for t in rows:
                for g in _grams_py(t):
                    out[bucket(g)] = out.get(bucket(g), 0) + 1
            return out

        tref, qref = counts(t_rows), counts(q_rows)
        nt = sum(tref.values()) + nb
        nq = sum(qref.values()) + nb
        want_default = math.log(1.0 / nt) - math.log(1.0 / nq)
        assert abs(default - want_default) < 1e-12
        for b in set(tref) | set(qref):
            want = math.log((tref.get(b, 0) + 1) / nt) - math.log(
                (qref.get(b, 0) + 1) / nq
            )
            assert abs(table[b] - want) < 1e-12, b
        got = {
            r["doc_id"]: (r["n_grams"], r["log_w"])
            for r in dsir_importance_weights(
                spark, qdf, table, default, n_buckets=nb
            ).collect()
        }
        assert set(got) == set(range(len(q_rows)))
        for i, t in enumerate(q_rows):
            grams = _grams_py(t)
            want_w = sum(
                table.get(bucket(g), default) for g in grams
            )
            assert got[i][0] == len(grams), i
            assert abs(got[i][1] - want_w) < 1e-9, i
        k = 3
        wdf = dsir_importance_weights(
            spark, qdf, table, default, n_buckets=nb
        )
        sel = [r["doc_id"] for r in dsir_resample(wdf, k, seed=1).collect()]
        assert len(sel) == len(set(sel)) == min(k, len(q_rows))

    check()


def test_gumbel_top1_inclusion_matches_softmax(spark):
    """The sampling LAW, not just determinism: for k=1, P(doc drawn)
    under the Gumbel trick equals softmax(log_w) exactly. Replay the
    selection over 600 seeds (sequentially, from engine-fetched
    xxhash64 draws — the same arithmetic dsir_resample executes) and
    check empirical inclusion against the analytic softmax within 4σ;
    spot-check 3 seeds against the distributed operator."""
    from pyspark.sql import functions as F

    docs = [(1, 0.0), (2, 1.0), (3, 2.0), (4, -1.0), (5, 0.5)]
    wdf = spark.createDataFrame(docs, "doc_id long, log_w double")
    n_seeds = 600
    # all (seed, doc) hashes in ONE job
    hdf = (
        wdf.crossJoin(
            spark.range(n_seeds).withColumnRenamed("id", "seed")
        )
        .select(
            "doc_id",
            "seed",
            F.xxhash64("doc_id", F.col("seed").cast("int")).alias("h"),
        )
        .collect()
    )
    # xxhash64(col, lit(seed)) hashes the INT literal; make sure the
    # cross-joined variant used int seeds too (it did: cast above)
    lw = dict(docs)
    wins: dict[int, int] = {d: 0 for d, _ in docs}
    by_seed: dict[int, list] = {}
    for r in hdf:
        by_seed.setdefault(r["seed"], []).append((r["doc_id"], r["h"]))
    for seed, entries in by_seed.items():
        best = max(
            entries,
            key=lambda e: (_gumbel_key_py(e[1], lw[e[0]]), -e[0]),
        )
        wins[best[0]] += 1
    z = sum(math.exp(w) for _d, w in docs)
    for d, w in docs:
        p = math.exp(w) / z
        sigma = math.sqrt(p * (1 - p) / n_seeds)
        assert abs(wins[d] / n_seeds - p) < 4 * sigma + 1e-9, (
            d, wins[d] / n_seeds, p
        )
    # the distributed operator agrees with the replay on 3 seeds
    for seed in (0, 7, 123):
        [row] = dsir_resample(wdf, 1, seed=seed).collect()
        want = max(
            ((d, h) for d, s, h in [
                (r["doc_id"], r["seed"], r["h"]) for r in hdf
            ] if s == seed),
            key=lambda e: (_gumbel_key_py(e[1], lw[e[0]]), -e[0]),
        )[0]
        assert row["doc_id"] == want, seed
