"""F16 — exact substring-run dedup vs a sequential reference.

The reference enumerates length-L token windows as tuples (no hashing),
counts them, unions duplicated windows into position sets, and derives
masked-run stats and the cut text by brute force — the trusted twin of
the operator's hash-aggregate + lag-window formulation (the E6/K20
test pattern: distributed algebra vs sequential ground truth).
"""

from __future__ import annotations

import random

from drive_bc_datapipeline_spark.operators.substring_dedup import (
    duplicated_span_stats,
    mask_duplicated_spans,
)


def _reference(docs, L, min_count=2, cross_doc_only=False):
    toks = {d: [t for t in txt.split(" ") if t] for d, txt in docs}
    occ: dict[tuple, list] = {}
    for d, tk in toks.items():
        for p in range(0, len(tk) - L + 1):
            occ.setdefault(tuple(tk[p : p + L]), []).append((d, p))
    dup_pos = {d: set() for d in toks}
    dup_windows = {d: 0 for d in toks}
    for lst in occ.values():
        dup = (
            len({d for d, _ in lst}) >= 2
            if cross_doc_only
            else len(lst) >= min_count
        )
        if not dup:
            continue
        for d, p in lst:
            dup_windows[d] += 1
            dup_pos[d].update(range(p, p + L))
    out = {}
    for d, tk in toks.items():
        pos = sorted(dup_pos[d])
        runs = sum(
            1
            for i, p in enumerate(pos)
            if i == 0 or p > pos[i - 1] + 1
        )
        out[d] = {
            "n_tokens": len(tk),
            "dup_windows": dup_windows[d],
            "masked_tokens": len(pos),
            "masked_runs": runs,
            "masked_frac": round(len(pos) / len(tk), 6) if tk else 0.0,
            "text_masked": " ".join(
                t for i, t in enumerate(tk) if i not in dup_pos[d]
            ),
        }
    return out


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _assert_matches(spark, docs, L, min_count=2, cross_doc_only=False):
    ref = _reference(docs, L, min_count, cross_doc_only)
    df = _docs_df(spark, docs)
    got = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(
            df, min_len=L, min_count=min_count, cross_doc_only=cross_doc_only
        ).collect()
    }
    assert set(got) == set(ref)
    for d, exp in ref.items():
        row = got[d]
        for k in (
            "n_tokens",
            "dup_windows",
            "masked_tokens",
            "masked_runs",
            "masked_frac",
        ):
            assert row[k] == exp[k], (d, k, row[k], exp[k])
    cut = {
        r["doc_id"]: (r["text_masked"], r["masked_tokens"])
        for r in mask_duplicated_spans(
            df, min_len=L, min_count=min_count, cross_doc_only=cross_doc_only
        ).collect()
    }
    for d, exp in ref.items():
        assert cut[d] == (exp["text_masked"], exp["masked_tokens"]), d


def test_planted_spans_and_edges(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    docs = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"one two three {shared} four five"),
        # intra-doc repeat of a 4-token run (masked at min_count=2,
        # untouched under cross_doc_only)
        (3, "x y z w PAD x y z w"),
        (4, "short doc"),  # shorter than L: zero windows
        (5, ""),  # empty text: zero tokens, frac 0.0
        (6, "totally unique tokens here nothing repeats at all ever"),
    ]
    _assert_matches(spark, docs, L=4)
    _assert_matches(spark, docs, L=4, cross_doc_only=True)
    # cross_doc_only must NOT mask doc 3's intra-doc repeat
    df = _docs_df(spark, docs)
    by_id = {
        r["doc_id"]: r["masked_tokens"]
        for r in duplicated_span_stats(
            df, min_len=4, cross_doc_only=True
        ).collect()
    }
    assert by_id[3] == 0
    by_id = {
        r["doc_id"]: r["masked_tokens"]
        for r in duplicated_span_stats(df, min_len=4).collect()
    }
    assert by_id[3] == 8  # both copies of the 4-token run


def test_adjacent_runs_merge_and_whole_doc_duplicate(spark):
    # doc 1 repeats "a b c" twice back-to-back and doc 2 carries one
    # copy: with L=3 the two dup windows in doc 1 sit at gap == L and
    # their masked spans touch — ONE maximal run of 6 tokens.
    docs = [
        (1, "a b c a b c"),
        (2, "pad a b c pad2 qq rr"),
        (3, "pad a b c pad2 ss tt"),  # whole 3-gram shared again
    ]
    _assert_matches(spark, docs, L=3)
    stats = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(
            _docs_df(spark, docs), min_len=3
        ).collect()
    }
    assert stats[1]["masked_tokens"] == 6
    assert stats[1]["masked_runs"] == 1
    # docs 2/3 share "pad a b c pad2" (length 5 > L): union of three
    # overlapping dup windows = one 5-token run, frac 5/7
    assert stats[2]["masked_tokens"] == 5
    assert stats[2]["masked_runs"] == 1
    assert stats[2]["masked_frac"] == round(5 / 7, 6)
    # full-doc duplicate corner: frac reaches exactly 1.0
    whole = [(1, "u v w u v w"), (2, "u v w u v w")]
    whole_stats = duplicated_span_stats(
        _docs_df(spark, whole), min_len=3
    ).collect()
    assert all(r["masked_frac"] == 1.0 for r in whole_stats)


def test_seeded_random_corpora_match_reference(spark):
    # Tiny vocabulary forces organic repeats; three seeds sweep corpus
    # shapes (plus per-corpus planted cross-doc spans).
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for seed in (7, 19, 42):
        rng = random.Random(seed)
        docs = []
        plant = " ".join(rng.choices(vocab, k=6))
        for d in range(12):
            n = rng.randrange(0, 30)
            words = rng.choices(vocab, k=n)
            if d % 3 == 0 and n > 4:
                words[rng.randrange(0, n - 4)] = plant  # splice a span
            docs.append((d, " ".join(words)))
        _assert_matches(spark, docs, L=3)
        _assert_matches(spark, docs, L=3, cross_doc_only=True)
        _assert_matches(spark, docs, L=5, min_count=3)
