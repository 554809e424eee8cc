"""H45 — distributed unigram-LM tokenizer training vs a sequential
reference (the E6/K20/F16 pattern): the piece table (pieces, Viterbi
counts, log-probs) and the segmentations must bit-match a plain-Python
replay of the deterministic Viterbi-EM variant over the same corpus.
The reference re-implements the DP independently (same semantics, not
the same code), so a bug in the operator's fold can't self-certify."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from drive_bc_datapipeline_spark.operators.unigram import (
    MAX_SEED_PIECES,
    UNK_LOGP,
    unigram_segment,
    unigram_train,
)
from tests.conftest import SF_SMOKE

# ---------------------------------------------------------------------------
# Sequential reference.
# ---------------------------------------------------------------------------


def _ref_viterbi(word, logp, max_len):
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(min(i, max_len), 0, -1):
            lp = logp.get(word[i - ln : i])
            if lp is None:
                continue
            s = best[i - ln] + lp
            if s > best[i]:
                best[i], back[i] = s, ln
        if back[i] == 0:
            best[i], back[i] = best[i - 1] + UNK_LOGP, 1
    out, i = [], n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    return out[::-1]


def _ref_train(texts, vocab_size, max_piece_len=8, min_count=2,
               keep_frac=0.75):
    words = Counter(w for t in texts for w in t.split(" ") if w)
    seed: Counter = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + ln]] += c
    vocab = {
        p: c for p, c in seed.items() if c >= min_count or len(p) == 1
    }

    def logprobs(counts):
        lt = math.log(float(sum(counts.values())))
        return {p: math.log(c) - lt for p, c in counts.items()}

    def em(logp):
        counts: Counter = Counter()
        for w, c in words.items():
            for piece in _ref_viterbi(w, logp, max_piece_len):
                counts[piece] += c
        return counts

    for _ in range(32):
        counts = em(logprobs(vocab))
        vocab = {
            p: counts.get(p, 1 if len(p) == 1 else 0)
            for p in vocab
            if len(p) == 1 or counts.get(p, 0) > 0
        }
        multi = [(p, c) for p, c in vocab.items() if len(p) > 1]
        chars = [(p, c) for p, c in vocab.items() if len(p) == 1]
        target = max(vocab_size - len(chars), 0)
        if len(multi) <= target:
            break
        keep = max(target, min(math.ceil(len(multi) * keep_frac),
                               len(multi) - 1))
        multi.sort(key=lambda pc: (-pc[1], pc[0]))
        vocab = dict(chars + multi[:keep])
        if keep == target:
            break
    counts = em(logprobs(vocab))
    vocab = {
        p: counts.get(p, 1 if len(p) == 1 else 0)
        for p in vocab
        if len(p) == 1 or counts.get(p, 0) > 0
    }
    lps = logprobs(vocab)
    return sorted(
        ((p, c, lps[p]) for p, c in vocab.items()),
        key=lambda t: (-t[1], t[0]),
    )


def _smoke_texts(limit=None):
    q = f"SELECT text FROM '{SF_SMOKE}/documents.parquet' ORDER BY doc_id"
    if limit:
        q += f" LIMIT {limit}"
    return [r[0] for r in duckdb.sql(q).fetchall()]


def test_unigram_train_bit_matches_sequential_reference(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = unigram_train(d, 200, max_piece_len=6, min_count=3)
    want = _ref_train(_smoke_texts(), 200, max_piece_len=6, min_count=3)
    assert got == want
    n_chars = sum(1 for p, _c, _l in got if len(p) == 1)
    assert len(got) <= max(200, n_chars)
    assert any(len(p) > 1 for p, _c, _l in got)  # learned real pieces


def test_unigram_segment_matches_reference_and_handles_unseen(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pieces = unigram_train(d, 120, max_piece_len=6, min_count=3)
    logp = {p: lp for p, _c, lp in pieces}
    max_len = max(len(p) for p in logp)
    probe = spark.createDataFrame(
        [(0, _smoke_texts(1)[0]), (1, "zzz@@ unseen"), (2, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["pieces"], r["n_pieces"])
        for r in unigram_segment(probe, pieces).collect()
    }
    for doc_id, txt in [(0, _smoke_texts(1)[0]), (1, "zzz@@ unseen"), (2, "")]:
        want = [
            p for w in txt.split(" ") if w
            for p in _ref_viterbi(w, logp, max_len)
        ]
        assert got[doc_id] == (want, len(want)), doc_id
    # every word segments totally, even with chars outside the corpus
    assert "".join(got[1][0]) == "zzz@@unseen"


def test_unigram_random_corpora_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=6, deadline=None, derandomize=True)
    @given(corpus)
    def check(texts):
        d = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = unigram_train(d, 6, max_piece_len=4, min_count=2)
        assert got == _ref_train(texts, 6, max_piece_len=4, min_count=2)

    check()


def test_unigram_guards(spark):
    d = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 1"):
        unigram_train(d, 0)
    with pytest.raises(ValueError, match="keep_frac"):
        unigram_train(d, 4, keep_frac=1.0)
    empty = spark.createDataFrame([(0, " ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one word"):
        unigram_train(empty, 4)
    # r11 ADVICE: max_piece_len=0 would make sequence(1, 0) descend and
    # seed empty-string pieces — must fail fast, like min_count=0
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_train(d, 4, max_piece_len=0)
    with pytest.raises(ValueError, match="min_count"):
        unigram_train(d, 4, min_count=0)
    assert MAX_SEED_PIECES == 262_144  # the documented model-state bound


def test_unigram_segment_carries_caller_id_type(spark):
    """Regression (r11 ADVICE): the output schema must derive the id
    field's type from the input, not hardcode long."""
    d = spark.createDataFrame(
        [("d0", "ab ab abc"), ("d1", "ab c")], "doc_id string, text string"
    )
    pieces = unigram_train(d, 8, max_piece_len=3, min_count=2)
    out = unigram_segment(d, pieces)
    assert dict(out.dtypes)["doc_id"] == "string"
    logp = {p: lp for p, _c, lp in pieces}
    max_len = max(len(p) for p in logp)
    rows = {r["doc_id"]: r["pieces"] for r in out.collect()}
    assert rows["d0"] == [
        p for w in "ab ab abc".split(" ")
        for p in _ref_viterbi(w, logp, max_len)
    ]


def test_unigram_seed_guard_trips_before_collect(spark):
    """The MAX_SEED_PIECES guard must raise (naming the knobs to turn)
    before any piece row reaches the driver: 40 distinct 1000-char
    words at min_count=1 seed ~40k·8 unique substrings > 262,144."""
    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrst"
    words = [
        "".join(rng.choice(alpha) for _ in range(1500))
        for _ in range(80)
    ]
    d = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="MAX_SEED_PIECES"):
        unigram_train(d, 50, min_count=1)

def test_unigram_non_bmp_code_point_pieces(spark):
    """The r12 ADVICE surrogate bug class, unigram side: Spark's
    substring() (the JVM seed enumeration) and Python slicing (the
    reference + the Arrow Viterbi) must agree on CODE-POINT semantics
    for non-BMP chars — train and segment on an emoji corpus must
    bit-match the sequential reference with no surrogate-half
    pieces."""
    texts = [
        "\U0001F600ab \U0001F600ab x\U0001F600",
        "\U0001F600ab cc cc x\U0001F600",
    ]
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pieces = unigram_train(d, 24, max_piece_len=4, min_count=2)
    want = _ref_train(texts, 24, max_piece_len=4, min_count=2)
    assert pieces == want
    for p, _c, _lp in pieces:
        assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in p), p
    assert any("\U0001F600" in p for p, _c, _lp in pieces)
    logp = {p: lp for p, _c, lp in pieces}
    max_len = max(len(p) for p in logp)
    got = {
        r["doc_id"]: r["pieces"]
        for r in unigram_segment(d, pieces).collect()
    }
    for doc_id, txt in enumerate(texts):
        assert got[doc_id] == [
            p for w in txt.split(" ") if w
            for p in _ref_viterbi(w, logp, max_len)
        ]
