"""H44 — distributed BPE tokenizer training vs a sequential reference
(the E6/K20/F16 pattern): the merge sequence, every pair count, and
the segmentations must bit-match a plain-Python replay of Sennrich
et al.'s algorithm over the same corpus."""

from __future__ import annotations

import duckdb
import pytest

from drive_bc_datapipeline_spark.operators.bpe import (
    EOW,
    MAX_JVM_SEGMENT_MERGES,
    MAX_MERGES,
    bpe_segment,
    bpe_segment_jvm,
    bpe_train,
    bpe_train_df,
)
from tests.conftest import SF_SMOKE

# ---------------------------------------------------------------------------
# Sequential reference: get_stats counts every adjacent occurrence
# (overlaps included); apply is greedy left-to-right non-overlapping;
# tie-break = (count desc, pair lexicographic asc).
# ---------------------------------------------------------------------------


def _seq_apply(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _seq_train(texts: list[str], n_merges: int, min_count: int = 2):
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: tuple(list(w) + [EOW]) for w in words}
    merges = []
    for rank in range(n_merges):
        stats: Counter = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += c
        if not stats:
            break
        (left, right), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < min_count:
            break
        merges.append((rank, left, right, left + right, n))
        syms = {w: _seq_apply(s, left, right) for w, s in syms.items()}
    return merges


def _seq_segment(word: str, merges) -> list[str]:
    syms = tuple(list(word) + [EOW])
    for _rank, left, right, _m, _n in merges:
        syms = _seq_apply(syms, left, right)
    return list(syms)


def _smoke_texts(limit: int | None = None) -> list[str]:
    q = f"SELECT text FROM '{SF_SMOKE}/documents.parquet' ORDER BY doc_id"
    if limit:
        q += f" LIMIT {limit}"
    return [r[0] for r in duckdb.sql(q).fetchall()]


def test_bpe_train_bit_matches_sequential_reference(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = bpe_train(d, 24)
    want = _seq_train(_smoke_texts(), 24)
    assert got == want
    assert len(got) == 24  # this corpus has >= 24 productive merges


def test_bpe_train_df_shape_and_order(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = bpe_train_df(d, 6)
    rows = out.collect()
    assert out.columns == [
        "merge_rank", "left", "right", "merged", "pair_count",
    ]
    assert [r["merge_rank"] for r in rows] == list(range(6))
    # counts are non-increasing ONLY per-pair-lifetime, not globally,
    # but every merged symbol must be its parts concatenated
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_bpe_greedy_overlap_and_early_stop(spark):
    # [a,a,a]: pair (a,a) counts overlaps (2 per 'aaa'), but greedy
    # apply merges non-overlapping left-to-right -> [aa, a, </w>]
    d = spark.createDataFrame(
        [(0, "aa aa aaa")], "doc_id long, text string"
    )
    merges = bpe_train(d, MAX_MERGES)
    want = _seq_train(["aa aa aaa"], MAX_MERGES)
    assert merges == want
    assert merges[0][1:] == ("a", "a", "aa", 4)  # 2x'aa' + 2 overlaps
    # early stop: every remaining pair eventually drops below
    # min_count=2, well before MAX_MERGES rounds
    assert len(merges) < MAX_MERGES


def test_bpe_segment_matches_sequential_replay(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    merges = bpe_train(d, 16)
    seg = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_segment(d.limit(40), merges).collect()
    }
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet' "
        "ORDER BY doc_id LIMIT 40"
    ).fetchall()
    for doc_id, text in texts:
        want = [
            s for w in text.split(" ") if w for s in _seq_segment(w, merges)
        ]
        assert seg[doc_id] == (want, len(want)), doc_id


@pytest.mark.slow
def test_bpe_random_corpora_property(spark):
    """Property check (derandomized, Spark round-trip per example so
    the example count stays small): on random small corpora over a
    3-letter alphabet — maximal pair-count ties, overlap-heavy words —
    the distributed trainer bit-matches the sequential reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(corpus)
    def check(texts):
        d = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        assert bpe_train(d, 8, min_count=2) == _seq_train(texts, 8)

    check()


def test_bpe_segment_jvm_bit_matches_arrow_path(spark):
    """The zero-Python JVM fold segmenter (r11 verdict Next #6) must
    produce the exact rows of the Arrow-batched path — same corpus,
    same merges, including newline-bearing words and unseen chars —
    and refuse merge lists past its nesting bound."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
    merges = bpe_train(d, MAX_JVM_SEGMENT_MERGES)[:MAX_JVM_SEGMENT_MERGES]
    probe = d.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(100000, "foo\n q@z unseen"), (100001, "")],
            "doc_id long, text string",
        )
    )
    arrow = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_segment(probe, merges).collect()
    }
    jvm = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_segment_jvm(probe, merges).collect()
    }
    assert jvm == arrow
    with pytest.raises(ValueError, match="Arrow-batched"):
        fake = [(i, f"x{i}", "y", f"x{i}y", 2) for i in range(
            MAX_JVM_SEGMENT_MERGES + 1
        )]
        bpe_segment_jvm(d, fake)


def test_bpe_segment_jvm_documented_divergence_and_null_text(spark):
    """The JVM path replays merges once in list order; bpe_segment
    runs the canonical min-rank greedy loop which can RE-apply an
    earlier merge whose pair a later merge recreates. Pin the
    documented divergence example, and that NULL text yields zero
    tokens (not size(NULL) = -1) on both paths."""
    d = spark.createDataFrame(
        [(0, "abc"), (1, None)], "doc_id long, text string"
    )
    # hand-built: rank-1 (b,c)->bc recreates rank-0's pair (a,bc)
    merges = [(0, "a", "bc", "abc", 9), (1, "b", "c", "bc", 9)]
    arrow = {r["doc_id"]: r["tokens"] for r in bpe_segment(d, merges).collect()}
    jvm = {r["doc_id"]: r["tokens"] for r in bpe_segment_jvm(d, merges).collect()}
    assert arrow[0] == ["abc", EOW]  # min-rank re-applies merge 0
    assert jvm[0] == ["a", "bc", EOW]  # in-order replay cannot
    # NULL text: zero tokens on both paths, never a negative count
    for out in (bpe_segment(d, merges), bpe_segment_jvm(d, merges)):
        row = {r["doc_id"]: (r["tokens"], r["n_tokens"]) for r in out.collect()}
        assert row[1] == ([], 0)


def test_bpe_train_words_with_trailing_newlines(spark):
    """Regression (r11 ADVICE): the char-split regex must use \\z, not
    Java's $ — $ also matches BEFORE a final line terminator, so a word
    ending in \\n (or \\r\\n) kept its last char fused to the
    terminator as one two-char initial symbol, silently diverging from
    the sequential reference's list(word)."""
    texts = ["foo\n foo\n bar", "foo\n baz\r\n baz\r\n", "a\nb a\nb"]
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = bpe_train(d, 12, min_count=2)
    want = _seq_train(texts, 12, min_count=2)
    assert got == want
    # the buggy regex would have produced an 'o\n' initial symbol; the
    # learned merges must instead build it from 'o' and '\n'
    assert any(m[1] == "o" and m[2] == "\n" for m in got) or any(
        "\n" in (m[1] + m[2]) for m in got
    )


def test_bpe_segment_carries_caller_id_type(spark):
    """Regression (r11 ADVICE): the output schema must derive the id
    field's type from the input, not hardcode long."""
    d = spark.createDataFrame(
        [("d0", "aa aa aaa"), ("d1", "aa bb")], "doc_id string, text string"
    )
    merges = bpe_train(d, 4, min_count=2)
    out = bpe_segment(d, merges)
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = {r["doc_id"]: r["tokens"] for r in out.collect()}
    assert rows["d0"] == [
        s for w in "aa aa aaa".split(" ") for s in _seq_segment(w, merges)
    ]


def test_bpe_guards(spark):
    d = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 1"):
        bpe_train(d, 0)
    with pytest.raises(ValueError, match="dedicated tokenizer"):
        bpe_train(d, MAX_MERGES + 1)
    empty = spark.createDataFrame([(0, " ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one word"):
        bpe_train(empty, 4)


def test_bpe_non_bmp_code_point_split(spark):
    """Regression (r12 ADVICE): the shared CHAR_SPLIT_RE must break
    between CODE POINTS, never inside a UTF-16 surrogate pair. Without
    the (?![\\uDC00-\\uDFFF]) assertion, bpe_train learned
    lone-surrogate merges the Arrow segmenter (list(word) = code
    points) never applied, and bpe_segment_jvm returned fewer tokens
    than bpe_segment for the same trained merges on any emoji-bearing
    corpus."""
    texts = [
        "\U0001F600a \U0001F600a b\U0001F600b",
        "\U0001F600a c\U0001F600 c\U0001F600",
        "\U0001D54Ax \U0001D54Ax \U0001F600a",
    ]
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(d, 8, min_count=2)
    want = _seq_train(texts, 8, min_count=2)
    assert merges == want
    # no learned symbol may contain a lone surrogate half
    for _rank, left, right, merged, _n in merges:
        for sym in (left, right, merged):
            assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in sym), sym
    # the emoji participates in merges as ONE code point
    assert any("\U0001F600" in m[3] for m in merges)
    # both segmenters agree, including an unseen non-BMP char
    probe = d.unionByName(
        spark.createDataFrame(
            [(100, "\U0001F984 unseen\U0001F600")],
            "doc_id long, text string",
        )
    )
    arrow = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_segment(probe, merges).collect()
    }
    jvm = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_segment_jvm(probe, merges).collect()
    }
    assert jvm == arrow
    # and the unseen emoji survived as a single whole-char token
    assert "\U0001F984" in arrow[100][0]
