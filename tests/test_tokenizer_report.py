"""H46 — tokenizer fertility/compression readout vs a sequential
reference (the E6/K20/F16/H44/H45 pattern): every counter and every
ratio must bit-match a plain-Python replay over the same corpus, for
both tokenizer families, including the OOV fallback and the
zero-denominator edge."""

from __future__ import annotations

import duckdb

from drive_bc_datapipeline_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_train,
)
from drive_bc_datapipeline_spark.operators.tokenizer_report import (
    UNK_ID,
    bpe_vocab,
    encode_token_ids,
    token_id_table,
    tokenizer_fertility_report,
    unigram_vocab,
)
from drive_bc_datapipeline_spark.operators.unigram import (
    unigram_segment,
    unigram_train,
)
from tests.conftest import SF_SMOKE

OUT_COLS = [
    "source",
    "n_docs",
    "n_words",
    "n_tokens",
    "n_text_bytes",
    "n_oov_tokens",
    "pieces_per_word",
    "bytes_per_token",
    "oov_token_rate",
]


def _ref_report(rows, seg_word, vocab: set[str]):
    """rows = [(source, text)]; seg_word(word) -> list[str]."""
    per: dict[str, list[int]] = {}
    for source, text in rows:
        words = [w for w in text.split(" ") if w]
        toks = [t for w in words for t in seg_word(w)]
        acc = per.setdefault(source, [0, 0, 0, 0, 0])
        acc[0] += 1
        acc[1] += len(words)
        acc[2] += len(toks)
        acc[3] += len(text.encode("utf-8"))
        acc[4] += sum(1 for t in toks if t not in vocab)
    out = []
    for source in sorted(per, key=lambda s: (s is not None, s or "")):
        nd, nw, nt, nb, noov = per[source]
        out.append(
            (
                source,
                nd,
                nw,
                nt,
                nb,
                noov,
                nt / nw if nw else None,
                nb / nt if nt else None,
                noov / nt if nt else None,
            )
        )
    return out


def _smoke_rows(limit: int):
    return duckdb.sql(
        f"SELECT source, text FROM '{SF_SMOKE}/documents.parquet' "
        f"ORDER BY doc_id LIMIT {limit}"
    ).fetchall()


def _seq_bpe_segment(word: str, merges) -> list[str]:
    syms = list(word) + [EOW]
    for _rank, left, right, _m, _n in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_fertility_report_bit_matches_reference(spark):
    d = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("doc_id < 120")
        .select("doc_id", "source", "text")
    )
    merges = bpe_train(d, 16)
    seg = bpe_segment(d, merges)
    vocab_df = bpe_vocab(d, merges)
    got = tokenizer_fertility_report(d, seg, vocab_df)
    assert got.columns == OUT_COLS
    rows = _smoke_rows(120)
    vocab = {r["token"] for r in vocab_df.collect()}
    want = _ref_report(rows, lambda w: _seq_bpe_segment(w, merges), vocab)
    assert [tuple(r) for r in got.collect()] == want
    # on its own training corpus a BPE vocab covers everything
    assert all(r[5] == 0 for r in want)
    assert all(r[6] is not None and r[6] >= 1.0 for r in want)


def test_unigram_fertility_report_counts_oov_fallback(spark):
    """Segment a PROBE corpus with chars the training corpus never saw:
    the Viterbi falls back to raw chars at UNK_LOGP and the report must
    count exactly those tokens as OOV, per source."""
    from drive_bc_datapipeline_spark.operators.unigram import _viterbi

    train = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("doc_id < 80")
        .select("doc_id", "source", "text")
    )
    pieces = unigram_train(train, 120, max_piece_len=6, min_count=3)
    probe_rows = [
        (0, "srcA", _smoke_rows(1)[0][1]),
        (1, "srcA", "zzz@@ unseen"),
        (2, "srcB", "@@@"),
        (3, "srcC", ""),  # zero words/tokens: NULL ratios, 0 OOV
    ]
    probe = spark.createDataFrame(
        probe_rows, "doc_id long, source string, text string"
    )
    seg = unigram_segment(probe, pieces)
    got = tokenizer_fertility_report(
        probe, seg, unigram_vocab(probe, pieces), tokens_col="pieces"
    )
    logp = {p: lp for p, _c, lp in pieces}
    max_len = max(len(p) for p in logp)
    want = _ref_report(
        [(s, t) for _i, s, t in probe_rows],
        lambda w: _viterbi(w, logp, max_len),
        set(logp),
    )
    assert [tuple(r) for r in got.collect()] == want
    by_src = {r[0]: r for r in want}
    assert by_src["srcB"][5] > 0  # the all-unseen probe counted as OOV
    assert by_src["srcC"][6] is None  # NULL, not NaN/div-by-zero
    assert by_src["srcC"][5] == 0


def test_report_null_source_keeps_its_oov_count(spark):
    """A NULL source is a legal group: a plain equi-join between the
    counter aggregate and the OOV aggregate would never match it
    (NULL = NULL is false) and coalesce its real OOV count to 0 —
    masking the go/no-go signal. The null-safe join must keep it."""
    from drive_bc_datapipeline_spark.operators.unigram import (
        _viterbi,
        unigram_segment,
        unigram_train,
    )

    train = spark.createDataFrame(
        [(0, "s", "ab ab abc c")], "doc_id long, source string, text string"
    )
    pieces = unigram_train(train, 8, max_piece_len=3, min_count=2)
    probe = spark.createDataFrame(
        [(0, None, "ab @@@"), (1, "srcA", "ab zz"), (2, None, None)],
        "doc_id long, source string, text string",
    )
    seg = unigram_segment(probe, pieces)
    got = {
        r["source"]: tuple(r)[1:]
        for r in tokenizer_fertility_report(
            probe, seg, unigram_vocab(probe, pieces), tokens_col="pieces"
        ).collect()
    }
    logp = {p: lp for p, _c, lp in pieces}
    max_len = max(len(p) for p in logp)
    want = {
        r[0]: r[1:]
        for r in _ref_report(
            [(s, txt or "") for _i, s, txt in
             [(0, None, "ab @@@"), (1, "srcA", "ab zz"), (2, None, None)]],
            lambda w: _viterbi(w, logp, max_len),
            set(logp),
        )
    }
    assert got == want
    # the NULL-source group's OOV tokens (@ chars) survived the join
    assert got[None][4] > 0
    assert got[None][7] is not None and got[None][7] > 0.0


def test_token_id_encoding_bit_matches_reference(spark):
    """encode_token_ids bridges segmentation to packing: ids must be
    dense from 0, deterministic, order-preserving within each doc, and
    OOV tokens must map to UNK_ID — all bit-matched against a plain
    dict replay. Frequency ordering must give frequent pieces small
    ids."""
    import pytest as _pytest

    train = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("doc_id < 60")
        .select("doc_id", "text")
    )
    merges = bpe_train(train, 12)
    vocab_df = bpe_vocab(train, merges)
    idt = token_id_table(vocab_df)
    rows = idt.collect()
    toks = sorted(r["token"] for r in rows)
    # dense, 0-based, lexicographic by default
    assert sorted(r["token_id"] for r in rows) == list(range(len(rows)))
    assert {r["token"]: r["token_id"] for r in rows} == {
        t: i for i, t in enumerate(toks)
    }
    probe = train.unionByName(
        spark.createDataFrame(
            [(100000, "q@@z unseen")], "doc_id long, text string"
        )
    )
    seg = bpe_segment(probe, merges)
    mapping = {r["token"]: r["token_id"] for r in rows}
    want = {
        r["doc_id"]: [mapping.get(t, UNK_ID) for t in r["tokens"]]
        for r in seg.collect()
    }
    got = {
        r["doc_id"]: (r["token_ids"], r["n_tokens"], r["n_unk"])
        for r in encode_token_ids(seg, idt).collect()
    }
    for doc_id, ids in want.items():
        assert got[doc_id] == (
            ids, len(ids), sum(1 for i in ids if i == UNK_ID)
        ), doc_id
    # '@' never appears in the smoke corpus: the probe doc has real OOV
    assert got[100000][2] > 0
    # frequency ordering: the corpus' most frequent vocab token gets id 0
    freq = (
        seg.selectExpr("explode(tokens) as token")
        .groupBy("token")
        .count()
        .withColumnRenamed("count", "cnt")
    )
    by_freq = {
        r["token"]: r["token_id"]
        for r in token_id_table(vocab_df, by_frequency=freq).collect()
    }
    top = min(
        (-r["cnt"], r["token"])
        for r in freq.collect()
        if r["token"] in by_freq
    )[1]
    assert by_freq[top] == 0
    # guard: an id table past the model-state bound refuses to collect
    big = spark.range(0, 300_000).selectExpr(
        "cast(id as string) as token", "cast(id as int) as token_id"
    )
    with _pytest.raises(ValueError, match="MAX_SEED_PIECES"):
        encode_token_ids(seg, big)


def test_report_and_encoding_random_corpora_property(spark):
    """Derandomized property check (the H44/H45 house pattern): on
    random corpora — OOV chars, NULL-able sources, empty docs — the
    fertility report bit-matches the sequential reference and the id
    encoding bit-matches a dict replay."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from drive_bc_datapipeline_spark.operators.unigram import (
        _viterbi,
        unigram_segment,
        unigram_train,
    )

    word = st.text(alphabet="ab@", min_size=1, max_size=5)
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)
    src = st.sampled_from(["s1", "s2", None])
    corpus = st.lists(st.tuples(src, doc), min_size=1, max_size=6)

    train = spark.createDataFrame(
        [(0, "s", "ab ab ba ba b a")], "doc_id long, source string, text string"
    )
    pieces = unigram_train(train, 6, max_piece_len=2, min_count=2)
    logp = {p: lp for p, _c, lp in pieces}
    max_len = max(len(p) for p in logp)
    vocab_df = unigram_vocab(train, pieces)
    idt = token_id_table(vocab_df)
    mapping = {r["token"]: r["token_id"] for r in idt.collect()}

    @settings(max_examples=6, deadline=None, derandomize=True)
    @given(corpus)
    def check(rows):
        probe = spark.createDataFrame(
            [(i, s, t) for i, (s, t) in enumerate(rows)],
            "doc_id long, source string, text string",
        )
        seg = unigram_segment(probe, pieces)
        got = [
            tuple(r)
            for r in tokenizer_fertility_report(
                probe, seg, vocab_df, tokens_col="pieces"
            ).collect()
        ]
        want = _ref_report(
            rows, lambda w: _viterbi(w, logp, max_len), set(logp)
        )
        assert got == want
        enc = {
            r["doc_id"]: (r["token_ids"], r["n_unk"])
            for r in encode_token_ids(
                seg, idt, tokens_col="pieces"
            ).collect()
        }
        for r in seg.collect():
            ids = [mapping.get(t, UNK_ID) for t in r["pieces"]]
            assert enc[r["doc_id"]] == (
                ids, sum(1 for i in ids if i == UNK_ID)
            )

    check()


def test_bpe_vocab_handles_line_terminators(spark):
    """The vocab char split uses the same \\z anchor as training: a
    word ending in \\n must contribute '\\n' (and its last real char)
    as separate alphabet entries, not a fused two-char symbol."""
    d = spark.createDataFrame(
        [(0, "srcA", "foo\n foo\n ba")], "doc_id long, source string, text string"
    )
    merges = bpe_train(d, 2, min_count=2)
    vocab = {r["token"] for r in bpe_vocab(d, merges).collect()}
    assert {"o", "\n", "f", "b", "a", EOW} <= vocab
    assert not any(len(t) == 2 and t.endswith("\n") and t != EOW for t in vocab - {m[3] for m in merges})


def test_bpe_vocab_and_report_non_bmp(spark):
    """Regression (r12 ADVICE): on an emoji-bearing training corpus
    the vocab must hold whole code points (no UTF-16 halves) and the
    report's oov_token_rate must be 0 — the go/no-go invariant the
    surrogate split broke (it reported 0.25 OOV on the vocab's own
    training corpus)."""
    rows = [
        ("a", "\U0001F600x \U0001F600x y\U0001F600"),
        ("b", "\U0001F600x z z"),
        (None, "y\U0001F600 y\U0001F600"),
    ]
    d = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    merges = bpe_train(d, 6, min_count=2)
    seg = bpe_segment(d, merges)
    vocab_df = bpe_vocab(d, merges)
    vocab = {r["token"] for r in vocab_df.collect()}
    assert not any(
        0xD800 <= ord(ch) <= 0xDFFF for t in vocab for ch in t
    )
    assert any("\U0001F600" in t for t in vocab)
    got = tokenizer_fertility_report(d, seg, vocab_df)
    want = _ref_report(
        rows, lambda w: _seq_bpe_segment(w, merges), vocab
    )
    assert [tuple(r) for r in got.collect()] == want
    # zero OOV on the vocab's own training corpus — the H46 invariant
    assert all(r[5] == 0 and r[8] == 0.0 for r in want)


def test_token_id_table_guard_trips_on_corpus_scale_vocab(spark):
    """r12 ADVICE (low): token_id_table's single-partition rank window
    is bounded by the same MAX_SEED_PIECES guard encode_token_ids
    uses, tripping BEFORE the window runs."""
    import pytest
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.operators.unigram import (
        MAX_SEED_PIECES,
    )

    big = spark.range(MAX_SEED_PIECES + 1).select(
        F.col("id").cast("string").alias("token")
    )
    with pytest.raises(ValueError, match="MAX_SEED_PIECES"):
        token_id_table(big)


def test_decode_inverts_encode_round_trip(spark):
    """decode(encode(seg)) must reproduce the exact token arrays for
    in-vocabulary tokens and render UNK_ID as unk_token for OOV ones —
    with n_unk counted by ID (a real vocab token that literally equals
    the unk marker must NOT count)."""
    import pytest
    from drive_bc_datapipeline_spark.operators.tokenizer_report import (
        decode_token_ids,
    )

    train = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("doc_id < 60")
        .select("doc_id", "text")
    )
    merges = bpe_train(train, 12)
    vocab_df = bpe_vocab(train, merges)
    idt = token_id_table(vocab_df)
    probe = train.unionByName(
        spark.createDataFrame(
            [(100000, "q@@z unseen")], "doc_id long, text string"
        )
    )
    seg = bpe_segment(probe, merges)
    enc = encode_token_ids(seg, idt)
    dec = {
        r["doc_id"]: (r["tokens"], r["n_tokens"], r["n_unk"])
        for r in decode_token_ids(enc, idt).collect()
    }
    orig = {r["doc_id"]: r["tokens"] for r in seg.collect()}
    vocab = {r["token"] for r in idt.collect()}
    assert set(dec) == set(orig)
    for doc_id, toks in orig.items():
        want = [t if t in vocab else "<unk>" for t in toks]
        n_unk = sum(1 for t in toks if t not in vocab)
        assert dec[doc_id] == (want, len(want), n_unk), doc_id
    # the probe doc had real OOV; training docs had none
    assert dec[100000][2] > 0
    assert all(
        dec[d][2] == 0 for d in dec if d != 100000
    )
    # contract failures are loud, not silent:
    dup = spark.createDataFrame(
        [("a", 0), ("b", 0)], "token string, token_id int"
    )
    with pytest.raises(ValueError, match="injective"):
        decode_token_ids(enc, dup)
    sentinel = spark.createDataFrame(
        [("a", 0), ("b", UNK_ID)], "token string, token_id int"
    )
    with pytest.raises(ValueError, match="unk_id"):
        decode_token_ids(enc, sentinel)
    # an id outside the table (and != unk_id) means a vocabulary
    # mismatch — the task must fail (Spark-wrapped, message kept),
    # not emit unk silently
    alien = spark.createDataFrame(
        [(1, [0, 999999])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="different vocabularies"):
        decode_token_ids(alien, idt).collect()


def test_decode_counts_unk_by_id_not_string(spark):
    """A vocabulary containing the literal string '<unk>' as a REAL
    token must decode with n_unk counting only UNK_ID positions."""
    from drive_bc_datapipeline_spark.operators.tokenizer_report import (
        decode_token_ids,
    )

    idt = spark.createDataFrame(
        [("<unk>", 0), ("x", 1)], "token string, token_id int"
    )
    enc = spark.createDataFrame(
        [(1, [0, 1, UNK_ID])], "doc_id long, token_ids array<int>"
    )
    [row] = decode_token_ids(enc, idt).collect()
    assert row["tokens"] == ["<unk>", "x", "<unk>"]
    assert row["n_tokens"] == 3
    assert row["n_unk"] == 1


def test_decode_rejects_null_ids_arrays(spark):
    """A NULL token_ids value or a NULL element is not an encoder
    output — decode must raise its named message, not an opaque
    TypeError from iterating None."""
    import pytest
    from drive_bc_datapipeline_spark.operators.tokenizer_report import (
        decode_token_ids,
    )

    idt = spark.createDataFrame(
        [("a", 0)], "token string, token_id int"
    )
    null_arr = spark.createDataFrame(
        [(1, None)], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="NULL token_ids"):
        decode_token_ids(null_arr, idt).collect()
    null_elem = spark.createDataFrame(
        [(1, [0, None])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="NULL element"):
        decode_token_ids(null_elem, idt).collect()
