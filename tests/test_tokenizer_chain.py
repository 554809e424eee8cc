"""End-to-end tokenizer-chain composition (r12 verdict Next #2).

Each stage of the tokenizer family is individually bit-matched
(tests/test_bpe.py, test_unigram.py, test_tokenizer_report.py); this
file pins the SEAMS: one corpus runs train → segment → fertility-vet →
id-encode → shard-pack → manifest and the COMPOSED invariants hold —

- token-budget conservation: Σ n_tokens is identical at the segmenter
  output, the fertility report, the id-encoded stream and the packed
  shards (the one-row-per-id contracts at the stage boundaries are
  exactly where a silent drop/dup would bite);
- OOV discipline: the trained vocabulary covers its own training mix
  exactly (OOV rate 0, zero UNK ids), while a held-out probe with
  unseen characters reports OOV > 0 through BOTH the report and the
  encoder — the two detectors must agree;
- determinism: a second full run of the chain from scratch reproduces
  the packed-shard manifest (checksums included) bit-for-bit;
- invertibility: decode(encode(·)) reproduces the segmenter's token
  stream exactly on the training mix and agrees with the encoder's
  UNK count on the held-out probe.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
)
from drive_bc_datapipeline_spark.operators.prefix import (
    exclusive_prefix_sum,
)
from drive_bc_datapipeline_spark.operators.tokenizer_report import (
    UNK_ID,
    bpe_vocab,
    decode_token_ids,
    encode_token_ids,
    token_id_table,
    tokenizer_fertility_report,
)
from tests.conftest import SF_SMOKE

#: Small so the 500-doc smoke corpus packs into several shards.
SHARD_CAP_TOKENS = 2_000


def _pack_shards(enc):
    """Greedy offset packing of the id-encoded stream, the
    shard_packing (H16) shape applied to TOKENS: exclusive prefix sum
    of n_tokens in doc_id order → shard = floor(offset / cap) →
    per-shard manifest row with an order checksum (the
    training_shard_manifest H42 convention)."""
    scanned = exclusive_prefix_sum(
        enc.select("doc_id", "n_tokens"),
        order_col="doc_id",
        value_col="n_tokens",
        out_col="start_off",
    )
    return (
        scanned.withColumn(
            "shard_id",
            F.floor(F.col("start_off") / SHARD_CAP_TOKENS).cast("bigint"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum(
                (F.col("start_off") + 1) * (F.col("doc_id") % 1000003)
            )
            .cast("bigint")
            .alias("order_checksum"),
        )
    )


def _run_chain(spark, train_docs):
    """One full pass: train → segment → vocab → report → encode →
    pack. Returns every intermediate needed by the asserts."""
    merges = bpe_train(train_docs, 16)
    seg = bpe_segment(train_docs, merges)
    vocab = bpe_vocab(train_docs, merges)
    report = tokenizer_fertility_report(train_docs, seg, vocab)
    idt = token_id_table(vocab)
    enc = encode_token_ids(seg, idt)
    shards = _pack_shards(enc)
    return merges, seg, vocab, report, idt, enc, shards


@pytest.mark.slow
def test_tokenizer_chain_composes_end_to_end(spark):
    train_docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("doc_id < 150")
        .select("doc_id", "source", "text")
    )
    merges, seg, vocab, report, idt, enc, shards = _run_chain(
        spark, train_docs
    )

    # --- token-budget conservation across every seam -----------------
    n_seg = seg.agg(F.sum("n_tokens")).collect()[0][0]
    n_rep = report.agg(F.sum("n_tokens")).collect()[0][0]
    enc_rows = enc.collect()
    n_enc = sum(r["n_tokens"] for r in enc_rows)
    shard_rows = shards.collect()
    n_pack = sum(r["shard_tokens"] for r in shard_rows)
    assert n_seg and n_seg == n_rep == n_enc == n_pack
    # the encoded arrays themselves carry the budget, not just counters
    assert sum(len(r["token_ids"]) for r in enc_rows) == n_enc

    # --- OOV discipline on the training mix --------------------------
    rep_rows = report.collect()
    assert sum(r["n_oov_tokens"] for r in rep_rows) == 0
    assert all(r["oov_token_rate"] == 0.0 for r in rep_rows)
    assert sum(r["n_unk"] for r in enc_rows) == 0
    assert not any(UNK_ID in r["token_ids"] for r in enc_rows)

    # --- id table is a dense bijection the encoder respected ---------
    id_rows = idt.collect()
    ids = sorted(r["token_id"] for r in id_rows)
    assert ids == list(range(len(id_rows)))
    assert all(
        0 <= i < len(id_rows) for r in enc_rows for i in r["token_ids"]
    )

    # --- packing partitions the corpus: every doc in exactly one
    #     shard, shards are disjoint contiguous doc-id ranges ---------
    n_docs = train_docs.count()
    assert sum(r["n_docs"] for r in shard_rows) == n_docs
    spans = sorted(
        (r["first_doc"], r["last_doc"]) for r in shard_rows
    )
    for (f1, l1), (f2, _l2) in zip(spans, spans[1:]):
        assert f1 <= l1 < f2

    # --- held-out probe: unseen chars surface as OOV in BOTH the
    #     report and the encoder (the detectors must agree) -----------
    probe = spark.createDataFrame(
        [(100000, "held", "zzz@@ \U0001F984 unseen"),
         (100001, "held", "qqqq")],
        "doc_id long, source string, text string",
    )
    probe_seg = bpe_segment(probe, merges)
    probe_rep = tokenizer_fertility_report(probe, probe_seg, vocab)
    probe_enc = encode_token_ids(probe_seg, idt)
    n_oov_rep = sum(
        r["n_oov_tokens"] for r in probe_rep.collect()
    )
    n_oov_enc = sum(r["n_unk"] for r in probe_enc.collect())
    assert n_oov_rep == n_oov_enc > 0

    # --- decode closes the loop: decode(encode(seg)) reproduces the
    #     segmenter's token stream exactly on the OOV-free training
    #     mix, and renders exactly the encoder's UNK count on the
    #     probe (n_unk counted by id on both sides of the seam) ------
    dec = decode_token_ids(enc, idt)
    seg_toks = {r["doc_id"]: r["tokens"] for r in seg.collect()}
    for r in dec.collect():
        assert r["tokens"] == seg_toks[r["doc_id"]], r["doc_id"]
        assert r["n_unk"] == 0
    probe_dec_rows = decode_token_ids(probe_enc, idt).collect()
    assert sum(r["n_unk"] for r in probe_dec_rows) == n_oov_enc
    assert all(
        t == "<unk>" or t in {x["token"] for x in id_rows}
        for r in probe_dec_rows
        for t in r["tokens"]
    )

    # --- determinism: a fresh end-to-end run reproduces the manifest
    #     (order checksums included) bit-for-bit ----------------------
    merges2, _s2, _v2, _r2, idt2, _e2, shards2 = _run_chain(
        spark, train_docs
    )
    assert merges2 == merges
    assert sorted(map(tuple, idt2.collect())) == sorted(
        map(tuple, id_rows)
    )
    assert sorted(map(tuple, shards2.collect()), key=lambda t: t[0]) == (
        sorted(map(tuple, shard_rows), key=lambda t: t[0])
    )
