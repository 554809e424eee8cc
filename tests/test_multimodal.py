"""Unit tests for the multimodal featurizers (SURVEY §2 I1-I4) —
deterministic stubs, real mapInPandas contracts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans import registry
from drive_bc_datapipeline_spark.plans.registry import QUERIES

registry.load_all_plans()

SF = "/root/testdata/sf0.001"


def test_bytes_meta_matches_python(spark):
    df = QUERIES["multimodal_bytes_meta"](spark, SF)
    rows = {r.doc_id: r for r in df.collect()}
    src = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert rows.keys() == src.keys()
    for doc_id, text in list(src.items())[:25]:
        b = text.encode("utf-8")
        r = rows[doc_id]
        assert r.n_bytes == len(b)
        assert r.first_byte == (b[0] if b else -1)
        assert r.payload_sig == hashlib.md5(b).hexdigest()[:8]


def test_resize_preserves_aspect_and_bounds(spark):
    df = QUERIES["multimodal_resize_stub"](spark, SF)
    for r in df.collect():
        assert 1 <= r.dst_w <= 224 and 1 <= r.dst_h <= 224
        # no upscaling
        assert r.dst_w <= r.src_w and r.dst_h <= r.src_h
        # aspect preserved within integer truncation (meaningless when a
        # side truncates to a handful of pixels)
        if (r.src_w > 224 or r.src_h > 224) and min(r.dst_w, r.dst_h) >= 10:
            assert abs(r.dst_w / r.src_w - r.dst_h / r.src_h) < 0.05


def test_frame_sample_fanout(spark):
    df = QUERIES["multimodal_frame_sample_stub"](spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # fan-out: ≥1 frame per doc, every sampled index divisible by K
    assert df.count() >= n_docs
    assert df.filter(F.col("frame_idx") % 4 != 0).count() == 0
    assert df.select("doc_id").distinct().count() == n_docs


def test_audio_windows_shape(spark):
    import json

    df = QUERIES["multimodal_audio_features_stub"](spark, SF)
    sample = df.limit(10).collect()
    for r in sample:
        energy = json.loads(r.window_energy)
        assert r.n_windows == len(energy)
        # each window sums ≤ 256 bytes of value ≤ 255
        assert all(0 <= e <= 255 * 256 for e in energy)
