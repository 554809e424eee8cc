"""Multimodal column plan (SURVEY §2 I1): opaque binary payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* core is a
deterministic stand-in (byte-level features); the Spark-side plumbing
— binary column construction, output schema, Arrow batch iteration,
partition-preserving mapInPandas — is real and is exactly what an
image/audio featurizer would use. Reference analog: etl-events.py's
binary Kinesis payload → parsed records path.

100 TB note: mapInPandas streams Arrow batches; no per-row Python
overhead, no driver collection, and the pipeline is embarrassingly
parallel (no shuffle at all — narrow transformation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans.registry import query, t

MULTIMODAL_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ord(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       substr(md5(text), 1, 8) AS payload_sig
FROM documents
"""


def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stand-in decoder: real featurizers (image resize, audio frames)
    drop in here with the same Arrow-batched signature."""
    import hashlib

    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.map(len).astype("int64"),
                "first_byte": payload.map(lambda b: b[0] if len(b) else -1).astype(
                    "int32"
                ),
                "payload_sig": payload.map(
                    lambda b: hashlib.md5(b).hexdigest()[:8]
                ),
            }
        )


def decode_binary_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → byte-level features via mapInPandas."""
    return df.mapInPandas(
        _featurize,
        schema="doc_id long, n_bytes long, first_byte int, payload_sig string",
    )


@query("multimodal_bytes_meta", MULTIMODAL_ORACLE)
def multimodal_bytes_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return decode_binary_features(with_payload)


@query("multimodal_image_stub")  # rows-only: decode stub, no SQL equivalent
def multimodal_image_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed multimodal record with a stubbed image decode.

    Produces (doc_id, width, height, n_channels) from a deterministic
    fake header; a real deployment swaps ``_decode_image_stub`` for a
    PIL/ffmpeg call with the identical mapInPandas contract.
    """
    d = t(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def _decode_image_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                }
            )

    return payload.mapInPandas(
        _decode_image_stub,
        schema="doc_id long, width int, height int, n_channels int",
    )


# --------------------------------------------------------------------------
# I2-I4 — the remaining multimodal verbs: resize, frame-sample, audio
# features. Decode cores are deterministic stand-ins (no image/audio
# libs in this environment); schemas, Arrow batch iteration, and the
# 1→1 / 1→N / 1→arrays output shapes are the real contracts a
# PIL/ffmpeg/librosa implementation drops into.
# --------------------------------------------------------------------------


@query("multimodal_resize_stub")  # rows-only
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→1 featurizer: 'image' metadata + target-box resize arithmetic.

    Real version: decode with PIL, thumbnail to (MAX_W, MAX_H), re-emit
    bytes. The stub derives source dims deterministically from payload
    length and applies the identical aspect-preserving box math.
    """
    MAX_W, MAX_H = 224, 224
    d = t(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            w = (n % 640 + 1).astype("int64")
            h = (n % 480 + 1).astype("int64")
            scale = pd.concat([MAX_W / w, MAX_H / h], axis=1).min(axis=1).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": w.astype("int32"),
                    "src_h": h.astype("int32"),
                    "dst_w": (w * scale).astype("int32").clip(lower=1),
                    "dst_h": (h * scale).astype("int32").clip(lower=1),
                }
            )

    return payload.mapInPandas(
        _resize, schema="doc_id long, src_w int, src_h int, dst_w int, dst_h int"
    )


@query("multimodal_frame_sample_stub")  # rows-only
def multimodal_frame_sample_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N featurizer: sample every Kth 'frame' of a 'video' payload.

    Real version: ffmpeg keyframe extraction. The stub treats each
    1 KiB slice as a frame and emits one output row per sampled frame —
    the fan-out contract (output rows ≠ input rows) that distinguishes
    mapInPandas from a scalar pandas_udf.
    """
    FRAME_BYTES, EVERY_K = 1024, 4
    d = t(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out_doc, out_idx, out_sig = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, (len(buf) + FRAME_BYTES - 1) // FRAME_BYTES)
                for i in range(0, n_frames, EVERY_K):
                    frame = bytes(buf[i * FRAME_BYTES:(i + 1) * FRAME_BYTES])
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_sig.append(hashlib.md5(frame).hexdigest()[:8])
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_sig": out_sig}
            )

    return payload.mapInPandas(
        _sample, schema="doc_id long, frame_idx int, frame_sig string"
    )


@query("multimodal_audio_features_stub")  # rows-only
def multimodal_audio_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→arrays featurizer: windowed 'audio' energy profile.

    Real version: librosa frame energies / MFCCs. The stub windows the
    byte stream and emits per-window mean as an array<double> column —
    the nested-output contract (arrays inside Arrow batches).
    """
    WINDOW = 256
    d = t(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                a = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
                pad = (-len(a)) % WINDOW
                if pad:
                    a = np.pad(a, (0, pad))
                feats.append(a.reshape(-1, WINDOW).mean(axis=1).round(4).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_windows": [len(f) for f in feats],
                    "window_energy": feats,
                }
            )

    return payload.mapInPandas(
        _energy,
        schema="doc_id long, n_windows int, window_energy array<double>",
    )
