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


IMAGE_STUB_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels
FROM documents
"""


@query("multimodal_image_stub", IMAGE_STUB_ORACLE)
def multimodal_image_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed multimodal record with a stubbed image decode.

    Produces (doc_id, width, height, n_channels) from a deterministic
    fake header; a real deployment swaps ``_decode_image_stub`` for a
    PIL/ffmpeg call with the identical mapInPandas contract. The decode
    core is length arithmetic, so the oracle replays it in SQL — the
    Spark plumbing (Arrow batches, schema, 1→1 shape) is what's tested.
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
# PIL/ffmpeg/librosa implementation drops into. Because each stand-in
# is pure byte/length arithmetic, every one gets a full DuckDB oracle
# (documents.text is ASCII in the testdata, so VARCHAR substr/ord/md5
# equal the byte-level operations on the utf-8 payload).
# --------------------------------------------------------------------------

RESIZE_ORACLE = """
WITH src AS (
  SELECT doc_id,
         octet_length(encode(text)) % 640 + 1 AS w,
         octet_length(encode(text)) % 480 + 1 AS h
  FROM documents
),
s AS (
  SELECT doc_id, w, h, least(224.0 / w, 224.0 / h, 1.0) AS scale FROM src
)
SELECT doc_id,
       CAST(w AS INTEGER) AS src_w,
       CAST(h AS INTEGER) AS src_h,
       CAST(greatest(1, trunc(w * scale)) AS INTEGER) AS dst_w,
       CAST(greatest(1, trunc(h * scale)) AS INTEGER) AS dst_h
FROM s
"""


@query("multimodal_resize_stub", RESIZE_ORACLE)
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


FRAME_SAMPLE_ORACLE = """
WITH f AS (
  SELECT doc_id, text,
         greatest(
           1, CAST(ceil(octet_length(encode(text)) / 1024.0) AS BIGINT)
         ) AS n_frames
  FROM documents
),
x AS (
  SELECT doc_id, text, unnest(range(0, n_frames, 4)) AS i FROM f
)
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       substr(md5(substr(text, i * 1024 + 1, 1024)), 1, 8) AS frame_sig
FROM x
"""


@query("multimodal_frame_sample_stub", FRAME_SAMPLE_ORACLE)
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


AUDIO_ORACLE = """
WITH pos AS (
  SELECT doc_id, text,
         unnest(range(1, octet_length(encode(text)) + 1)) AS p
  FROM documents
),
w AS (
  SELECT doc_id, (p - 1) // 256 AS win,
         CAST(SUM(ord(substr(text, p, 1))) AS BIGINT) AS s
  FROM pos GROUP BY doc_id, win
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_windows,
         to_json(list(s ORDER BY win)) AS window_energy
  FROM w GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_windows, 0) AS INTEGER) AS n_windows,
       COALESCE(a.window_energy, '[]') AS window_energy
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@query("multimodal_audio_features_stub", AUDIO_ORACLE)
def multimodal_audio_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→nested featurizer: windowed 'audio' energy profile.

    Real version: librosa frame energies / MFCCs. The stub windows the
    byte stream (256-byte windows, zero-padded tail) and emits the
    per-window byte SUM — integer, so it is bit-exact across engines —
    serialized as a compact JSON array string. (A raw ``array<double>``
    output crashes pandas-based canonicalizers — lists are unhashable —
    and float window means hit round-half ties between numpy's
    half-to-even and SQL's half-away rounding; integer sums dodge both
    while keeping the nested-output contract: variable-length features
    inside Arrow batches.) Zero-padding leaves sums unchanged, so the
    oracle needs no pad modeling.
    """
    WINDOW = 256
    d = t(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n_windows, feats = [], []
            for buf in pdf["payload"]:
                a = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64)
                pad = (-len(a)) % WINDOW
                if pad:
                    a = np.pad(a, (0, pad))
                sums = a.reshape(-1, WINDOW).sum(axis=1)
                n_windows.append(len(sums))
                feats.append("[" + ",".join(str(int(s)) for s in sums) + "]")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_windows": n_windows,
                    "window_energy": feats,
                }
            )

    return payload.mapInPandas(
        _energy,
        schema="doc_id long, n_windows int, window_energy string",
    )
