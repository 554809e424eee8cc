"""Multimodal column plans (SURVEY §2 I1-I4): opaque binary payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The container has no image/audio libraries. As of r16 the image (I1b)
and audio (I4) keys decode REAL formats anyway — pure-numpy 24-bit
BMP and PCM WAV codecs in ``operators/multimodal`` (header parse,
row-flip/BGR/chunk-walk and all), fed by real bytes built from each
document's text. As of r17 the I2 resize key runs the REAL
pixel path too (decode → nearest-neighbor grid → re-encode →
re-decode → feature, one Arrow stage) and the I3 key samples frames
from a REAL YUV4MPEG2 C444 stream (header/FRAME-marker/planar-slice
parse — the public uncompressed container; entropy-coded codecs stay
out of scope with no decoder libs in-container). The I1 byte-meta
key keeps its deterministic byte-level decode core; their Spark-side plumbing — binary column construction,
output schema, Arrow batch iteration, 1→1 / 1→N shapes — is real and
identical to what a PIL/ffmpeg featurizer would use (the
byte-level resize sibling that re-emits BMP payloads lives in
``operators/multimodal.resize_image_bytes``, tests-only). Every
byte-reading oracle NULL-poisons on non-ASCII text (r16 ADVICE:
``ord(substr(text, p, 1))`` indexes characters while the engine
reads bytes — ASCII is the precondition, asserted on the testdata
in tests/test_multimodal.py and made loud here, not comment-only). Reference
analog: etl-events.py's binary Kinesis payload → parsed records path.

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
       CAST(CASE WHEN octet_length(encode(text)) <> length(text)
                 THEN NULL
                 ELSE ord(substr(text, 1, 1)) END
            AS INTEGER) AS first_byte,
       CASE WHEN octet_length(encode(text)) <> length(text)
            THEN NULL ELSE substr(md5(text), 1, 8) END AS payload_sig
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
WITH sums AS (
  SELECT doc_id,
         SUM(CASE WHEN octet_length(encode(text)) <> length(text)
                  THEN NULL
                  ELSE ord(substr(text, p, 1)) END) AS s
  FROM (SELECT doc_id, text,
               unnest(range(1, octet_length(encode(text)) + 1)) AS p
        FROM documents)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(greatest(
         1, CAST(ceil(octet_length(encode(d.text)) / 48.0) AS BIGINT)
       ) AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(COALESCE(s.s, 0) AS BIGINT) AS px_sum,
       CAST(CASE WHEN octet_length(encode(d.text)) < 1 THEN 0
                 WHEN octet_length(encode(d.text)) <> length(d.text)
                 THEN NULL
                 ELSE ord(substr(d.text, 1, 1))
            END AS INTEGER) AS top_left_r
FROM documents d LEFT JOIN sums s USING (doc_id)
"""


@query("multimodal_image_stub", IMAGE_STUB_ORACLE)
def multimodal_image_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed multimodal record through a REAL image decode (r16; the
    key name keeps its historical ``_stub`` suffix for driver-artifact
    continuity — the decode core is no longer a stub).

    Two Arrow-batched stages: build a real 24-bit BMP per document
    from its text bytes (the ``operators/multimodal`` text→BMP
    convention: width 16, height ceil(n/48), pixels = the bytes,
    zero-padded), then ``decode_image_features`` parses the actual
    header and pixel array — dims from the header, the exact pixel
    sum, and the top-left pixel's R channel, which a decoder that
    skips the BMP bottom-up row flip or the BGR swap gets wrong. The
    oracle states the same features from the text directly (pixels
    ARE the text bytes; pad contributes 0). At 100 TB the encode
    stage doesn't exist — payloads arrive as real bytes through the
    K14 binaryFile source (that composition is tested in
    tests/test_multimodal.py); the decode stage is unchanged.
    """
    from drive_bc_datapipeline_spark.operators.multimodal import (
        attach_bmp_payload,
        decode_image_features,
    )

    d = t(spark, sf_dir, "documents")
    return decode_image_features(attach_bmp_payload(d))


# --------------------------------------------------------------------------
# I2-I4 — the remaining multimodal verbs: resize (REAL pixel path,
# r17), frame-sample (REAL Y4M parse, r17), audio features (REAL WAV
# parse, r16). Schemas, Arrow batch iteration, and the 1→1 / 1→N /
# 1→arrays output shapes are the contracts a PIL/ffmpeg/librosa
# implementation drops into. Every key gets a full DuckDB oracle
# (documents.text is ASCII in the testdata, so VARCHAR substr/ord
# equal the byte-level operations on the utf-8 payload — asserted in
# tests, NULL-poisoned in the oracles).
# --------------------------------------------------------------------------

RESIZE_ORACLE = """
WITH src AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         octet_length(encode(text)) = length(text) AS is_ascii,
         greatest(1, CAST(ceil(octet_length(encode(text)) / 48.0)
                          AS BIGINT)) AS h
  FROM documents
),
d2 AS (
  SELECT doc_id, text, n, is_ascii, h,
         greatest(1, CAST(trunc(16 * least(8.0 / 16, 8.0 / h, 1.0))
                          AS BIGINT)) AS w2,
         greatest(1, CAST(trunc(h * least(8.0 / 16, 8.0 / h, 1.0))
                          AS BIGINT)) AS h2
  FROM src
),
yj AS (SELECT *, unnest(range(0, h2)) AS j FROM d2),
xi AS (SELECT *, unnest(range(0, w2)) AS i FROM yj),
ch AS (SELECT *, unnest(range(0, 3)) AS c FROM xi),
sums AS (
  SELECT doc_id,
         SUM(CASE
               WHEN (j * h) // h2 * 48 + (i * 16) // w2 * 3 + c >= n
                 THEN 0
               WHEN NOT is_ascii THEN NULL
               ELSE ord(substr(
                 text,
                 CAST((j * h) // h2 * 48 + (i * 16) // w2 * 3 + c + 1
                      AS INTEGER),
                 1))
             END) AS psum
  FROM ch GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(16 AS INTEGER) AS src_w,
       CAST(d.h AS INTEGER) AS src_h,
       CAST(d.w2 AS INTEGER) AS dst_w,
       CAST(d.h2 AS INTEGER) AS dst_h,
       CAST(s.psum AS BIGINT) AS px_sum,
       CAST(CASE WHEN d.n < 1 THEN 0
                 WHEN NOT d.is_ascii THEN NULL
                 ELSE ord(substr(d.text, 1, 1))
            END AS INTEGER) AS top_left_r
FROM d2 d JOIN sums s USING (doc_id)
"""


@query("multimodal_resize_stub", RESIZE_ORACLE)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 through the REAL pixel path (r17; the key name keeps its
    historical ``_stub`` suffix for driver-artifact continuity — the
    resize is no longer length arithmetic): build a real 24-bit BMP
    per document from its text bytes, then ONE Arrow stage decodes
    the header+pixels, nearest-neighbor-downscales into an 8x8 box
    (the 16-wide text BMP always halves, so the grid math is LIVE on
    every row), re-encodes, RE-DECODES, and features the resized
    image — dst dims plus the resized pixel sum and top-left R, the
    values a wrong row-flip/BGR/grid would corrupt. The oracle
    restates the same integer arithmetic from the text convention
    (resized pixel (j,i,c) reads text byte (j*h//h2)*48 +
    (i*16//w2)*3 + c, pad contributes 0), NULL-poisoning byte reads
    on non-ASCII text so a testdata drift mismatches loudly instead
    of silently diverging (r16 ADVICE; the ASCII precondition is
    also asserted in tests/test_multimodal.py). At 100 TB the encode
    stage doesn't exist — payloads arrive via K14 binaryFile — and
    the resize stage is the same single narrow mapInPandas: no
    shuffle, no dims-vs-features join, no second corpus pass.
    """
    from drive_bc_datapipeline_spark.operators.multimodal import (
        attach_bmp_payload,
        resize_image_features,
    )

    d = t(spark, sf_dir, "documents")
    return resize_image_features(
        attach_bmp_payload(d), max_w=8, max_h=8
    )


FRAME_SAMPLE_ORACLE = """
WITH f AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         octet_length(encode(text)) = length(text) AS is_ascii,
         greatest(1, CAST(ceil(octet_length(encode(text)) / 192.0)
                          AS BIGINT)) AS n_frames
  FROM documents
),
x AS (
  SELECT doc_id, text, n, is_ascii,
         unnest(range(0, n_frames, 4)) AS i
  FROM f
),
p AS (
  SELECT doc_id, text, n, is_ascii, i,
         unnest(range(i * 192, (i + 1) * 192)) AS b
  FROM x
),
s AS (
  SELECT doc_id, i,
         SUM(CASE WHEN b >= n THEN 0
                  WHEN NOT is_ascii THEN NULL
                  ELSE ord(substr(text, CAST(b + 1 AS INTEGER), 1))
             END) AS px_sum,
         SUM(CASE WHEN b - i * 192 >= 64 THEN 0
                  WHEN b >= n THEN 0
                  WHEN NOT is_ascii THEN NULL
                  ELSE ord(substr(text, CAST(b + 1 AS INTEGER), 1))
             END) AS y_sum
  FROM p GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(y_sum AS BIGINT) AS y_sum
FROM s
"""


@query("multimodal_frame_sample_stub", FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 through a REAL video container (r17; the key name keeps its
    historical ``_stub`` suffix for driver-artifact continuity): build
    a real YUV4MPEG2 C444 stream per document from its text bytes
    (16x4 frames — 192 bytes each, planar Y/Cb/Cr, zero-padded), then
    ``sample_video_frames`` PARSES the stream — signature, header
    token walk, per-frame FRAME markers, planar slicing — and emits
    one row per 4th frame with the frame's pixel sum and its Y-plane
    (luma) sum, the value a decoder that mis-walks the planar layout
    gets wrong. The 1→N fan-out contract is unchanged from r16; the
    decode is no longer a 1-KiB-slice stand-in. The oracle restates
    the same sums from the text convention (frame f plane c position
    (y, x) reads byte f*192 + c*64 + y*16 + x; pad contributes 0),
    NULL-poisoned on non-ASCII text. Entropy-coded codecs stay out of
    scope (no decoder libs in-container); Y4M is the public
    uncompressed container every ffmpeg rawvideo pipeline speaks. At
    100 TB real .y4m payloads arrive via K14 binaryFile; the sampler
    is one narrow mapInPandas — no shuffle.
    """
    from drive_bc_datapipeline_spark.operators.multimodal import (
        attach_y4m_payload,
        sample_video_frames,
    )

    d = t(spark, sf_dir, "documents")
    return sample_video_frames(attach_y4m_payload(d), every_k=4)


AUDIO_ORACLE = """
WITH pos AS (
  SELECT doc_id, text,
         unnest(range(1, octet_length(encode(text)) + 1)) AS p
  FROM documents
),
w AS (
  SELECT doc_id, (p - 1) // 256 AS win,
         CAST(SUM(CASE WHEN octet_length(encode(text)) <> length(text)
                       THEN NULL
                       ELSE ord(substr(text, p, 1)) END)
              AS BIGINT) AS s
  FROM pos GROUP BY doc_id, win
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_windows,
         to_json(list(s ORDER BY win)) AS window_energy
  FROM w GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(octet_length(encode(d.text)) AS INTEGER) AS n_samples,
       CAST(COALESCE(a.n_windows, 0) AS INTEGER) AS n_windows,
       COALESCE(a.window_energy, '[]') AS window_energy
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@query("multimodal_audio_features_stub", AUDIO_ORACLE)
def multimodal_audio_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→nested featurizer through a REAL audio decode (r16; the key
    name keeps its historical ``_stub`` suffix for driver-artifact
    continuity — the decode core is no longer a stub).

    Two Arrow-batched stages: build a real PCM RIFF/WAVE per document
    (8-bit unsigned mono at 8 kHz, one sample per text byte — the
    ``operators/multimodal`` text→WAV convention), then
    ``decode_audio_features`` walks the actual RIFF chunk list to the
    fmt/data chunks and windows the DECODED sample array (256-sample
    windows, zero-padded tail, integer sums — bit-exact across
    engines; JSON-array string for the nested output, the I4
    convention: a raw array<double> crashes pandas canonicalizers and
    float means hit round-half ties). The oracle re-states the same
    window sums from the text bytes directly (samples ARE the bytes),
    plus the decoded sample rate and count the header carries. At
    100 TB real .wav payloads arrive via K14 binaryFile (tested in
    tests/test_multimodal.py); the decode stage is unchanged.
    """
    from drive_bc_datapipeline_spark.operators.multimodal import (
        attach_wav_payload,
        decode_audio_features,
    )

    d = t(spark, sf_dir, "documents")
    return decode_audio_features(attach_wav_payload(d), window=256)
