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
