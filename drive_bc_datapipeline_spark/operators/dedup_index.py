"""Persisted MinHash-LSH signature index: build once over the corpus,
probe each incoming batch — the infrastructure that turns F2's
one-shot near-dup join into the DAILY incremental workflow
(`incremental_dedup_status` is the query-shaped readout; this is the
stateful artifact behind it).

At 100 TB the economics are the whole point: signatures are ~64 bytes
per document regardless of text length, the index parquet is
(band_id, band_hash)-sorted so a probe's shuffle join hits sorted
runs, and the corpus TEXT is never re-read after the build — each
day's probe costs O(batch + matching index rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans.documents import (
    MH_N,
    _band_exprs,
    _mh_cols_spark,
    _mh_slice_cols,
    word_ngrams,
)


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash) LSH band rows for `docs`
    (doc_id, text) — the same signature scheme as dedup_minhash_lsh
    (documents.py), so index and query agree bit-for-bit."""
    shingles = word_ngrams(docs, MH_N, distinct=False)
    sigs = (
        shingles.select("doc_id", *_mh_slice_cols())
        .groupBy("doc_id")
        .agg(*_mh_cols_spark())
    )
    band_arr = F.array(
        *[
            F.md5(F.concat(*[F.col(c) for c in cols]).cast("binary"))
            for cols in _band_exprs()
        ]
    )
    return sigs.select(
        "doc_id", F.posexplode(band_arr).alias("band_id", "band_hash")
    )


def build_minhash_index(docs: DataFrame, path: str) -> int:
    """Write the corpus band index, sorted by the probe join key so
    parquet row groups carry tight (band_id, band_hash) min/max stats
    (footer-level skipping for selective probes). Returns row count."""
    bands = minhash_bands(docs).sortWithinPartitions("band_id", "band_hash")
    bands.write.mode("overwrite").parquet(path)
    return bands.sparkSession.read.parquet(path).count()


def probe_minhash_index(
    spark: SparkSession, path: str, new_docs: DataFrame
) -> DataFrame:
    """Candidate (new_doc_id, corpus_doc_id) near-dup pairs for a new
    batch: the batch's bands equi-join the stored index — no corpus
    text re-read, no batch×batch or corpus×corpus comparison."""
    idx = spark.read.parquet(path).select(
        F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_hash"
    )
    probe = minhash_bands(new_docs).select(
        F.col("doc_id").alias("new_doc_id"), "band_id", "band_hash"
    )
    return (
        probe.join(idx, ["band_id", "band_hash"])
        .filter(F.col("new_doc_id") != F.col("corpus_doc_id"))
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
