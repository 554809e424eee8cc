"""Unit tests for the reusable column-function library
(drive_bc_datapipeline_spark.functions) on tiny literal frames."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.functions import geo, text, vectors


def test_vector_ops(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0])]
    )
    r = df.select(
        vectors.dot("a", "b").alias("dot"),
        vectors.l2_norm("a").alias("nrm"),
        vectors.cosine("a", "b").alias("cos"),
        vectors.add("a", "b").alias("sum"),
        vectors.scale("a", 2.0).alias("dbl"),
        vectors.normalize("a").alias("unit"),
    ).first()
    assert r.dot == 32.0
    assert abs(r.nrm - math.sqrt(14)) < 1e-12
    assert abs(r.cos - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12
    assert r.sum == [5.0, 7.0, 9.0]
    assert r.dbl == [2.0, 4.0, 6.0]
    assert abs(vec_len := math.sqrt(sum(x * x for x in r.unit)) - 1.0) < 1e-12


def test_normalize_zero_vector_passthrough(spark):
    df = spark.createDataFrame([Row(a=[0.0, 0.0])])
    assert df.select(vectors.normalize("a").alias("u")).first().u == [0.0, 0.0]


def test_haversine_known_distance(spark):
    # Vancouver → Kamloops ≈ 253 km great-circle
    df = spark.range(1).select(
        geo.haversine_km(
            F.lit(49.2827), F.lit(-123.1207), F.lit(50.6745), F.lit(-120.3273)
        ).alias("d")
    )
    assert abs(df.first().d - 253) < 5


def test_haversine_zero_and_antipode(spark):
    df = spark.range(1).select(
        geo.haversine_km(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)).alias("z"),
        geo.haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(180.0)).alias("anti"),
    )
    r = df.first()
    assert r.z == 0.0
    assert abs(r.anti - math.pi * geo.EARTH_RADIUS_KM) < 0.01


def test_grid_cell(spark):
    cx, cy = geo.grid_cell(F.lit(-12.3), F.lit(47.9), 5.0)
    r = spark.range(1).select(cx.alias("x"), cy.alias("y")).first()
    assert (r.x, r.y) == (9, -3)  # floor(47.9/5)=9, floor(-12.3/5)=-3


def test_tokenize_and_count(spark):
    df = spark.createDataFrame([Row(t="Hello,  world! x2  ")])
    r = df.select(
        text.whitespace_tokens("t").alias("toks"),
        text.whitespace_token_count("t").alias("n_ws"),
        text.regex_token_count("t").alias("n_bpe"),
    ).first()
    assert r.toks == ["Hello,", "world!", "x2"]
    assert r.n_ws == 3
    # Hello , world ! x 2 → 6 BPE-ish pretokens
    assert r.n_bpe == 6


@pytest.mark.parametrize(
    "sentence,n,expected",
    [
        ("a b c d", 2, ["a b", "b c", "c d"]),
        ("a b", 3, []),  # shorter than n → empty, not sequence(1,0) garbage
        ("solo", 1, ["solo"]),
    ],
)
def test_word_shingles(spark, sentence, n, expected):
    df = spark.createDataFrame([Row(t=sentence)]).select(
        F.split("t", " ").alias("toks")
    )
    assert df.select(text.word_shingles("toks", n).alias("s")).first().s == expected


def test_char_shingles(spark):
    df = spark.createDataFrame([Row(t="abcde")])
    r = df.select(text.char_shingles("t", 3).alias("s")).first()
    assert r.s == ["abc", "bcd", "cde"]


def test_ratios(spark):
    df = spark.createDataFrame([Row(t="the cat, and a dog!")]).select(
        "t", F.split("t", " ").alias("toks")
    )
    r = df.select(
        text.punct_ratio("t").alias("p"),
        text.stopword_ratio("toks", ("the", "a", "and")).alias("s"),
    ).first()
    assert abs(r.p - 2 / 19) < 1e-12
    # 'the', 'and', 'a' among 5 tokens ('cat,'/'dog!' carry punctuation)
    assert abs(r.s - 3 / 5) < 1e-12


def test_chunk_docs_udtf_matches_native_plan(spark):
    """The Python UDTF chunker must emit exactly the rows the
    JVM-native explode/transform/slice plan emits (H31's chunking),
    proving the SQL LATERAL surface before anyone ports real Python
    segmentation logic onto it."""
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.functions.udtfs import register_udtfs
    from drive_bc_datapipeline_spark.plans.registry import t

    register_udtfs(spark)
    d = t(spark, "/root/testdata/sf0.001", "documents").limit(50)
    d.createOrReplaceTempView("udtf_docs")
    via_udtf = {
        (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk)
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk "
            "FROM udtf_docs d, LATERAL chunk_docs(d.text, 16) c"
        ).collect()
    }
    w = 16
    native = (
        d.select(
            "doc_id",
            F.filter(F.split("text", " "), lambda x: x != "").alias("tk"),
        )
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(cast(ceil(size(tk)"
                    f" / {w}.0) as int), 1)),"
                    f" i -> slice(tk, (i - 1) * {w} + 1, {w}))"
                )
            ).alias("chunk_idx", "part"),
        )
        .filter(F.size("part") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            F.size("part").alias("n_tokens"),
            F.array_join("part", " ").alias("chunk"),
        )
    )
    via_native = {
        (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk)
        for r in native.collect()
    }
    assert via_udtf == via_native
    assert len(via_udtf) > 50
