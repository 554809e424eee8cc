"""Tests for the skew/bucketing join toolbox (operators/joins.py).

Salted variants must be RESULT-equal to their plain counterparts (the
optimization is physical, not logical); the bucketed-join test asserts
the physical property itself — no Exchange in the plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.operators import joins as J

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # heavy skew: one user owns 5000 rows, 50 users own 10 each
    hot = spark.range(5000).select(
        F.lit("hot_user").alias("user_id"), F.col("id").alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("u"), (F.col("id") % 50)).alias("user_id"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot_user", "H")] + [(f"u{i}", f"D{i}") for i in range(50)]
    return spark.createDataFrame(rows, "user_id string, tag string")


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain(spark, skewed, dim):
    plain = skewed.join(dim, "user_id").select("user_id", "v", "tag")
    salted = J.salted_join(skewed, dim, "user_id", n_salts=8).select(
        "user_id", "v", "tag"
    )
    assert _sorted(salted) == _sorted(plain)


def test_salted_left_join_keeps_unmatched(spark, skewed, dim):
    missing = dim.filter(F.col("user_id") != "hot_user")
    salted = J.salted_join(skewed, missing, "user_id", n_salts=4, how="left")
    plain = skewed.join(missing, "user_id", "left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("user_id") == "hot_user")
        .filter(F.col("tag").isNull())
        .count()
        == 5000
    )


def test_salted_groupby_matches_plain(spark, skewed):
    plain = {
        (r.user_id): (r.n, r.s, r.mx)
        for r in skewed.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.user_id): (r.n, r.s, r.mx)
        for r in J.salted_groupby(
            skewed,
            ["user_id"],
            {"n": "count(*)", "s": "sum(v)", "mx": "max(v)"},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_groupby_rejects_unknown_agg(spark, skewed):
    with pytest.raises(ValueError):
        J.salted_groupby(skewed, ["user_id"], {"x": "median(v)"})


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    l = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    J.write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
    J.write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    # at test SF the planner would (correctly) broadcast instead; force
    # the sort-merge path to expose the bucket co-location property
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # the property under test is bucket co-location (zero
        # exchanges), not the join algorithm: with broadcast disabled
        # the planner picks sort-merge by default and shuffled-hash
        # under preferSortMergeJoin=false (r17 session default) —
        # both consume the bucketed layout shuffle-free
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # (a Sort node may remain: Spark only trusts sortBy when each
        # bucket holds a single file, which parallel writers don't
        # guarantee — the exchange elimination is the scale win)
        # and it still computes the right thing
        expected = o.join(l, o.o_orderkey == l.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_exclusive_prefix_sum_matches_sequential(spark):
    """L4: two-phase distributed scan == sequential exclusive cumsum,
    across multiple range partitions."""
    import random

    from drive_bc_datapipeline_spark.operators.prefix import (
        exclusive_prefix_sum,
    )

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 500)) for i in range(1000)]
    rng.shuffle(rows)  # input order must not matter
    df = spark.createDataFrame(rows, "k INT, v INT")

    got = {
        r["k"]: r["prefix_sum"]
        for r in exclusive_prefix_sum(
            df, order_col="k", value_col="v", num_partitions=7
        ).collect()
    }
    acc, expected = 0, {}
    for k, v in sorted(rows):
        expected[k] = acc
        acc += v
    assert got == expected


def test_exclusive_prefix_sum_deterministic_at_scale(spark):
    """L4 regression (round-6): repartitionByRange re-samples its range
    boundaries per job, so an unpinned lineage applied the totals-job
    __pid->offset map to DIFFERENT partition contents in the final job
    (measured 4,368/5,000 wrong values before the fix). The operator
    must (a) match the single-partition global-window truth and
    (b) agree with itself across two independent invocations, at a row
    count large enough that many range partitions are in play.
    """
    from pyspark.sql.window import Window

    from drive_bc_datapipeline_spark.operators.prefix import (
        exclusive_prefix_sum,
    )

    n = 6000
    # non-trivial value distribution + string-ish ordering domain like
    # shard_packing's doc_id (zero-padded so lexicographic == numeric)
    df = spark.range(n).select(
        F.format_string("doc_%08d", F.col("id")).alias("k"),
        ((F.col("id") * 37) % 211 + 1).cast("int").alias("v"),
    )

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    truth = {
        r["k"]: r["p"]
        for r in df.withColumn(
            "p", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint")
        ).collect()
    }

    def run():
        return {
            r["k"]: r["prefix_sum"]
            for r in exclusive_prefix_sum(
                df, order_col="k", value_col="v", num_partitions=16
            ).collect()
        }

    first, second = run(), run()
    assert first == truth
    assert second == truth


def test_exclusive_prefix_sum_stable_across_reexecution(spark):
    """The RETURNED DataFrame must give identical results when its own
    lineage is executed more than once (count then collect then
    collect) — the exact re-execution pattern that exposed the bug.
    """
    from drive_bc_datapipeline_spark.operators.prefix import (
        exclusive_prefix_sum,
    )

    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("int").alias("v")
    )
    out = exclusive_prefix_sum(
        df, order_col="k", value_col="v", num_partitions=11
    )
    assert out.count() == 5000
    a = sorted((r["k"], r["prefix_sum"]) for r in out.collect())
    b = sorted((r["k"], r["prefix_sum"]) for r in out.collect())
    assert a == b
    # spot-check closed form: sum_{i<k} (i % 97)
    acc, exp = 0, {}
    for i in range(5000):
        exp[i] = acc
        acc += i % 97
    assert dict(a) == exp


def test_bloom_pruned_join_injects_runtime_filter(spark):
    """L5: with the thresholds widened, a selective dim filter must
    inject a runtime bloom filter on the fact side of the shuffle join
    (bloom_filter_agg build + might_contain probe in the plan), and
    the result must equal the unfiltered join."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")

        def joined():
            return l.join(o, l.l_orderkey == o.o_orderkey).agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("tot"),
            )

        with J.bloom_pruned_joins(spark):
            plan = joined()._jdf.queryExecution().executedPlan().toString()
            assert "bloom_filter_agg" in plan, plan[:2000]
            assert "might_contain" in plan, plan[:2000]
            with_bloom = joined().collect()[0]
        # confs restored; same numbers without the runtime filter
        without = joined().collect()[0]
        assert with_bloom == without
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_minhash_index_probe_matches_direct_banding(spark, tmp_path):
    """F15/K18: building the signature index then probing a new batch
    must find exactly the cross (new x corpus) band-collision pairs
    the direct one-shot banding computation finds."""
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.operators.dedup_index import (
        build_minhash_index,
        minhash_bands,
        probe_minhash_index,
    )
    from drive_bc_datapipeline_spark.plans.registry import t

    docs = t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    path = str(tmp_path / "mh_index")
    n_rows = build_minhash_index(corpus, path)
    assert n_rows > 0

    got = {
        (r.new_doc_id, r.corpus_doc_id)
        for r in probe_minhash_index(spark, path, batch).collect()
    }

    # direct computation: band-join batch bands against corpus bands
    cb = minhash_bands(corpus).select(
        F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_hash"
    )
    nb = minhash_bands(batch).select(
        F.col("doc_id").alias("new_doc_id"), "band_id", "band_hash"
    )
    want = {
        (r.new_doc_id, r.corpus_doc_id)
        for r in nb.join(cb, ["band_id", "band_hash"])
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_rfm_ntile_matches_native_ntile(spark):
    """B49's _rfm_ntile (rank-arithmetic NTILE(4)) must reproduce
    Spark's own ntile() for every total count 1..13 — covering the
    n % 4 remainder distribution and the base=0 (n < k) edge."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from drive_bc_datapipeline_spark.plans.events import _rfm_ntile

    for n in range(1, 14):
        df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "rk long")
        df = df.withColumn("n", F.lit(n).cast("long"))
        native = df.withColumn(
            "b", F.ntile(4).over(W.orderBy("rk"))
        )
        ours = df.withColumn("b", _rfm_ntile("rk", "n"))
        a = sorted((r["rk"], r["b"]) for r in native.collect())
        b = sorted((r["rk"], r["b"]) for r in ours.collect())
        assert a == b, f"n={n}: {a} != {b}"


def test_prefix_sum_with_total_matches_grand_sum(spark):
    """with_total=True returns the driver-side grand total phase 2
    already accumulated — must equal the exact sum, with the output
    frame unchanged vs the default call."""
    from drive_bc_datapipeline_spark.operators.prefix import (
        exclusive_prefix_sum,
    )

    df = spark.range(1234).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("int").alias("v")
    )
    out, total = exclusive_prefix_sum(
        df, order_col="k", value_col="v", num_partitions=5, with_total=True
    )
    assert total == sum(i % 7 for i in range(1234))
    rows = sorted((r["k"], r["prefix_sum"]) for r in out.collect())
    acc, exp = 0, []
    for i in range(1234):
        exp.append((i, acc))
        acc += i % 7
    assert rows == exp
