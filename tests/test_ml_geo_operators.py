"""Tests for the non-SQL operators: E2/E3 SparkML pipeline and D3
per-tile DBSCAN (SURVEY §5.2 — hand-computed expectations on tiny
frames; the oracle gate can't cover model fitting / iterative ops)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.operators import geo as geo_ops
from drive_bc_datapipeline_spark.operators import ml as ml_ops
from drive_bc_datapipeline_spark.plans import registry
from drive_bc_datapipeline_spark.plans.registry import QUERIES

registry.load_all_plans()


# ---------------------------------------------------------------- D3


def _points(spark, rows):
    return spark.createDataFrame(
        [Row(point_id=str(i), lat=float(a), lon=float(b)) for i, (a, b) in enumerate(rows)]
    )


def test_dbscan_two_clusters_and_noise(spark):
    # cluster A: 5 points near (0,0); cluster B: 5 near (20,20); 1 noise
    a = [(0.0, 0.0), (0.1, 0.0), (0.0, 0.1), (0.1, 0.1), (0.05, 0.05)]
    b = [(20.0, 20.0), (20.1, 20.0), (20.0, 20.1), (20.1, 20.1), (20.05, 20.05)]
    noise = [(40.0, -40.0)]
    df = geo_ops.dbscan_tiles(
        _points(spark, a + b + noise), eps_deg=0.5, min_samples=5, tile_deg=10.0
    )
    rows = {r.point_id: r for r in df.collect()}
    assert len(rows) == 11  # every point labeled exactly once (no ghost dups)
    a_ids = {rows[str(i)].cluster_id for i in range(5)}
    b_ids = {rows[str(i)].cluster_id for i in range(5, 10)}
    assert len(a_ids) == 1 and None not in a_ids
    assert len(b_ids) == 1 and None not in b_ids
    assert a_ids != b_ids
    assert rows["10"].cluster_id is None  # noise


def test_dbscan_cluster_straddles_tile_border(spark):
    # 6 points in a tight chain across the lon=10 tile boundary
    chain = [(0.0, 9.7 + 0.12 * i) for i in range(6)]  # 9.7 .. 10.3
    df = geo_ops.dbscan_tiles(
        _points(spark, chain), eps_deg=0.5, min_samples=3, tile_deg=10.0
    )
    rows = sorted(df.collect(), key=lambda r: int(r.point_id))
    assert len(rows) == 6
    # every point is clustered (ghost margin let each tile see the
    # whole chain) even though home tiles differ across the boundary
    assert all(r.cluster_id is not None for r in rows)
    assert len({r.tile_id for r in rows}) == 2


def test_dbscan_weighted(spark):
    # 3 co-located points with weight 2 → weighted sum 6 ≥ 5 = core;
    # unweighted the same 3 points are below min_samples=5 → noise.
    pts = [(0.0, 0.0), (0.05, 0.0), (0.0, 0.05)]
    from pyspark.sql import functions as F

    base = _points(spark, pts).withColumn("w2", F.lit(2.0))
    unweighted = geo_ops.dbscan_tiles(base, eps_deg=0.5, min_samples=5)
    assert all(r.cluster_id is None for r in unweighted.collect())
    weighted = geo_ops.dbscan_tiles(
        base, eps_deg=0.5, min_samples=5, weight_col="w2"
    )
    assert all(r.cluster_id is not None for r in weighted.collect())


def test_dbscan_rejects_bad_tiling(spark):
    with pytest.raises(ValueError):
        geo_ops.dbscan_tiles(_points(spark, [(0, 0)]), eps_deg=5.0, tile_deg=10.0)


# ------------------------------------------------------------- E2/E3


@pytest.fixture(scope="module")
def duration_df(spark):
    return QUERIES["ml_duration_features"](
        spark, SF_SMOKE
    ).cache()


def test_ml_pipeline_fit_evaluate(spark, duration_df):
    train, test = duration_df.randomSplit([0.8, 0.2], seed=7)
    model = ml_ops.fit(train, algo="rf")
    metrics = ml_ops.evaluate(model, test)
    assert set(metrics) == {"rmse", "mae", "mse", "r2"}
    assert metrics["rmse"] > 0
    assert abs(metrics["rmse"] ** 2 - metrics["mse"]) < 1e-6 * max(1.0, metrics["mse"])


def test_ml_cv_and_gbt(spark, duration_df):
    small = duration_df.limit(300)
    model = ml_ops.fit_cv(small, algo="gbt", folds=2)
    pred = model.transform(small)
    assert pred.select("prediction").count() == small.count()


def test_ml_save_load_score(spark, duration_df, tmp_path):
    model = ml_ops.fit(duration_df, algo="rf")
    path = str(tmp_path / "pipeline_model")
    ml_ops.save(model, path)
    loaded = ml_ops.load(path)
    scored = ml_ops.score(loaded, duration_df.limit(20))
    rows = scored.collect()
    assert len(rows) == 20
    assert all(r.prediction is not None for r in rows)
    # unseen category survives scoring (handleInvalid="keep")
    import pyspark.sql.functions as F

    oddball = duration_df.limit(5).withColumn("o_orderstatus", F.lit("ZZ"))
    assert ml_ops.score(loaded, oddball).count() == 5


def test_nearest_hub_self_assignment(spark):
    """A hub's own point is distance 0 from itself, so every hub must be
    assigned to itself (tiebreak can't steal an exact-zero match)."""
    from drive_bc_datapipeline_spark.plans.geo import N_HUBS, geo_nearest_hub

    out = geo_nearest_hub(spark, SF_SMOKE)
    hubs = {r.event_id: r for r in out.collect() if r.event_id < N_HUBS}
    assert len(hubs) == N_HUBS
    for eid, r in hubs.items():
        assert r.nearest_hub == eid and r.dist2 == 0.0


def test_numpy_mlp_learns_linear_signal(spark):
    """E4: the MLP stand-in must learn an easy y = 2a - 3b + 1 signal
    (driver-side training, distributed Arrow-batched scoring), and the
    row-count guard must refuse oversized driver collections."""
    import pytest

    from drive_bc_datapipeline_spark.operators.ml import (
        score_mlp_numpy,
        train_mlp_numpy,
    )

    df = (
        spark.range(600)
        .selectExpr(
            "CAST(id % 17 AS DOUBLE) / 17 AS a",
            "CAST(id % 7 AS DOUBLE) / 7 AS b",
        )
        .selectExpr("a", "b", "2*a - 3*b + 1 AS y")
    )
    model = train_mlp_numpy(df, ["a", "b"], "y", epochs=400, lr=0.05)
    scored = score_mlp_numpy(df, model).join(df, ["a", "b"])
    rows = scored.select("prediction", "y").collect()
    mae = sum(abs(r.prediction - r.y) for r in rows) / len(rows)
    assert mae < 0.15, f"MLP failed to fit linear signal, MAE={mae}"

    with pytest.raises(ValueError, match="sample the training frame"):
        train_mlp_numpy(df, ["a", "b"], "y", max_train_rows=10)


# ---------------------------------------------------------------------------
# E6 exact AUC / K20 weighted sampling
# ---------------------------------------------------------------------------


def _auc_reference(pairs):
    """Sequential midrank Mann-Whitney AUC (sklearn semantics)."""
    pairs = sorted(pairs)
    ranks, i = {}, 0
    n = len(pairs)
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        ranks.setdefault(pairs[i][0], mid)
        i = j
    npos = sum(y for _, y in pairs)
    nneg = n - npos
    rsum = sum(ranks[s] for s, y in pairs if y)
    return (rsum - npos * (npos + 1) / 2.0) / (npos * nneg)


def test_auc_rank_sum_matches_reference(spark):
    import random

    from drive_bc_datapipeline_spark.operators.ml import auc_rank_sum

    for seed in range(6):
        rng = random.Random(400 + seed)
        n = rng.randint(10, 200)
        # coarse score grid so ties are common; both classes present
        pairs = [
            (rng.randint(0, 12) / 12.0, rng.random() < 0.4) for _ in range(n)
        ]
        pairs[0] = (pairs[0][0], True)
        pairs[1] = (pairs[1][0], False)
        df = spark.createDataFrame(
            [(s, int(y)) for s, y in pairs], "score double, label int"
        )
        got = auc_rank_sum(df, "label", "score")
        want = _auc_reference([(s, int(y)) for s, y in pairs])
        assert abs(got - want) < 1e-12, f"seed {seed}: {got} vs {want}"


def test_auc_rank_sum_degenerate_raises(spark):
    import pytest as _pytest

    from drive_bc_datapipeline_spark.operators.ml import auc_rank_sum

    df = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, label int")
    with _pytest.raises(ValueError):
        auc_rank_sum(df, "label", "score")


def test_weighted_sample_matches_keyed_topk_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.operators.sampling import (
        hash_unit_py,
        weighted_sample,
    )

    rows = [(i, float(1 + (i * 7) % 5)) for i in range(300)]
    rows += [(300, 0.0), (301, -2.0), (302, None)]  # zero-mass excluded
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in weighted_sample(df, 25, "w", "id", seed=3).collect()]
    # sequential reference: same key formula, Spark's own xxhash64
    keyed = df.filter(F.col("w") > 0).select(
        "id", "w", F.xxhash64("id", F.lit(3)).alias("h")
    ).collect()
    import math

    want = [
        r["id"]
        for r in sorted(
            keyed,
            key=lambda r: (-(math.log(hash_unit_py(r["h"])) / r["w"]), r["id"]),
        )
    ][:25]
    assert got == want
    again = [r["id"] for r in weighted_sample(df, 25, "w", "id", seed=3).collect()]
    assert got == again
    other = [r["id"] for r in weighted_sample(df, 25, "w", "id", seed=4).collect()]
    assert got != other  # different seed, different draw


def test_hash_unit_is_strictly_positive_at_both_hash_extremes():
    """The -2^63 corner must map to a positive u with a finite log —
    the pre-division '+1' variant rounded away and drew u == 0 there."""
    import math

    from drive_bc_datapipeline_spark.operators.sampling import hash_unit_py

    lo = hash_unit_py(-(2**63))
    hi = hash_unit_py(2**63 - 1)
    assert lo == 2.0**-64 > 0.0
    assert math.isfinite(math.log(lo))
    assert hi <= 1.0  # nudge is sub-epsilon at the top of the range
    # monotone in the hash, so the order statistics are undisturbed
    assert lo < hash_unit_py(0) < hi


def test_weighted_sample_favors_heavy_rows(spark):
    """Rows with 50x the weight must dominate inclusion counts across
    seeds — the without-replacement inclusion law at work."""
    from drive_bc_datapipeline_spark.operators.sampling import weighted_sample

    rows = [(i, 50.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy = 0
    for seed in range(8):
        ids = [r["id"] for r in weighted_sample(df, 20, "w", "id", seed).collect()]
        assert len(ids) == 20
        heavy += sum(1 for i in ids if i < 20)
    assert heavy >= 8 * 20 * 0.55, heavy  # heavies are 10% of rows, >55% of picks


def test_seeded_shuffle_is_a_deterministic_permutation(spark):
    """L13: same (corpus, seed) -> same shard contents and same
    within-shard order, on fresh lineages; rows are preserved exactly;
    a different seed actually reorders."""
    from drive_bc_datapipeline_spark.operators.sampling import (
        seeded_shuffle,
    )

    def run(seed):
        df = spark.range(2000).select(
            F.col("id"), (F.col("id") * 7 % 13).alias("payload")
        )
        out = seeded_shuffle(df, "id", seed=seed, n_shards=8)
        rows = out.orderBy("shard", "pos_key", "id").collect()
        return [(r["id"], r["payload"], r["shard"]) for r in rows]

    a, b = run(5), run(5)
    assert a == b  # deterministic across independent builds
    # permutation: exact row multiset preserved
    assert sorted((i, p) for i, p, _ in a) == [
        (i, (i * 7) % 13) for i in range(2000)
    ]
    # seed actually matters: some rows land in different shards
    c = run(6)
    assert a != c
    moved = sum(1 for (_, _, s1), (_, _, s2) in zip(a, c) if s1 != s2)
    assert moved > 0
    # hash-uniform shard balance: no empty shard, max within 2x mean
    from collections import Counter

    sizes = Counter(s for _, _, s in a)
    assert len(sizes) == 8
    assert max(sizes.values()) < 2 * (2000 / 8)


def test_seeded_shuffle_epoch_write_roundtrip(spark, tmp_path):
    """The documented writer recipe produces reproducible shard files:
    two independent writes of the same (corpus, seed) yield identical
    per-shard id sequences when read back in pos_key order."""
    from drive_bc_datapipeline_spark.operators.sampling import (
        seeded_shuffle,
    )

    def write_epoch(path):
        df = spark.range(500).select("id")
        out = seeded_shuffle(df, "id", seed=11, n_shards=4)
        (
            out.repartition(4, "shard")
            .sortWithinPartitions("shard", "pos_key")
            .write.partitionBy("shard")
            .mode("overwrite")
            .parquet(path)
        )
        back = spark.read.parquet(path)
        return {
            s: [
                r["id"]
                for r in back.filter(F.col("shard") == s)
                .orderBy("pos_key")
                .collect()
            ]
            for s in range(4)
        }

    e1 = write_epoch(str(tmp_path / "epoch1"))
    e2 = write_epoch(str(tmp_path / "epoch2"))
    assert e1 == e2
    assert sorted(i for ids in e1.values() for i in ids) == list(range(500))


def test_temperature_resample_matches_sequential_reference(spark):
    """H40: multiplicities are exact vs a sequential reimplementation
    of q_s ∝ p_s^tau with the same hash draws; tau=1 is the identity;
    rare sources are upweighted and dominant ones downweighted."""
    import math

    from drive_bc_datapipeline_spark.operators.sampling import (
        hash_unit_py,
        temperature_resample,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    got = (
        temperature_resample(df, "source", tau=0.5, seed=9)
        .groupBy("doc_id", "source")
        .count()
        .collect()
    )
    got_mult = {r["doc_id"]: r["count"] for r in got}

    # sequential reference with the engine's own hash draws
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", F.xxhash64("doc_id", F.lit(9)).alias("h")
        ).collect()
    }
    p = {"big": 0.9, "small": 0.1}
    qn = {s: p[s] ** 0.5 for s in p}
    z = sum(qn.values())
    m = {s: (qn[s] / z) / p[s] for s in p}
    exp = {}
    for i, s in rows:
        u = hash_unit_py(hashes[i])
        c = math.floor(m[s]) + (1 if u < m[s] % 1.0 else 0)
        if c > 0:
            exp[i] = c
    assert got_mult == exp
    # direction: small upweighted (m>1), big downweighted (m<1)
    assert m["small"] > 1.0 > m["big"]
    # tau=1 is the identity permutation (every m_s == 1)
    ident = temperature_resample(df, "source", tau=1.0, seed=9)
    assert ident.count() == 1000
    assert ident.groupBy("doc_id").count().filter("count > 1").count() == 0


# ---------------------------------------------------------------------------
# F17 — leakage-safe group split
# ---------------------------------------------------------------------------


def test_group_split_keeps_components_together(spark):
    from drive_bc_datapipeline_spark.operators.sampling import group_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # two chains (0-1-2, 10-11) and a 2-cycle (20, 21)
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 20)],
        "src long, dst long",
    )
    out = group_split(docs, pairs, "doc_id", eval_frac=0.3, seed=7)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200
    # every component entirely on one side, labeled by its min id
    for grp in [(0, 1, 2), (10, 11), (20, 21)]:
        sides = {rows[i]["split"] for i in grp}
        reps = {rows[i]["group_rep"] for i in grp}
        assert len(sides) == 1 and reps == {min(grp)}, grp
    # singletons are their own group
    assert rows[99]["group_rep"] == 99
    # deterministic: same seed → same assignment; the draw is per-GROUP,
    # so fraction lands near eval_frac over ~195 groups
    again = {r["doc_id"]: r["split"] for r in
             group_split(docs, pairs, "doc_id", 0.3, seed=7).collect()}
    assert again == {k: v["split"] for k, v in rows.items()}
    n_eval = sum(1 for r in rows.values() if r["split"] == "eval")
    assert 0.15 * 200 < n_eval < 0.45 * 200, n_eval


def test_group_split_draws_once_per_group(spark):
    """The u-draw must use the group REP, not the row id: flipping a
    member's own hash draw cannot move it off its group's side."""
    from drive_bc_datapipeline_spark.operators.sampling import (
        _hash_unit,
        group_split,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 25) for i in range(25)], "src long, dst long"
    )
    out = group_split(docs, pairs, "doc_id", eval_frac=0.5, seed=3)
    rows = out.collect()
    # recompute the expected side from the rep's hash draw alone
    reps = out.select(F.col("group_rep").alias("r")).distinct()
    u_of = {
        r["r"]: r["u"]
        for r in reps.select("r", _hash_unit(F.col("r"), 3).alias("u")).collect()
    }
    for r in rows:
        want = "eval" if u_of[r["group_rep"]] < 0.5 else "train"
        assert r["split"] == want, r


def test_group_split_rejects_bad_fraction(spark):
    import pytest

    from drive_bc_datapipeline_spark.operators.sampling import group_split

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="eval_frac"):
        group_split(docs, pairs, "doc_id", eval_frac=1.5)


def test_group_split_tolerates_and_guards_column_names(spark):
    """r10: a df already carrying a 'component' column must NOT be
    shadowed by the CC working column (reserved __component now), and
    output-name clashes (group_rep / split) raise instead of silently
    producing ambiguous frames."""
    import pytest

    from drive_bc_datapipeline_spark.operators.sampling import group_split

    docs = spark.createDataFrame(
        [(1, "a", 99), (2, "b", 98), (3, "c", 97)],
        "doc_id long, text string, component long",
    )
    pairs = spark.createDataFrame([(1, 2)], "src long, dst long")
    rows = {
        r["doc_id"]: r
        for r in group_split(docs, pairs, "doc_id", 0.5, seed=1).collect()
    }
    # the user column survives untouched and the grouping still works
    assert [rows[i]["component"] for i in (1, 2, 3)] == [99, 98, 97]
    assert rows[1]["group_rep"] == rows[2]["group_rep"] == 1
    assert rows[3]["group_rep"] == 3

    for bad in ("group_rep", "split", "__component"):
        clash = docs.withColumn(bad, docs.doc_id)
        with pytest.raises(ValueError, match="rename them"):
            group_split(clash, pairs, "doc_id", 0.5)


# ---------------------------------------------------------------------------
# E8 — greedy k-center coreset vs sequential reference
# ---------------------------------------------------------------------------


def _seq_kcenter(sf_dir: str, k: int):
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    vecs = dict(rows)

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            dx = float(x) - float(y)
            acc += dx * dx
        return acc

    first = min(vecs)
    centers = [(0, first, 0.0)]
    md = {v: d2(vecs[v], vecs[first]) for v in vecs}
    for rnd in range(1, k):
        # arg-max distance, smaller id on ties (min over (-d, id))
        nd, cid = min((-md[v], v) for v in vecs)
        if nd == 0.0:
            break
        centers.append((rnd, cid, -nd))
        for v in vecs:
            md[v] = min(md[v], d2(vecs[v], vecs[cid]))
    return centers


def test_kcenter_matches_sequential_reference(spark):
    from drive_bc_datapipeline_spark.operators.ml import kcenter_coreset
    from drive_bc_datapipeline_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = [
        (r["round"], r["center_id"], r["radius"])
        for r in kcenter_coreset(emb, k=6).orderBy("round").collect()
    ]
    want = _seq_kcenter(SF_SMOKE, 6)
    assert len(got) == len(want) == 6
    for g, w in zip(got, want):
        assert g[:2] == w[:2], (g, w)
        assert abs(g[2] - w[2]) < 1e-9, (g, w)
    # radii are non-increasing (each pick can only shrink the cover)
    radii = [r for _, _, r in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii


def test_kcenter_short_circuits_on_duplicates(spark):
    from drive_bc_datapipeline_spark.operators.ml import kcenter_coreset

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = kcenter_coreset(df, k=3).orderBy("round").collect()
    # only 2 distinct points exist: round 2's max-min distance is 0,
    # so selection stops at 2 centers instead of picking a duplicate
    assert [(r["round"], r["center_id"]) for r in rows] == [(0, 1), (1, 3)]
    assert abs(rows[1]["radius"] - 25.0) < 1e-12


def test_kcenter_guards(spark):
    import pytest

    from drive_bc_datapipeline_spark.operators.ml import kcenter_coreset

    df = spark.createDataFrame(
        [(1, [0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="k must be"):
        kcenter_coreset(df, k=0)
    with pytest.raises(ValueError, match="sequential corpus passes"):
        kcenter_coreset(df, k=65)


def test_kcenter_preserves_id_type_and_releases_state(spark):
    """r10: center_id carries the caller's id type (here string), and
    no cached corpus state survives the call (the per-round states are
    eagerly unpersisted — previously up to k localCheckpoint copies
    accumulated)."""
    from drive_bc_datapipeline_spark.operators.ml import kcenter_coreset

    df = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [3.0, 4.0]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    persisted_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = kcenter_coreset(df, k=3)
    assert dict(out.dtypes)["center_id"] == "string"
    rows = [(r["round"], r["center_id"]) for r in out.orderBy("round").collect()]
    # seed = min id 'a'; farthest from a is b (25.0); then c (1.0)
    assert rows == [(0, "a"), (1, "b"), (2, "c")]
    persisted_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert persisted_after <= persisted_before, "leaked persisted state"
