"""Structured Streaming tests (SURVEY §2 J1/J2).

Strategy (SURVEY §5.3): write JSONL event files into a tmp source dir,
run the stream with trigger(availableNow=True) so it drains the backlog
deterministically and stops, then assert the streamed result equals the
equivalent batch computation on the same files.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.streaming import pipeline as sp

EVENTS = [
    {"event_id": "e1", "ts": "2024-01-01T00:10:00", "user_id": "u1",
     "event_type": "click", "value": 1.0, "props": '{"k": 3}'},
    {"event_id": "e2", "ts": "2024-01-01T00:40:00", "user_id": "u2",
     "event_type": "view", "value": 2.0, "props": '{"k": 5}'},
    {"event_id": "e3", "ts": "2024-01-01T01:05:00", "user_id": "u1",
     "event_type": "click", "value": 3.0, "props": '{"k": 1}'},
    # dup of e1 (streaming dedup drops it), null-ts row (dropna drops it)
    {"event_id": "e1", "ts": "2024-01-01T00:10:00", "user_id": "u1",
     "event_type": "click", "value": 1.0, "props": '{"k": 3}'},
    {"event_id": "e4", "ts": None, "user_id": "u3",
     "event_type": "view", "value": 4.0, "props": "{}"},
]


def _write_source(tmp_path, n_files=2):
    src = tmp_path / "src"
    src.mkdir()
    per = (len(EVENTS) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = EVENTS[i * per:(i + 1) * per]
        (src / f"part{i}.json").write_text(
            "\n".join(json.dumps(e) for e in chunk)
        )
    return str(src)


def test_etl_stream_foreachbatch(spark, tmp_path):
    """J1: stream → clean → foreachBatch date-partitioned parquet append."""
    src = _write_source(tmp_path)
    sink = str(tmp_path / "sink")
    q = sp.start_etl_stream(
        spark, src, sink, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    # e4 dropped (null ts); dup e1 kept (J1 has no dedup — that's J1+dedup)
    assert out.count() == 4
    assert {"event_id", "k", "event_date", "hour"} <= set(out.columns)
    rows = {(r.event_id, r.k, r.hour) for r in out.collect()}
    assert ("e2", 5, 0) in rows
    assert ("e3", 1, 1) in rows


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    """J2: watermark + tumbling window agg == batch window agg."""
    src = _write_source(tmp_path)
    q = sp.start_windowed_counts_stream(
        spark, src, str(tmp_path / "ckpt2"), query_name="t_hourly",
        available_now=True,
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.window_end, r.event_type, r.cnt)
        for r in spark.sql("SELECT * FROM t_hourly").collect()
    }

    batch = (
        spark.read.schema(sp.RAW_EVENT_SCHEMA).json(src)
        .dropna(subset=["ts"])
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )
    expected = {
        (r.window_start, r.window_end, r.event_type, r.cnt)
        for r in batch.collect()
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_deduped_stream(spark, tmp_path):
    """Streaming keyed dedup via dropDuplicatesWithinWatermark."""
    src = _write_source(tmp_path)
    deduped = sp.deduped_event_stream(
        sp.read_event_stream(spark, src)
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [r.event_id for r in spark.sql("SELECT event_id FROM t_dedup").collect()]
    assert sorted(ids) == ["e1", "e2", "e3"]  # dup e1 dropped, e4 dropped


def test_stateful_user_stats_matches_batch(spark, tmp_path):
    """applyInPandasWithState running totals == batch groupBy at drain."""
    src = _write_source(tmp_path)
    q = sp.start_stateful_user_stats_stream(
        spark, src, str(tmp_path / "ckpt4"), query_name="t_stats",
        available_now=True,
    )
    q.awaitTermination(120)
    # update mode may emit a row per micro-batch per key; last emission
    # per user carries the final running totals
    streamed = {
        r.user_id: (r.n_events, r.total_value, r.last_ts)
        for r in spark.sql(
            "SELECT * FROM t_stats"
        ).orderBy("n_events").collect()  # ascending → final row wins in dict
    }
    batch = (
        spark.read.schema(sp.RAW_EVENT_SCHEMA).json(src)
        .dropna(subset=["ts"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tot"),
            F.max("ts").alias("last_ts"),
        )
    )
    expected = {
        r.user_id: (r.n, float(r.tot), r.last_ts) for r in batch.collect()
    }
    assert streamed == expected
    assert len(streamed) == 2  # u1, u2 (u3 has null ts)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """J6: watermarked stream-stream join == equivalent batch join."""
    import json as _json

    events = []
    base = "2024-01-01T"
    rows = [
        ("c1", "00:10", "u1", "click"),
        ("c2", "00:50", "u1", "click"),
        ("p1", "01:00", "u1", "purchase"),   # joins c1 (50m) + c2 (10m)
        ("c3", "02:30", "u1", "click"),
        ("p2", "04:00", "u1", "purchase"),   # c3 is 90m before → outside 60m
        ("c4", "03:55", "u2", "click"),
        ("p3", "04:05", "u2", "purchase"),   # joins c4 (10m), not u1's clicks
    ]
    for eid, hm, user, etype in rows:
        events.append({"event_id": eid, "ts": f"{base}{hm}:00", "user_id": user,
                       "event_type": etype, "value": 1.0, "props": "{}"})
    src = tmp_path / "ssj_src"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(e) for e in events))

    q = sp.start_stream_stream_join(
        spark, str(src), str(tmp_path / "ssj_ckpt"), query_name="t_ssj",
        available_now=True,
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.click_ts.strftime("%H:%M"))
        for r in spark.sql("SELECT * FROM t_ssj").collect()
    }
    assert got == {("p1", "00:10"), ("p1", "00:50"), ("p3", "03:55")}


def test_stream_static_enrichment(spark, tmp_path):
    """J7: micro-batches left-join a broadcast static dim."""
    src = _write_source(tmp_path)
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], "user_id string, tier string"
    )
    q = sp.start_enriched_stream(
        spark, src, dim, str(tmp_path / "ckpt5"), query_name="t_enrich",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = {r.event_id: r.tier for r in spark.sql(
        "SELECT event_id, tier FROM t_enrich").collect()}
    # e1 appears twice (no dedup in this path) but maps consistently
    assert rows["e1"] == "gold" and rows["e3"] == "gold"
    assert rows["e2"] == "silver"


def test_tws_user_stats_matches_batch(spark, tmp_path):
    """J8: transformWithStateInPandas running totals == batch groupBy
    (and == the J4 applyInPandasWithState semantics)."""
    pytest.importorskip(
        "google.protobuf", reason="TWS worker protocol needs protobuf"
    )
    src = _write_source(tmp_path)
    q = sp.start_tws_user_stats_stream(
        spark, src, str(tmp_path / "ckpt_tws"), query_name="t_tws",
        available_now=True,
    )
    q.awaitTermination(120)
    streamed = {
        r.user_id: (r.n_events, r.total_value, r.last_ts)
        for r in spark.sql("SELECT * FROM t_tws").orderBy("n_events").collect()
    }
    batch = (
        spark.read.schema(sp.RAW_EVENT_SCHEMA).json(src)
        .dropna(subset=["ts"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tot"),
            F.max("ts").alias("last_ts"),
        )
    )
    expected = {
        r.user_id: (r.n, float(r.tot), r.last_ts) for r in batch.collect()
    }
    assert streamed == expected


def test_tws_gate_points_to_j4_fallback(spark, tmp_path):
    """Without protobuf the J8 starter must fail FAST with a pointer to
    the J4 fallback — not crash the streaming worker mid-query."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        pytest.skip("protobuf present: gate inactive")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="applyInPandasWithState"):
        sp.start_tws_user_stats_stream(
            spark, str(tmp_path), str(tmp_path / "ck"), query_name="x"
        )


def test_session_window_stream_matches_batch(spark, tmp_path):
    """J9: streaming session_window merge == batch session_window."""
    src = _write_source(tmp_path)
    q = sp.start_session_window_stream(
        spark, src, str(tmp_path / "ckpt9"), query_name="t_sessions",
        available_now=True,
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    batch = (
        spark.read.schema(sp.RAW_EVENT_SCHEMA).json(src)
        .dropna(subset=["ts"])
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_exactly_once_sink_stream_matches_batch(spark, tmp_path):
    """J10 end-to-end: availableNow drain through the commit-log sink
    equals the batch computation, and a SECOND run of the same stream
    (fresh checkpoint, so every batch id replays) changes nothing —
    the at-least-once duplication window is closed."""
    src = _write_source(tmp_path)
    sink = str(tmp_path / "sink")
    sp.start_exactly_once_sink(
        spark, str(src), sink, str(tmp_path / "ck1")
    ).awaitTermination(60)
    want = sorted(
        map(tuple, sp.clean_events(spark.read.json(str(src), schema=sp.RAW_EVENT_SCHEMA))
            .select("event_id", "value", "k").collect())
    )
    got = sorted(
        map(tuple, sp.read_committed(spark, sink)
            .select("event_id", "value", "k").collect())
    )
    assert got == want
    # replay the whole stream into the same sink: same batch ids, but a
    # fresh checkpoint means Spark re-delivers every batch
    sp.start_exactly_once_sink(
        spark, str(src), sink, str(tmp_path / "ck2")
    ).awaitTermination(60)
    again = sorted(
        map(tuple, sp.read_committed(spark, sink)
            .select("event_id", "value", "k").collect())
    )
    assert again == want


def test_exactly_once_crash_replay_protocol(spark, tmp_path):
    """Drive the commit protocol directly through each crash window:
    (a) crash before rename (tmp garbage), (b) crash after rename but
    before marker (dir invisible), (c) replay after full commit
    (no-op). Every path converges to exactly one copy."""
    import os

    sink = str(tmp_path / "sink")
    write_batch = sp.exactly_once_batch_writer(sink)
    df = spark.range(5).withColumnRenamed("id", "v")

    # (a) simulate crash BEFORE rename: stale tmp dir left behind
    os.makedirs(os.path.join(sink, "_tmp_batch_0"))
    write_batch(df, 0)
    assert sorted(
        r["v"] for r in sp.read_committed(spark, sink).collect()
    ) == [0, 1, 2, 3, 4]

    # (b) simulate crash AFTER rename, BEFORE marker for batch 1
    df.write.parquet(os.path.join(sink, "batch=1"))
    committed = sp.read_committed(spark, sink)
    assert committed.count() == 5  # uncommitted dir invisible
    write_batch(df, 1)  # replay completes the commit — exactly once
    assert sp.read_committed(spark, sink).count() == 10

    # (c) full replay of a committed batch is a no-op
    write_batch(df, 1)
    write_batch(df, 0)
    assert sp.read_committed(spark, sink).count() == 10

    # empty batches commit their emptiness (no dir, marker only)
    write_batch(df.limit(0), 2)
    assert sp.read_committed(spark, sink).count() == 10


# ---------------------------------------------------------------------------
# J11 — streaming curation gate (the incremental twin of the batch
# E9→E10→E7 gate): per-micro-batch scoring is per-doc pure, so the
# streamed kept-set must equal the batch gate on the union, and the
# J10 commit protocol must close the replay window without re-scoring.
# ---------------------------------------------------------------------------


def _gate_model(spark):
    """A hand-crafted hashed-linear model: +8 on 'good', -8 on 'junk'
    (bucket ids computed with the operator's own hash, so the test
    can't drift from the feature space)."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        hash_bucket,
    )

    rows = (
        spark.createDataFrame([("good",), ("junk",)], "tok string")
        .select("tok", hash_bucket(F.col("tok"), 64).alias("b"))
        .collect()
    )
    buckets = {r["tok"]: r["b"] for r in rows}
    assert buckets["good"] != buckets["junk"], "widen n_buckets"
    return {buckets["good"]: 8.0, buckets["junk"]: -8.0}


DOCS = [
    (1, "web", "good good story here"),
    (2, "web", "junk junk junk noise"),
    (3, "book", "good good good prose"),
    (4, "web", "good junk mixed bag"),
    (5, "book", "junk junk bad stuff"),
    (6, "web", "good clean words again"),
]


def _write_doc_source(tmp_path, spark, n_files=3):
    src = str(tmp_path / "docs_src")
    df = spark.createDataFrame(DOCS, sp.DOC_STREAM_SCHEMA)
    df.repartition(n_files).write.parquet(src)
    return src


def test_curation_gate_stream_matches_batch(spark, tmp_path):
    from drive_bc_datapipeline_spark.operators.classifier import (
        score_hashed_linear,
    )

    w = _gate_model(spark)
    src = _write_doc_source(tmp_path, spark)
    sink = str(tmp_path / "gate_sink")
    sp.start_curation_gate_stream(
        spark, src, sink, str(tmp_path / "ck1"),
        weights=w, bias=0.0, threshold=0.6, n_buckets=64,
        max_files_per_trigger=1,  # force multiple micro-batches
    ).awaitTermination(120)

    batch_docs = spark.read.parquet(src)
    batch_scored = score_hashed_linear(
        spark, batch_docs, w, n_buckets=64, bias=0.0
    )
    want = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in batch_scored.filter(F.col("score") >= 0.6).collect()
    )
    got_df = sp.read_committed(spark, sink)
    got = sorted(
        (r["doc_id"], round(r["score"], 9)) for r in got_df.collect()
    )
    assert got == want
    assert len(got) > 0 and len(got) < len(DOCS)  # the gate did work
    # kept rows carry every input column + the audit score
    assert set(got_df.columns) == {"doc_id", "source", "text", "score"}
    # only good-dominated docs clear sigmoid-land: ids 1, 3, 6
    assert [d for d, _s in got] == [1, 3, 6]

    # full replay with a fresh checkpoint (every batch id re-delivers)
    # changes nothing — exactly once end to end
    sp.start_curation_gate_stream(
        spark, src, sink, str(tmp_path / "ck2"),
        weights=w, bias=0.0, threshold=0.6, n_buckets=64,
        max_files_per_trigger=1,
    ).awaitTermination(120)
    again = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in sp.read_committed(spark, sink).collect()
    )
    assert again == want


def test_curation_gate_crash_replay_protocol(spark, tmp_path):
    """The J10 crash windows driven through the gate writer: stale
    tmp, rename-without-marker, and full-commit replay all converge
    to exactly one scored copy per batch."""
    import os

    w = _gate_model(spark)
    sink = str(tmp_path / "gate_sink")
    write_batch = sp.curation_gate_batch_writer(
        sink, w, 0.0, 0.6, n_buckets=64
    )
    df = spark.createDataFrame(DOCS, sp.DOC_STREAM_SCHEMA)

    # (a) stale tmp dir from a crash before rename
    os.makedirs(os.path.join(sink, "_tmp_batch_0"))
    write_batch(df, 0)
    first = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert first == [1, 3, 6]

    # (b) crash after rename, before marker: dir invisible until the
    # replayed batch recommits it
    os.rename(
        os.path.join(sink, "batch=0"), os.path.join(sink, "batch=1")
    )
    os.remove(os.path.join(sink, "_commits", "0"))
    assert not os.path.isdir(os.path.join(sink, "_commits")) or \
        "1" not in os.listdir(os.path.join(sink, "_commits"))
    write_batch(df, 1)  # completes batch 1's commit
    write_batch(df, 0)  # rewrites + commits batch 0
    assert sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    ) == [1, 1, 3, 3, 6, 6]

    # (c) replaying committed ids is a no-op (marker short-circuits
    # before any scoring plan is built)
    write_batch(df, 0)
    write_batch(df, 1)
    assert sp.read_committed(spark, sink).count() == 6

    # an all-filtered batch commits emptiness: replay skips it
    junk_only = df.filter(F.col("doc_id").isin(2, 5))
    write_batch(junk_only, 2)
    assert sp.read_committed(spark, sink).count() == 6
    write_batch(junk_only, 2)
    assert sp.read_committed(spark, sink).count() == 6


@pytest.mark.slow
def test_curation_gate_stream_calibrated_handoff(spark, tmp_path):
    """The documented batch→stream handoff, end to end: train on
    seeds, calibrate (E11), select the threshold on CALIBRATED
    probabilities, invert it through calibrated_threshold_to_raw,
    and run J11 with the raw threshold — the streamed kept-set must
    equal the batch calibrated gate on the same corpus."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        apply_isotonic_calibration,
        calibrated_threshold_to_raw,
        classifier_pr_curve,
        isotonic_calibration_table,
        score_hashed_linear,
        train_hashed_linear,
    )

    n_bins = 200
    seeds = spark.createDataFrame(
        [(1000 + i, 1, "good story number %d" % i) for i in range(12)]
        + [(2000 + i, 0, "junk noise number %d" % i) for i in range(12)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(
        spark, seeds, n_buckets=64, n_rounds=40, lr=1.0
    )
    seed_scored = score_hashed_linear(
        spark, seeds, w, n_buckets=64, bias=b
    ).join(seeds.select("doc_id", "label"), "doc_id")
    table = isotonic_calibration_table(seed_scored, n_bins=n_bins)
    seed_cal = apply_isotonic_calibration(
        seed_scored, table, n_bins=n_bins
    )
    curve = classifier_pr_curve(
        seed_cal, score_col="calibrated", n_bins=n_bins
    ).collect()
    eligible = [r for r in curve if r["precision"] >= 0.95]
    assert eligible
    t_cal = min(r["threshold"] for r in eligible)
    raw_t = calibrated_threshold_to_raw(table, t_cal, n_bins=n_bins)

    src = _write_doc_source(tmp_path, spark)
    sink = str(tmp_path / "cal_sink")
    sp.start_curation_gate_stream(
        spark, src, sink, str(tmp_path / "ck_cal"),
        weights=w, bias=b, threshold=raw_t, n_buckets=64,
        max_files_per_trigger=1,
    ).awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )

    batch = score_hashed_linear(
        spark, spark.read.parquet(src), w, n_buckets=64, bias=b
    )
    batch_cal = apply_isotonic_calibration(batch, table, n_bins=n_bins)
    want = sorted(
        r["doc_id"]
        for r in batch_cal.filter(
            F.col("calibrated") >= t_cal
        ).collect()
    )
    assert got == want
    # the gate actually separated the corpus (not all-kept/all-drop)
    assert 0 < len(got) < len(DOCS)

    # r15 (r14 ADVICE): the calibrated handoff as an ARGUMENT PAIR —
    # pass the calibrated threshold + the manifest's calibration
    # table and the stream performs the inversion itself; kept set
    # identical to the hand-inverted run above
    sink2 = str(tmp_path / "cal_sink2")
    sp.start_curation_gate_stream(
        spark, src, sink2, str(tmp_path / "ck_cal2"),
        weights=w, bias=b, threshold=t_cal,
        cal_table=table, curve_bins=n_bins, n_buckets=64,
        max_files_per_trigger=1,
    ).awaitTermination(120)
    got2 = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink2).collect()
    )
    assert got2 == want

    # half-supplying the handoff fails loudly where detectable: a
    # curve_bins SMALLER than the fit leaves table bins out of range
    # (the inversion's n_bins contract guard); too-large curve_bins is
    # inherently undetectable from the table alone — the pair being
    # one call site (instead of a docstring asking the caller to
    # invert by hand) is the mitigation for that direction
    import pytest as _pytest

    assert any(row[0] >= n_bins // 2 for row in table)  # guard fires
    with _pytest.raises(ValueError, match="same n_bins"):
        sp.start_curation_gate_stream(
            spark, src, str(tmp_path / "bad"), str(tmp_path / "ck_bad"),
            weights=w, bias=b, threshold=t_cal,
            cal_table=table, curve_bins=n_bins // 2, n_buckets=64,
        )
    # ...and the undetectable direction (a defaulted/omitted
    # curve_bins larger than the fit would silently rescale the cut)
    # is closed by refusing a half-supplied pair outright
    with _pytest.raises(ValueError, match="without curve_bins"):
        sp.start_curation_gate_stream(
            spark, src, str(tmp_path / "bad2"), str(tmp_path / "ck_b2"),
            weights=w, bias=b, threshold=t_cal,
            cal_table=table, n_buckets=64,
        )
    with _pytest.raises(ValueError, match="without cal_table"):
        sp.start_curation_gate_stream(
            spark, src, str(tmp_path / "bad3"), str(tmp_path / "ck_b3"),
            weights=w, bias=b, threshold=raw_t,
            curve_bins=n_bins, n_buckets=64,
        )


# ---------------------------------------------------------------------------
# J12 — streaming CCNet gate (frozen LM + per-domain thresholds)
# ---------------------------------------------------------------------------

CCNET_DOCS = [
    # per domain: 3 reference-like docs, 3 OOV-soup docs — the batch
    # q=0.5 cut keeps each domain's reference-like half
    (i, src, text)
    for src_i, src in enumerate(("web", "book"))
    for i, text in (
        [(100 * src_i + j, "the quick fox jumps over %d" % j)
         for j in range(3)]
        + [(100 * src_i + 10 + j, "zx%d qq blorp gnar wib" % j)
           for j in range(3)]
    )
]


def test_ccnet_gate_stream_matches_batch(spark, tmp_path):
    """The streamed CCNet cut IS the batch cut: run the batch
    prefilter for the manifest, stream the same corpus through the
    J12 gate with the SAME frozen LM + thresholds, and the kept sets
    match exactly."""
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter
    from drive_bc_datapipeline_spark.operators.lm_score import (
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick fox jumps over the lazy dog") for i in range(6)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(CCNET_DOCS, sp.DOC_STREAM_SCHEMA)
    m = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "batch"), q=0.5
    )
    batch_kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(m["path"]).collect()
    )
    assert 0 < len(batch_kept) < len(CCNET_DOCS)

    src = str(tmp_path / "ccnet_src")
    docs.repartition(3).write.parquet(src)
    lm = unigram_lm_table(ref, alpha=m["alpha"])
    sink = str(tmp_path / "ccnet_sink")
    sp.start_ccnet_gate_stream(
        spark, src, sink, str(tmp_path / "ck_ccnet"),
        lm=lm, thresholds=m["thresholds"], q=m["q"],
        max_files_per_trigger=1,  # force multiple micro-batches
    ).awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert got == batch_kept
    # the audit columns ride the kept stream output
    kept_df = sp.read_committed(spark, sink)
    assert {"n_toks", "avg_nll"} <= set(kept_df.columns)


def test_ccnet_gate_writer_replay_and_guards(spark, tmp_path):
    """The J10 protocol through the J12 writer: replayed committed
    ids short-circuit on the marker, a crash window replays cleanly,
    an unknown stream domain fails fast, and an empty threshold dict
    is refused up front."""
    import os

    import pytest

    from drive_bc_datapipeline_spark.operators.lm_score import (
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick fox jumps over the lazy dog") for i in range(6)],
        "doc_id long, text string",
    )
    lm = unigram_lm_table(ref)
    docs = spark.createDataFrame(CCNET_DOCS, sp.DOC_STREAM_SCHEMA)
    # thresholds high enough to keep the reference-like docs
    thresholds = {"web": 10.0, "book": 10.0}
    sink = str(tmp_path / "w_sink")
    write_batch = sp.ccnet_gate_batch_writer(sink, lm, thresholds, 0.5)

    write_batch(docs, 0)
    n0 = sp.read_committed(spark, sink).count()
    assert n0 > 0
    # replay of a committed id: marker short-circuits, nothing changes
    write_batch(docs, 0)
    assert sp.read_committed(spark, sink).count() == n0
    # crash window: data written but marker lost -> full rewrite
    os.remove(sp.commit_marker_path(sink, 0))
    write_batch(docs, 0)
    assert sp.read_committed(spark, sink).count() == n0

    # unknown domain fails at execution (the apply fail-fast rides in)
    stray = spark.createDataFrame(
        [(999, "mars", "the quick fox")], sp.DOC_STREAM_SCHEMA
    )
    with pytest.raises(Exception, match="never fit"):
        write_batch(stray, 1)

    # empty thresholds refused before any stream starts
    with pytest.raises(ValueError, match="empty thresholds"):
        sp.start_ccnet_gate_stream(
            spark, str(tmp_path / "x"), str(tmp_path / "y"),
            str(tmp_path / "z"), lm=lm, thresholds={}, q=0.5,
        )


@pytest.mark.slow
def test_ccnet_gate_writer_bigram_arm(spark, tmp_path):
    """The order-2 arm: the writer scores under the bigram LM when
    given one, and the kept set matches the batch lm_order=2 job."""
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter
    from drive_bc_datapipeline_spark.operators.lm_score import (
        bigram_lm_table,
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick fox jumps over the lazy dog") for i in range(6)],
        "doc_id long, text string",
    )
    ordered = "the quick fox jumps over"
    shuffled = "over fox the jumps quick"
    docs = spark.createDataFrame(
        [(j, "web", ordered) for j in range(3)]
        + [(10 + j, "web", shuffled) for j in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    m = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "bg_batch"),
        q=0.5, lm_order=2, lam=0.6,
    )
    batch_kept = sorted(
        r["doc_id"] for r in spark.read.parquet(m["path"]).collect()
    )
    assert batch_kept == [0, 1, 2]  # the order-sensitive cut

    lm = unigram_lm_table(ref, alpha=m["alpha"])
    bg = bigram_lm_table(ref)
    sink = str(tmp_path / "bg_sink")
    write_batch = sp.ccnet_gate_batch_writer(
        sink, lm, m["thresholds"], m["q"],
        bigram=bg, alpha=m["alpha"], lam=m["lam"],
    )
    write_batch(docs, 0)
    assert sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    ) == batch_kept


def test_ccnet_gate_writer_probes_model_once(spark, tmp_path, monkeypatch):
    """The frozen model's validation probes run ONCE at writer build,
    not per micro-batch (r15 review catch)."""
    import drive_bc_datapipeline_spark.operators.lm_score as lmm
    from drive_bc_datapipeline_spark.operators.lm_score import (
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick fox jumps over the lazy dog") for i in range(3)],
        "doc_id long, text string",
    )
    lm = unigram_lm_table(ref)
    calls = {"oov": 0, "stats": 0}
    real_oov, real_stats = lmm.unigram_oov_logp, lmm.bigram_backoff_stats
    monkeypatch.setattr(
        lmm, "unigram_oov_logp",
        lambda t: (calls.__setitem__("oov", calls["oov"] + 1), real_oov(t))[1],
    )
    monkeypatch.setattr(
        lmm, "bigram_backoff_stats",
        lambda b, u: (
            calls.__setitem__("stats", calls["stats"] + 1), real_stats(b, u)
        )[1],
    )
    docs = spark.createDataFrame(CCNET_DOCS, sp.DOC_STREAM_SCHEMA)
    write_batch = sp.ccnet_gate_batch_writer(
        str(tmp_path / "p_sink"), lm, {"web": 10.0, "book": 10.0}, 0.5
    )
    assert calls == {"oov": 1, "stats": 0}  # probed at build
    write_batch(docs, 0)
    write_batch(docs.limit(3), 1)
    assert calls == {"oov": 1, "stats": 0}  # ...and never again


@pytest.mark.slow
def test_staged_gate_stream_matches_batch_prefix(spark, tmp_path):
    """J13: the staged gate stream (CCNet cut → classifier gate) ==
    running the batch prefilter then the batch classifier gate on the
    survivors — run_staged_curation's filterable prefix, incremental.
    Model state comes from the two batch manifests."""
    from drive_bc_datapipeline_spark.jobs import run_staged_curation
    from drive_bc_datapipeline_spark.operators.classifier import (
        score_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick fox jumps over the lazy dog") for i in range(6)],
        "doc_id long, text string",
    )
    # corpus: per domain, seed-shaped docs (half "good", half "junk"
    # — EXACTLY the seed text shapes, so the classifier's seed-curve
    # threshold transfers to the survivors) + OOV soup the prefilter
    # cuts before the classifier ever scores it
    rows = []
    for si, src in enumerate(("web", "book")):
        for j in range(3):
            rows.append((100 * si + j, src, "the quick good %d" % j))
        for j in range(3):
            rows.append((100 * si + 10 + j, src,
                         "the quick junk %d" % j))
        for j in range(3):
            rows.append((100 * si + 20 + j, src,
                         "zx%d qq blorp gnar wib" % j))
    docs = spark.createDataFrame(rows, sp.DOC_STREAM_SCHEMA)
    seeds = spark.createDataFrame(
        [(1000 + i, 1, "the quick good %d" % i) for i in range(8)]
        + [(2000 + i, 0, "the quick junk %d" % i) for i in range(8)],
        "doc_id long, label int, text string",
    )
    target = spark.createDataFrame(
        [(3000 + i, "the quick fox good") for i in range(5)],
        "doc_id long, text string",
    )
    m = run_staged_curation(
        spark, docs, ref, seeds, target, str(tmp_path / "batch"),
        k=4, q=0.7, n_buckets=64, n_rounds=40, lr=1.0,
        min_precision=0.9, dsir_buckets=256, seed=3, n_shards=2,
    )
    # batch truth: the prefilter's kept set, then the classifier gate
    pre_kept = spark.read.parquet(f"{tmp_path}/batch/prefilter/kept")
    mw = m["curation"]
    # the gate model isn't in the manifest (driver state) — retrain
    # identically: run_curation_pipeline is deterministic for a fixed
    # seed frame, so refitting reproduces weights; instead reuse the
    # frames seam for the model
    from drive_bc_datapipeline_spark.jobs import build_curation_frames

    frames = build_curation_frames(
        spark, pre_kept, seeds, target,
        k=4, n_buckets=64, n_rounds=40, lr=1.0,
        min_precision=0.9, dsir_buckets=256, seed=3, n_shards=2,
    )
    w, b = frames["model_weights"], frames["model_bias"]
    assert frames["threshold"] == mw["threshold"]  # same training
    batch_gate_kept = sorted(
        r["doc_id"]
        for r in score_hashed_linear(
            spark, pre_kept, w, n_buckets=64, bias=b
        ).filter(F.col("score") >= mw["threshold"]).collect()
    )
    assert batch_gate_kept  # the gate kept something

    lm = unigram_lm_table(ref, alpha=m["prefilter"]["alpha"])
    src_dir = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src_dir)
    sink = str(tmp_path / "sink")
    sp.start_staged_gate_stream(
        spark, src_dir, sink, str(tmp_path / "ck"),
        lm=lm, thresholds=m["prefilter"]["thresholds"],
        q=m["prefilter"]["q"],
        weights=w, bias=b, threshold=mw["threshold"],
        n_buckets=64, max_files_per_trigger=1,
    ).awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert got == batch_gate_kept
    # both audit trails ride the kept rows
    kept_df = sp.read_committed(spark, sink)
    assert {"n_toks", "avg_nll", "score"} <= set(kept_df.columns)

    # the calibrated handoff END TO END (review catch — the guards
    # alone don't exercise the inversion path): fit isotonic on the
    # seed scores, pick a calibrated threshold whose raw inversion
    # equals the gate threshold used above, and the calibrated staged
    # stream keeps the identical set
    from drive_bc_datapipeline_spark.operators.classifier import (
        apply_isotonic_calibration,
        calibrated_threshold_to_raw,
        isotonic_calibration_table,
    )

    n_bins = 200
    seed_scored = score_hashed_linear(
        spark, seeds, w, n_buckets=64, bias=b
    ).join(seeds.select("doc_id", "label"), "doc_id")
    cal_table = isotonic_calibration_table(seed_scored, n_bins=n_bins)
    seed_cal = apply_isotonic_calibration(
        seed_scored, cal_table, n_bins=n_bins
    )
    # lowest calibrated value whose raw bin clears the gate threshold
    t_cal = min(
        r["calibrated"]
        for r in seed_cal.collect()
        if r["score"] >= mw["threshold"]
    )
    raw_t = calibrated_threshold_to_raw(cal_table, t_cal, n_bins=n_bins)
    cal_sink = str(tmp_path / "cal_sink")
    sp.start_staged_gate_stream(
        spark, src_dir, cal_sink, str(tmp_path / "cal_ck"),
        lm=lm, thresholds=m["prefilter"]["thresholds"],
        q=m["prefilter"]["q"], weights=w, bias=b,
        threshold=t_cal, cal_table=cal_table, curve_bins=n_bins,
        n_buckets=64, max_files_per_trigger=1,
    ).awaitTermination(120)
    got_cal = sorted(
        r["doc_id"]
        for r in sp.read_committed(spark, cal_sink).collect()
    )
    # same set as applying the hand-inverted raw threshold batch-side
    want_cal = sorted(
        r["doc_id"]
        for r in score_hashed_linear(
            spark, pre_kept, w, n_buckets=64, bias=b
        ).filter(F.col("score") >= raw_t).collect()
    )
    assert got_cal == want_cal and got_cal

    # both half-supply guard directions compose here too
    import pytest as _pytest

    with _pytest.raises(ValueError, match="without cal_table"):
        sp.start_staged_gate_stream(
            spark, src_dir, str(tmp_path / "s2"), str(tmp_path / "c2"),
            lm=lm, thresholds=m["prefilter"]["thresholds"],
            q=m["prefilter"]["q"], weights=w, bias=b,
            threshold=mw["threshold"], curve_bins=100, n_buckets=64,
        )
    with _pytest.raises(ValueError, match="without curve_bins"):
        sp.start_staged_gate_stream(
            spark, src_dir, str(tmp_path / "s3"), str(tmp_path / "c3"),
            lm=lm, thresholds=m["prefilter"]["thresholds"],
            q=m["prefilter"]["q"], weights=w, bias=b,
            threshold=t_cal, cal_table=cal_table, n_buckets=64,
        )


@pytest.mark.slow
def test_staged_gate_writer_replay_protocol(spark, tmp_path):
    """The J10 replay protocol through the STAGED writer (review
    catch — it had only been driven through the single-gate
    writers): replayed committed ids short-circuit, a crash window
    rewrites cleanly."""
    import os

    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick good fox") for i in range(4)],
        "doc_id long, text string",
    )
    lm = unigram_lm_table(ref)
    seeds = spark.createDataFrame(
        [(100 + i, 1, "the quick good %d" % i) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(spark, seeds, n_buckets=64, n_rounds=30)
    docs = spark.createDataFrame(
        [(i, "web", "the quick good %d" % i) for i in range(4)]
        + [(10 + i, "web", "zz junk bad %d" % i) for i in range(4)],
        sp.DOC_STREAM_SCHEMA,
    )
    sink = str(tmp_path / "rp_sink")
    write_batch = sp.staged_gate_batch_writer(
        sink, lm, {"web": 50.0}, 0.9, w, b, 0.6, n_buckets=64
    )
    write_batch(docs, 0)
    n0 = sp.read_committed(spark, sink).count()
    assert n0 > 0
    write_batch(docs, 0)  # replay: marker short-circuits
    assert sp.read_committed(spark, sink).count() == n0
    os.remove(sp.commit_marker_path(sink, 0))
    write_batch(docs, 0)  # crash window: clean rewrite
    assert sp.read_committed(spark, sink).count() == n0


def test_gate_stream_lm_order_guard(spark, tmp_path):
    """r15 ADVICE: the J12/J13 starters accept the batch manifest's
    lm_order and refuse a model/thresholds order mismatch in BOTH
    directions — thresholds fit at order 2 with no bigram table would
    silently score order-1 and diverge from the batch cut."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        bigram_lm_table,
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick good fox") for i in range(4)],
        "doc_id long, text string",
    )
    lm = unigram_lm_table(ref)
    bg = bigram_lm_table(ref)
    seeds = spark.createDataFrame(
        [(100 + i, 1, "the quick good %d" % i) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(spark, seeds, n_buckets=64, n_rounds=5)

    def j12(**kw):
        return sp.start_ccnet_gate_stream(
            spark, str(tmp_path / "s"), str(tmp_path / "o"),
            str(tmp_path / "c"), lm=lm, thresholds={"web": 50.0},
            q=0.9, **kw,
        )

    def j13(**kw):
        return sp.start_staged_gate_stream(
            spark, str(tmp_path / "s"), str(tmp_path / "o2"),
            str(tmp_path / "c2"), lm=lm, thresholds={"web": 50.0},
            q=0.9, weights=w, bias=b, threshold=0.6, n_buckets=64,
            **kw,
        )

    for start in (j12, j13):
        with pytest.raises(ValueError, match="only order-1 tables"):
            start(lm_order=2)
        with pytest.raises(ValueError, match="order-2 tables were supplied"):
            start(lm_order=1, bigram=bg)
        with pytest.raises(ValueError, match="order 1"):
            start(lm_order=7)


@pytest.mark.slow
def test_staged_gate_writer_releases_prefiltered_storage(spark, tmp_path):
    """r15 ADVICE: the staged writer's per-batch prefiltered pin is
    RELEASED after the commit — a long-running stream must not
    accumulate one pinned block set per micro-batch (the old
    localCheckpoint had no release hook). Kept rows unchanged."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "the quick good fox") for i in range(4)],
        "doc_id long, text string",
    )
    lm = unigram_lm_table(ref)
    seeds = spark.createDataFrame(
        [(100 + i, 1, "the quick good %d" % i) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(spark, seeds, n_buckets=64, n_rounds=30)
    docs = spark.createDataFrame(
        [(i, "web", "the quick good %d" % i) for i in range(4)]
        + [(10 + i, "web", "zz junk bad %d" % i) for i in range(4)],
        sp.DOC_STREAM_SCHEMA,
    )
    sink = str(tmp_path / "rel_sink")
    write_batch = sp.staged_gate_batch_writer(
        sink, lm, {"web": 50.0}, 0.9, w, b, 0.6, n_buckets=64
    )
    def pinned_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    # set-based, not a count: the ContextCleaner may unpersist OLDER
    # tests' checkpoint RDDs mid-loop, so only "no NEW survivors" is
    # a stable property
    base = pinned_ids()
    for batch_id in range(3):
        write_batch(docs, batch_id)
        # nothing pinned survives the batch: neither the kept frame
        # nor the prefiltered intermediate
        assert pinned_ids() <= base
    assert sp.read_committed(spark, sink).count() > 0


@pytest.mark.slow
def test_curation_gate_writer_n_gram_arm(spark, tmp_path):
    """r16 (Next #5): the gate writer threads n_gram to the scorer —
    on the planted token-order classes the n_gram=2 gate separates
    and keeps exactly the positive-ordered docs, matching the batch
    cut; the n_gram=1 gate cannot (identical feature vectors)."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        score_hashed_linear,
        train_hashed_linear,
    )

    pos = "alpha beta gamma delta"
    neg = "delta gamma beta alpha"
    seeds = spark.createDataFrame(
        [(i, 1, pos) for i in range(6)] + [(10 + i, 0, neg) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(
        spark, seeds, n_buckets=256, n_rounds=150, lr=2.0, n_gram=2
    )
    docs = spark.createDataFrame(
        [(100 + i, "web", pos) for i in range(4)]
        + [(200 + i, "web", neg) for i in range(4)],
        sp.DOC_STREAM_SCHEMA,
    )
    batch_kept = sorted(
        r["doc_id"]
        for r in score_hashed_linear(
            spark, docs, w, n_buckets=256, bias=b, n_gram=2
        )
        .filter(F.col("score") >= 0.5)
        .collect()
    )
    assert batch_kept == [100, 101, 102, 103]
    sink = str(tmp_path / "ng_sink")
    write_batch = sp.curation_gate_batch_writer(
        sink, w, b, 0.5, n_buckets=256, n_gram=2
    )
    write_batch(docs, 0)
    got = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert got == batch_kept


# ---------------------------------------------------------------------------
# J14 (r16) — model-rotation protocol: versioned manifests, the
# batch-boundary swap, per-row model_version audit.
# ---------------------------------------------------------------------------


def _rotation_fixtures(spark):
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )

    seeds = spark.createDataFrame(
        [(100 + i, 1, "the quick good %d" % i) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(spark, seeds, n_buckets=64, n_rounds=30)
    docs = spark.createDataFrame(
        [(i, "web", "the quick good %d" % i) for i in range(4)]
        + [(10 + i, "web", "zz junk bad %d" % i) for i in range(4)],
        sp.DOC_STREAM_SCHEMA,
    )
    return w, b, docs


@pytest.mark.slow
def test_gate_model_swap_at_batch_boundary(spark, tmp_path):
    """The r15 verdict's Done criterion: an in-flight sink picks up
    v2 at exactly one batch boundary — batches written before the
    publish carry model_version 1, batches after carry 2, committed
    rows are untouched by the swap, and each batch's kept set is its
    version's cut."""
    w, b, docs = _rotation_fixtures(spark)
    model_dir = str(tmp_path / "models")
    v1 = sp.publish_gate_model(
        model_dir, sp.classifier_gate_manifest(w, b, 0.6, n_buckets=64)
    )
    assert v1 == 1
    sink = str(tmp_path / "vsink")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, sp._classifier_kept_of_manifest()
    )
    write_batch(docs, 0)
    rows0 = sp.read_committed(spark, sink).collect()
    assert rows0 and all(r["model_version"] == 1 for r in rows0)
    kept_v1 = sorted(r["doc_id"] for r in rows0)
    assert kept_v1 == [0, 1, 2, 3]  # the good half passes at 0.6

    # v2: a threshold no document reaches — the strictest possible cut
    v2 = sp.publish_gate_model(
        model_dir,
        sp.classifier_gate_manifest(w, b, 0.999999, n_buckets=64),
    )
    assert v2 == 2
    write_batch(docs, 1)  # next batch boundary: the swap lands HERE
    rows = sp.read_committed(spark, sink).collect()
    # batch 0 rows untouched (still v1); batch 1 kept nothing at v2
    assert sorted(
        r["doc_id"] for r in rows if r["model_version"] == 1
    ) == kept_v1
    assert not [r for r in rows if r["model_version"] == 2]

    # v3 relaxes the cut: new batches keep under v3 and say so
    sp.publish_gate_model(
        model_dir, sp.classifier_gate_manifest(w, b, 0.6, n_buckets=64)
    )
    write_batch(docs, 2)
    rows = sp.read_committed(spark, sink).collect()
    assert sorted(
        r["doc_id"] for r in rows if r["model_version"] == 3
    ) == kept_v1


@pytest.mark.slow
def test_gate_model_version_resolved_once_per_batch(spark, tmp_path, monkeypatch):
    """The pointer read happens once per micro-batch (after the
    replay-marker probe — a replayed batch never reads it), and the
    kept BUILDER rebuilds once per VERSION, not per batch (the J12
    probe-once discipline survives rotation)."""
    w, b, docs = _rotation_fixtures(spark)
    model_dir = str(tmp_path / "models")
    sp.publish_gate_model(
        model_dir, sp.classifier_gate_manifest(w, b, 0.6, n_buckets=64)
    )
    reads = {"n": 0}
    real_read = sp.read_current_gate_model

    def counting_read(d):
        reads["n"] += 1
        return real_read(d)

    monkeypatch.setattr(sp, "read_current_gate_model", counting_read)
    builds = {"n": 0}
    real_builder = sp._classifier_kept_of_manifest()

    def counting_builder(manifest):
        builds["n"] += 1
        return real_builder(manifest)

    sink = str(tmp_path / "vsink2")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, counting_builder
    )
    write_batch(docs, 0)
    write_batch(docs, 1)
    assert reads["n"] == 2 and builds["n"] == 1  # 2 batches, 1 version
    write_batch(docs, 0)  # replay: marker short-circuits BEFORE the read
    assert reads["n"] == 2
    sp.publish_gate_model(
        model_dir, sp.classifier_gate_manifest(w, b, 0.7, n_buckets=64)
    )
    write_batch(docs, 2)
    assert reads["n"] == 3 and builds["n"] == 2  # rebuild per version


@pytest.mark.slow
def test_gate_model_publish_and_guards(spark, tmp_path):
    import pytest

    w, b, _docs = _rotation_fixtures(spark)
    model_dir = str(tmp_path / "models")
    # reading before any publish fails by name
    with pytest.raises(ValueError, match="publish"):
        sp.read_current_gate_model(model_dir)
    with pytest.raises(ValueError, match="publish"):
        sp.start_versioned_curation_gate_stream(
            spark, str(tmp_path / "s"), str(tmp_path / "o"),
            str(tmp_path / "c"), model_dir,
        )
    # the calibrated pair travels whole or not at all
    with pytest.raises(ValueError, match="pair"):
        sp.classifier_gate_manifest(w, b, 0.6, cal_table=[[0, 0.1]])
    # a hand-rolled manifest missing keys fails by name at build
    v = sp.publish_gate_model(model_dir, {"gate": "classifier"})
    assert v == 1
    build = sp._classifier_kept_of_manifest()
    _version, manifest = sp.read_current_gate_model(model_dir)
    with pytest.raises(ValueError, match="missing"):
        build(manifest)
    # weights round-trip through JSON string keys intact
    sp.publish_gate_model(
        model_dir, sp.classifier_gate_manifest(w, b, 0.6, n_buckets=64)
    )
    _version, m2 = sp.read_current_gate_model(model_dir)
    assert {int(k): v for k, v in m2["weights"].items()} == w


@pytest.mark.slow
def test_versioned_gate_stream_end_to_end(spark, tmp_path):
    """The real-stream plumbing: a versioned J14 stream drains a
    backlog under CURRENT and stamps every kept row."""
    w, b, docs = _rotation_fixtures(spark)
    model_dir = str(tmp_path / "models")
    sp.publish_gate_model(
        model_dir, sp.classifier_gate_manifest(w, b, 0.6, n_buckets=64)
    )
    src = str(tmp_path / "vsrc")
    docs.write.parquet(src)
    sink = str(tmp_path / "vsink3")
    sp.start_versioned_curation_gate_stream(
        spark, src, sink, str(tmp_path / "vck"), model_dir,
    ).awaitTermination(120)
    rows = sp.read_committed(spark, sink).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3]
    assert all(r["model_version"] == 1 for r in rows)
    assert all(r["score"] >= 0.6 for r in rows)  # both audit columns


@pytest.mark.slow
def test_gate_manifest_validates_n_gram_at_build(spark, tmp_path):
    """Review catch: a bad feature order in a published manifest must
    fail when the version is first RESOLVED (once), not at the first
    micro-batch's scoring plan."""
    import pytest

    w, b, _docs = _rotation_fixtures(spark)
    model_dir = str(tmp_path / "models")
    bad = sp.classifier_gate_manifest(w, b, 0.6, n_buckets=64)
    bad["n_gram"] = 3
    sp.publish_gate_model(model_dir, bad)
    build = sp._classifier_kept_of_manifest()
    _v, manifest = sp.read_current_gate_model(model_dir)
    with pytest.raises(ValueError, match="n_gram"):
        build(manifest)


def test_ccnet_gate_writer_trigram_arm(spark, tmp_path):
    """The order-3 arm (r16): the J12 writer scores under the trigram
    backoff chain when given both tables, and the kept set matches
    the batch lm_order=3 job on the planted bigram-preserving corpus
    only order 3 can cut."""
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter
    from drive_bc_datapipeline_spark.operators.lm_score import (
        bigram_lm_table,
        trigram_lm_table,
        unigram_lm_table,
    )

    good = "a a b a b b"
    bad = "a b a a b b"  # same bigram multiset, different triples
    ref = spark.createDataFrame(
        [(i, good) for i in range(8)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(10 + i, "web", bad) for i in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    m = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "tg_batch"),
        q=0.5, lm_order=3, lam=0.6,
    )
    batch_kept = sorted(
        r["doc_id"] for r in spark.read.parquet(m["path"]).collect()
    )
    assert batch_kept == [0, 1, 2]  # only order 3 separates these

    lm = unigram_lm_table(ref, alpha=m["alpha"])
    bg = bigram_lm_table(ref)
    tg = trigram_lm_table(ref)
    sink = str(tmp_path / "tg_sink")
    write_batch = sp.ccnet_gate_batch_writer(
        sink, lm, m["thresholds"], m["q"],
        bigram=bg, trigram=tg, alpha=m["alpha"], lam=m["lam"],
    )
    write_batch(docs, 0)
    assert sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    ) == batch_kept

    # order mismatch guards, both directions, through the starters
    def j12(**kw):
        return sp.start_ccnet_gate_stream(
            spark, str(tmp_path / "s"), str(tmp_path / "o"),
            str(tmp_path / "c"), lm=lm, thresholds=m["thresholds"],
            q=m["q"], **kw,
        )

    with pytest.raises(ValueError, match="only order-2"):
        j12(lm_order=3, bigram=bg)
    with pytest.raises(ValueError, match="order-3 tables were supplied"):
        j12(lm_order=2, bigram=bg, trigram=tg)
    with pytest.raises(ValueError, match="without its bigram"):
        j12(lm_order=3, trigram=tg)
    # the kept builder itself refuses a chain missing its middle
    with pytest.raises(ValueError, match="without its bigram"):
        sp.ccnet_gate_batch_writer(
            str(tmp_path / "x"), lm, m["thresholds"], m["q"], trigram=tg
        )


@pytest.mark.slow
def test_staged_gate_writer_trigram_arm(spark, tmp_path):
    """The staged (J13) writer composes the order-3 prefilter with
    the classifier gate: kept set == batch prefilter(lm_order=3) then
    batch classifier gate on the survivors."""
    from drive_bc_datapipeline_spark.operators.classifier import (
        score_hashed_linear,
        train_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        bigram_lm_table,
        trigram_lm_table,
        unigram_lm_table,
    )

    good = "a a b a b b"
    bad = "a b a a b b"
    ref = spark.createDataFrame(
        [(i, good) for i in range(8)], "doc_id long, text string"
    )
    # classifier seeds: 'c'-suffixed junk vs the reference vocabulary
    seeds = spark.createDataFrame(
        [(100 + i, 1, good) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(spark, seeds, n_buckets=64, n_rounds=30)
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(10 + i, "web", bad) for i in range(3)]
        + [(20 + i, "web", "zz junk bad %d" % i) for i in range(2)],
        sp.DOC_STREAM_SCHEMA,
    )
    lm = unigram_lm_table(ref)
    bg = bigram_lm_table(ref)
    tg = trigram_lm_table(ref)
    # batch equivalent: order-3 domain cut at q=0.5 keeps the good
    # half; classifier gate then keeps reference-vocabulary docs
    from drive_bc_datapipeline_spark.operators.domain_filter import (
        apply_domain_filter,
        collect_domain_thresholds,
        domain_threshold_table,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        score_docs_under_trigram_lm,
    )

    scored = docs.join(
        score_docs_under_trigram_lm(docs, tg, bg, lm), "doc_id"
    )
    # q=0.4: the threshold interpolates BETWEEN the good and bad
    # score plateaus (at q=0.5 it lands exactly ON the bad plateau
    # and the tie keeps them) — order 3 must visibly cut here
    rows = collect_domain_thresholds(
        domain_threshold_table(scored, (0.4,), approx=False)
    )
    pre_kept = apply_domain_filter(scored, rows, 0.4)
    cls_scored = score_hashed_linear(
        spark, pre_kept, w, n_buckets=64, bias=b
    )
    want = sorted(
        r["doc_id"]
        for r in cls_scored.filter(F.col("score") >= 0.6).collect()
    )
    assert want == [0, 1, 2]  # junk + bad died at order 3, good kept

    thresholds = {r["source"]: r["threshold"] for r in rows}
    sink = str(tmp_path / "stg_sink")
    write_batch = sp.staged_gate_batch_writer(
        sink, lm, thresholds, 0.4, w, b, 0.6,
        bigram=bg, trigram=tg, n_buckets=64,
    )
    write_batch(docs, 0)
    got = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert got == want


def test_versioned_ccnet_gate_rotation(spark, tmp_path):
    """J12 under the rotation protocol: v1 is the order-1 cut (blind
    to token order), v2 re-fits at order 3 — the in-flight writer
    swaps at the batch boundary, the order-scrambled docs start
    failing, and every row names the model that passed it."""
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter
    from drive_bc_datapipeline_spark.operators.lm_score import (
        bigram_lm_table,
        trigram_lm_table,
        unigram_lm_table,
    )

    good = "a a b a b b"
    bad = "a b a a b b"  # same unigrams AND bigrams, different triples
    ref = spark.createDataFrame(
        [(i, good) for i in range(8)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(10 + i, "web", bad) for i in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    lm = unigram_lm_table(ref)
    model_dir = str(tmp_path / "ccnet_models")

    # v1: order-1 thresholds from the batch job — order-blind, the
    # q=0.5 cut keeps everything (all docs share the unigram bag)
    m1 = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "b1"), q=0.5, lm_order=1
    )
    v1 = sp.publish_ccnet_gate_model(
        model_dir, lm=lm, thresholds=m1["thresholds"], q=m1["q"],
        alpha=m1["alpha"],
    )
    assert v1 == 1
    sink = str(tmp_path / "ccnet_vsink")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, sp._ccnet_kept_of_manifest(spark)
    )
    write_batch(docs, 0)
    rows = sp.read_committed(spark, sink).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 10, 11, 12]
    assert all(r["model_version"] == 1 for r in rows)

    # v2: the order-3 re-fit (same reference) — q=0.4 so the cut
    # lands between the good and bad score plateaus
    m3 = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "b3"), q=0.4, lm_order=3,
        lam=0.7,
    )
    v2 = sp.publish_ccnet_gate_model(
        model_dir, lm=lm, thresholds=m3["thresholds"], q=m3["q"],
        alpha=m3["alpha"], lam=m3["lam"],
        bigram=bigram_lm_table(ref), trigram=trigram_lm_table(ref),
    )
    assert v2 == 2
    write_batch(docs, 1)  # the swap lands at THIS batch boundary
    rows = sp.read_committed(spark, sink).collect()
    v2_kept = sorted(
        r["doc_id"] for r in rows if r["model_version"] == 2
    )
    assert v2_kept == [0, 1, 2]  # order 3 cut the scrambled half
    # batch-0 rows untouched by the swap
    assert sorted(
        r["doc_id"] for r in rows if r["model_version"] == 1
    ) == [0, 1, 2, 10, 11, 12]
    # the audit trail carries BOTH halves: LM scores + the version
    assert all("avg_nll" in r.asDict() for r in rows)


def test_versioned_ccnet_gate_guards_and_stream(spark, tmp_path):
    from drive_bc_datapipeline_spark.operators.lm_score import (
        trigram_lm_table,
        unigram_lm_table,
    )

    ref = spark.createDataFrame(
        [(i, "a a b a b b") for i in range(4)], "doc_id long, text string"
    )
    lm = unigram_lm_table(ref)
    model_dir = str(tmp_path / "m")
    with pytest.raises(ValueError, match="without its bigram"):
        sp.publish_ccnet_gate_model(
            model_dir, lm=lm, thresholds={"web": 9.0}, q=0.5,
            trigram=trigram_lm_table(ref),
        )
    with pytest.raises(ValueError, match="empty thresholds"):
        sp.publish_ccnet_gate_model(
            model_dir, lm=lm, thresholds={}, q=0.5
        )
    with pytest.raises(ValueError, match="publish"):
        sp.start_versioned_ccnet_gate_stream(
            spark, str(tmp_path / "s"), str(tmp_path / "o"),
            str(tmp_path / "c"), model_dir,
        )
    # a hand-rolled manifest whose order disagrees with its stored
    # tables fails through the shared order check at build
    sp.publish_ccnet_gate_model(
        model_dir, lm=lm, thresholds={"web": 9.0}, q=0.5
    )
    _v, manifest = sp.read_current_gate_model(model_dir)
    manifest["lm_order"] = 2  # claims order 2, stores order 1
    build = sp._ccnet_kept_of_manifest(spark)
    with pytest.raises(ValueError, match="only order-1 tables"):
        build(manifest)
    with pytest.raises(ValueError, match="missing"):
        build({"gate": "ccnet"})

    # end-to-end: the real stream drains under CURRENT and stamps rows
    docs = spark.createDataFrame(
        [(i, "web", "a a b a b b") for i in range(4)],
        sp.DOC_STREAM_SCHEMA,
    )
    src = str(tmp_path / "vsrc")
    docs.write.parquet(src)
    sink = str(tmp_path / "vsink")
    sp.start_versioned_ccnet_gate_stream(
        spark, src, sink, str(tmp_path / "vck"), model_dir,
    ).awaitTermination(120)
    rows = sp.read_committed(spark, sink).collect()
    assert len(rows) == 4
    assert all(r["model_version"] == 1 for r in rows)


def test_ccnet_prefilter_publishes_gate_model(spark, tmp_path):
    """The batch-fit → rotation loop in ONE call (r16):
    run_ccnet_prefilter(publish_model_dir=...) publishes its fitted
    LM + thresholds, an in-flight versioned J12 sink swaps to them,
    and the streamed cut equals the job's own cut."""
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter

    good = "a a b a b b"
    bad = "a b a a b b"
    ref = spark.createDataFrame(
        [(i, good) for i in range(8)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(10 + i, "web", bad) for i in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    model_dir = str(tmp_path / "pub_models")
    m = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "pub_batch"),
        q=0.4, lm_order=3, publish_model_dir=model_dir,
    )
    assert m["published_version"] == 1
    batch_kept = sorted(
        r["doc_id"] for r in spark.read.parquet(m["path"]).collect()
    )
    assert batch_kept == [0, 1, 2]
    _v, manifest = sp.read_current_gate_model(model_dir)
    assert manifest["lm_order"] == 3 and manifest["trigram_path"]

    sink = str(tmp_path / "pub_sink")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, sp._ccnet_kept_of_manifest(spark)
    )
    write_batch(docs, 0)
    got = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert got == batch_kept


@pytest.mark.slow
def test_versioned_staged_gate_rotation(spark, tmp_path):
    """Both halves of the staged gate rotate TOGETHER: v1 (order-1
    prefilter + lenient classifier cut) and v2 (order-3 prefilter +
    strict cut) swap at one batch boundary, with all three audit
    trails on every kept row."""
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        bigram_lm_table,
        trigram_lm_table,
        unigram_lm_table,
    )

    good = "a a b a b b"
    bad = "a b a a b b"
    ref = spark.createDataFrame(
        [(i, good) for i in range(8)], "doc_id long, text string"
    )
    seeds = spark.createDataFrame(
        [(100 + i, 1, good) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(spark, seeds, n_buckets=64, n_rounds=30)
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(10 + i, "web", bad) for i in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    lm = unigram_lm_table(ref)
    model_dir = str(tmp_path / "staged_models")

    m1 = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "sb1"), q=0.5, lm_order=1
    )
    v1 = sp.publish_staged_gate_model(
        model_dir, lm=lm, thresholds=m1["thresholds"], q=m1["q"],
        weights=w, bias=b, threshold=0.6, n_buckets=64,
    )
    assert v1 == 1
    sink = str(tmp_path / "staged_vsink")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, sp._staged_kept_of_manifest(spark)
    )
    write_batch(docs, 0)
    rows = sp.read_committed(spark, sink).collect()
    # order-1 prefilter keeps all, classifier keeps all (same vocab)
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 10, 11, 12]
    assert {"avg_nll", "score", "model_version"} <= set(
        rows[0].asDict()
    )

    m3 = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "sb3"), q=0.4, lm_order=3
    )
    v2 = sp.publish_staged_gate_model(
        model_dir, lm=lm, thresholds=m3["thresholds"], q=m3["q"],
        weights=w, bias=b, threshold=0.6, n_buckets=64,
        bigram=bigram_lm_table(ref), trigram=trigram_lm_table(ref),
    )
    assert v2 == 2
    write_batch(docs, 1)
    rows = sp.read_committed(spark, sink).collect()
    assert sorted(
        r["doc_id"] for r in rows if r["model_version"] == 2
    ) == [0, 1, 2]
    assert sorted(
        r["doc_id"] for r in rows if r["model_version"] == 1
    ) == [0, 1, 2, 10, 11, 12]

    # guards: a half-missing manifest fails by name
    build = sp._staged_kept_of_manifest(spark)
    with pytest.raises(ValueError, match="missing"):
        build({"gate": "staged", "ccnet": {}})

    # end-to-end stream plumbing under CURRENT
    src = str(tmp_path / "ssrc")
    docs.write.parquet(src)
    sink2 = str(tmp_path / "staged_vsink2")
    sp.start_versioned_staged_gate_stream(
        spark, src, sink2, str(tmp_path / "sck"), model_dir,
    ).awaitTermination(120)
    got = sp.read_committed(spark, sink2).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2]
    assert all(r["model_version"] == 2 for r in got)


@pytest.mark.slow
def test_curation_pipeline_publishes_gate_model(spark, tmp_path):
    """run_curation_pipeline(publish_model_dir=...) publishes the
    trained classifier gate: the versioned J14 stream applies exactly
    the job's cut, calibrated handoff included."""
    from drive_bc_datapipeline_spark.jobs import run_curation_pipeline

    pos = "alpha beta gamma delta"
    neg = "zz junk bad words"
    seeds = spark.createDataFrame(
        [(100 + i, 1, pos) for i in range(8)]
        + [(200 + i, 0, neg) for i in range(8)],
        "doc_id long, label int, text string",
    )
    docs = spark.createDataFrame(
        [(i, pos) for i in range(4)] + [(10 + i, neg) for i in range(4)],
        "doc_id long, text string",
    )
    target = docs.limit(3)
    model_dir = str(tmp_path / "cur_models")
    m = run_curation_pipeline(
        spark, docs, seeds, target, str(tmp_path / "cur_out"),
        k=3, n_buckets=256, n_rounds=40, lr=1.0,
        min_precision=0.9, dsir_buckets=64, n_shards=2,
        calibrate=True, publish_model_dir=model_dir,
    )
    assert m["published_version"] == 1
    assert "model" in m and m["model"]["weights"]  # in-memory only
    import json as _json

    with open(f"{tmp_path}/cur_out/curation_manifest.json") as f:
        assert "model" not in _json.load(f)  # never in the JSON

    sdocs = spark.createDataFrame(
        [(i, "web", pos) for i in range(3)]
        + [(10 + i, "web", neg) for i in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    sink = str(tmp_path / "cur_vsink")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, sp._classifier_kept_of_manifest()
    )
    write_batch(sdocs, 0)
    got = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert got == [0, 1, 2]  # the gate's own cut, through the manifest


@pytest.mark.slow
def test_staged_curation_publishes_combined_model(spark, tmp_path):
    """run_staged_curation(publish_model_dir=...) publishes BOTH gate
    halves as one version — fit-once guaranteed by the tables
    injection seam — and the versioned staged writer reproduces the
    job's filterable prefix."""
    from drive_bc_datapipeline_spark.jobs import run_staged_curation

    good = "a a b a b b"
    bad = "a b a a b b"
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(6)]
        + [(10 + i, "web", bad) for i in range(6)],
        "doc_id long, source string, text string",
    )
    ref = spark.createDataFrame(
        [(i, good) for i in range(4)], "doc_id long, text string"
    )
    seeds = spark.createDataFrame(
        [(100 + i, 1, good) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    target = docs.limit(3).select("doc_id", "text")
    model_dir = str(tmp_path / "stg_models")
    m = run_staged_curation(
        spark, docs, ref, seeds, target, str(tmp_path / "stg_out"),
        k=3, q=0.4, lm_order=3, n_buckets=256, n_rounds=30, lr=1.0,
        min_precision=0.9, dsir_buckets=64, n_shards=2,
        publish_model_dir=model_dir,
    )
    assert m["published_version"] == 1
    _v, manifest = sp.read_current_gate_model(model_dir)
    assert manifest["gate"] == "staged"
    assert manifest["ccnet"]["lm_order"] == 3
    # the prefilter kept only the reference-ordered half (order 3)
    assert m["n_kept_prefilter"] == 6

    sdocs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(10 + i, "web", bad) for i in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    sink = str(tmp_path / "stg_vsink")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, sp._staged_kept_of_manifest(spark)
    )
    write_batch(sdocs, 0)
    rows = sp.read_committed(spark, sink).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2]
    assert all(r["model_version"] == 1 for r in rows)


@pytest.mark.slow
def test_staged_gate_rules_config_published_and_applied(spark, tmp_path):
    """r17 (the r16 ADVICE divergence): a staged job run with
    rules=True publishes its stage-0 screen in the manifest, and the
    versioned staged gate APPLIES it — a rotated stream must not keep
    rule-failing docs the batch cut dropped. v1 (no rules) keeps the
    short docs; v2 (same LM + classifier, rules on) drops exactly
    them; the plain J13 writer with rules_config matches v2; kept
    rows never carry flag columns."""
    from drive_bc_datapipeline_spark.jobs import run_staged_curation
    from drive_bc_datapipeline_spark.operators.classifier import (
        train_hashed_linear,
    )
    from drive_bc_datapipeline_spark.operators.lm_score import (
        unigram_lm_table,
    )
    from drive_bc_datapipeline_spark.operators.quality_rules import (
        RULE_FLAGS,
    )

    good = "a a b a b b"
    short = "a a"  # passes LM + classifier, fails min_words=5
    cfg = dict(min_words=5, min_mean_word_len=0.0, min_required_words=0)
    ref = spark.createDataFrame(
        [(i, good) for i in range(8)], "doc_id long, text string"
    )
    seeds = spark.createDataFrame(
        [(100 + i, 1, good) for i in range(6)]
        + [(200 + i, 0, "zz junk bad %d" % i) for i in range(6)],
        "doc_id long, label int, text string",
    )
    w, b = train_hashed_linear(spark, seeds, n_buckets=64, n_rounds=30)
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(20 + i, "web", short) for i in range(2)],
        sp.DOC_STREAM_SCHEMA,
    )
    lm = unigram_lm_table(ref)
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter

    m1 = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "rb1"), q=0.9, lm_order=1
    )
    model_dir = str(tmp_path / "rules_models")
    v1 = sp.publish_staged_gate_model(
        model_dir, lm=lm, thresholds=m1["thresholds"], q=m1["q"],
        weights=w, bias=b, threshold=0.5, n_buckets=64,
    )
    assert v1 == 1
    sink = str(tmp_path / "rules_vsink")
    write_batch = sp.versioned_gate_batch_writer(
        sink, model_dir, sp._staged_kept_of_manifest(spark)
    )
    write_batch(docs, 0)
    rows = sp.read_committed(spark, sink).collect()
    # without rules the short docs pass every model gate
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 20, 21]

    v2 = sp.publish_staged_gate_model(
        model_dir, lm=lm, thresholds=m1["thresholds"], q=m1["q"],
        weights=w, bias=b, threshold=0.5, n_buckets=64,
        rules_config=cfg,
    )
    assert v2 == 2
    _v, manifest = sp.read_current_gate_model(model_dir)
    assert manifest["rules_config"] == cfg
    write_batch(docs, 1)
    rows = sp.read_committed(spark, sink).collect()
    v2_kept = sorted(
        r["doc_id"] for r in rows if r["model_version"] == 2
    )
    assert v2_kept == [0, 1, 2]  # the screen now rides the gate
    assert not set(rows[0].asDict()) & {"rules_ok", *RULE_FLAGS}

    # the plain (argument-driven) J13 writer takes the same knob
    sink2 = str(tmp_path / "rules_psink")
    sp.staged_gate_batch_writer(
        sink2, lm, m1["thresholds"], m1["q"], w, b, 0.5,
        n_buckets=64, rules_config=cfg,
    )(docs, 0)
    got = sorted(
        r["doc_id"]
        for r in sp.read_committed(spark, sink2).collect()
    )
    assert got == [0, 1, 2]

    # end-to-end: the batch staged job with rules=True publishes the
    # screen itself, and a fresh versioned sink applies it
    target = docs.limit(2).select("doc_id", "text")
    model_dir2 = str(tmp_path / "rules_models2")
    m = run_staged_curation(
        spark, docs, ref, seeds, target, str(tmp_path / "rules_out"),
        k=2, q=0.9, n_buckets=64, n_rounds=30,
        min_precision=0.5, dsir_buckets=64, n_shards=2,
        rules=True, rules_config=cfg,
        publish_model_dir=model_dir2,
    )
    assert m["published_version"] == 1
    _v, man2 = sp.read_current_gate_model(model_dir2)
    assert man2["rules_config"] == cfg
    sink3 = str(tmp_path / "rules_vsink3")
    sp.versioned_gate_batch_writer(
        sink3, model_dir2, sp._staged_kept_of_manifest(spark)
    )(docs, 0)
    got3 = sorted(
        r["doc_id"]
        for r in sp.read_committed(spark, sink3).collect()
    )
    assert 20 not in got3 and 21 not in got3


def test_ccnet_gate_order45_arms(spark, tmp_path):
    """r17: the generic chain reaches the streaming gates — a
    published order-4 model separates the trigram-preserving planted
    corpus through the versioned CCNet gate, _validate_lm_order
    covers orders 4/5 in both directions, and the chain-gap guard
    fails by name."""
    from drive_bc_datapipeline_spark.jobs import run_ccnet_prefilter
    from drive_bc_datapipeline_spark.operators.lm_score import (
        ngram_lm_table,
        unigram_lm_table,
    )

    good = "a a a b a a"
    bad = "a a b a a a"
    ref = spark.createDataFrame(
        [(i, good) for i in range(8)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, "web", good) for i in range(3)]
        + [(100 + i, "web", bad) for i in range(3)],
        sp.DOC_STREAM_SCHEMA,
    )
    ug = unigram_lm_table(ref)
    t2, t3, t4 = (ngram_lm_table(ref, k=m) for m in (2, 3, 4))

    m4 = run_ccnet_prefilter(
        spark, docs, ref, str(tmp_path / "b4"), q=0.5, lm_order=4
    )
    model_dir = str(tmp_path / "o4_models")
    v1 = sp.publish_ccnet_gate_model(
        model_dir, lm=ug, thresholds=m4["thresholds"], q=m4["q"],
        bigram=t2, trigram=t3, fourgram=t4,
    )
    assert v1 == 1
    _v, manifest = sp.read_current_gate_model(model_dir)
    assert manifest["lm_order"] == 4
    assert manifest["fourgram_path"] and manifest["fivegram_path"] is None
    sink = str(tmp_path / "o4_sink")
    sp.versioned_gate_batch_writer(
        sink, model_dir, sp._ccnet_kept_of_manifest(spark)
    )(docs, 0)
    kept = sorted(
        r["doc_id"] for r in sp.read_committed(spark, sink).collect()
    )
    assert kept == [0, 1, 2]  # order 4 separates; order 3 kept all

    # both mismatch directions at the new orders
    with pytest.raises(ValueError, match="only order-3 tables"):
        sp._validate_lm_order(4, t2, t3)
    with pytest.raises(ValueError, match="order-4 tables were supplied"):
        sp._validate_lm_order(3, t2, t3, t4)
    with pytest.raises(ValueError, match="lm_order=6"):
        sp._validate_lm_order(6, t2, t3, t4)
    sp._validate_lm_order(4, t2, t3, t4)
    # chain gaps fail by name, everywhere the tables enter
    with pytest.raises(ValueError, match="fourgram table without its"):
        sp._check_ccnet_gate_inputs({"web": 1.0}, t2, None, t4)
    with pytest.raises(ValueError, match="trigram"):
        sp.publish_ccnet_gate_model(
            str(tmp_path / "gap"), lm=ug, thresholds={"web": 1.0},
            q=0.5, bigram=t2, fourgram=t4,
        )
