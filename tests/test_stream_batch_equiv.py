"""Stream ≡ batch equivalence (SURVEY.md §5.3): the Structured Streaming
form of each §2.J operator must produce exactly the batch operator's
result when fed the events table as file-source micro-batches.

Uses sf0.001 (streaming jobs pay per-micro-batch overhead).
"""

from __future__ import annotations

from basis_spark.operators import incremental
from basis_spark.streaming import jobs
from tests.conftest import SF_SMALL


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark):
    stream = jobs.stream_tumbling_counts(spark, SF_SMALL)
    batch = incremental.stream_tumbling(spark, SF_SMALL)
    cols = ["ws", "event_type", "n", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_session_equals_batch(spark):
    stream = jobs.stream_session_counts(spark, SF_SMALL)
    batch = incremental.stream_session(spark, SF_SMALL)
    cols = ["user_id", "sess_start", "n_events", "dur_us"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_dedup_equals_batch(spark):
    stream = jobs.stream_dedup(spark, SF_SMALL)
    batch = incremental.stream_dedup_keys(spark, SF_SMALL)
    cols = ["event_id", "user_id", "event_type", "value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_accumulate_equals_batch(spark):
    stream = jobs.stream_accumulate(spark, SF_SMALL)
    batch = incremental.accumulate_stream(spark, SF_SMALL)
    cols = ["event_id", "user_id", "event_type", "value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_stream_join_equals_batch(spark):
    stream = jobs.stream_click_purchase_join(spark, SF_SMALL)
    batch = incremental.stream_stream_join(spark, SF_SMALL)
    cols = ["click_id", "purchase_id", "user_id", "click_ts", "purchase_ts", "purchase_value"]
    rows = _rows(stream, cols)
    assert rows == _rows(batch, cols)
    assert len(rows) > 0  # non-vacuous: fixture has in-window pairs


def test_stream_watermark_runs(spark):
    # Watermark semantics are stream-side only (no batch oracle, §2.J).
    out = jobs.stream_watermark_drop_late(spark, SF_SMALL)
    assert out.count() > 0


def test_stream_upsert_foreachbatch_equals_batch(spark):
    stream = jobs.stream_upsert_foreachbatch(spark, SF_SMALL)
    batch = incremental.stream_upsert_cdc(spark, SF_SMALL)
    cols = ["user_id", "last_type", "last_value", "n_versions"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_watermark_drops_late_chunk_under_reordering(spark):
    """Adversarial delivery order (0,3,1,2): chunk 2 (~7.5 days of
    events) arrives LAST, two batches after chunk 3 pushed the
    watermark ~8 days past it, so the 10-minute watermark must drop
    chunk 2's rows from the aggregation. Delivery (0,3,1,2) and not a
    simple swap because Spark's late-record filter applies the
    PREVIOUS batch's watermark (measured on 4.1.2: a late file
    arriving one batch after the watermark-setter is admitted,
    numRowsDroppedByWatermark=0; two batches after, dropped) — the
    late chunk must trail the setter by two batches to be dropped
    under either semantic. Pinned: every emitted window is a (<=)
    subset of the batch count, at least one window vanishes entirely,
    and the out-of-order run emits strictly fewer events than
    in-order."""
    from pyspark.sql import functions as F

    from basis_spark.io import load

    ooo = jobs.stream_watermark_drop_late(spark, SF_SMALL, delivery=(0, 3, 1, 2))
    inorder = jobs.stream_watermark_drop_late(spark, SF_SMALL)
    batch = (
        load(spark, SF_SMALL, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    b = {r["ws"]: r["n"] for r in batch.collect()}
    o = {r["ws"]: r["n"] for r in ooo.collect()}
    i = {r["ws"]: r["n"] for r in inorder.collect()}
    assert set(o) <= set(b), "stream emitted a window batch never saw"
    assert all(o[w] <= b[w] for w in o), "stream emitted MORE than batch for a window"
    assert set(i) - set(o), "no window vanished: reordering did not drop anything"
    assert sum(o.values()) < sum(i.values())
    assert len(o) > 0


def test_stream_join_reordering_tight_vs_covering_watermark(spark):
    """Same adversarial delivery for the stream-stream join. With the
    1-hour watermark (<< the ~15-day disorder) the late chunk's matches
    are dropped: strict subset of batch. With a 31-day watermark that
    COVERS the disorder, reordering must not change the result at all:
    exact batch equality. This is the watermark contract: correctness
    under reordering is bounded-disorder x covering-delay."""
    cols = ["click_id", "purchase_id", "user_id", "click_ts", "purchase_ts", "purchase_value"]
    batch = _rows(incremental.stream_stream_join(spark, SF_SMALL), cols)
    tight = _rows(
        jobs.stream_click_purchase_join(spark, SF_SMALL, delivery=(0, 3, 1, 2)), cols
    )
    covering = _rows(
        jobs.stream_click_purchase_join(
            spark, SF_SMALL, delivery=(0, 3, 1, 2), delay="31 days"
        ),
        cols,
    )
    assert covering == batch, "covering watermark must make reordering invisible"
    assert set(tight) <= set(batch)
    assert len(tight) < len(batch), "tight watermark should have dropped late matches"


def test_stream_count_min_equals_batch(spark):
    """CMS is a sum sketch: merging micro-batch increments must land on
    the identical counter table, so estimates match the batch sketch
    EXACTLY (not within tolerance)."""
    from basis_spark.operators.aggregates import sketch_count_min

    stream = jobs.stream_count_min(spark, SF_SMALL)
    batch = sketch_count_min(spark, SF_SMALL)
    cols = ["user_id", "est"]
    rows = _rows(stream, cols)
    assert rows == _rows(batch, cols)
    assert len(rows) > 0


def test_stream_session_dynamic_gap_equals_batch(spark):
    """The dynamic-gap sessionizer must merge identically whether the
    events arrive as one batch or as file-source micro-batches —
    session state carried across micro-batch boundaries included."""
    stream = jobs.stream_session_dynamic_counts(spark, SF_SMALL)
    batch = incremental.stream_session_dynamic_gap(spark, SF_SMALL)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    rows = _rows(stream, cols)
    assert rows == _rows(batch, cols)
    assert len(rows) > 0


def test_session_window_merges_at_exact_boundary(spark):
    """Pins the boundary semantics stream_session_dynamic_gap's oracle
    encodes: an event arriving at EXACTLY the running session end
    (prev ts + gap) MERGES into the session (so the oracle must split
    on ts > prev_end, strictly). If a Spark upgrade flips this, the
    oracle's CASE must flip with it — fail here, not as a gate flake."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = (
        df.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(out) == 1 and out[0]["n"] == 2


def test_stream_static_enrich_equals_batch(spark):
    stream = jobs.stream_static_enrich_counts(spark, SF_SMALL)
    batch = incremental.stream_static_enrich(spark, SF_SMALL)
    cols = ["n_name", "n", "sum_value"]
    rows = _rows(stream, cols)
    assert rows == _rows(batch, cols)
    assert len(rows) > 0


def test_stream_left_outer_join_equals_batch_to_horizon(spark):
    """Left-outer stream-stream join: matched rows identical to batch;
    unmatched (NULL) rows identical for clicks older than the
    watermark horizon (delay + join window) — younger unmatched clicks
    legitimately stay buffered on a finite stream."""
    from pyspark.sql import functions as F

    from basis_spark.io import load

    stream = jobs.stream_click_purchase_left_join(spark, SF_SMALL)
    batch = incremental.stream_join_left_outer(spark, SF_SMALL)
    cols = ["click_id", "user_id", "purchase_id", "purchase_value"]

    s_matched = _rows(stream.filter("purchase_id IS NOT NULL"), cols)
    b_matched = _rows(batch.filter("purchase_id IS NOT NULL"), cols)
    assert s_matched == b_matched and len(s_matched) > 0

    # the global watermark is the MIN across both inputs of
    # (max event ts seen - delay); outer rows need it past
    # click_ts + 30 min, so the provable-emission horizon is
    # min(max click ts, max purchase ts) - 1 h - 30 min
    ev = load(spark, SF_SMALL, "events")
    side_max = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    )
    horizon = side_max - __import__("datetime").timedelta(minutes=90)
    clicks = load(spark, SF_SMALL, "events").filter(
        (F.col("event_type") == "click") & (F.col("ts") < F.lit(horizon))
    )
    old_ids = {r.event_id for r in clicks.select("event_id").collect()}
    s_null = [
        r for r in _rows(stream.filter("purchase_id IS NULL"), cols)
        if r[0] in old_ids
    ]
    b_null = [
        r for r in _rows(batch.filter("purchase_id IS NULL"), cols)
        if r[0] in old_ids
    ]
    assert s_null == b_null and len(b_null) > 0


def test_stream_topk_equals_batch(spark):
    stream = jobs.stream_topk_counts(spark, SF_SMALL)
    batch = incremental.stream_topk_per_window(spark, SF_SMALL)
    cols = ["ws", "event_type", "n", "rnk"]
    assert _rows(stream, cols) == _rows(batch, cols)
