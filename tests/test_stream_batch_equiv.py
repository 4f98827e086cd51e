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
