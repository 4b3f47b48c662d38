"""Batch-stream parity tests: the same transformations over readStream
must produce the batch answers when replayed with availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators import relational as R
from firebird_mapreduce_spark.sources import load_table
from firebird_mapreduce_spark.streaming import (
    group_count_stream,
    run_stream_to_memory,
    session_window_stream,
    stream_events,
    stream_stream_join,
    streaming_dedup,
    tumbling_window_stream,
    user_running_counts_stream,
)
from tests.conftest import SF_SMOKE


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_group_count_parity(spark):
    stream = group_count_stream(stream_events(spark, SF_SMOKE))
    result = run_stream_to_memory(stream, "t_group_count")
    batch = R.group_count(spark, SF_SMOKE)
    assert _rows(result, "event_type", "cnt") == _rows(batch, "event_type", "cnt")
    # the replay must restore the nanosAsLong conf it flips (leaked state
    # would silently change later batch reads' column types)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None


def test_tumbling_window_parity(spark):
    stream = tumbling_window_stream(stream_events(spark, SF_SMOKE))
    result = run_stream_to_memory(stream, "t_tumbling")
    batch = R.tumbling_window_count(spark, SF_SMOKE)
    assert _rows(result, "hour_start", "cnt") == _rows(batch, "hour_start", "cnt")


def test_session_window_counts_all_events(spark):
    stream = session_window_stream(stream_events(spark, SF_SMOKE), gap="10 minutes")
    result = run_stream_to_memory(stream, "t_sessions")
    total_events = load_table(spark, SF_SMOKE, "events").count()
    agg = result.agg(F.sum("n_events").alias("s"), F.count(F.lit(1)).alias("n")).first()
    assert agg["s"] == total_events  # every event lands in exactly one session
    assert agg["n"] > 1  # and sessions actually split
    # sessions never overlap per user (checked driver-side: self-joining a
    # memory-sink view trips conflicting-reference resolution)
    sessions: dict[int, list[tuple]] = {}
    for r in result.collect():
        sessions.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in sessions.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2, f"overlapping sessions: {(s1, e1)} vs {(s2, _)}"


def test_streaming_dedup_one_per_key(spark):
    stream = streaming_dedup(stream_events(spark, SF_SMOKE))
    result = run_stream_to_memory(stream, "t_dedup", output_mode="append")
    batch_keys = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # all events fall inside one watermark horizon replayed as one batch,
    # so exactly one survivor per (user_id, event_type) key
    assert result.count() == batch_keys
    dupes = result.groupBy("user_id", "event_type").count().filter("count > 1").count()
    assert dupes == 0


def test_stream_stream_join_matches_batch(spark):
    stream = stream_stream_join(stream_events(spark, SF_SMOKE))
    result = run_stream_to_memory(stream, "t_ssjoin", output_mode="append")
    events = load_table(spark, SF_SMOKE, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    batch = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("purchase_id", "click_id")
    assert _rows(result, "purchase_id", "click_id") == _rows(
        batch, "purchase_id", "click_id"
    )
    assert result.count() > 0  # non-vacuous: pairs actually exist


def test_stateful_running_counts_parity(spark):
    stream = user_running_counts_stream(stream_events(spark, SF_SMOKE))
    result = run_stream_to_memory(stream, "t_running", output_mode="update")
    # with a single availableNow batch the final state equals the batch count
    final = result.groupBy("user_id").agg(F.max("total_events").alias("total"))
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("total"))
    )
    assert _rows(final, "user_id", "total") == _rows(batch, "user_id", "total")
