"""Streaming jobs: file-source event stream, windowed aggregations, and a
custom stateful operator via ``applyInPandasWithState`` (the streaming
analogue of the reference's user-defined ``reduce``,
``/root/reference/firebird.h:249``).

Scale notes: these jobs run identically against Kafka/file sources on a
cluster; watermarks bound state (an unwatermarked windowed agg leaks state
forever), ``availableNow`` gives the batch-replay mode used in tests, and
state-heavy operators should run on RocksDB state store in production
(``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# events schema as stored (ts is nanos-int64 in the parquet; converted on
# read exactly like sources.readers.load_table does for batch)
_EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file stream — same rows the batch path sees,
    same nanos→timestamp conversion.  The ``nanosAsLong`` conf the scan
    needs at execution time is set (and restored) by
    ``run_stream_to_memory``, not here: a plan builder must not mutate
    session state it cannot restore (same discipline as
    ``sources.readers.load_table``)."""
    # the file stream source requires a *directory*; glob-filter the one
    # table out of the corpus dir instead of pointing at the file
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def group_count_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``relational.group_count`` — byte-for-byte the
    same transformation, now over an unbounded source."""
    return events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


def tumbling_window_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``relational.tumbling_window_count``; the
    watermark lets Spark drop state for windows more than 2 hours behind
    the max seen event time (late data beyond that is discarded)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("hour_start"), "cnt")
    )


def session_window_stream(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows: activity bursts per user separated by ``gap`` of
    silence — the dynamic-window shape tumbling windows can't express."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def user_running_counts_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-user event counter carried across micro-batches — arbitrary user
    state the built-in aggregations can't hold (the streaming form of the
    reference's mutable per-key reduce state, re-expressed as explicit
    managed state instead of shared memory)."""
    out_schema = "user_id bigint, total_events bigint"
    state_schema = "total bigint"

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in batches:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [total]})

    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(events: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup: drop rows whose key was already seen within
    the watermark horizon (``dropDuplicatesWithinWatermark``) — the
    streaming twin of ``relational.distinct_dedup``.  The watermark bounds
    the dedup state: at 100 TB/day of events an unbounded ``dropDuplicates``
    state grows forever; within-watermark semantics trade exactness beyond
    the horizon for bounded memory."""
    return events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        subset or ["user_id", "event_type"]
    )


def stream_stream_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: purchases joined to the same user's
    clicks from the preceding 30 minutes — the streaming form of
    ``relational.range_join_sessionize``.  Both sides carry watermarks and
    the join condition bounds event-time distance, so each side's buffered
    state is evictable; an unbounded-interval stream-stream join never
    frees state."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("purchase_id", "click_id")


_REPLAY_COUNTER = 0


def stream_group_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the streaming group-count replayed to completion —
    must equal the batch ``group_count`` exactly (same oracle SQL)."""
    global _REPLAY_COUNTER
    _REPLAY_COUNTER += 1
    return run_stream_to_memory(
        group_count_stream(stream_events(spark, sf_dir)),
        f"q_stream_group_count_{_REPLAY_COUNTER}",
    )


def stream_tumbling_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: streaming tumbling-window counts replayed to
    completion — equals batch ``tumbling_window_count``."""
    global _REPLAY_COUNTER
    _REPLAY_COUNTER += 1
    return run_stream_to_memory(
        tumbling_window_stream(stream_events(spark, sf_dir)),
        f"q_stream_tumbling_{_REPLAY_COUNTER}",
    )


def session_window_stream_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: 10-minute-gap session windows per user, replayed to
    completion.  The oracle reproduces Spark's session semantics
    relationally: a new session starts when the gap since the previous
    event of the same user is >= 10 minutes (Spark merges an event into a
    session only while its time is strictly inside [start, last+gap)), and
    ``session_end = last event + gap``."""
    global _REPLAY_COUNTER
    _REPLAY_COUNTER += 1
    return run_stream_to_memory(
        session_window_stream(stream_events(spark, sf_dir), gap="10 minutes"),
        f"q_stream_sessions_{_REPLAY_COUNTER}",
    )


def stateful_running_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the ``applyInPandasWithState`` per-user running
    counter replayed over the corpus.  availableNow reads the single
    parquet file as one micro-batch, so the emitted update per user IS the
    final state — equal to the batch per-user count (that equality is the
    oracle)."""
    global _REPLAY_COUNTER
    _REPLAY_COUNTER += 1
    result = run_stream_to_memory(
        user_running_counts_stream(stream_events(spark, sf_dir)),
        f"q_stream_running_{_REPLAY_COUNTER}",
        output_mode="update",
    )
    # defensive final-state reduction: if the source ever splits into
    # multiple micro-batches, the last (max) update per user is the total
    return result.groupBy("user_id").agg(
        F.max("total_events").alias("total_events")
    )


def stream_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: streaming within-watermark dedup replayed to
    completion, projected to the KEY COLUMNS ONLY — the representative row
    ``dropDuplicatesWithinWatermark`` keeps per key is arbitrary (first
    arrival wins, which varies with partitioning), so the deterministic,
    oracle-comparable statement is the surviving key set: exactly
    ``SELECT DISTINCT user_id, event_type`` over the corpus when the whole
    corpus fits one micro-batch."""
    global _REPLAY_COUNTER
    _REPLAY_COUNTER += 1
    deduped = streaming_dedup(stream_events(spark, sf_dir))
    return run_stream_to_memory(
        deduped.select("user_id", "event_type"),
        f"q_stream_dedup_{_REPLAY_COUNTER}",
        output_mode="append",
    )


def stream_stream_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the purchase⋈click interval join replayed to
    completion.  One availableNow micro-batch means no row is ever behind
    the watermark, so the emitted pair set equals the batch interval join —
    that equality is the oracle (micros-truncated timestamps on the DuckDB
    side, matching the nanos→micros source conversion)."""
    global _REPLAY_COUNTER
    _REPLAY_COUNTER += 1
    return run_stream_to_memory(
        stream_stream_join(stream_events(spark, sf_dir)),
        f"q_stream_ssjoin_{_REPLAY_COUNTER}",
        output_mode="append",
    )


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the available data
    (``availableNow`` trigger) into an in-memory table and return it as a
    batch DataFrame — the test/replay harness for streaming jobs.

    The ``nanosAsLong`` legacy conf the events scan needs is flipped only
    for the lifetime of the replay and then restored — microbatch scans
    consult it at execution time, which happens entirely inside
    ``start()``..``awaitTermination()``."""
    spark = df.sparkSession
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        query = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return spark.table(name)
