#!/usr/bin/env python
"""Time every declared streaming query's full 4-micro-batch replay —
wall-clock + events/sec throughput for the Structured Streaming layer,
the streaming counterpart of bench.py's batch numbers.

Each declared streaming query replays the events table through
``maxFilesPerTrigger=1`` micro-batches to an in-memory sink
(``availableNow``), so one measurement covers source scan, watermark
advance, state store traffic, and sink append for all batches.  Numbers
are min-of-RUNS (default 3; replays rebuild their state store every run,
so there is no warm-state shortcut to accidentally measure).

Usage:  python tools/measure_streaming.py [sf_dir]
Env:    RUNS (default 3)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from firebird_mapreduce_spark.session import get_session

RUNS = int(os.environ.get("RUNS", "3"))

STREAMING_QUERIES = [
    "stream_group_count",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_running_count",
    "stream_dedup",
    "stream_stream_join",
    "stream_session_custom",
    "stream_session_timeout",
    "stream_static_join",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    spark = get_session("measure-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out = {"sf_dir": sf_dir, "n_events": n_events, "runs": RUNS, "queries": {}}
    for name in STREAMING_QUERIES:
        fn = queries[name]
        times = []
        for _ in range(RUNS):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.time() - t0)
        best = min(times)
        out["queries"][name] = {
            "min": round(best, 3),
            "median": round(statistics.median(times), 3),
            "events_per_sec": int(n_events / best),
            "runs": [round(x, 3) for x in times],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
