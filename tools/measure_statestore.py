"""A/B the streaming state-store providers (HDFS-backed heap vs RocksDB)
on the state-heavy jobs: the applyInPandasWithState sessionizer and the
dropDuplicates dedup, replayed over the sf events corpus as 4
event-time-ordered micro-batches.  Outputs one JSON line; numbers land
in SCALE.md's streaming table.

Usage: python tools/measure_statestore.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebird_mapreduce_spark.session import get_session
from firebird_mapreduce_spark.streaming.jobs import (
    ROCKSDB_PROVIDER,
    custom_session_stream,
    run_stream_to_memory,
    stream_events_multibatch,
    streaming_dedup,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("measure-statestore")
    spark.sparkContext.setLogLevel("ERROR")

    jobs = {
        "sessionizer": lambda: custom_session_stream(
            stream_events_multibatch(spark, sf_dir)
        ),
        "dedup": lambda: streaming_dedup(
            stream_events_multibatch(spark, sf_dir), horizon="45 days"
        ),
    }
    modes = {"dedup": "append", "sessionizer": "update"}
    out: dict[str, dict[str, float]] = {}
    counter = 0
    for job, mk in jobs.items():
        out[job] = {}
        for label, provider in (("hdfs", None), ("rocksdb", ROCKSDB_PROVIDER)):
            times = []
            for _ in range(repeats):
                counter += 1
                t0 = time.monotonic()
                df = run_stream_to_memory(
                    mk(),
                    f"m_ss_{job}_{label}_{counter}",
                    output_mode=modes[job],
                    state_store_provider=provider,
                )
                n = df.count()
                times.append(time.monotonic() - t0)
            out[job][label] = round(min(times), 3)
            out[job][f"{label}_rows"] = n
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats, "jobs": out}))


if __name__ == "__main__":
    main()
