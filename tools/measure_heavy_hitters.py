#!/usr/bin/env python
"""A/B the two-pass Misra-Gries heavy hitters
(`frequency.heavy_hitters_exact`) against the plain
`groupBy(key).count().where(cnt >= t)` spelling on a generated
high-cardinality corpus — the measured form of SCALE.md's
sub-linear-shuffle claim.

The plain spelling shuffles the FULL key cardinality; the two-pass form
shuffles only rows whose key survived the bounded-memory candidate pass,
so its shuffle volume tracks the number of heavy keys, not the
vocabulary.  This probe generates N rows with three planted hot keys
(45% of the mass) over a TAIL_KEYS-deep uniform tail, asserts both
spellings return the identical result set, then interleaves min-of-RUNS
timings and reports the candidate-set size vs the distinct-key count the
naive plan shuffles.

Usage:  python tools/measure_heavy_hitters.py [N_ROWS ...]
Env:    RUNS (default 5), TAIL_KEYS (default 1_000_000), PARTS (32)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import urllib.request

from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators.frequency import heavy_hitters_exact
from firebird_mapreduce_spark.session import get_session


def shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across all completed stages, from
    the local UI's REST API — the quantity that is NETWORK on a real
    cluster (local-mode shuffles are memory/disk-speed, so wall time
    understates the at-scale difference between plans)."""
    app = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)

RUNS = int(os.environ.get("RUNS", "5"))
TAIL_KEYS = int(os.environ.get("TAIL_KEYS", "1000000"))
PARTS = int(os.environ.get("PARTS", "32"))
PHI = (2, 100)  # 2% threshold -> k = 50 counters per partition


def corpus(spark, n_rows: int):
    """Planted-skew stream: ids hash-bucketed so hotA/hotB/hotC carry
    20/15/10% of rows and the rest spread over TAIL_KEYS distinct keys."""
    u = (F.col("id") * 2654435761) % 100
    return spark.range(n_rows).select(
        F.when(u < 20, F.lit("hotA"))
        .when(u < 35, F.lit("hotB"))
        .when(u < 45, F.lit("hotC"))
        .otherwise(
            F.concat(F.lit("t"), ((F.col("id") * 40503) % TAIL_KEYS))
        )
        .alias("key")
    ).repartition(PARTS)


def naive(df, total: int):
    threshold = -(-total * PHI[0] // PHI[1])
    return (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= threshold)
        .select(
            "key", "cnt", F.round(F.col("cnt") / F.lit(float(total)), 6).alias("share")
        )
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_session("measure-heavy-hitters", **{"spark.ui.enabled": "true"})
    for n in sizes:
        df = corpus(spark, n).localCheckpoint()  # freeze input, time ops only
        got = sorted(map(tuple, heavy_hitters_exact(df, "key", *PHI).collect()))
        want = sorted(map(tuple, naive(df, n).collect()))
        assert got == want, f"mismatch at n={n}"
        distinct = df.select("key").distinct().count()
        times = {"two_pass": [], "naive_groupby": []}
        bytes_ = {"two_pass": [], "naive_groupby": []}
        for _ in range(RUNS):
            b0 = shuffle_write_bytes(spark)
            t0 = time.monotonic()
            heavy_hitters_exact(df, "key", *PHI).collect()
            times["two_pass"].append(time.monotonic() - t0)
            b1 = shuffle_write_bytes(spark)
            t0 = time.monotonic()
            naive(df, n).collect()
            times["naive_groupby"].append(time.monotonic() - t0)
            b2 = shuffle_write_bytes(spark)
            bytes_["two_pass"].append(b1 - b0)
            bytes_["naive_groupby"].append(b2 - b1)
        # min across runs, same methodology as the timings: a task retry
        # (GC pause, speculation, AQE re-plan) in any single run inflates
        # that run's shuffle writes; the minimum is the clean execution
        print(
            json.dumps(
                {
                    "n_rows": n,
                    "distinct_keys": distinct,
                    "heavy_keys": len(got),
                    "two_pass_s": round(min(times["two_pass"]), 3),
                    "naive_s": round(min(times["naive_groupby"]), 3),
                    "two_pass_bytes": min(bytes_["two_pass"]),
                    "naive_bytes": min(bytes_["naive_groupby"]),
                    "byte_runs": bytes_,
                    "runs": {k: [round(v, 3) for v in vs] for k, vs in times.items()},
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
