#!/usr/bin/env python
"""A/B the SSSP convergence-probe spelling at the reference's syn.graph
scale (VERDICT r4 item 5): lazy checkpoint + `filter(improved).isEmpty()`
(the r3/r4 form) vs an `Observation` improved-count metric riding the
EAGER checkpoint's own materialization job (no separate probe action).

Both are one blocking job per probe window; the observe form additionally
guarantees the checkpoint is FULLY persisted by its job (isEmpty's
limit-1 probe can leave straggler partitions to a later recompute).
Fixpoint equality is asserted before timing; keep-only-if-faster,
min-of-RUNS interleaved.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebird_mapreduce_spark.operators.graph import (
    sssp,
    synthetic_edges,
    undirected,
)
from firebird_mapreduce_spark.session import get_session

RUNS = int(os.environ.get("RUNS", "5"))


def main():
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    edges = undirected(synthetic_edges(spark)).localCheckpoint(eager=True)
    a = {r["node"]: r["dist"] for r in sssp(spark, edges, 0, probe="isEmpty").collect()}
    b = {r["node"]: r["dist"] for r in sssp(spark, edges, 0, probe="observe").collect()}
    assert a == b, "fixpoints diverge — DO NOT ship"
    print(f"fixpoint parity: {len(a)} reachable nodes identical", flush=True)

    times: dict[str, list[float]] = {"isEmpty": [], "observe": []}
    for r in range(RUNS):
        for name in ("isEmpty", "observe"):  # interleaved
            t0 = time.monotonic()
            sssp(spark, edges, 0, probe=name).write.mode("overwrite").format(
                "noop"
            ).save()
            times[name].append(round(time.monotonic() - t0, 3))
            print(f"run {r} {name}: {times[name][-1]}", flush=True)
    out = {
        name: {
            "runs": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
        }
        for name, ts in times.items()
    }
    out["speedup_min"] = round(out["isEmpty"]["min"] / out["observe"]["min"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
