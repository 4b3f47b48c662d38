#!/usr/bin/env python
"""Per-iteration breakdown of sssp_syn18k (VERDICT r9 item 6): the bench's
most expensive entry costs ~10 s, and the claim has been "scheduler floor ×
~30 rounds, not data".  This tool MEASURES that split — per-round wall vs
frontier size via the sssp ``trace`` hook under ``checkpoint_every=1`` —
and A/Bs the one cadence point never swept (probe EVERY round: cadence 1,
where the eager checkpoint's lineage is shallowest) against the shipped
cadence 2 (r4 swept 2/4/6 and found less-frequent probing slower).

Fixpoint equality asserted before timing; keep-only-if->=1.5x per the
verdict's bar, record honestly either way.  Outputs one JSON blob for
SCALE.md.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebird_mapreduce_spark.operators.graph import (  # noqa: E402
    sssp,
    synthetic_edges,
    undirected,
)
from firebird_mapreduce_spark.session import get_session  # noqa: E402

RUNS = int(os.environ.get("RUNS", "5"))


def main():
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    edges = undirected(synthetic_edges(spark)).localCheckpoint(eager=True)

    # fixpoint parity across the cadences under test
    base = {
        r["node"]: r["dist"]
        for r in sssp(spark, edges, 0, checkpoint_every=2).collect()
    }
    c1 = {
        r["node"]: r["dist"]
        for r in sssp(spark, edges, 0, checkpoint_every=1).collect()
    }
    assert base == c1, "fixpoints diverge — DO NOT ship"
    print(f"fixpoint parity: {len(base)} reachable nodes identical", flush=True)

    # the per-round breakdown: cadence 1 + trace = true per-round walls
    trace: list = []
    sssp(spark, edges, 0, checkpoint_every=1, trace=trace).write.mode(
        "overwrite"
    ).format("noop").save()
    rounds = [
        {"it": it, "sec": sec, "frontier": n} for it, sec, n in trace
    ]
    tail = [r for r in rounds if r["frontier"] < 100]
    print(json.dumps({"per_round": rounds}), flush=True)
    print(
        f"rounds={len(rounds)} total={round(sum(r['sec'] for r in rounds), 2)}s "
        f"tiny-frontier(<100) rounds={len(tail)} "
        f"costing {round(sum(r['sec'] for r in tail), 2)}s",
        flush=True,
    )

    # cadence A/B, interleaved min-of-RUNS
    times: dict[int, list[float]] = {1: [], 2: []}
    for r in range(RUNS):
        for cadence in (1, 2):
            t0 = time.monotonic()
            sssp(spark, edges, 0, checkpoint_every=cadence).write.mode(
                "overwrite"
            ).format("noop").save()
            times[cadence].append(round(time.monotonic() - t0, 3))
            print(f"run {r} cadence{cadence}: {times[cadence][-1]}", flush=True)
    out = {
        f"cadence{c}": {
            "runs": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
        }
        for c, ts in times.items()
    }
    out["speedup_min_c1_over_c2"] = round(
        out["cadence2"]["min"] / out["cadence1"]["min"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
