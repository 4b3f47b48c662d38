#!/usr/bin/env python
"""A/B the SSSP hops-per-round knob at the reference's syn.graph scale
(VERDICT r3 item 8): 1 relaxation per scheduled round vs 2 (frontier ⋈
edges ∪ (frontier⋈edges) ⋈ edges, shared min).

The 18k-node graph is scheduler-bound — per-round data is tiny, so wall
time ≈ rounds × scheduler overhead, and advancing two BFS levels per
round should roughly halve it unless the added per-round stages eat the
win.  Fixpoint equality is asserted before timing (the small-graph
Dijkstra differential also runs hops=2 in tests/test_graph.py).
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
    a = {r["node"]: r["dist"] for r in sssp(spark, edges, 0, hops_per_round=1).collect()}
    b = {r["node"]: r["dist"] for r in sssp(spark, edges, 0, hops_per_round=2).collect()}
    assert a == b, "fixpoints diverge — DO NOT ship"
    print(f"fixpoint parity: {len(a)} reachable nodes identical", flush=True)

    times: dict[str, list[float]] = {"hops1": [], "hops2": []}
    for r in range(RUNS):
        for name, hops in (("hops1", 1), ("hops2", 2)):  # interleaved
            t0 = time.monotonic()
            sssp(spark, edges, 0, hops_per_round=hops).write.mode(
                "overwrite"
            ).format("noop").save()
            times[name].append(round(time.monotonic() - t0, 3))
            print(f"run {r} {name}: {times[name][-1]}", flush=True)
    out = {
        k: {"runs": v, "min": min(v), "median": statistics.median(v)}
        for k, v in times.items()
    }
    out["speedup_min"] = round(out["hops1"]["min"] / out["hops2"]["min"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
