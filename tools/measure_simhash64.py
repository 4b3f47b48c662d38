#!/usr/bin/env python
"""A/B the 64-bit SimHash tiers (VERDICT r3 item 2).

Interleaved min-of-N at sf0.1 over the documents table:

  pandas  — the r3 registered kernel: per-doc, per-token Python
            hashlib.md5 loop inside mapInPandas
  codegen — explode tokens → F.md5 flat projection → 63 partial-agg
            bit-vote sums (the minhash_signatures shape, all JVM)

Equality of every signature is asserted before timing (the differential
also lives in tests/test_llm_ops.py); the registered dedup_simhash64
query runs the codegen tier as of r4.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebird_mapreduce_spark.operators import dedup as D
from firebird_mapreduce_spark.session import get_session
from firebird_mapreduce_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))


def main():
    spark = get_session()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    variants = {
        "pandas": lambda: D.simhash64_pandas(docs),
        "codegen": lambda: D.simhash64_signatures(docs),
    }
    a = {r["doc_id"]: r["simhash64"] for r in variants["pandas"]().collect()}
    b = {r["doc_id"]: r["simhash64"] for r in variants["codegen"]().collect()}
    assert a == b, "tiers diverge — DO NOT ship"
    print(f"bit-parity: {len(a)} signatures identical", flush=True)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(RUNS):
        for name, build in variants.items():  # interleaved
            t0 = time.monotonic()
            build().count()
            times[name].append(round(time.monotonic() - t0, 3))
            print(f"run {r} {name}: {times[name][-1]}", flush=True)
    out = {
        k: {"runs": v, "min": min(v), "median": statistics.median(v)}
        for k, v in times.items()
    }
    out["speedup_min"] = round(out["pandas"]["min"] / out["codegen"]["min"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
