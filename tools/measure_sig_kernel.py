#!/usr/bin/env python
"""A/B the multi-table LSH signature kernel's rounding tier (VERDICT r3 item 1).

Interleaves min-of-N runs of the full embedding_lsh_ann_multi signature
stage (mapInPandas over sf0.1 embeddings, count() to force execution)
under two rounding kernels:

  decimal  — the r3 shipped kernel: np.fromiter over a per-element
             Decimal(repr(v)).quantize(...) generator (per-value Python
             inside the Arrow batch)
  twotier  — vectorized acc >= 5e-7 compare; Decimal only for elements
             inside the |acc - 5e-7| <= 1e-12 tie window (~0 rows)

Also cross-checks that both kernels produce IDENTICAL signatures on the
full corpus before timing, so the speedup claim is conditioned on
bit-parity.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebird_mapreduce_spark.operators import similarity as S
from firebird_mapreduce_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))
N_TABLES = S.N_TABLES


def tagged(spark, sf_dir, kernel: str):
    emb = S.load_table(spark, sf_dir, "embeddings")
    weights_by_table = [
        [list(p) for p in S._srp_weights_table(t)] for t in range(N_TABLES)
    ]
    sig_schema = "vec_id bigint, " + ", ".join(
        f"sig_{t} bigint" for t in range(N_TABLES)
    )

    def add_sigs(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as _pd

        def round6_pos(v: float) -> bool:
            return (
                Decimal(repr(float(v))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                > 0
            )

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            out = {"vec_id": pdf["vec_id"]}
            for t, planes in enumerate(weights_by_table):
                sig = np.zeros(len(pdf), dtype=np.int64)
                for p, w in enumerate(planes):
                    acc = np.zeros(len(pdf), dtype=np.float64)
                    for j, wj in enumerate(w):
                        acc = acc + mat[:, j] * wj
                    if kernel == "decimal":
                        bit = np.fromiter(
                            (round6_pos(v) for v in acc), dtype=bool, count=len(acc)
                        )
                    else:
                        bit = acc >= 5e-07
                        for i in np.flatnonzero(np.abs(acc - 5e-07) <= 1e-12):
                            bit[i] = round6_pos(float(acc[i]))
                    sig |= np.where(bit, np.int64(1 << p), np.int64(0))
                out[f"sig_{t}"] = sig
            yield _pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(add_sigs, schema=sig_schema)


def micro(n_rows: int = 200_000):
    """Kernel-only microbench, no Spark: the per-element cost is invisible
    at sf0.1's 2,000 embeddings (Spark overhead dominates), so this times
    the two rounding tiers over a production-sized Arrow batch — the
    number that scales to 100 TB ingest."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    def round6_pos(v: float) -> bool:
        return (
            Decimal(repr(float(v))).quantize(Decimal("0.000001"), ROUND_HALF_UP) > 0
        )

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((n_rows, S.N_DIMS))
    weights = [
        [list(p) for p in S._srp_weights_table(t)] for t in range(N_TABLES)
    ]
    times: dict[str, list[float]] = {"decimal": [], "twotier": []}
    for r in range(max(3, RUNS // 2)):
        for kernel in ("decimal", "twotier"):
            t0 = time.monotonic()
            for planes in weights:
                sig = np.zeros(n_rows, dtype=np.int64)
                for p, w in enumerate(planes):
                    acc = np.zeros(n_rows, dtype=np.float64)
                    for j, wj in enumerate(w):
                        acc = acc + mat[:, j] * wj
                    if kernel == "decimal":
                        bit = np.fromiter(
                            (round6_pos(v) for v in acc), dtype=bool, count=n_rows
                        )
                    else:
                        bit = acc >= 5e-07
                        for i in np.flatnonzero(np.abs(acc - 5e-07) <= 1e-12):
                            bit[i] = round6_pos(float(acc[i]))
                    sig |= np.where(bit, np.int64(1 << p), np.int64(0))
            times[kernel].append(round(time.monotonic() - t0, 3))
            print(f"micro run {r} {kernel}: {times[kernel][-1]}", flush=True)
    out = {
        k: {"runs": v, "min": min(v), "rows_per_sec_at_min": int(n_rows / min(v))}
        for k, v in times.items()
    }
    out["speedup_min"] = round(out["decimal"]["min"] / out["twotier"]["min"], 2)
    out["n_rows"] = n_rows
    print(json.dumps(out))


def main():
    if "--micro" in sys.argv:
        micro()
        return
    spark = get_session()
    # bit-parity gate first: every signature identical across kernels
    a = tagged(spark, SF_DIR, "decimal").toPandas().sort_values("vec_id")
    b = tagged(spark, SF_DIR, "twotier").toPandas().sort_values("vec_id")
    assert len(a) == len(b) and a.reset_index(drop=True).equals(
        b.reset_index(drop=True)
    ), "kernel signatures diverge — DO NOT ship"
    print(f"bit-parity: {len(a)} rows x {N_TABLES} tables identical", flush=True)

    times: dict[str, list[float]] = {"decimal": [], "twotier": []}
    for r in range(RUNS):
        for kernel in ("decimal", "twotier"):  # interleaved
            t0 = time.monotonic()
            tagged(spark, SF_DIR, kernel).count()
            times[kernel].append(round(time.monotonic() - t0, 3))
            print(f"run {r} {kernel}: {times[kernel][-1]}", flush=True)
    out = {
        k: {"runs": v, "min": min(v), "median": statistics.median(v)}
        for k, v in times.items()
    }
    out["speedup_min"] = round(out["decimal"]["min"] / out["twotier"]["min"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
