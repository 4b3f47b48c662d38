#!/usr/bin/env python
"""A/B the skew-safe per-key rank (`skew.skewed_rank`) against the naive
`row_number() OVER (PARTITION BY key ORDER BY ...)` window spelling on a
generated hot-key corpus — the measured form of SCALE.md's rank-skew
claim.

The window spelling puts each key in ONE task, so a hot key holding most
of the table serializes on a single core no matter how many executors
exist; `skewed_rank` range-splits the hot key across ordered partitions
and stitches ranks from broadcast span offsets, so its straggler ceiling
is rows-per-range-partition.  This probe generates N rows with HOT_FRAC
of them under one key (remaining rows uniform over 1000 cold keys),
asserts both spellings agree on a sampled id set, then interleaves
min-of-RUNS timings.

Usage:  python tools/measure_skewed_rank.py [N_ROWS ...]
Env:    RUNS (default 5), HOT_FRAC (default 0.8), PARTS (default 32)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators.skew import skewed_rank
from firebird_mapreduce_spark.session import get_session

RUNS = int(os.environ.get("RUNS", "5"))
HOT_FRAC = float(os.environ.get("HOT_FRAC", "0.8"))
PARTS = int(os.environ.get("PARTS", "32"))


def corpus(spark, n_rows: int):
    """Deterministic hot-key table: HOT_FRAC of rows under key 'hot',
    the rest hashed over 1000 cold keys; (ord, id) is a total order."""
    hot_cut = int(n_rows * HOT_FRAC)
    return spark.range(n_rows).select(
        F.col("id"),
        F.when(F.col("id") < hot_cut, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("k"), ((F.col("id") * 2654435761) % 1000))
        )
        .alias("key"),
        ((F.col("id") * 2246822519) % 1000000007).alias("ord"),
    )


def window_rank(df):
    w = Window.partitionBy("key").orderBy("ord", "id")
    return df.select("id", "key", F.row_number().over(w).alias("rnk"))


def split_rank(df):
    return skewed_rank(
        df, key_cols=["key"], order_cols=["ord", "id"], num_partitions=PARTS
    ).select("id", "key", "rnk")


def run(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_session("measure-skewed-rank")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"runs": RUNS, "hot_frac": HOT_FRAC, "sizes": {}}
    for n in sizes:
        df = corpus(spark, n).localCheckpoint(eager=True)
        # equality on a deterministic id sample (full collect would melt
        # the driver at 10M rows; the sampled ids include hot-key rows)
        sample = df.filter(F.col("id") % 97_001 == 0)
        a = {
            (r.id): (r.key, r.rnk)
            for r in window_rank(df).join(sample.select("id"), "id").collect()
        }
        b = {
            (r.id): (r.key, r.rnk)
            for r in split_rank(df).join(sample.select("id"), "id").collect()
        }
        assert a == b, f"rank mismatch at n={n}"
        assert any(v[0] == "hot" for v in a.values()), "sample missed hot key"
        times: dict[str, list[float]] = {"window": [], "split": []}
        run(window_rank(df))  # warm both paths once, untimed
        run(split_rank(df))
        for _ in range(RUNS):
            times["window"].append(run(window_rank(df)))
            times["split"].append(run(split_rank(df)))
        out["sizes"][str(n)] = {
            k: {
                "min": round(min(v), 3),
                "median": round(statistics.median(v), 3),
                "runs": [round(x, 3) for x in v],
            }
            for k, v in times.items()
        }
        df.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
