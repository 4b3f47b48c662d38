#!/usr/bin/env python
"""8-trigger long-crawl soak for the threshold-compaction cadence
(VERDICT r10 item 5): drive ``_strinc_apply_batch`` — the same
screen/commit/fold/compact loop both streaming crawls run per trigger —
for EIGHT consecutive synthetic daily deliveries against a real corpus
seed, recording per-trigger wall clock, the worst-bucket fragmentation
curve of both state tables, and which folds triggered a compaction.

What the numbers must show (and SCALE.md records):
  - fragmentation climbs +1 per fold and snaps back to 1 at every
    threshold crossing (every ~4 ingests for threshold 4);
  - transient fragmentation never exceeds threshold+1;
  - per-trigger wall stays FLAT across the soak apart from the ~2
    compaction folds (which pay the O(state) rewrite the cadence
    amortizes) — i.e. crawl age does not degrade the screen.

Usage:  python tools/measure_crawl_soak.py [sf_dir]
Env:    DAYS (default 8), DOCS_PER_DAY (default 200)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebird_mapreduce_spark.operators.dedup import (  # noqa: E402
    _text_state_tables,
)
from firebird_mapreduce_spark.operators.layout import (  # noqa: E402
    bucket_fragmentation,
)
from firebird_mapreduce_spark.operators.relational import (  # noqa: E402
    warehouse_path,
)
from firebird_mapreduce_spark.session import get_session  # noqa: E402
from firebird_mapreduce_spark.streaming.jobs import (  # noqa: E402
    _strinc_apply_batch,
)

DAYS = int(os.environ.get("DAYS", "8"))
DOCS_PER_DAY = int(os.environ.get("DOCS_PER_DAY", "200"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("measure-crawl-soak")
    spark.sparkContext.setLogLevel("ERROR")
    day0_h, day0_b = _text_state_tables(spark, sf_dir, 16, 4)
    htbl, btbl = "soak_crawl_hash", "soak_crawl_bands"
    report_dir = os.path.join(warehouse_path(spark), "soak_crawl_rep")
    shutil.rmtree(report_dir, ignore_errors=True)
    for tbl, keys, base in ((htbl, ["h"], day0_h), (btbl, ["band", "sig"], day0_b)):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(
            os.path.join(warehouse_path(spark), tbl), ignore_errors=True
        )
        base.repartition(8, *keys).write.bucketBy(8, *keys).sortBy(
            *keys
        ).saveAsTable(tbl)

    out = {
        "sf_dir": sf_dir,
        "days": DAYS,
        "docs_per_day": DOCS_PER_DAY,
        "triggers": [],
    }
    prev_frag = 1
    for day in range(DAYS):
        batch = (
            spark.range(DOCS_PER_DAY)
            .select(
                (F.lit(9_000_000 + day * 10_000) + F.col("id")).alias("doc_id"),
                F.concat(
                    F.lit(f"soak day {day} doc "),
                    F.col("id").cast("string"),
                    F.lit(" " + "tok " * 30),
                ).alias("text"),
            )
        )
        t0 = time.perf_counter()
        _strinc_apply_batch(spark, batch, day, report_dir, htbl, btbl, 16, 4)
        wall = round(time.perf_counter() - t0, 3)
        frag_h = bucket_fragmentation(spark, htbl)
        out["triggers"].append(
            {
                "day": day,
                "wall_sec": wall,
                "frag_hash": frag_h,
                "frag_bands": bucket_fragmentation(spark, btbl),
                "compacted": frag_h < prev_frag,
            }
        )
        prev_frag = frag_h
    out["compactions"] = sum(t["compacted"] for t in out["triggers"])
    walls = [t["wall_sec"] for t in out["triggers"]]
    steady = [
        t["wall_sec"] for t in out["triggers"] if not t["compacted"]
    ]
    out["wall_min"] = min(walls)
    out["wall_max"] = max(walls)
    out["steady_spread"] = (
        round(max(steady) / min(steady), 3) if steady else None
    )
    print(json.dumps(out, indent=2))
    for tbl in (htbl, btbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(report_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
