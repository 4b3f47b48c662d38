#!/usr/bin/env python
"""Measure the row-group pruning a Z-order layout buys at sf0.1 —
the deterministic signal behind SCALE.md's layout numbers (row groups a
min/max check must touch; engine-independent, no timing noise).

Usage:  python tools/measure_zorder.py [sf_dir] [--three|--four]
(default sf0.1, 2-D; --three adds the md5 type bucket; --four adds
hour-of-day and clusters on all four 15-bit dimensions like the
declared zorder4_key_events query)
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators.layout import (
    write_zordered,
    write_zordered_nd,
)
from firebird_mapreduce_spark.session import get_session
from firebird_mapreduce_spark.sources import load_table

N_FILES = 32


def overlapping_groups(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    hit = total = 0
    for f in glob.glob(path + "/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        names = [
            meta.row_group(0).column(i).path_in_schema
            for i in range(meta.num_columns)
        ]
        j = names.index(col)
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(j).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                hit += 1
    return hit, total


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    three = "--three" in sys.argv
    four = "--four" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_session("measure-zorder")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_bucket", F.floor("value").cast("long")
    )
    if three or four:
        # md5 bucket of event_type — the third layout dimension of the
        # declared zorder3/zorder4 queries (16-bit for 3-D, masked to
        # 15 for 4-D like the z4 key itself)
        tb = F.conv(F.substring(F.md5(F.col("event_type")), 1, 4), 16, 10).cast(
            "long"
        )
        ev = ev.withColumn("type_bucket", tb if three else tb.bitwiseAND(F.lit(0x7FFF)))
    if four:
        # hour is a 5-bit domain in a 15-bit dimension: unscaled, its
        # bits all sit BELOW the other dims' file-split points and prune
        # nothing (measured); shifting it to the dimension's full width
        # (hour << 10 — the cheap stand-in for ntile(32768) domain
        # normalization) is what makes the 4th dimension real
        ev = ev.withColumn("hour_bucket", F.hour("ts").cast("long"))
        if "--scaled" in sys.argv:
            ev = ev.withColumn(
                "hour_bucket", F.shiftleft(F.col("hour_bucket"), 10)
            )
    base = tempfile.mkdtemp(prefix="zorder_measure_")
    try:
        linear = os.path.join(base, "linear")
        zordered = os.path.join(base, "zorder")
        (
            ev.repartitionByRange(N_FILES, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(linear)
        )
        if four:
            write_zordered_nd(
                ev,
                ["user_id", "value_bucket", "type_bucket", "hour_bucket"],
                zordered,
                num_files=N_FILES,
            )
            hour_hi = (5 << 10) + 1023 if "--scaled" in sys.argv else 5
            preds = [
                ("value_bucket", 256, 383),
                ("user_id", 10, 19),
                ("type_bucket", 16384, 20479),
                ("hour_bucket", 0, hour_hi),
            ]
        elif three:
            write_zordered_nd(
                ev,
                ["user_id", "value_bucket", "type_bucket"],
                zordered,
                num_files=N_FILES,
            )
            preds = [
                ("value_bucket", 64, 127),
                ("value_bucket", 256, 383),
                ("user_id", 10, 19),
                ("user_id", 64, 95),
                # one md5 bucket ~ one event_type: point-ish range
                ("type_bucket", 0, 4095),
                ("type_bucket", 32768, 36863),
            ]
        else:
            write_zordered(
                ev, "user_id", "value_bucket", zordered, num_files=N_FILES
            )
            preds = [
                ("value_bucket", 64, 127),
                ("value_bucket", 256, 383),
                ("user_id", 10, 19),
                ("user_id", 64, 95),
            ]
        out = {"sf_dir": sf_dir, "n_files": N_FILES, "rows": ev.count(),
               "dims": 4 if four else (3 if three else 2), "preds": {}}
        for col, lo, hi in preds:
            lin = overlapping_groups(linear, col, lo, hi)
            zor = overlapping_groups(zordered, col, lo, hi)
            out["preds"][f"{col}[{lo},{hi}]"] = {
                "linear_sorted_by_user_id": f"{lin[0]}/{lin[1]}",
                "zorder": f"{zor[0]}/{zor[1]}",
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
