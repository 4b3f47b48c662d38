#!/usr/bin/env python
"""Focused re-measurement of dedup_minhash_lsh (VERDICT r2 item 1).

Runs the operator N times at sf0.1 under three variants of the signature
pinning strategy and prints per-run arrays + median/min, so the 4.07->6.26 s
bench swing can be attributed to code or to host noise.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators import dedup
from firebird_mapreduce_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))


def lsh_variant(spark, sf_dir, pin: str):
    k, bands = 16, 4
    rows = k // bands
    sigs = dedup.minhash_signatures(dedup.augmented_documents(spark, sf_dir), k)
    if pin == "lazy":
        sigs = sigs.localCheckpoint(eager=False)
    elif pin == "none":
        pass
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.array_join(
                        F.slice(F.col("mh"), band * rows + 1, rows), ","
                    ).alias("sig"),
                ),
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    a = banded.select(F.col("doc_id").alias("a_id"), "band", "sig")
    b = banded.select(F.col("doc_id").alias("b_id"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def main() -> None:
    spark = get_session("minhash-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    lsh_variant(spark, SF_DIR, "none").write.mode("overwrite").format("noop").save()
    results = {}
    for pin in ["none", "lazy"]:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            lsh_variant(spark, SF_DIR, pin).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        results[pin] = {
            "runs": samples,
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
        }
        print(json.dumps({pin: results[pin]}), flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
