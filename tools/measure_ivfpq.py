#!/usr/bin/env python
"""Measure IVFPQ recall vs compression (VERDICT r6 item 3).

At $SPARK_GRAFT_SF_DIR (default sf0.1): recall@10 of
``embedding_knn_ivfpq`` against the exact brute force, swept over the
ADC candidate budget C and probe width — alongside the plain multiprobe
IVF (full-precision candidates) at the same nprobe, so the table
separates what the COARSE probe loses from what the 256x code
compression loses.  Results land in SCALE.md.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import firebird_mapreduce_spark.operators.similarity as S  # noqa: E402
from firebird_mapreduce_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_session()
    exact = [r["vec_id"] for r in S.embedding_knn(spark, SF_DIR).collect()]
    out = {
        "sf_dir": SF_DIR,
        "bytes_per_vector_raw": 64 * 8,
        "bytes_per_vector_pq": S.PQ_M * 0.5,  # 16 codes x 4 bits = 8 bytes
        "exact_top10": exact,
        "sweeps": [],
    }
    for nprobe in (3, 10):
        ivf = [
            r["vec_id"]
            for r in S.embedding_knn_ivf_multiprobe(
                spark, SF_DIR, nprobe=nprobe
            ).collect()
        ]
        for cands in (10, 25, 50, 100):
            pq = [
                r["vec_id"]
                for r in S.embedding_knn_ivfpq(
                    spark, SF_DIR, nprobe=nprobe, n_candidates=cands
                ).collect()
            ]
            out["sweeps"].append(
                {
                    "nprobe": nprobe,
                    "n_candidates": cands,
                    "recall_ivf_fullprec": round(
                        len(set(ivf) & set(exact)) / len(exact), 2
                    ),
                    "recall_ivfpq": round(
                        len(set(pq) & set(exact)) / len(exact), 2
                    ),
                }
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
