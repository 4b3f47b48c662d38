#!/usr/bin/env python
"""Measure SQ8 (int8 scalar quantization) recall and compression.

At $SPARK_GRAFT_SF_DIR (default sf0.1): recall@k of ``embedding_sq8_knn``
against the exact brute force for k in {1, 10}, over MULTIPLE query
vectors (not just the registered vec_id 0), plus per-query rank
displacement of the misses — the evidence for the "no-codebook 4x tier,
~1 miss in 10" claim in SCALE.md.  Queries are parameterized by swapping
which vec_id plays "0" via a view-free rebind: we re-run the same
expressions with QUERY filtered to each probe id.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# the measured path IS the registered query's core (sq8_topk shared
# verbatim — ADVICE r10: a duplicated spelling here could let the recall
# evidence drift from what embedding_sq8_knn actually serves)
from firebird_mapreduce_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    sq8_topk,
)
from firebird_mapreduce_spark.session import get_session  # noqa: E402
from firebird_mapreduce_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBES = (0, 7, 42, 123, 999)


def main():
    spark = get_session()
    emb = load_table(spark, SF_DIR, "embeddings")
    out = {
        "sf_dir": SF_DIR,
        "bytes_per_vector_raw": 64 * 8,
        "bytes_per_vector_sq8": 64 + 8,  # codes + the double scale
        "probes": [],
    }
    for qid in PROBES:
        qvec = [
            list(r["embedding"])
            for r in emb.filter(F.col("vec_id") == qid).collect()
        ]
        if not qvec:
            continue
        exact = [
            r["vec_id"]
            for r in cosine_topk(
                emb.filter(F.col("vec_id") != qid), qvec[0], 10
            ).collect()
        ]
        sq8 = [r["vec_id"] for r in sq8_topk(emb, qid, 10).collect()]
        # rank displacement of misses: where in the sq8 top-50 do the
        # missed exact-top-10 ids actually sit?
        sq8_50 = [r["vec_id"] for r in sq8_topk(emb, qid, 50).collect()]
        misses = [v for v in exact if v not in sq8]
        out["probes"].append(
            {
                "query_vec_id": qid,
                "recall_at_1": int(exact[0] == sq8[0]),
                "recall_at_10": len(set(exact) & set(sq8)),
                "miss_ranks_in_sq8": [
                    sq8_50.index(v) + 1 if v in sq8_50 else ">50"
                    for v in misses
                ],
            }
        )
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
