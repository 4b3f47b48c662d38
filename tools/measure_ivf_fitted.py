#!/usr/bin/env python
"""Measure `embedding_knn_ivf_fitted`'s recall@10 vs brute-force cosine
(`embedding_knn`) and its probe cost (fraction of the corpus in the
probed cluster), alongside the stand-in-centroid `embedding_knn_ivf` —
the fitted-quantizer row for SCALE.md's similarity surface.

Runs the real Spark queries (the fit is the exact decimal schedule, so
there is nothing to re-derive in numpy) at each sf dir given.

Usage: python tools/measure_ivf_fitted.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from firebird_mapreduce_spark.operators.similarity import (  # noqa: E402
    QUERY_VEC_ID,
    _kmeans_exact_assign,
    embedding_knn,
    embedding_knn_ivf,
    embedding_knn_ivf_fitted,
    embedding_knn_ivf_multiprobe,
)
from firebird_mapreduce_spark.sources import load_table  # noqa: E402


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("measure-ivf-fitted")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    from firebird_mapreduce_spark.operators.similarity import (
        N_CENTROIDS,
    )

    for sf_dir in dirs:
        exact = [r.vec_id for r in embedding_knn(spark, sf_dir).collect()]
        n = load_table(spark, sf_dir, "embeddings").count()
        # ONE fit per sf_dir, reused by the probe accounting and the
        # nprobe sweep (the exact schedule is the tool's slowest stage)
        assign = _kmeans_exact_assign(
            load_table(spark, sf_dir, "embeddings")
        ).localCheckpoint(eager=True)
        for name, fn in (
            ("ivf_standin", embedding_knn_ivf),
            ("ivf_fitted", embedding_knn_ivf_fitted),
        ):
            got = [r.vec_id for r in fn(spark, sf_dir).collect()]
            recall = len(set(exact) & set(got)) / len(exact)
            if name == "ivf_fitted":
                qc = (
                    assign.filter(F.col("vec_id") == QUERY_VEC_ID)
                    .select("cluster")
                    .first()[0]
                )
                probe = assign.filter(F.col("cluster") == qc).count()
            else:
                probe = None
            frac = f" probe={probe}/{n} ({probe / n:.1%})" if probe else ""
            print(f"{sf_dir} {name}: recall@10={recall:.2f}{frac}")
        # nprobe sweep: recall@10 vs scan fraction for the multi-probe
        # scheduler (nprobe=1 probes the query-NEAREST centroid, which
        # can differ from ivf_fitted's own-cluster rule on boundary
        # queries — both shown so the scheduler's effect is visible)
        for nprobe in (1, 2, 3, 4):
            got_rows = embedding_knn_ivf_multiprobe(
                spark, sf_dir, nprobe=nprobe
            ).collect()
            got = [r.vec_id for r in got_rows]
            recall = len(set(exact) & set(got)) / len(exact)
            # scan fraction is ~nprobe/k by construction (each probe is
            # one of the k cells)
            print(
                f"{sf_dir} ivf_multiprobe nprobe={nprobe}: "
                f"recall@10={recall:.2f} (~{nprobe}/{N_CENTROIDS} of corpus)"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
