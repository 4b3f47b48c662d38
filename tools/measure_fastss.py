#!/usr/bin/env python
"""Measure the FastSS k=1 vs k=2 cost curve (VERDICT r6 item 7).

Over the planted entity catalogs at $SPARK_GRAFT_SF_DIR (default sf0.1):
distinct blocking keys per name, total key rows, the blocked join's
candidate volume (Sigma |bucket|^2 before verification), true-pair
output size, and wall time — the honest FastSS trade (index size
O(N*L^k)) that SCALE.md records.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebird_mapreduce_spark.operators import dedup as D  # noqa: E402
from firebird_mapreduce_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def keyed_frame(spark, k):
    from firebird_mapreduce_spark.operators.dedup import _delete_char

    if k == 1:
        names = D.fuzzy_matching_names(spark, SF_DIR)
        keys = F.array_distinct(
            F.concat(
                F.array(F.col("name")),
                F.transform(
                    F.sequence(F.lit(1), F.length("name")),
                    lambda i: _delete_char(F.col("name"), i),
                ),
            )
        )
    else:
        names = D.fuzzy_matching_names_k2(spark, SF_DIR).filter(
            F.length("name") <= 48
        )
        L = F.length("name")
        d1 = F.transform(
            F.sequence(F.lit(1), L), lambda i: _delete_char(F.col("name"), i)
        )
        d2 = F.flatten(
            F.transform(
                F.sequence(F.lit(1), L - F.lit(1)),
                lambda p1: F.transform(
                    F.sequence(p1 + F.lit(1), L),
                    lambda p2: _delete_char(
                        _delete_char(F.col("name"), p2), p1
                    ),
                ),
            )
        )
        keys = F.array_distinct(F.concat(F.array(F.col("name")), d1, d2))
    return names.select("k", F.explode(keys).alias("bkey"))


def main():
    spark = get_session()
    out = {"sf_dir": SF_DIR}
    for k, query in ((1, D.fuzzy_match_names), (2, D.fuzzy_match_names_k2)):
        keyed = keyed_frame(spark, k)
        stats = keyed.groupBy("bkey").agg(
            F.count(F.lit(1)).alias("n")
        ).agg(
            F.sum("n").alias("key_rows"),
            F.sum(F.col("n") * F.col("n")).alias("sum_bucket_sq"),
            F.count(F.lit(1)).alias("distinct_keys"),
        ).first()
        t0 = time.perf_counter()
        query(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        n_names = keyed.select("k").distinct().count()
        pairs = query(spark, SF_DIR).count()
        out[f"k{k}"] = {
            "names": n_names,
            "key_rows": int(stats["key_rows"]),
            "keys_per_name": round(stats["key_rows"] / n_names, 1),
            "distinct_keys": int(stats["distinct_keys"]),
            "candidates_sum_bucket_sq": int(stats["sum_bucket_sq"]),
            "true_pairs": pairs,
            "wall_sec": round(wall, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
