"""Misra-Gries two-pass exact heavy hitters: the superset guarantee under
forced compression, exactness vs the plain groupBy spelling, and the
corpus query's non-vacuity."""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd

from firebird_mapreduce_spark.operators.frequency import (
    _mg_partition,
    heavy_hitters_exact,
    heavy_hitters_tokens,
)

from tests.conftest import SF_SMOKE


def _zipf_rows(seed: int, n: int, hot: list[tuple[str, float]], n_tail: int):
    """Planted-skew key stream: named hot keys with fixed shares, the
    rest spread over a uniform long tail of n_tail distinct keys."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        u = rng.random()
        acc = 0.0
        key = None
        for name, share in hot:
            acc += share
            if u < acc:
                key = name
                break
        if key is None:
            key = f"tail_{rng.randrange(n_tail)}"
        rows.append(key)
    rng.shuffle(rows)
    return rows


def test_mg_partition_superset_under_forced_compression():
    # 5000 distinct tail keys vs k=10 counters: compression fires on
    # every batch, yet every key with freq > n/(k+1) must survive.
    rows = _zipf_rows(7, 20_000, [("A", 0.4), ("B", 0.2), ("C", 0.11)], 5000)
    k = 10
    batches = [
        pd.DataFrame({"key": rows[i : i + 1000]}) for i in range(0, len(rows), 1000)
    ]
    out = next(_mg_partition(k)(iter(batches)))
    total = int(out.loc[out["is_total"], "n"].iloc[0])
    assert total == len(rows)
    survivors = set(out.loc[~out["is_total"], "key"])
    assert len(survivors) <= k
    exact = Counter(rows)
    for key, cnt in exact.items():
        if cnt > total / (k + 1):
            assert key in survivors, (key, cnt)


def test_heavy_hitters_exact_matches_groupby_spelling(spark):
    rows = _zipf_rows(11, 30_000, [("A", 0.35), ("B", 0.18), ("C", 0.06)], 2000)
    df = spark.createDataFrame([(r,) for r in rows], "key string").repartition(8)
    got = {
        (r["key"], r["cnt"])
        for r in heavy_hitters_exact(df, "key", 5, 100).collect()
    }
    n = len(rows)
    threshold = -(-n * 5 // 100)
    want = {(k, c) for k, c in Counter(rows).items() if c >= threshold}
    assert got == want
    # the 6% key is above the 5% line, the tail far below: non-vacuous
    assert {k for k, _ in want} == {"A", "B", "C"}


def test_heavy_hitters_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a",)] * 8 + [(None,)] * 90 + [("b",)] * 2, "key string"
    )
    out = heavy_hitters_exact(df, "key", 1, 2).collect()
    # N counts non-null rows only (10): a has 8 >= ceil(10/2), b has 2
    assert {(r["key"], r["cnt"]) for r in out} == {("a", 8)}


def test_heavy_hitters_tokens_smoke_non_vacuous(spark):
    out = heavy_hitters_tokens(spark, SF_SMOKE).collect()
    keys = {r["token"] for r in out}
    assert len(keys) == 30  # the vocabulary passes ...
    assert "dup" not in keys  # ... the planted rare token does not


def test_heavy_hitters_mixed_compression_fires_and_stays_exact(spark):
    """The registered forced-compression case (VERDICT r5 item 7): over
    the mixed 8-gram ∪ token stream the pass-1 Misra-Gries summaries
    must COMPRESS — candidate count a small fraction of the distinct
    key count (heavy_hitters_tokens' vocabulary fits in its counters,
    so the driver row never exercised the overflow path before) — while
    the final answer still equals the exact groupBy spelling: the 30
    vocabulary tokens and not a single 8-gram (max 8-gram frequency is
    3 on this corpus)."""
    from pyspark.sql import functions as F

    from firebird_mapreduce_spark.operators.frequency import (
        gram_token_stream,
        heavy_hitters_mixed,
    )

    stream = gram_token_stream(spark, SF_SMOKE).select(
        F.col("gram").cast("string")
    )
    summary = stream.mapInPandas(
        _mg_partition(100), schema="key string, n long, is_total boolean"
    ).collect()
    candidates = {r["key"] for r in summary if not r["is_total"]}
    n_distinct = stream.distinct().count()
    assert n_distinct > 10_000, "stream cardinality collapsed — vacuous"
    assert len(candidates) < n_distinct / 50, (
        f"{len(candidates)} candidates vs {n_distinct} keys: "
        "compression never fired"
    )

    out = heavy_hitters_mixed(spark, SF_SMOKE).collect()
    threshold = -(-stream.count() // 100)  # ceil(N/100), integer-exact
    exact = {
        (r["gram"], r["cnt"])
        for r in stream.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
        if r["cnt"] >= threshold
    }
    assert {(r["gram"], r["cnt"]) for r in out} == exact
    assert len(out) > 0 and all(" " not in r["gram"] for r in out)
