"""Tests for the commutative table fingerprint (operators/integrity.py):
order/partition invariance, tamper detection, and NULL-vs-empty-string
canonicalization — the properties that make it a replication check."""

from __future__ import annotations

from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators.integrity import (
    _canon,
    _table_fp,
    table_fingerprint,
)
from tests.conftest import SF_SMOKE


def _fp(df, cols):
    # drives the PRODUCTION aggregation helper, not a replica
    return _table_fp(df, "t", cols).collect()[0]


def test_fingerprint_is_partition_and_order_invariant(spark):
    rows = [(i, f"name-{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, v string")
    cols = [_canon(F.col("k")), _canon(F.col("v"))]
    one = _fp(df.repartition(1), cols)
    thirteen = _fp(df.repartition(13), cols)
    reversed_ = _fp(df.orderBy(F.desc("k")).repartition(13), cols)
    assert one["fingerprint"] == thirteen["fingerprint"] == reversed_["fingerprint"]
    assert one["n_rows"] == 500


def test_fingerprint_detects_single_row_tamper_at_equal_counts(spark):
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k bigint, v bigint"
    )
    # same row COUNT, one value off by one — the corruption row counts miss
    tampered = base.withColumn(
        "v", F.when(F.col("k") == 42, F.col("v") + 1).otherwise(F.col("v"))
    )
    cols = [_canon(F.col("k")), _canon(F.col("v"))]
    a, b = _fp(base, cols), _fp(tampered, cols)
    assert a["n_rows"] == b["n_rows"] == 100
    assert a["fingerprint"] != b["fingerprint"]


def test_fingerprint_detects_duplicated_plus_dropped_row(spark):
    # the multiset change XOR-folding would cancel: drop row A, duplicate
    # row B — counts equal, content different
    base = spark.createDataFrame([(i,) for i in range(10)], "k bigint")
    swapped = spark.createDataFrame(
        [(i,) for i in range(1, 10)] + [(5,)], "k bigint"
    )
    cols = [_canon(F.col("k"))]
    a, b = _fp(base, cols), _fp(swapped, cols)
    assert a["n_rows"] == b["n_rows"]
    assert a["fingerprint"] != b["fingerprint"]


def test_null_canonicalizes_differently_from_empty_string(spark):
    df_null = spark.createDataFrame([("a", None)], "x string, y string")
    df_empty = spark.createDataFrame([("a", "")], "x string, y string")
    cols = [_canon(F.col("x")), _canon(F.col("y"))]
    assert _fp(df_null, cols)["fingerprint"] != _fp(df_empty, cols)["fingerprint"]


def test_table_fingerprint_query_shape(spark):
    out = {r["table_name"]: r for r in table_fingerprint(spark, SF_SMOKE).collect()}
    assert set(out) == {"nation", "customer", "orders"}
    for row in out.values():
        assert row["n_rows"] > 0
        # exact decimal digits, no float drift, no scientific notation
        assert row["fingerprint"].isdigit()


def test_snapshot_diff_matches_independent_expectation(spark):
    """The diff's change set recomputed INDEPENDENTLY in pandas from the
    raw parquet (set arithmetic on keys, no joins, no hashing): deleted =
    keys ≡0 (mod 97); changed = surviving keys ≡0 (mod 101) — a +1.00
    reprice must always change the content hash; inserted = keys ≡0
    (mod 103) re-keyed into the negative namespace.  Also pins that
    unchanged rows never leak into the report."""
    import pandas as pd

    from firebird_mapreduce_spark.operators.integrity import snapshot_diff

    keys = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")["o_orderkey"]
    expected = {
        (int(k), "deleted") for k in keys if k % 97 == 0
    } | {
        (int(k), "changed") for k in keys if k % 97 != 0 and k % 101 == 0
    } | {
        (-(int(k) + 1), "inserted") for k in keys if k % 103 == 0
    }
    got = {
        (r["o_orderkey"], r["change_type"])
        for r in snapshot_diff(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert {t for _, t in got} == {"deleted", "changed", "inserted"}


def test_stream_fingerprint_equals_batch_scan(spark):
    """The incrementally-maintained streaming checksum must equal the
    one-shot batch scan using the SAME events_row_fingerprint — the
    cross-path consistency the replication story rests on (a divergence
    here would mean batch and streaming disagree on row identity)."""
    from pyspark.sql import functions as F

    from firebird_mapreduce_spark.operators.integrity import (
        events_row_fingerprint,
    )
    from firebird_mapreduce_spark.sources import load_table
    from firebird_mapreduce_spark.streaming.jobs import (
        stream_table_fingerprint_query,
    )

    streamed = stream_table_fingerprint_query(spark, SF_SMOKE).collect()[0]
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(events_row_fingerprint()).cast("string").alias("fp"),
        )
        .collect()[0]
    )
    assert streamed["n_rows"] == batch["n_rows"] > 0
    assert streamed["fingerprint"] == batch["fp"]
