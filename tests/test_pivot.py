"""Pivot/unpivot semantics the corpus never exercises: absent categories
must pivot to 0 (not NULL) to match the oracle's FILTER counts, and
unpivot must be lossless."""

from __future__ import annotations

from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators.relational import EVENT_TYPES


def test_pivot_fills_missing_categories_with_zero(spark):
    tiny = spark.createDataFrame(
        [(7, "click"), (7, "click"), (8, "view")], "user_id bigint, event_type string"
    )
    piv = (
        tiny.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, subset=list(EVENT_TYPES))
    )
    rows = {r["user_id"]: r for r in piv.collect()}
    assert rows[7]["click"] == 2 and rows[7]["view"] == 0 and rows[7]["error"] == 0
    assert rows[8]["view"] == 1 and rows[8]["click"] == 0


def test_unpivot_is_lossless(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0), (2, 30.0, 40.0)], "id int, a double, b double")
    long = df.unpivot(["id"], ["a", "b"], "metric", "value")
    assert long.count() == 4
    back = long.groupBy("id").pivot("metric", ["a", "b"]).agg(F.first("value"))
    assert sorted(map(tuple, back.collect())) == [(1, 10.0, 20.0), (2, 30.0, 40.0)]
