"""Skew-mitigation operators: salted two-stage aggregation.

At 100 TB the failure mode of ``groupBy(hot_key)`` is a handful of reducer
partitions holding most of the data (the events table's 5 event types over
32+ cores is exactly this shape: ≤5 of N reduce tasks do all the work).
Salting splits each hot key into ``salt_buckets`` sub-keys for a first
partial aggregation, then combines the partials — both stages get uniform
partitions, at the cost of one extra (tiny) shuffle.

Spark's AQE skew handling covers *join* skew automatically; aggregation
skew is mostly solved by map-side partial aggregation already, so explicit
salting matters for the cases partials can't compress: ``collect_list``/
``collect_set`` reduces, exact percentile/median per key, and grouped-map
pandas UDFs (``applyInPandas``) where one group = one task — there the salt
is the only thing standing between you and a straggler executor.

The salt must be deterministic-per-row but need not be stable across runs:
any uniform function works because it is aggregated away in stage 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def _salt(df: DataFrame, salt_buckets: int) -> Column:
    """Uniform deterministic salt from the full row content.

    The caller MUST keep at least one row-unique column in ``df``: hashing
    only the group key makes the salt constant per key and the whole
    mitigation a silent no-op (every hot key still lands in one bucket,
    and the output is identical so no correctness check catches it)."""
    return F.pmod(F.hash(*df.columns), F.lit(salt_buckets))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation for algebraic folds.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}; each is combinable so stage-2 re-folds the
    stage-1 partials (count re-folds with sum).
    """
    stage1_exprs = []
    stage2_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            stage1_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            stage2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            stage1_exprs.append(F.sum(col).alias(f"_p_{out}"))
            stage2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            stage1_exprs.append(F.min(col).alias(f"_p_{out}"))
            stage2_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            stage1_exprs.append(F.max(col).alias(f"_p_{out}"))
            stage2_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-combinable aggregate: {fn}")
    salted = df.withColumn("_salt", _salt(df, salt_buckets))
    partial = salted.groupBy(*key_cols, "_salt").agg(*stage1_exprs)
    return partial.groupBy(*key_cols).agg(*stage2_exprs)


def salted_collect_list(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe ``collect_list``: per-salt partial lists flattened in
    stage 2 — the canonical case where plain partial aggregation does NOT
    help (lists don't compress map-side) and one hot key otherwise lands
    on one task.  Order within the list is unspecified, matching the
    engine's unordered-output contract."""
    salted = df.withColumn("_salt", _salt(df, salt_buckets))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.collect_list(value_col).alias("_part")
    )
    return partial.groupBy(*key_cols).agg(
        F.flatten(F.collect_list("_part")).alias(f"{value_col}_list")
    )


def salted_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: the ``number_count`` histogram under extreme key
    skew (5 event types across all cores), computed with explicit salting.
    Result is identical to the unsalted ``group_count`` — the oracle
    checks exactly that."""
    events = load_table(spark, sf_dir, "events")
    # event_id is kept in the projection ONLY to feed the salt: hashing
    # just the group key would make _salt constant per key (each hot key
    # still in exactly one stage-1 bucket — a no-op mitigation).  With the
    # row-unique event_id in the hash, every key spreads across all
    # salt_buckets stage-1 groups; test_properties asserts the stage-1
    # group count actually exceeds the key cardinality.
    return salted_agg(
        events.select("event_type", "event_id"),
        ["event_type"],
        {"cnt": ("event_type", "count")},
        salt_buckets=16,
    )