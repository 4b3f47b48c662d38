"""The idiomatic Spark successor of the reference's ``MapReduceScheduler``.

The reference's entire API surface is: the user overrides two virtual
functions, ``map`` (multi-emit over an input chunk,
``/root/reference/firebird.h:248``, emit at ``:239-242``) and ``reduce``
(fold over one key's value list with multi-emit, ``firebird.h:249``,
driven at ``:214-226``); the scheduler chunks the input array
(``firebird.h:188-196``), groups intermediates by key (``firebird.h:84-95``,
``:202-208``) and concatenates per-thread outputs (``firebird.h:119-134``).

Spark mapping, stage by stage:

==========================  =======================================
reference stage             here
==========================  =======================================
chunked scan (A1)           DataFrame partitions (Arrow batches)
user map + emit (A2/A3)     ``mapInPandas`` — one pandas frame in,
                            0..n rows out == multi-emit flatMap
group-by-key merge (A4)     ``groupBy(*key_cols)`` shuffle
user reduce + emit (A5/A6)  ``applyInPandas`` (grouped map) — the
                            key is carried in the rows, removing the
                            reference's implicit ``keyForThreads``
                            hazard (``firebird.h:222-224``)
collect output (A7)         the returned DataFrame (unordered, same
                            contract as ``README.txt:54-58``)
==========================  =======================================

Scale notes: the reference merges all intermediates single-threaded on the
caller (``firebird.h:202-208``) and keeps every emitted value in memory with
no combiner (``firebird.h:42,59``; ``README.txt:53``).  Both bottlenecks
disappear here: the shuffle is distributed, and users who have an algebraic
fold should use plain ``groupBy().agg()`` (partial aggregation map-side) —
``map_reduce`` is the escape hatch for genuinely arbitrary per-key logic.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# A user map function: one input chunk (pandas frame) -> iterable of
# 0..n emitted records, each a dict of column -> value.  This is the
# Arrow-era analogue of `map(const InputDataT*, UINT)` + `emit_intermediate`.
MapFn = Callable[[pd.DataFrame], Iterable[dict[str, Any]]]
# A user reduce function: (key tuple, all records for that key) -> iterable
# of emitted records.  Analogue of `reduce(key, begin, end)` + `emit`.
ReduceFn = Callable[[tuple, pd.DataFrame], Iterable[dict[str, Any]]]


def map_reduce(
    df: DataFrame,
    map_fn: MapFn,
    map_schema: StructType | str,
    key_cols: list[str],
    reduce_fn: ReduceFn,
    reduce_schema: StructType | str,
) -> DataFrame:
    """Run a user-defined MapReduce job over ``df``.

    Both callables run Arrow-batched on executors; nothing touches the
    driver.  Prefer built-in ``groupBy().agg`` when the reduce is an
    algebraic fold — this function exists for the arbitrary-logic cases
    the reference's virtual-function API was built for.
    """

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in batches:
            emitted = list(map_fn(chunk))
            if emitted:
                yield pd.DataFrame.from_records(emitted)

    def _reduce(key: tuple, group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame.from_records(list(reduce_fn(key, group)))

    mapped = df.mapInPandas(_map, schema=map_schema)
    return mapped.groupBy(*key_cols).applyInPandas(_reduce, schema=reduce_schema)


def iterate_until_fixpoint(
    step_fn: Callable[[DataFrame], DataFrame],
    initial: DataFrame,
    max_iterations: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Drive an iterate-to-fixpoint computation: the Spark analogue of the
    reference's feed-output-back-as-input loop
    (``/root/reference/sample_apps/shortest_path/main.cpp:180-188``).

    ``step_fn`` maps the current working set to the next one; iteration
    stops when the working set is empty (the reference's ``num == 0`` test)
    or ``max_iterations`` is hit.  ``localCheckpoint`` truncates lineage so
    plan size and scheduler overhead stay O(1) per iteration instead of
    growing without bound — the number-one failure mode of naive iterative
    dataflow at scale.

    Returns the *last non-empty* working set.  Callers that accumulate
    state across iterations (e.g. SSSP distances) should close over their
    own state DataFrame inside ``step_fn`` and checkpoint it too.
    """
    current = initial.localCheckpoint(eager=True)
    for iteration in range(max_iterations):
        nxt = step_fn(current)
        if checkpoint_every and iteration % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return current
        current = nxt
    return current


def map_only(
    df: DataFrame,
    map_fn: MapFn,
    map_schema: StructType | str,
) -> DataFrame:
    """A map phase with no reduce — the degenerate job the reference supports
    by making ``reduce`` an identity emit.  Useful for flatMap-style record
    expansion with arbitrary Python logic."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in batches:
            emitted = list(map_fn(chunk))
            if emitted:
                yield pd.DataFrame.from_records(emitted)

    return df.mapInPandas(_map, schema=map_schema)


def mapreduce_group_count(spark, sf_dir: str) -> DataFrame:
    """Declared query: the reference's ``number_count`` program written
    against the user-defined map/reduce API (not the relational shortcut),
    proving the escape hatch end-to-end — map multi-emits ``(key, 1)``
    records from each Arrow chunk (the ``emit_intermediate`` pattern,
    ``/root/reference/firebird.h:239-242``), reduce folds one key's group
    and emits a single count row (``number_count/main.cpp:15-20``).

    ``count()`` here counts the grouped rows exactly as the reference
    counts its value list (``sum++`` per element), not a sum of values.
    """
    from .sources import load_table

    events = load_table(spark, sf_dir, "events")

    def map_fn(chunk: pd.DataFrame):
        for value in chunk["event_type"]:
            yield {"event_type": value, "one": 1}

    def reduce_fn(key: tuple, group: pd.DataFrame):
        yield {"event_type": key[0], "cnt": len(group)}

    return map_reduce(
        events.select("event_type"),
        map_fn,
        "event_type string, one int",
        ["event_type"],
        reduce_fn,
        "event_type string, cnt long",
    )


def count_by_key(df: DataFrame, *key_cols: str) -> DataFrame:
    """The reference's ``number_count`` sample as a one-liner: map emits
    ``(value, 1)`` and reduce counts the group
    (``/root/reference/sample_apps/number_count/main.cpp:8-21``).  Spark's
    ``groupBy().count()`` runs it with map-side partial aggregation — a
    strict upgrade over the reference's no-combiner design."""
    return df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("count"))


def cogroup_customer_orders(spark, sf_dir: str) -> DataFrame:
    """Co-grouped reduce over TWO sources — the generalization of the
    reference's single-source user ``reduce``
    (``/root/reference/firebird.h:249``) to the classic MapReduce
    "join in the reducer" pattern: both tables shuffle on the key and
    ONE Python function sees both key-aligned groups
    (``groupBy().cogroup().applyInPandas``).  Used here as a per-customer
    reconciliation: does the customer record exist, how many orders, and
    their exact total — full-outer semantics fall out naturally (a key
    present on either side reaches the reducer; pinned with crafted
    unmatched keys in tests/test_mapreduce.py).

    Prefer a relational join+agg when the logic is expressible (Catalyst
    optimizes it; this shape always shuffles both sides whole) — cogroup
    is the escape hatch for per-key logic a join cannot express.

    Exactness: the per-key total sums ``Decimal(repr(v))`` values —
    order-independent, so the result is stable under any row order the
    shuffle delivers; the oracle's DECIMAL(18,2) sum is the same number
    (prices are exact 2-dp).  Closure is self-contained (executors don't
    need this repo on sys.path)."""
    from .sources import load_table

    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    return (
        customer.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(make_cogroup_reconcile(), COGROUP_RECONCILE_SCHEMA)
    )


COGROUP_RECONCILE_SCHEMA = (
    "custkey long, has_customer boolean, n_orders long, total_price double"
)


def make_cogroup_reconcile():
    """The cogroup reducer, built in a factory so (a) the closure ships
    BY VALUE to executors and (b) tests exercise THIS function's
    unmatched-key branches with crafted inputs, not a private copy.
    ``repr(float(v))`` (not ``repr(v)``): pandas yields numpy scalars,
    whose NumPy-2 repr is ``np.float64(...)`` and would crash
    ``Decimal``; ``float()`` first is the numpy-version-proof spelling
    (same discipline as operators.similarity)."""

    def reconcile(key: tuple, left: pd.DataFrame, right: pd.DataFrame):
        from decimal import Decimal

        import pandas as _pd

        total = sum(
            (Decimal(repr(float(v))) for v in right["o_totalprice"]),
            Decimal(0),
        )
        return _pd.DataFrame(
            {
                "custkey": [key[0]],
                "has_customer": [len(left) > 0],
                "n_orders": [len(right)],
                "total_price": [float(total)],
            }
        )

    return reconcile
