"""Z-order (Morton) interleave keys for multi-dimensional file layout.

A single-column sort clusters parquet row-group min/max ranges for ONE
predicate dimension; a 2-D workload (e.g. ``user_id = ? AND value
BETWEEN ? AND ?``) then prunes nothing on the second dimension.
Interleaving the bits of both dimensions into one sort key makes row
groups cover axis-aligned RECTANGLES of the (a, b) space, so range
predicates on EITHER dimension overlap few groups — the classic
Z-order / space-filling-curve layout trick the big table formats
(Delta OPTIMIZE ZORDER BY, Iceberg sort orders) apply before writing.

The bit spread is the branch-free magic-number form — five
shift/or/mask steps, each a plain integer expression, so the whole key
stays inside whole-stage codegen (no UDF, no loop) and the identical
arithmetic runs on the DuckDB oracle side.  16 bits per dimension is
the layout sweet spot: 32-bit keys, and finer bits would shuffle rows
WITHIN row groups where min/max pruning cannot see them anyway.  At
100 TB the inputs are first quantile-bucketed to 16 bits
(``ntile(65536)`` over each dimension) so skewed raw domains still
spread; the synthetic corpus's domains already fit 16 bits raw.

Reference parity note: the reference engine has no storage layout
layer at all (its sources are in-memory vectors, ``firebird.h:174``);
this module exists for the 100 TB posture, not reference coverage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions 0,2,..,30.

    Magic-number Morton spread: after masking to 16 bits, each
    shift-or-mask step doubles the gap between occupied bit positions.
    Pure integer expressions on BIGINT — codegen-friendly and
    bit-identical in any engine with ``<<``/``&``/``|``.
    """
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z2(a: Column, b: Column) -> Column:
    """32-bit Z-order key interleaving two 16-bit dimensions: ``a`` takes
    the even bits, ``b`` the odd bits."""
    return spread16(a).bitwiseOR(F.shiftleft(spread16(b), 1))


def spread16_sql(expr: str) -> str:
    """The DuckDB spelling of :func:`spread16` — the same five steps, so
    the oracle recomputes the key bit-for-bit."""
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def z2_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB spelling of :func:`z2`."""
    return f"({spread16_sql(a_expr)} | ({spread16_sql(b_expr)} << 1))"
