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


# Morton-3D spread: 16-bit input to stride-3 positions 0,3,..,45 — the
# standard public magic-number sequence (graphics literature; valid for
# up-to-21-bit inputs, we mask to 16).
_SPREAD3_STEPS = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)

# One extra doubling step ahead of _SPREAD_STEPS spreads a 32-bit input
# to stride-2 positions 0,2,..,62 — used to compose the 4-D key from two
# 2-D keys.
_SPREAD32_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread16_3(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to stride-3 positions 0,3,..,45."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD3_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z3(a: Column, b: Column, c: Column) -> Column:
    """48-bit Z-order key interleaving three 16-bit dimensions (bit order
    within each triple, LSB first: a, b, c) — real lakehouse layouts
    cluster 3+ columns; same codegen-only shift/or/mask arithmetic as
    :func:`z2`, same DuckDB twin via :func:`z3_sql`."""
    return (
        spread16_3(a)
        .bitwiseOR(F.shiftleft(spread16_3(b), 1))
        .bitwiseOR(F.shiftleft(spread16_3(c), 2))
    )


def _spread32(col: Column) -> Column:
    x = col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD32_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z4(a: Column, b: Column, c: Column, d: Column) -> Column:
    """60-bit Z-order key interleaving four 15-BIT dimensions (the last
    bit is dropped per dimension: 16-bit inputs would push dimension
    ``d``'s top bit to position 63 — the BIGINT sign — and break key
    ordering).  Composed as interleave32(z2(a, c), z2(b, d)): z2 puts
    a_i at 2i and c_i at 2i+1; the stride-2 spread32 then maps those to
    4i and 4i+2, and the b/d word (shifted 1) fills 4i+1 / 4i+3 — bit
    order a, b, c, d within each quad."""
    am = a.cast("long").bitwiseAND(F.lit(0x7FFF))
    bm = b.cast("long").bitwiseAND(F.lit(0x7FFF))
    cm = c.cast("long").bitwiseAND(F.lit(0x7FFF))
    dm = d.cast("long").bitwiseAND(F.lit(0x7FFF))
    return _spread32(z2(am, cm)).bitwiseOR(F.shiftleft(_spread32(z2(bm, dm)), 1))


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


def spread16_3_sql(expr: str) -> str:
    """DuckDB spelling of :func:`spread16_3` — identical steps."""
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD3_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def z3_sql(a_expr: str, b_expr: str, c_expr: str) -> str:
    """DuckDB spelling of :func:`z3`."""
    return (
        f"({spread16_3_sql(a_expr)} | ({spread16_3_sql(b_expr)} << 1)"
        f" | ({spread16_3_sql(c_expr)} << 2))"
    )


def _spread32_sql(expr: str) -> str:
    x = f"(({expr}) & 4294967295)"
    for shift, mask in _SPREAD32_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def z4_sql(a_expr: str, b_expr: str, c_expr: str, d_expr: str) -> str:
    """DuckDB spelling of :func:`z4` — same pair composition, same
    15-bit masks."""
    am, bm, cm, dm = (f"(({e}) & 32767)" for e in (a_expr, b_expr, c_expr, d_expr))
    even = _spread32_sql(z2_sql(am, cm))
    odd = _spread32_sql(z2_sql(bm, dm))
    return f"({even} | ({odd} << 1))"
