"""Text hashing / sketching expressions.

Everything here is built from ``md5`` + array lambdas so the identical
computation is expressible in the DuckDB oracle SQL — the sketches are
deterministic functions of the text, not of engine RNG.  (pyspark.ml's
MinHashLSH uses model-fitted random coefficients, which would make oracle
parity impossible; md5-seeded hashing gives the same LSH guarantees with
reproducibility.  Hash quality: md5's avalanche behavior over the
``seed|shingle`` concatenation is far more than enough for Jaccard
estimation.)

Scale notes: each expression is evaluated row-at-a-time inside whole-stage
codegen; nothing shuffles.  The MinHash array for k=16 costs k·|shingles|
md5 calls per document — at 100 TB you'd budget k and shingle width, not
change the algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (array<string>)."""
    return F.split(F.lower(text), " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array of space-joined strings.

    Documents with fewer than ``n`` tokens yield an empty array — guarded
    explicitly because Spark's ``sequence(1, 0)`` produces a *descending*
    [1, 0], not an empty sequence.  Equivalent DuckDB (range is
    exclusive-upper, so it empties naturally):
    ``list_transform(range(1, greatest(len(t)-(n-2), 1)),
    i -> array_to_string(t[i:i+(n-1)], ' '))``.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exploded_word_shingles(
    df, id_col: str = "doc_id", text_col: str = "text", n: int = 3
):
    """(id, shingle) rows via ``arrays_zip`` of n shifted token arrays —
    zero shuffles and fully codegen.

    ``slice``/``arrays_zip``/``explode``/``concat_ws`` are all ordinary
    expressions (NOT higher-order functions), so the whole generation stays
    inside whole-stage codegen: ~3x faster at sf0.1 than the previous
    window-lead formulation (which shuffled on ``id_col`` for the window
    sort) and ~12x over exploding a per-element ``transform`` lambda (HOFs
    run interpreted).  ``arrays_zip`` pads the shorter shifted arrays with
    NULL, so filtering on the last position emits only complete n-grams:
    documents with fewer than ``n`` tokens produce NO rows (callers that
    must retain them join back to the source).  Output proven row-identical
    to the window-lead form (tests/test_llm_ops.py).
    """
    toks = tokens(F.col(text_col))
    shifted = [toks.alias("_t0")] + [
        F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(0))).alias(f"_t{i}")
        for i in range(1, n)
    ]
    zipped = df.select(
        id_col, F.explode(F.arrays_zip(*shifted)).alias("_s")
    )
    return zipped.filter(F.col(f"_s._t{n-1}").isNotNull()).select(
        id_col,
        F.concat_ws(" ", *[F.col(f"_s._t{i}") for i in range(n)]).alias("shingle"),
    )


# NOTE on MinHash: the signature computation lives in
# ``operators.dedup.minhash_signatures`` as a relational explode -> md5
# projection -> groupBy-min pipeline rather than an array-lambda expression
# here.  Reason: md5 inside a higher-order function runs on the interpreted
# expression path (HOFs never enter whole-stage codegen) and Catalyst
# re-inlines lambda-referenced projections, which made the expression form
# 5-10x slower at sf0.1.  Lexicographic min over 8-hex slices is
# engine-portable (identical in DuckDB SQL).


_HIGH_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash16(toks: Column) -> Column:
    """A 16-bit SimHash as a BIGINT, fully portable to ANSI SQL.

    Bit i (1-based hex position i of each token's md5) is set when the
    majority of tokens have that hex digit's high bit set — i.e. each of
    the 16 hex positions contributes one signed vote dimension.  Production
    width (64/128 bit) lives in ``operators.dedup.simhash64_pandas``; this
    relational variant exists so the driver can oracle-check the operator.
    """
    bit_votes = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.when(
            F.aggregate(
                toks,
                F.lit(0),
                lambda acc, t: acc
                + F.when(
                    F.md5(t).substr(i, F.lit(1)).isin(*_HIGH_HEX),
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # bits -> integer: sum(bit_i * 2^(i-1))
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.transform(F.sequence(F.lit(0), F.lit(15)), lambda i: F.pow(F.lit(2.0), i)),
            lambda bit, weight: bit.cast("double") * weight,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ).cast("bigint")
