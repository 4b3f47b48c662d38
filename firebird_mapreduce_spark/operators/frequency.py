"""Frequency estimation: two-pass EXACT heavy hitters over a key column.

The 100 TB problem this solves: ``groupBy(key).count().where(cnt >= t)``
shuffles the FULL key cardinality — for n-gram / URL / token keys that is
billions of distinct groups, and the shuffle (plus the reducer-side hash
tables) dwarfs the answer, which is a handful of heavy keys.  The classic
fix is the Misra-Gries summary (k counters per partition, bounded memory,
no shuffle) to find a small CANDIDATE superset, then one exact recount of
only the candidates:

  pass 1  mapInPandas: per-partition Misra-Gries with k = ceil(1/phi)
          counters -> <= k candidate keys per partition + the partition's
          exact row count.  Collected to the driver: <= (k+1) * partitions
          tiny rows, no shuffle at all.
  pass 2  broadcast the candidate set, semi-join the fact, exact
          groupBy-count of candidate rows only -> filter by the exact
          threshold ceil(phi * N).

Guarantee (why the result is EXACT, not approximate): Misra-Gries with k
counters over a partition of n_p rows retains every key whose partition
frequency exceeds n_p/(k+1).  A key with global frequency >= ceil(phi*N)
> N/(k+1) (since k+1 > 1/phi) must exceed n_p/(k+1) in at least one
partition, so it survives pass 1 somewhere; pass 2 counts candidates
exactly and the threshold filter discards false candidates.  The batchwise
compression used here (merge exact per-Arrow-batch counts, then subtract
the (k+1)-th largest count and drop non-positives) is the mergeable-
summaries formulation of Agarwal/Cormode/Huang/Phillips/Wei/Yi,
"Mergeable Summaries" (PODS 2012), which preserves the same bound.

Candidate-set membership depends on row arrival order, but the FINAL
output does not: pass 1 only ever produces a superset of the true heavy
hitters, and pass 2 is order-independent — which is what makes the
operator oracle-checkable against a plain GROUP BY ... HAVING.

Reference parity: the reference engine's only frequency surface is the
full count-by-key reduce (``/root/reference/sample_apps/number_count/
main.cpp:31-43``); this is the sub-linear-communication spelling of the
same question for cardinalities where the full reduce stops being viable.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import exploded_word_shingles
from ..sources import load_table


def _mg_partition(k: int) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Per-partition Misra-Gries summary over the first column.

    Vectorized per Arrow batch: exact ``value_counts`` in C, dict-merge
    into the running summary, then compress to <= k entries only when the
    summary overflows (subtract the (k+1)-th largest count, keep strictly
    positive).  Emits the surviving candidate keys plus one total-marker
    row (is_total=True) carrying the partition's exact row count, so the
    single pass delivers both the candidate set and N."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            n_rows += int(len(col))
            for key, c in col.value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > k:
                dec = sorted(counts.values(), reverse=True)[k]
                counts = {x: c - dec for x, c in counts.items() if c > dec}
        yield pd.DataFrame(
            {
                "key": list(counts.keys()) + [None],
                "n": [0] * len(counts) + [n_rows],
                "is_total": [False] * len(counts) + [True],
            }
        )

    return run


def heavy_hitters_exact(
    df: DataFrame, key_col: str, phi_num: int, phi_den: int
) -> DataFrame:
    """Exact keys with frequency >= ceil(N * phi_num / phi_den), two-pass.

    The threshold fraction is passed as integers so the cutoff is exact
    integer arithmetic on both engines (no float-product ceil drift).
    NULL keys are excluded (standard heavy-hitter semantics; NULL doubles
    as the total-marker in the pass-1 summary schema).

    Output: (key, cnt BIGINT, share DOUBLE rounded 6 dp).  Pass 1 runs
    zero shuffles (narrow mapInPandas + a tiny driver collect of
    <= (k+1)*partitions rows); pass 2's groupBy shuffles only rows whose
    key survived candidacy — at billion-key cardinality that is the
    difference between shuffling the corpus vocabulary and shuffling the
    answer."""
    spark = df.sparkSession
    keyed = df.select(F.col(key_col).cast("string").alias(key_col)).where(
        F.col(key_col).isNotNull()
    )
    k = -(-phi_den // phi_num)  # ceil(1/phi): k+1 > 1/phi => superset holds
    summary = keyed.mapInPandas(
        _mg_partition(k), schema="key string, n long, is_total boolean"
    ).collect()
    total = sum(r["n"] for r in summary if r["is_total"])
    candidates = sorted({r["key"] for r in summary if not r["is_total"]})
    threshold = -(-total * phi_num // phi_den)  # ceil(N * phi)
    cand_df = spark.createDataFrame(
        [(c,) for c in candidates], schema=f"{key_col} string"
    )
    exact = (
        keyed.join(F.broadcast(cand_df), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(threshold))
    )
    return exact.select(
        key_col,
        "cnt",
        F.round(F.col("cnt") / F.lit(float(total)), 6).alias("share"),
    )


def gram_token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixed-order n-gram key stream of ``heavy_hitters_mixed``:
    every word 8-gram UNION ALL every single token over the lowercased
    corpus — one column ``gram``.  The 8-gram side is the cardinality
    (≈22.6k distinct at sf0.01, max frequency 3: real passage-level
    keys, none heavy); the token side is the mass (the ~30-word
    vocabulary, each carrying ~1.7% of the combined stream).  Shared by
    the query and the compression-assertion test so the two can never
    measure different streams."""
    docs = load_table(spark, sf_dir, "documents")
    grams = exploded_word_shingles(docs, "doc_id", "text", 8).select(
        F.col("shingle").alias("gram")
    )
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("gram")
    )
    return grams.unionByName(toks)


def heavy_hitters_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over a key space that FORCES the Misra-Gries
    compression path: grams carrying >= 1% of the MIXED token ∪ 8-gram
    stream, exactly.  (Named for the mixed stream, not its output: on
    this corpus the heavy set is always tokens — the 8-grams are the
    ~23k-key cold tail whose sole job is to overflow the counters; the
    r6-era name ``heavy_hitters_8gram`` implied the opposite.)

    ``heavy_hitters_tokens``' 31-word vocabulary fits inside its 34
    counters, so its registered run never compresses (admitted in its
    docstring — the overflow path was only test-exercised).  This query
    is the missing driver-facing case: the stream's ~23k distinct keys
    dwarf the k = ceil(1/phi) = 100 counters, so EVERY partition's
    summary overflows and compresses (decrement-and-drop) many times —
    asserted as candidates ≪ distinct keys in test_frequency.py — while
    the ~30 heavy tokens still surface exactly (the MG guarantee:
    candidacy is a superset at any overflow rate; pass 2 recounts
    exactly).  Neither key class is planted: the 8-grams are the
    corpus' real passage-level keys (none above 0.013%), the tokens its
    real vocabulary.

    Scale shape: identical to ``heavy_hitters_exact`` — pass 1 zero
    shuffle with <= (k+1)·partitions driver rows regardless of
    cardinality (at a billion distinct n-grams the full groupBy this
    replaces would shuffle the corpus vocabulary), pass 2 shuffles only
    candidate-key rows.  The mixed-order stream is the one-pass corpus
    profile a curation pipeline wants anyway: hot tokens and hot
    boilerplate passages from the same scan."""
    return heavy_hitters_exact(gram_token_stream(spark, sf_dir), "gram", 1, 100)


def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens carrying >= 3% of the corpus token mass, exactly.

    Non-vacuous on this corpus at every SF: the 30 vocabulary words sit
    just above the 3% line and the rare planted 'dup' token falls below
    it.  k = ceil(100/3) = 34 counters; the corpus vocabulary (31) fits,
    so compression never fires here — the overflow path is exercised by
    the planted-Zipf differential tests in tests/test_frequency.py."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    return heavy_hitters_exact(tokens, "token", 3, 100)
