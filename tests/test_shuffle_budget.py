"""Systemic shuffle-budget regression guard: every (pure-batch) bench
headline query's physical plan must stay within its recorded Exchange
ceiling.  Individual plan tests pin specific shapes; this table catches
the OTHER regression mode — a refactor that silently adds a shuffle to
a query nobody wrote a dedicated plan test for.  Ceilings are the
measured counts at the time of pinning (sf0.001, AQE on); a plan that
IMPROVES still passes, one that grows a shuffle fails loudly with the
plan attached."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from firebird_mapreduce_spark.plans import count_exchanges, plan_string
from tests.conftest import SF_SMOKE

# measured ceilings (see git history for the generating scan); queries
# excluded here are iterative (plan-per-round), layout-writing (one-time
# write jobs), binary-file scans, or multi-stage pipelines whose
# exchange count is pinned by their own dedicated tests
BUDGETS = {
    "numbercount_10m": 1,
    "group_sum_avg": 1,
    "group_count": 1,
    "filter_predicate": 0,
    "reduce_side_join": 1,  # broadcast at tiny SF (0); shuffle at scale
    "broadcast_join": 0,
    "semi_anti_join": 1,
    "range_join_sessionize": 1,
    "asof_purchase_prior_click": 1,
    "window_rank": 1,
    "topk_orders": 0,
    "tumbling_window_count": 1,
    "word_count": 1,
    "doc_fingerprint": 1,
    "text_quality": 0,
    "dedup_exact_hash": 1,
    "dedup_minhash_lsh": 1,
    "tpch_revenue_by_nation": 1,
    "tpch_q1_pricing": 1,
    "tpch_q3_topk": 1,  # broadcast at tiny SF; fact-fact shuffle at scale
    "tpch_q18_topk": 1,  # HAVING-filtered agg; joins broadcast the survivors
    "try_arithmetic": 1,
    # returned plan: broadcast candidate join + exact recount groupBy;
    # the MG candidate pass itself is a zero-shuffle mapInPandas job
    "heavy_hitters_tokens": 1,
    # same two-pass shape over the mixed 8-gram ∪ token stream — the
    # forced-compression case keeps the identical returned plan
    "heavy_hitters_mixed": 1,
    # first-occurrence window + reassembly groupBy; the report join
    # broadcasts at tiny SF (at scale it reuses the doc_id partitioning)
    "dedup_paragraphs": 2,
    # band-membership join + distinct + hash-membership join
    "dedup_incremental": 3,
    # one deletion-key equi-join (broadcast at tiny SF) + the pair
    # distinct (needed since r6's full-FastSS keys: an indel pair can
    # collide once per deletion of the longer that yields the shorter)
    "fuzzy_match_names": 2,
    # same shape at depth 2 (the sampled catalog broadcasts at tiny SF,
    # leaving only the pair distinct); the ~105-key explode is map-side
    "fuzzy_match_names_k2": 2,
    # three scan-reduce partial aggregates, single-row outputs — the
    # whole point: a 100 TB replication check with no shuffle at all
    "table_fingerprint": 0,
    # both snapshots hash-partitioned on the key for ONE full-outer
    # join; content hashes are map-side 32-hex projections
    "snapshot_diff": 2,
    "dedup_ngram_jaccard": 9,
    "embedding_knn": 0,
    "embedding_neardup_topk": 1,
    "inverted_index": 2,
    "pack_training_chunks": 1,
    "embedding_lsh_ann_multi": 0,
    "skew_join_events": 0,
    "skewed_rank_events": 2,
    "quality_filter_c4": 0,
    "unigram_logprob": 1,
    "tfidf_top_terms": 4,
    "zorder_key_events": 0,
    "profile_events": 6,
    # 4 → 6 with the r5 re-tier: the per-doc bigram-count collapse adds
    # plan nodes but every shuffle now carries distinct (doc, bigram)
    # pairs instead of the raw occurrence stream — A/B 4.37 → 1.06 s
    # min-of-5 at sf0.1 (see the operator docstring).  This ceiling sees
    # only the post-checkpoint plan; the corpus-side shuffle upstream of
    # the localCheckpoint is pinned by
    # test_bigram_corpus_side_stays_one_exchange below.
    "bigram_logprob": 6,
    # NOTE on decompositions: count_exchanges excludes SinglePartition
    # exchanges, and a subtree consumed twice appears twice in the
    # STATIC plan (AQE reuses it at runtime) — the counts below are
    # static hashpartitioning-exchange counts, not distinct shuffles
    "bm25_topk": 2,  # the per-doc groupBy subtree, statically duplicated
    "batch_session_window": 1,
    "funnel_conversion": 5,  # 3 stage groupBys + duplicated v/c subtrees
    "retention_cohorts": 4,  # cohort agg + activity distinct + grid count-distinct
    # the BM25 per-doc groupBy subtree (statically duplicated like
    # bm25_topk's); the dense arm, rank windows (20-row frames) and the
    # fusion join all broadcast / single-partition — excluded by policy
    "hybrid_retrieval_rrf": 2,
    # map-only quantization + integer-dot top-k: ZERO exchanges, the
    # whole query is one codegen scan + TakeOrderedAndProject
    "embedding_sq8_knn": 0,
    # r11: same two as the brute spelling (the duplicated BM25 subtree)
    # — the SQ8 candidate cut, the 40-row rerank join and the fusion
    # add NO hash exchange (bucketed code-table scan + broadcasts)
    "hybrid_retrieval_rrf_ann": 2,
    # r11: ONE exchange — the per-query top-k window on q_id over the
    # sampled probes' scored rows; fold append exchanges are delta-
    # sized and sit behind the state table, the probe side broadcasts
    "embedding_sq8_knn_incremental": 1,
}


def test_bigram_corpus_side_stays_one_exchange(spark):
    """bigram_logprob's eager localCheckpoint hides everything upstream
    of it from the main budget guard — pin the corpus-side dataflow
    (codegen shingle explode → groupBy(doc_id, bigram)) separately so a
    refactor that adds a shuffle there still fails loudly."""
    from firebird_mapreduce_spark.operators.text import _bigram_doc_counts
    from firebird_mapreduce_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    df = _bigram_doc_counts(docs)
    n = count_exchanges(df)
    assert n <= 1, f"bigram corpus side: {n} exchanges > 1\n" + plan_string(
        df, "simple"
    )


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_headline_query_stays_within_shuffle_budget(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    n = count_exchanges(df)
    assert n <= BUDGETS[name], (
        f"{name}: {n} exchanges > budget {BUDGETS[name]}\n"
        + plan_string(df, "simple")
    )
