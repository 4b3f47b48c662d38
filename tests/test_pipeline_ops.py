"""Semantic + plan tests for the training-data pipeline operators
(operators/pipeline.py).  The oracle hash-match lives in
test_oracle_parity.py; these assert the parts an oracle match alone can't:
that the planted positives actually exercise the match paths (non-vacuity)
and that the physical plans keep their scale shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from firebird_mapreduce_spark.operators import pipeline as P
from firebird_mapreduce_spark.plans import count_exchanges, plan_string
from tests.conftest import SF_SMOKE


def test_pii_redact_planted_positives(spark):
    rows = P.pii_redact(spark, SF_SMOKE).collect()
    by_id = {r.doc_id: r for r in rows}
    planted_email = [r for r in rows if r.doc_id % 7 == 0]
    planted_ssn = [r for r in rows if r.doc_id % 11 == 0]
    assert planted_email and planted_ssn  # non-vacuous
    for r in planted_email:
        assert r.n_email >= 1 and "[EMAIL]" in r.redacted
        assert "@example.com" not in r.redacted
    for r in planted_ssn:
        assert r.n_id >= 1 and "[ID]" in r.redacted
        assert "123-45-6789" not in r.redacted
    # docs with no planted PII are untouched
    clean = next(r for r in rows if r.doc_id % 7 and r.doc_id % 11)
    assert clean.n_email == 0 and clean.n_id == 0
    assert by_id  # sanity


def test_pii_redact_is_pure_projection(spark):
    # per-row scrub must not shuffle — embarrassingly parallel at 100 TB
    assert count_exchanges(P.pii_redact(spark, SF_SMOKE)) == 0


def test_contamination_flags_planted_docs(spark):
    hits = {r.doc_id: r.n_contaminated_ngrams
            for r in P.contamination_check(spark, SF_SMOKE).collect()}
    assert hits, "no contaminated docs found — planting failed"
    # every planted doc (doc_id % 13 == 0, excluding probe doc 0) is flagged
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    planted = [d for d in range(13, n_docs, 13)]
    for d in planted:
        assert hits.get(d, 0) >= 1, f"planted doc {d} not flagged"


def test_contamination_probe_side_is_broadcast(spark):
    plan = plan_string(P.contamination_check(spark, SF_SMOKE), "simple")
    # the benchmark n-gram set must be the broadcast side: corpus n-grams
    # never shuffle for the membership test
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_inverted_index_postings_sorted(spark):
    rows = P.inverted_index(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert r.df == len(ids) == len(set(ids))


def test_tfidf_scores_sane(spark):
    df = P.tfidf_top_terms(spark, SF_SMOKE)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs  # exactly one top term per doc
    for r in rows:
        assert r.tfidf == r.tf * n_docs / r.df
        assert 1 <= r.df <= n_docs


def test_stratified_sample_rates(spark):
    rows = {r.lang: r for r in P.stratified_sample(spark, SF_SMOKE).collect()}
    assert "en" in rows
    en = rows["en"]
    # 'en' capped at ~20%: sampled strictly fewer than total, and kept ids
    # are real members
    assert 0 < en.n_sampled < en.n_total
    assert en.min_kept is not None and en.min_kept <= en.max_kept


def test_quality_topk_rank_bounds(spark):
    rows = P.quality_topk_per_lang(spark, SF_SMOKE).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, grp in by_lang.items():
        assert 1 <= len(grp) <= 3
        scores = [r.quality_score for r in sorted(grp, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True), lang


def test_pack_training_chunks_contiguous_and_bounded(spark):
    rows = P.pack_training_chunks(spark, SF_SMOKE).collect()
    assert rows
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, grp in by_shard.items():
        chunks = sorted(r.chunk for r in grp)
        # chunk ids are contiguous from 0 (concat-then-chunk leaves no gaps)
        assert chunks == list(range(len(chunks))), shard
        for r in grp:
            assert r.n_docs >= 1
            # a chunk never holds more than context + one straddling doc
            # worth of tokens (docs are < context long in this corpus)
            assert r.chunk_tokens <= 2048 + 99
            assert r.first_doc <= r.last_doc


def test_quality_filter_c4_nonvacuous_and_map_only(spark):
    """The C4 rule gate must actually split the corpus (a filter that
    keeps or drops everything passes an oracle match vacuously) and must
    stay a pure projection — zero exchanges, the map-only 100 TB shape."""
    df = P.quality_filter_c4(spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    rows = df.collect()
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped, "filter is vacuous on this corpus"
    # each rule is individually responsible for at least one drop or the
    # threshold is dead weight
    assert any(r.n_words < 30 for r in dropped)
    assert any(r.stop_ratio < 0.03 for r in dropped)
    for r in rows:
        assert r.keep == (
            r.n_words >= 30
            and r.mean_word_len <= 5.0
            and r.stop_ratio >= 0.03
        )


def test_lang_mix_downsample_rebalances_toward_uniform(spark):
    """Computed rates must actually rebalance: the smallest language is
    kept whole (rate 1 ⇒ cut = 2^32 > any 8-hex-digit hash), and every
    language's kept count lands near the smallest language's total
    (binomial noise around n_target, not the original skew)."""
    rows = P.lang_mix_downsample(spark, SF_SMOKE).collect()
    n_min = min(r.n_total for r in rows)
    smallest = next(r for r in rows if r.n_total == n_min)
    assert smallest.n_kept == smallest.n_total, "min language was sampled"
    skew_before = max(r.n_total for r in rows) / n_min
    assert skew_before > 1.5, "corpus not skewed; test is vacuous"
    for r in rows:
        # 4-sigma binomial tolerance around the uniform target
        sigma = (n_min * (1 - n_min / r.n_total)) ** 0.5
        assert abs(r.n_kept - n_min) <= 4 * sigma + 1, (
            r.lang, r.n_kept, n_min
        )


def test_observe_metrics_account_without_second_pass(spark):
    """Pipeline accounting via ``observe()``: keep/drop counters ride the
    SAME job that materializes the filter output — at 100 TB a separate
    count() would re-scan the corpus just for bookkeeping.  The observed
    metrics must equal the independently computed answers."""
    from pyspark.sql import Observation

    from firebird_mapreduce_spark.operators.pipeline import quality_filter_c4
    from tests.conftest import SF_SMOKE

    gated = quality_filter_c4(spark, SF_SMOKE)
    obs = Observation("c4_accounting")
    observed = gated.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )
    kept_rows = observed.filter("keep").count()  # the one real job
    metrics = obs.get
    assert metrics["n_kept"] == kept_rows
    assert metrics["n_total"] == gated.count()
    assert 0 < metrics["n_kept"] < metrics["n_total"]


def test_curation_pipeline_funnel_drops_at_every_stage(spark):
    """The composed pipeline is only meaningful if each stage does real
    work: quality drops some rows, dedup exactly halves the kept set
    (every doc has one planted exact copy, and quality flags are
    identical for copies since features depend only on text), and the
    mix downsampling cuts the non-minimum languages."""
    from firebird_mapreduce_spark.operators.pipeline import curation_pipeline
    from tests.conftest import SF_SMOKE

    rows = {r.lang: r for r in curation_pipeline(spark, SF_SMOKE).collect()}
    assert len(rows) >= 2
    tot = lambda f: sum(getattr(r, f) for r in rows.values())  # noqa: E731
    assert tot("n_corpus") > tot("n_quality"), "quality gate dropped nothing"
    assert tot("n_quality") == 2 * tot("n_unique"), "dedup must halve (1 copy each)"
    assert tot("n_unique") > tot("n_final"), "mix stage dropped nothing"
    # mix targets the smallest language: the min language keeps ~all docs
    min_lang = min(rows.values(), key=lambda r: r.n_unique)
    assert min_lang.n_final >= int(0.8 * min_lang.n_unique)
    for r in rows.values():
        if r.n_final > 0:
            assert r.min_final is not None and r.max_final >= r.min_final


def test_curation_pipeline_reports_fully_filtered_language(spark, tmp_path):
    """A language whose docs ALL fail the quality gate must still appear
    in the funnel with n_unique=0/n_final=0 (left join + coalesce), not
    silently vanish — the report is the curation audit trail."""
    from firebird_mapreduce_spark.operators.pipeline import curation_pipeline
    from firebird_mapreduce_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang"
    )
    bad = spark.createDataFrame(
        [(900000 + i, "too short", "xx") for i in range(5)],
        "doc_id LONG, text STRING, lang STRING",
    )
    sf_dir = str(tmp_path / "sf")
    docs.unionByName(bad).coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    rows = {r.lang: r for r in curation_pipeline(spark, sf_dir).collect()}
    assert "xx" in rows, "fully-filtered language dropped from the funnel"
    xx = rows["xx"]
    assert xx.n_corpus == 10 and xx.n_quality == 0
    assert xx.n_unique == 0 and xx.n_final == 0
    assert xx.min_final is None and xx.max_final is None


def test_curation_pipeline_full_stages_monotone_and_biting(spark):
    """The production-width funnel: every stage must be monotone
    (corpus >= quality >= 2*unique-ish, unique >= neardup >= clean >=
    final per language) and the two NEW stages must genuinely bite —
    near-dedup drops at least one natural near-dup pair somewhere, and
    decontamination removes the planted %13 benchmark-snippet docs
    (which concentrate in whatever language doc 0 carries)."""
    rows = {r.lang: r for r in P.curation_pipeline_full(spark, SF_SMOKE).collect()}
    assert rows
    for r in rows.values():
        assert r.n_corpus >= r.n_quality >= r.n_unique
        assert r.n_unique >= r.n_neardup >= r.n_clean >= r.n_final
        if r.n_final > 0:
            assert r.min_final is not None and r.max_final >= r.min_final
    assert sum(r.n_unique - r.n_neardup for r in rows.values()) > 0, (
        "near-dedup stage vacuous: no natural near-dup collisions"
    )
    assert sum(r.n_neardup - r.n_clean for r in rows.values()) > 0, (
        "decontamination stage vacuous: planted snippets not caught"
    )


def test_curation_pipeline_multimodal_media_stages_bite(spark):
    """The eight-stage multimodal funnel: monotone through BOTH media
    stages, each genuinely biting — the image stage drops >min members
    of the 4-doc image groups, and the AUDIO stage (r9) drops rows the
    image stage could NOT (its 8-doc clip groups span two image groups,
    so the two image survivors of a span collide in audio) — and the
    text stages agree EXACTLY with curation_pipeline_full (one shared
    body, asserted not assumed)."""
    mm = {
        r.lang: r
        for r in P.curation_pipeline_multimodal(spark, SF_SMOKE).collect()
    }
    full = {
        r.lang: r for r in P.curation_pipeline_full(spark, SF_SMOKE).collect()
    }
    assert set(mm) == set(full)
    for lang, r in mm.items():
        assert r.n_corpus >= r.n_quality >= r.n_unique
        assert r.n_unique >= r.n_neardup >= r.n_imgdedup
        assert r.n_imgdedup >= r.n_auddedup >= r.n_clean >= r.n_final
        # stages upstream of the image screen are byte-identical
        f = full[lang]
        assert (r.n_corpus, r.n_quality, r.n_unique, r.n_neardup) == (
            f.n_corpus,
            f.n_quality,
            f.n_unique,
            f.n_neardup,
        )
    img_dropped = sum(r.n_neardup - r.n_imgdedup for r in mm.values())
    assert img_dropped > 0, "image near-dup stage vacuous"
    aud_dropped = sum(r.n_imgdedup - r.n_auddedup for r in mm.values())
    assert aud_dropped > 0, "audio near-dup stage vacuous"


def test_curation_pipeline_semantic_stage_bites_before_media(spark):
    """The NINE-stage funnel (r11): the SemDeDup stage sits between
    text near-dedup and the media screens, is monotone there
    (n_neardup >= n_semdedup >= n_imgdedup), and genuinely bites —
    survivors sharing a 4-doc VECTOR family collapse to ~1 per family,
    a substantial drop (>= 25% of text survivors at this SF; the
    measured figure is ~60%).  Stages upstream of the semantic screen
    are byte-identical to the eight-stage funnel (one shared body), and
    the media stages still bite on the semantic survivors — the stage
    did not starve them."""
    sem = {
        r.lang: r
        for r in P.curation_pipeline_semantic(spark, SF_SMOKE).collect()
    }
    mm = {
        r.lang: r
        for r in P.curation_pipeline_multimodal(spark, SF_SMOKE).collect()
    }
    assert set(sem) == set(mm)
    for lang, r in sem.items():
        assert r.n_unique >= r.n_neardup >= r.n_semdedup
        assert r.n_semdedup >= r.n_imgdedup >= r.n_auddedup
        assert r.n_auddedup >= r.n_clean >= r.n_final
        m = mm[lang]
        assert (r.n_corpus, r.n_quality, r.n_unique, r.n_neardup) == (
            m.n_corpus,
            m.n_quality,
            m.n_unique,
            m.n_neardup,
        )
    nd_total = sum(r.n_neardup for r in sem.values())
    sem_dropped = sum(r.n_neardup - r.n_semdedup for r in sem.values())
    assert sem_dropped >= 0.25 * nd_total > 0, (
        f"semantic stage dropped {sem_dropped}/{nd_total} — under-biting"
    )
    img_dropped = sum(r.n_semdedup - r.n_imgdedup for r in sem.values())
    aud_dropped = sum(r.n_imgdedup - r.n_auddedup for r in sem.values())
    assert img_dropped > 0 and aud_dropped > 0, (
        "a media stage went vacuous after the semantic screen"
    )
