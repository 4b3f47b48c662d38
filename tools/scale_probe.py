#!/usr/bin/env python
"""Empirical scaling probe: time the engine's core operator shapes over a
100× row-count range (1M → 100M generated rows, no test data needed) and
print one JSON line per (shape, n) with rows/sec throughput.

This answers the question the fixed-SF bench can't: does wall-clock grow
linearly (or better) with data, i.e. is the plan data-bound rather than
overhead-bound once rows dominate?  Shapes covered: hash aggregation
(number_count's exact shape), shuffle join + broadcast join, partitioned
window rank, and exact hash dedup.

Run:  python tools/scale_probe.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebird_mapreduce_spark.session import get_session  # noqa: E402

SIZES = [1_000_000, 10_000_000, 100_000_000]


def shapes(spark):
    def agg(n):
        # number_count at width n: groupBy over 100 keys
        return (
            spark.range(n)
            .select((F.col("id") % 100).alias("k"))
            .groupBy("k")
            .count()
        )

    def shuffle_join(n):
        # fact (n rows) ⋈ fact-derived dim (n/10 rows) on a shuffled key
        a = spark.range(n).select((F.col("id") % (n // 10)).alias("k"), "id")
        b = spark.range(n // 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        return a.join(b, "k").groupBy().agg(F.sum("v").alias("s"))

    def broadcast_join(n):
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        fact = spark.range(n).select((F.col("id") % 1000).alias("k"))
        return (
            fact.join(F.broadcast(dim), "k").groupBy("grp").count()
        )

    def window_rank(n):
        from pyspark.sql import Window

        w = Window.partitionBy(F.col("id") % 1000).orderBy(F.col("r"))
        return (
            spark.range(n)
            .select("id", (F.col("id") * 2654435761 % 1000003).alias("r"))
            .select("id", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 3)
        )

    def exact_dedup(n):
        # 50% duplicate rate on a synthetic content hash
        return (
            spark.range(n)
            .select(F.md5((F.col("id") % (n // 2)).cast("string")).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy()
            .agg(F.count(F.lit(1)).alias("uniq"), F.sum("c").alias("total"))
        )

    def zorder_key(n):
        # late-r4 Morton projection: pure codegen bit arithmetic — must
        # run at scan speed (any sub-linear throughput here means the
        # shift/or/mask chain fell out of codegen)
        from firebird_mapreduce_spark.functions.zorder import z2

        return (
            spark.range(n)
            .select(
                z2(
                    (F.col("id") % 65536),
                    ((F.col("id") * 7919) % 65536),
                ).alias("z")
            )
            .groupBy()
            .agg(F.sum("z").alias("checksum"))
        )

    def unigram_score(n):
        # late-r4 LM-scoring shape on a synthetic token stream (one row =
        # one token occurrence): vocab-sized model aggregate, broadcast
        # join back over the stream, per-doc sum — the two
        # map-side-combined shuffles of unigram_logprob without the text
        # explode (which is scan-side and covered by word_count/bench)
        toks = spark.range(n).select(
            (F.col("id") / 100).cast("long").alias("doc_id"),
            ((F.col("id") * 2654435761) % 50_000).alias("token"),
        )
        model = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        return (
            toks.join(F.broadcast(model), "token")
            .groupBy("doc_id")
            .agg(F.sum("cnt").alias("s"))
            .groupBy()
            .agg(F.count(F.lit(1)).alias("docs"), F.sum("s").alias("chk"))
        )

    def profile_columns(n):
        # late-r4 profiling shape: one pruned aggregation branch per
        # column (3 here), unioned — each branch a partial→final pair
        df = spark.range(n).select(
            "id",
            (F.col("id") % 1009).alias("a"),
            ((F.col("id") * 31) % 497).alias("b"),
        )
        branches = [
            df.agg(
                F.lit(c).alias("col_name"),
                F.countDistinct(c).alias("distinct_cnt"),
                F.min(c).cast("string").alias("mn"),
                F.max(c).cast("string").alias("mx"),
            )
            for c in ("id", "a", "b")
        ]
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    def session_window(n):
        # r5 batch sessionization shape: gap-merge is a per-key sorted
        # pass inside the shuffle partition — 10k users, irregular
        # inter-event gaps straddling the 600 s threshold so sessions
        # actually split (~1 session per ~3 events)
        ev = spark.range(n).select(
            (F.col("id") % 10_000).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + (F.col("id") * 2654435761 % 1_000_003) % 86_400
                + (F.col("id") / 10_000).cast("long") * 120
            ).alias("ts"),
        )
        return (
            ev.groupBy("user_id", F.session_window("ts", "10 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy()
            .agg(F.count(F.lit(1)).alias("sessions"), F.sum("n").alias("chk"))
        )

    def funnel_stages(n):
        # r5 funnel shape: three keyed min aggregates chained by joins,
        # every exchange the same user_id hash partitioning
        ev = spark.range(n).select(
            (F.col("id") % 100_000).alias("user_id"),
            (F.col("id") % 3).alias("et"),
            F.col("id").alias("t"),
        )
        v = ev.filter(F.col("et") == 0).groupBy("user_id").agg(F.min("t").alias("tv"))
        c = (
            ev.filter(F.col("et") == 1)
            .join(v, "user_id")
            .filter(F.col("t") > F.col("tv"))
            .groupBy("user_id")
            .agg(F.min("t").alias("tc"))
        )
        p = (
            ev.filter(F.col("et") == 2)
            .join(c, "user_id")
            .filter(F.col("t") > F.col("tc"))
            .groupBy("user_id")
            .agg(F.min("t").alias("tp"))
        )
        return p.groupBy().agg(F.count(F.lit(1)).alias("converted"))

    def fingerprint_sum(n):
        # r5 table_fingerprint shape: canonical concat → md5 → 60-bit hex
        # parse → DECIMAL(38,0) partial SUM, merged to one row — the
        # zero-shuffle scan-reduce replication check
        rows = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("v"),
            F.concat(F.lit("name-"), (F.col("id") % 97).cast("string")).alias(
                "s"
            ),
        )
        row_str = F.concat_ws(
            "|",
            F.col("k").cast("string"),
            F.col("v").cast("string"),
            F.col("s"),
        )
        fp = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast(
            "decimal(38,0)"
        )
        return rows.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(fp).cast("string").alias("fingerprint"),
        )

    def paragraph_dedup(n):
        # r5 dedup_paragraphs core (post-chunking): n chunk rows, 5 chunks
        # per doc, 50% of chunk CONTENT duplicated corpus-wide — the
        # partial-agg first-occurrence min + per-doc reassembly groupBy
        chunks = spark.range(n).select(
            (F.col("id") / 5).cast("long").alias("doc_id"),
            (F.col("id") % 5).cast("int").alias("chunk_idx"),
            F.md5((F.col("id") % (n // 2)).cast("string")).alias("chunk"),
        )
        kept = (
            chunks.groupBy(F.md5("chunk").alias("h"))
            .agg(
                F.min(F.struct("doc_id", "chunk_idx", "chunk")).alias("first")
            )
            .select("first.doc_id", "first.chunk_idx", "first.chunk")
        )
        return kept.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("kept_text"),
        )

    def fastss_keys(n):
        # r6 fuzzy_match_names core: n BLOCKING-KEY rows (the exploded
        # unit that actually scales — n//13 synthetic 12-char names ×
        # (L+1) identity+deletion keys), self-join on the key, a<b,
        # levenshtein==1 verify, pair distinct.  Synthetic hex names
        # give near-unique buckets (the non-pathological catalog), and
        # every 100th name plants a single-deletion variant so matches
        # are non-vacuous.  Sub-quadratic claim under test: wall grows
        # with Σ|bucket|² ≈ key rows, never (n//13)².
        names = spark.range(n // 13).select(
            F.col("id").alias("k"),
            F.substring(F.md5(F.col("id").cast("string")), 1, 12).alias(
                "name"
            ),
        )
        planted = names.filter(F.col("k") % 100 == 0).select(
            (F.col("k") + n).alias("k"),
            F.concat(
                F.substring("name", 1, 4), F.substring("name", 6, 7)
            ).alias("name"),
        )
        cat = names.unionByName(planted)
        keyed = cat.select(
            "k",
            "name",
            F.explode(
                F.array_distinct(
                    F.concat(
                        F.array(F.col("name")),
                        F.transform(
                            F.sequence(F.lit(1), F.length("name")),
                            lambda i: F.concat(
                                F.substr(F.col("name"), F.lit(1), i - F.lit(1)),
                                F.substr(F.col("name"), i + F.lit(1)),
                            ),
                        ),
                    )
                )
            ).alias("bkey"),
        )
        a = keyed.select(
            F.col("k").alias("ak"), F.col("name").alias("an"), "bkey"
        )
        b = keyed.select(
            F.col("k").alias("bk"), F.col("name").alias("bn"), "bkey"
        )
        return (
            a.join(b, "bkey")
            .filter(F.col("ak") < F.col("bk"))
            .filter(F.levenshtein("an", "bn") == 1)
            .select("ak", "bk")
            .distinct()
            .groupBy()
            .agg(F.count(F.lit(1)).alias("pairs"))
        )

    def semantic_candidates(n):
        # r6 dedup_semantic core (post-fit, post-signature): n (vector,
        # table) key rows — n//8 vectors × 8 SRP tables, synthetic 8-bit
        # sigs — self-join on (cluster, tbl, sig), a<b, pair distinct.
        # The banding join is THE data-sized shuffle of the operator;
        # candidates ≈ Σ|bucket|² with bucket ≈ vectors/(clusters·256).
        # The CLUSTER COUNT SCALES WITH N (v/1000, the SemDeDup/IVF
        # deployment rule: k grows with corpus so cells stay
        # bounded-size) — a first cut of this probe fixed clusters at
        # 1000 and candidate volume went quadratic by 100M rows, which
        # is precisely the mis-sized-index failure the rule prevents;
        # with scaling clusters, candidates ≈ 15·vectors stays linear.
        v = n // 8
        n_clusters = max(1000, v // 1000)
        keyed = (
            spark.range(v)
            .select(
                F.col("id").alias("vid"),
                (F.col("id") % n_clusters).alias("cluster"),
            )
            .select(
                "vid", "cluster", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("tbl")
            )
            .select(
                "vid",
                "cluster",
                "tbl",
                ((F.col("vid") * 2654435761 + F.col("tbl") * 40503) % 256).alias(
                    "sig"
                ),
            )
        )
        a = keyed.select("cluster", "tbl", "sig", F.col("vid").alias("a_id"))
        b = keyed.select("cluster", "tbl", "sig", F.col("vid").alias("b_id"))
        return (
            a.join(b, ["cluster", "tbl", "sig"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
            .groupBy()
            .agg(F.count(F.lit(1)).alias("candidates"))
        )

    def snapshot_diff_hash(n):
        # r6 snapshot_diff core: two n//2-row snapshots reduced to
        # (key, 32-hex content hash), ONE keyed full-outer join, change
        # classification — the join carries 2 columns per side no matter
        # how wide the table; 1% planted mutations keep the output real.
        def side(mutate):
            content = (F.col("id") % 1000).cast("string")
            if mutate:
                content = F.when(
                    F.col("id") % 101 == 0, F.lit("mutated")
                ).otherwise(content)
            return spark.range(n // 2).select(
                F.col("id").alias("k"), F.md5(content).alias("h")
            )

        ah = side(False).withColumnRenamed("h", "ha")
        bh = side(True).withColumnRenamed("h", "hb")
        j = ah.join(bh, "k", "full_outer")
        return (
            j.select(
                F.when(F.col("ha").isNull(), "inserted")
                .when(F.col("hb").isNull(), "deleted")
                .when(F.col("ha") != F.col("hb"), "changed")
                .otherwise("unchanged")
                .alias("ct")
            )
            .filter(F.col("ct") != "unchanged")
            .groupBy("ct")
            .count()
        )

    def adc_lookup(n):
        # r7 embedding_knn_ivfpq serving core (post-fit): n CODE rows =
        # n//16 vectors × 16 sub-codes, scored by joining the BROADCAST
        # query distance table (m·ksub = 256 rows — driver-sized at any
        # corpus scale) and summing per vector.  The per-vector sum
        # partial-aggregates map-side (a vector's 16 codes are
        # generated/stored together, so the shuffle carries ~1 row per
        # vector per partition), and the top-C cut is
        # TakeOrderedAndProject — the claim under test is that ADC
        # serving is a LINEAR broadcast-lookup scan, the whole point of
        # trading 512-byte vectors for 8-byte codes.
        v = n // 16
        codes = (
            spark.range(v)
            .select(
                F.col("id").alias("ovec"),
                F.explode(F.sequence(F.lit(0), F.lit(15))).alias("s"),
            )
            .select(
                "ovec",
                "s",
                (
                    (F.col("ovec") * 2654435761 + F.col("s") * 40503) % 16
                ).alias("cluster"),
            )
        )
        qd = spark.range(256).select(
            (F.col("id") % 16).alias("s"),
            F.expr("id div 16").cast("int").alias("cluster"),
            (F.pmod(F.xxhash64("id"), F.lit(10000)) / 10000.0).alias("dist"),
        )
        return (
            codes.join(F.broadcast(qd), ["s", "cluster"])
            .groupBy("ovec")
            .agg(F.sum("dist").alias("adc"))
            .orderBy(F.col("adc").asc(), F.col("ovec").asc())
            .limit(100)
        )

    def pq_encode(n):
        # r8 assign-only PQ batch encoding core (_pq_assign_arrays):
        # n PAIR rows = n//256 sub-vectors × the BROADCAST 256-centroid
        # array table, each pair scored by a fixed-width exact-decimal
        # term sum (the oracle-grade arithmetic), reduced by a
        # partial-agg struct argmin.  The claim under test: incremental
        # encoding is a LINEAR broadcast-scan in batch size — the
        # property that lets daily ingests encode without touching the
        # corpus (and that made the sampled-fit + assign-only index
        # build 5.6x cheaper than the full-corpus fit).
        dims = 5
        v = n // 256
        sub = spark.range(v).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        F.pmod(F.xxhash64(F.col("id") + F.lit(i)), F.lit(1000))
                        / 1000.0
                    )
                    for i in range(dims)
                ]
            ).alias("qv"),
        )
        cent = spark.range(256).select(
            F.col("id").alias("cluster"),
            F.array(
                *[
                    (
                        F.pmod(
                            F.xxhash64(F.col("id") * 7 + F.lit(i)),
                            F.lit(1000),
                        )
                        / 1000.0
                    )
                    for i in range(dims)
                ]
            ).alias("cvec"),
        )
        pairs = sub.crossJoin(F.broadcast(cent))
        terms = F.zip_with(
            F.col("qv"),
            F.col("cvec"),
            lambda a, b: ((a - b) * (a - b)).cast("decimal(28,15)"),
        )
        dist2 = F.element_at(terms, 1)
        for i in range(2, dims + 1):
            dist2 = dist2 + F.element_at(terms, i)
        scored = pairs.select(
            "vec_id", "cluster", dist2.cast("decimal(38,15)").alias("d2")
        )
        # the noop sink consumes every output column, so the decimal
        # term sums cannot be pruned away (a count()-only sink let
        # Catalyst eliminate the whole scoring expression)
        return (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cluster")).alias("s"))
            .select(
                "vec_id",
                F.col("s.cluster").alias("cluster"),
                F.col("s.d2").alias("d2"),
            )
        )

    return {
        "agg_100keys": agg,
        "shuffle_join": shuffle_join,
        "broadcast_join": broadcast_join,
        "window_rank": window_rank,
        "exact_dedup": exact_dedup,
        "zorder_key": zorder_key,
        "unigram_score": unigram_score,
        "profile_columns": profile_columns,
        "session_window": session_window,
        "funnel_stages": funnel_stages,
        "fingerprint_sum": fingerprint_sum,
        "paragraph_dedup": paragraph_dedup,
        "fastss_keys": fastss_keys,
        "semantic_candidates": semantic_candidates,
        "adc_lookup": adc_lookup,
        "pq_encode": pq_encode,
        "snapshot_diff_hash": snapshot_diff_hash,
    }


def main() -> None:
    sizes = SIZES[:2] if "--quick" in sys.argv else SIZES
    spark = get_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: absorb JVM/codegen startup
    spark.range(10_000_000).groupBy((F.col("id") % 10)).count().write.mode(
        "overwrite"
    ).format("noop").save()
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    for name, fn in shapes(spark).items():
        if only and name not in only:
            continue
        for n in sizes:
            start = time.perf_counter()
            fn(n).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - start
            print(
                json.dumps(
                    {
                        "shape": name,
                        "rows": n,
                        "wall_sec": round(wall, 3),
                        "mrows_per_sec": round(n / wall / 1e6, 1),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
