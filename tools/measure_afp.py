#!/usr/bin/env python
"""Measure the audio-fingerprint dedup's banding (VERDICT r7 item 4).

Over the audio fixture at $SPARK_GRAFT_SF_DIR (default sf0.1):

  recall     — banded pair set vs ALL-PAIRS Hamming <= threshold over the
               decoded fingerprints (expected 1.000: threshold 3 < 4
               disjoint bands is the same pigeonhole guarantee as the
               image tier — the fingerprint shares the 56-bit/4-band
               geometry, so ``phash_pairs`` is literally shared);
  reduction  — candidate pairs from the band join vs N(N-1)/2 all-pairs;
  classes    — Hamming histogram of the true pairs (gain copies at 0,
               one-window edits at 1-2, unrelated clips far away).

Results land in SCALE.md.
"""
from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebird_mapreduce_spark.operators import multimodal as M  # noqa: E402
from firebird_mapreduce_spark.session import get_session  # noqa: E402
from firebird_mapreduce_spark.sources.readers import read_binary_dir  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_session()
    fixture = M._afp_fixture_dir(spark, SF_DIR)
    files = read_binary_dir(spark, fixture, glob="*.wav")
    assets = files.select(
        F.regexp_extract(F.col("path"), r"asset_(\d+)\.wav$", 1)
        .cast("bigint")
        .alias("asset_id"),
        "content",
    )
    # decode+fingerprint ONCE (checkpointed): the collected dict, the
    # band-key join and the operator below all reuse it instead of
    # re-running the mapInPandas decode pass per consumer
    fps = M.audio_fingerprints(assets).localCheckpoint(eager=True)
    hashes = {
        r["asset_id"]: r["phash"] for r in fps.collect()  # measurement only
    }
    ids = sorted(hashes)
    n = len(ids)
    dists = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    brute = {p for p, d in dists.items() if d <= M._PHASH_THRESHOLD}
    banded = {
        (r["a_id"], r["b_id"])
        for r in M.dedup_audio_fingerprint(spark, SF_DIR)
        .select("a_id", "b_id")
        .collect()
    }
    keyed = M._phash_band_keys(fps)
    a = keyed.select(F.col("asset_id").alias("a_id"), "band", "bval")
    b = keyed.select(F.col("asset_id").alias("b_id"), "band", "bval")
    candidates = (
        a.join(b, ["band", "bval"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    unrelated = [d for p, d in dists.items() if p not in brute]
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_clips": n,
                "all_pairs": all_pairs,
                "band_candidates": candidates,
                "reduction_x": round(all_pairs / max(candidates, 1), 1),
                "true_pairs": len(brute),
                "banded_pairs": len(banded),
                "recall": round(len(banded & brute) / max(len(brute), 1), 4),
                "pair_hamming_hist": dict(
                    collections.Counter(dists[p] for p in brute)
                ),
                "unrelated_mean_hamming": round(
                    sum(unrelated) / max(len(unrelated), 1), 1
                ),
                "threshold": M._PHASH_THRESHOLD,
            }
        )
    )


if __name__ == "__main__":
    main()
