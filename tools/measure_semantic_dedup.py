#!/usr/bin/env python
"""Measure `dedup_semantic`'s recall and candidate reduction against the
WITHIN-CLUSTER brute force it de-quadratifies.

Three numbers per scale factor (NumPy replication of the pipeline —
Spark/DuckDB parity is pinned by the oracle-backed query itself):

- pair recall: of all within-cluster pairs at cosine >= threshold, the
  fraction the SRP banding retains as candidates (the banding-vs-exact
  surface inside a cluster);
- end-to-end dup recall: of the planted near-copies (the known semantic
  duplicates), the fraction the full pipeline flags — this differs from
  pair recall exactly by the CLUSTER SPLITS: a copy whose tiny
  perturbation flips its k-means argmin lands in a different cluster
  from its original and is structurally invisible, the inherent
  SemDeDup trade-off (the paper's within-cluster restriction);
- candidate fraction: banded candidates / within-cluster all-pairs
  (the sub-quadratic claim).

Usage: python tools/measure_semantic_dedup.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow.parquet as pq

N_PLANES = 8
N_DIMS = 64
N_TABLES = 8
K = 10
ITERATIONS = 3
THRESHOLD = 0.9


def planes(table_idx: int) -> np.ndarray:
    out = np.empty((N_PLANES, N_DIMS))
    for p in range(N_PLANES):
        for j in range(N_DIMS):
            key = f"{table_idx}|{p}|{j}"
            out[p, j] = (
                1.0
                if hashlib.md5(key.encode()).hexdigest()[0] in "89abcdef"
                else -1.0
            )
    return out


def augmented(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    pert = mat.copy()
    pert[np.arange(len(ids)), ids % mat.shape[1]] += 0.05
    return (
        np.concatenate([ids, ids + 100000]),
        np.round(np.vstack([mat, pert]), 6),
    )


def kmeans_assign(ids: np.ndarray, comp: np.ndarray) -> np.ndarray:
    """float64 replication of the exact-decimal schedule (measurement
    only; decimal-vs-float drift cannot flip an argmin on this corpus's
    margins, and parity is the oracle's job, not this tool's)."""
    assign = ids % K
    for _ in range(ITERATIONS):
        cent = np.vstack(
            [comp[assign == c].mean(axis=0) for c in range(K)]
        )
        d2 = ((comp[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
    return assign


def signatures(comp: np.ndarray) -> np.ndarray:
    sigs = np.zeros((len(comp), N_TABLES), dtype=np.int64)
    for t in range(N_TABLES):
        proj = comp @ planes(t).T  # (n, planes)
        bits = (np.round(proj, 6) > 0).astype(np.int64)
        sigs[:, t] = (bits << np.arange(N_PLANES)).sum(axis=1)
    return sigs


def measure(sf_dir: str) -> None:
    ids, comp = augmented(sf_dir)
    n = len(ids)
    assign = kmeans_assign(ids, comp)
    sigs = signatures(comp)
    norm = comp / np.linalg.norm(comp, axis=1, keepdims=True)

    total_pairs = 0
    true_pairs: set[tuple[int, int]] = set()
    cand: set[tuple[int, int]] = set()
    for c in range(K):
        members = np.flatnonzero(assign == c)
        m = len(members)
        total_pairs += m * (m - 1) // 2
        sim = norm[members] @ norm[members].T
        ti, tj = np.nonzero(np.triu(np.round(sim, 6) >= THRESHOLD, k=1))
        true_pairs.update(
            (min(ids[members[i]], ids[members[j]]),
             max(ids[members[i]], ids[members[j]]))
            for i, j in zip(ti, tj)
        )
        for t in range(N_TABLES):
            order = members[np.argsort(sigs[members, t], kind="stable")]
            svals = sigs[order, t]
            start = 0
            for e in range(1, len(order) + 1):
                if e == len(order) or svals[e] != svals[start]:
                    # no bucket-size cap: the real pipeline has none, and
                    # a silent cap here would under-report exactly the
                    # hot-bucket pairs dedup targets
                    bucket = order[start:e]
                    for x in range(len(bucket)):
                        for y in range(x + 1, len(bucket)):
                            a, b = ids[bucket[x]], ids[bucket[y]]
                            cand.add((min(a, b), max(a, b)))
                    start = e

    got_pairs = true_pairs & cand
    planted = {(i, i + 100000) for i in ids[ids < 100000]}
    flagged = planted & got_pairs
    splits = sum(
        1
        for i in ids[ids < 100000]
        if assign[np.flatnonzero(ids == i)[0]]
        != assign[np.flatnonzero(ids == i + 100000)[0]]
    )
    print(
        f"{sf_dir}: n={n} within-cluster pairs={total_pairs} "
        f"candidates={len(cand)} ({len(cand) / max(total_pairs, 1):.4f}) | "
        f"pair recall {len(got_pairs)}/{len(true_pairs)} "
        f"({len(got_pairs) / max(len(true_pairs), 1):.4f}) | "
        f"planted flagged {len(flagged)}/{len(planted)} "
        f"({len(flagged) / max(len(planted), 1):.4f}), "
        f"cluster splits {splits}"
    )


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for d in dirs:
        measure(d)
