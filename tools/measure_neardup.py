#!/usr/bin/env python
"""Measure `embedding_neardup_topk`'s banded candidate generation against
the exact within-block all-pairs baseline: candidate fraction (the
sub-quadratic claim) and recall@50 (how many of the exact top-50 pairs
the banding retains), over a (tables × band-layout) sweep.

NumPy re-implementation of the SRP signature arithmetic (md5-derived ±1
planes salted by table index — identical derivation to
`operators.similarity._srp_weights_table`; float rounding here because
this is measurement, not parity — Spark/DuckDB signature parity is pinned
by the oracle-backed queries themselves).

Usage: python tools/measure_neardup.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
from itertools import combinations

import numpy as np
import pyarrow.parquet as pq

N_PLANES = 8
N_DIMS = 64
TOP_PAIRS = 50


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


def measure(sf_dir: str) -> None:
    table = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    d = table.to_pandas()
    mat = np.array(list(d["embedding"]), dtype=np.float64)
    labels = d["label"].to_numpy()
    ids = d["vec_id"].to_numpy()
    nrm = np.linalg.norm(mat, axis=1)

    # exact within-block top-50 (the all-pairs baseline — sample scale only)
    pairs: list[tuple[float, int, int]] = []
    total_pairs = 0
    for lab in np.unique(labels):
        idx = np.where(labels == lab)[0]
        sub = mat[idx]
        sims = (sub @ sub.T) / np.outer(nrm[idx], nrm[idx])
        for i, j in combinations(range(len(idx)), 2):
            a, b = sorted((int(ids[idx[i]]), int(ids[idx[j]])))
            pairs.append((round(float(sims[i, j]), 6), a, b))
        total_pairs += len(idx) * (len(idx) - 1) // 2
    pairs.sort(key=lambda x: (-x[0], x[1], x[2]))
    top = {(a, b) for _, a, b in pairs[:TOP_PAIRS]}

    max_tables = 8
    bits = np.zeros((len(d), max_tables, N_PLANES), dtype=bool)
    for t in range(max_tables):
        bits[:, t, :] = (mat @ planes(t).T) > 0

    print(f"{sf_dir}: n={len(d)} blocks={len(np.unique(labels))} "
          f"all within-block pairs={total_pairs}")
    print("  L  bands      cand_frac  recall@50")
    for nbands, bband in ((1, 8), (2, 4), (4, 2)):
        for n_tables in (2, 4, 8):
            cand: set[tuple[int, int]] = set()
            for lab in np.unique(labels):
                idx = np.where(labels == lab)[0]
                for t in range(n_tables):
                    for b in range(nbands):
                        buckets: dict[tuple, list[int]] = {}
                        for i in idx:
                            v = tuple(bits[i, t, b * bband:(b + 1) * bband])
                            buckets.setdefault(v, []).append(int(ids[i]))
                        for members in buckets.values():
                            for a, c in combinations(sorted(members), 2):
                                cand.add((a, c))
            star = " <- registered default" if (nbands, bband, n_tables) == (1, 8, 8) else ""
            print(f"  {n_tables}  {nbands}x{bband}bit   "
                  f"{len(cand) / total_pairs:9.3f}  {len(top & cand) / TOP_PAIRS:9.2f}{star}")


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    for sf_dir in dirs:
        measure(sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
