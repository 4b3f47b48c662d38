#!/usr/bin/env python
"""Measure SRP-LSH recall@10 vs brute-force cosine as a function of the
number of independent hash tables L — the 1−(1−P)^L amplification the
``embedding_lsh_ann_multi`` operator implements.

NumPy re-implementation of the exact signature arithmetic (md5-derived ±1
planes salted by table index, 6 dp half-up rounding before the sign test)
so the sweep runs in seconds; the Spark/DuckDB parity of the same
signatures is separately pinned by the oracle-backed queries.

Usage: python tools/measure_lsh_recall.py [sf_dir] [n_queries]
Sweeps probe radius 1 and 2 at each L.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PLANES = 8
N_DIMS = 64
TOP_K = 10


def planes(table_idx: int | None) -> np.ndarray:
    """±1 plane matrix [N_PLANES, N_DIMS]; table_idx None reproduces the
    single-table operator's un-salted derivation."""
    out = np.empty((N_PLANES, N_DIMS))
    for p in range(N_PLANES):
        for j in range(N_DIMS):
            key = f"{p}|{j}" if table_idx is None else f"{table_idx}|{p}|{j}"
            out[p, j] = (
                1.0
                if hashlib.md5(key.encode()).hexdigest()[0] in "89abcdef"
                else -1.0
            )
    return out


def signatures(emb: np.ndarray, w: np.ndarray) -> np.ndarray:
    proj = np.round(emb @ w.T, 6)  # float round ~ half-even; measurement only
    bits = (proj > 0).astype(np.int64)
    return bits @ (1 << np.arange(N_PLANES))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    table = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    emb = np.array(table.column("embedding").to_pylist(), dtype=np.float64)
    n = len(emb)
    norms = np.linalg.norm(emb, axis=1)
    unit = emb / norms[:, None]
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    true_topk = np.argsort(-sims, axis=1)[:, :TOP_K]

    max_l = 8
    sigs = np.stack(
        [signatures(emb, planes(t)) for t in range(max_l)]
    )  # [L, n]
    flips_r1 = [0] + [1 << i for i in range(N_PLANES)]
    flips_r2 = flips_r1 + [
        (1 << i) | (1 << j)
        for i in range(N_PLANES)
        for j in range(i + 1, N_PLANES)
    ]

    print(f"# sf_dir={sf_dir} n={n} queries={n_queries}")
    print("L  radius  recall@10  mean_candidates  frac_scanned")
    for L in (1, 2, 4, 8):
        for radius, flips in ((1, np.array(flips_r1)), (2, np.array(flips_r2))):
            recalls, cand_counts = [], []
            for q in range(min(n_queries, n)):
                cand = np.zeros(n, dtype=bool)
                for t in range(L):
                    probe_sigs = sigs[t, q] ^ flips
                    cand |= np.isin(sigs[t], probe_sigs)
                cand[q] = False
                cand_counts.append(int(cand.sum()))
                hit = np.isin(true_topk[q], np.flatnonzero(cand)).sum()
                recalls.append(hit / TOP_K)
            print(
                f"{L}  {radius}       {np.mean(recalls):.3f}"
                f"      {np.mean(cand_counts):9.1f}"
                f"       {np.mean(cand_counts) / n:.3f}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
