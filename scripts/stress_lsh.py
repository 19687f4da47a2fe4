"""×10 near-dup stress for embedding_dup_pairs (VERDICT r3 item 1).

Builds a duplication-heavy embedding corpus — N_ORIG seed vectors, each
replicated DUP times with tiny gaussian perturbations (cosine ≥ 0.99 to its
seed, so every cluster is an all-pairs near-dup clique) — and times
`embedding_dup_pairs` at two duplication levels on the same machine.

The claim under test: runtime is governed by ROWS + EMITTED PAIRS (bucketed
verify + few-partition vectorized pair-dedup), never by a per-distinct-pair
aggregate (~65 µs/key, CLAUDE.md invariant 9). Going dup=2 → dup=10
multiplies rows ×5 and clique pairs ×45; a per-key-aggregate tail would
scale with the ×45, the fixed plan with the ×5 (plus linear emission cost).

Usage: python scripts/stress_lsh.py  (run from /root/repo; owns its Ray
session; prints one JSON line, paste into BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())  # run from /root/repo; workers resolve via cwd

import numpy as np
import pyarrow as pa

import ray

N_ORIG = 20_000
DIM = 64


def build(dup: int) -> pa.Table:
    rng = np.random.default_rng(7)
    seeds = rng.standard_normal((N_ORIG, DIM))
    seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
    rows = np.repeat(seeds, dup, axis=0)
    rows = rows + 0.005 * rng.standard_normal(rows.shape)  # cos≈0.9997 to seed
    ids = np.arange(len(rows), dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(rows.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
    })


def run(dup: int) -> dict:
    from pdftext_ray.ops.dedup import embedding_dup_pairs

    tbl = build(dup)
    ds = ray.data.from_arrow(tbl).repartition(32).materialize()
    t0 = time.perf_counter()
    pairs = embedding_dup_pairs(
        ds, threshold=0.98, n_planes=12, probe_radius=1
    )
    n_pairs = pairs.count()
    sec = round(time.perf_counter() - t0, 3)
    return {"dup": dup, "rows": tbl.num_rows, "pairs": n_pairs, "sec": sec,
            "us_per_pair": round(1e6 * sec / max(n_pairs, 1), 2)}


def main():
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    out = [run(2), run(10)]
    r = {
        "probe": "embedding_dup_pairs x10 near-dup stress",
        "levels": out,
        "rows_ratio": round(out[1]["rows"] / out[0]["rows"], 2),
        "pairs_ratio": round(out[1]["pairs"] / max(out[0]["pairs"], 1), 2),
        "sec_ratio": round(out[1]["sec"] / out[0]["sec"], 2),
    }
    print(json.dumps(r))
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
