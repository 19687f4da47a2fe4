"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is broadcast
  via ``ray.put`` ONCE and read inside each task (never re-shipped per
  batch); each batch computes scores with one float64 matmul and emits only
  its local top-k, so the driver-side merge sees ≤ k rows per block.
* ``ivf_topk`` — the scale path: seeded k-means centroids (fit on a sample),
  vectors assigned to inverted lists; queries probe the ``n_probe`` nearest
  lists only. Approximate; recall measured in tests against brute force.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pdftext_ray.ops import round_half_away, vec_matrix


def _unit(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k of every row vs one query vector.

    Output: (vec_id, score) — score rounded to 6 decimals, ordered by
    (score desc, vec_id asc), exactly k rows.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        vecs = vec_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_arrays([pa.array([], pa.int64()), pa.array([], pa.float64())],
                                        names=[id_col, "score"])
        scores = round_half_away(_unit(vecs) @ qv, 6)
        take = min(k, len(ids))
        # lexsort (not argpartition): boundary TIES must keep the smallest
        # ids so the local top-k agrees with ORDER BY score DESC, id ASC
        idx = np.lexsort((ids, -scores))[:take]
        return pa.Table.from_arrays(
            [pa.array(ids[idx], pa.int64()), pa.array(scores[idx], pa.float64())],
            names=[id_col, "score"],
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
    return local.sort(["score", id_col], descending=[True, False]).limit(k)


def brute_force_topk_many(
    ds: ray.data.Dataset,
    query_mat: np.ndarray,
    query_ids=None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k for a BATCH of query vectors in one pass.

    The whole (nq × dim) query matrix broadcasts once via ``ray.put``; each
    data batch computes one (batch × nq) float64 matmul and emits its local
    top-k PER QUERY (≤ nq·k rows per block), then a per-query head-k
    finalizes. Output: (query_id, vec_id, score), k rows per query, ordered
    within a query by (score desc, vec_id asc).
    """
    import pandas as pd

    Q = _unit(np.asarray(query_mat, dtype=np.float64))
    qids = np.arange(len(Q), dtype=np.int64) if query_ids is None else np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((Q, qids))

    def _empty() -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["query_id", id_col, "score"],
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        Qm, qi = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return _empty()
        vecs = vec_matrix(batch.column(vec_col))
        scores = round_half_away(_unit(vecs) @ Qm.T, 6)  # (n, nq)
        take = min(k, len(ids))
        o_q, o_i, o_s = [], [], []
        for j in range(len(qi)):
            col = scores[:, j]
            sel = np.lexsort((ids, -col))[:take]
            o_q.append(np.full(take, qi[j], dtype=np.int64))
            o_i.append(ids[sel])
            o_s.append(col[sel])
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(o_q), pa.int64()),
                pa.array(np.concatenate(o_i).astype(np.int64), pa.int64()),
                pa.array(np.concatenate(o_s), pa.float64()),
            ],
            names=["query_id", id_col, "score"],
        )

    def head(g: pd.DataFrame) -> pa.Table:
        sel = np.lexsort((g[id_col].to_numpy(), -g["score"].to_numpy()))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(g["query_id"].to_numpy()[sel].astype(np.int64), pa.int64()),
                pa.array(g[id_col].to_numpy()[sel].astype(np.int64), pa.int64()),
                pa.array(g["score"].to_numpy()[sel], pa.float64()),
            ],
            names=["query_id", id_col, "score"],
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
    # nq groups only — per-group overhead is bounded by the query count
    return local.groupby("query_id").map_groups(head, batch_format="pandas")


class IVFIndex:
    """Seeded Lloyd k-means over a sample; pure numpy, deterministic."""

    def __init__(self, sample: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 5):
        rng = np.random.RandomState(seed)
        sample = _unit(np.asarray(sample, dtype=np.float64))
        n_centroids = min(n_centroids, len(sample))
        idx = rng.choice(len(sample), size=n_centroids, replace=False)
        cents = sample[idx].copy()
        for _ in range(iters):
            assign = np.argmax(sample @ cents.T, axis=1)
            for c in range(n_centroids):
                members = sample[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
            cents = _unit(cents)
        self.centroids = cents

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        return np.argmax(_unit(vecs) @ self.centroids.T, axis=1)


def ivf_topk(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_fraction: float = 0.2,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF approximate top-k: train on a sample, probe the nearest lists.

    The index (centroid matrix) is broadcast once via ``ray.put``; the filter
    + local top-k run in one map_batches pass (no shuffle at all — the probe
    set prunes most rows before scoring).

    The training sample is a DETERMINISTIC function of (id, seed) — a
    per-row hash gate, not ``Dataset.random_sample`` (whose draw depends on
    Ray's task/block layout, so the trained centroids would change with
    read parallelism, Ray version, or file row-grouping; the gate's pinned
    recall contract needs layout-independence).
    """
    import hashlib

    gate32 = int(min(max(sample_fraction, 0.0), 1.0) * (1 << 32))

    def hash_sample(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if pa.types.is_integer(col.type):
            ids = np.asarray(col).astype(np.uint64)
            h = ((ids + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
            keep = h < np.uint64(gate32)
        else:
            keep = np.array(
                [
                    int.from_bytes(
                        hashlib.blake2b(repr((seed, v)).encode(), digest_size=4).digest(), "big"
                    )
                    < gate32
                    for v in col.to_pylist()
                ],
                dtype=bool,
            )
        return t.filter(pa.array(keep))

    sample = ds.map_batches(hash_sample, batch_format="pyarrow").take_all()
    if len(sample) < 2:
        # an unlucky/empty sample on a tiny dataset: fall back to a prefix
        sample = ds.limit(max(4 * n_centroids, 64)).take_all()
    # take_all() row ORDER varies with block layout/parallelism; k-means
    # init draws by position, so sort by id for a layout-independent index
    sample = sorted(sample, key=lambda r: r[id_col])
    index = IVFIndex(np.asarray([r[vec_col] for r in sample]), n_centroids, seed=seed)

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(index.centroids @ q))[:n_probe].tolist())
    idx_ref = ray.put(index)
    q_ref = ray.put(q)

    def probe_topk(batch: pa.Table) -> pa.Table:
        ivf: IVFIndex = ray.get(idx_ref)
        qv = ray.get(q_ref)
        vecs = vec_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_arrays([pa.array([], pa.int64()), pa.array([], pa.float64())],
                                        names=[id_col, "score"])
        lists = ivf.assign(vecs)
        mask = np.isin(lists, list(probe))
        vecs, ids = vecs[mask], ids[mask]
        if len(ids) == 0:
            return pa.Table.from_arrays([pa.array([], pa.int64()), pa.array([], pa.float64())],
                                        names=[id_col, "score"])
        scores = round_half_away(_unit(vecs) @ qv, 6)
        take = min(k, len(ids))
        sel = np.lexsort((ids, -scores))[:take]
        return pa.Table.from_arrays(
            [pa.array(ids[sel], pa.int64()), pa.array(scores[sel], pa.float64())],
            names=[id_col, "score"],
        )

    local = ds.map_batches(probe_topk, batch_format="pyarrow", batch_size=4096)
    return local.sort(["score", id_col], descending=[True, False]).limit(k)


class PQIndex:
    """Product quantizer: split dim into ``m`` subspaces, Lloyd k-means with
    ``ksub`` centroids per subspace. Pure numpy, deterministic.

    Determinism contract (shared with the scalar golden,
    pipelines/goldens.expected_pq_table — same contract style as
    ops/cluster.kmeans_assign): the training sample arrives id-sorted and
    unit-normalized; per-subspace init = the first ``ksub`` sample rows'
    sub-vectors; centroids round half-away to 6 decimals after EVERY update
    (so summation order can't leak into assignments); empty clusters keep
    their previous centroid; encode = argmin squared L2 (numpy argmin's
    first-minimum rule breaks ties toward the lowest code).
    """

    def __init__(self, sample: np.ndarray, m: int = 8, ksub: int = 16, iters: int = 8):
        sample = _unit(np.asarray(sample, dtype=np.float64))
        n, d = sample.shape
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m} subspaces")
        if n < ksub:
            raise ValueError(f"PQ training needs >= ksub={ksub} sample rows, got {n}")
        self.m, self.ksub, self.dsub = m, ksub, d // m
        self.codebooks = np.empty((m, ksub, self.dsub), dtype=np.float64)
        for s in range(m):
            sub = sample[:, s * self.dsub : (s + 1) * self.dsub]
            cents = round_half_away(sub[:ksub].copy(), 6)
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
                assign = np.argmin(d2, axis=1)
                for c in range(ksub):
                    members = sub[assign == c]
                    if len(members):
                        cents[c] = members.mean(axis=0)
                cents = round_half_away(cents, 6)
            self.codebooks[s] = cents

    def encode(self, vecs: np.ndarray) -> np.ndarray:
        """(n, d) unit vectors → (n, m) uint8 codes, vectorized per subspace."""
        vecs = _unit(np.asarray(vecs, dtype=np.float64))
        codes = np.empty((len(vecs), self.m), dtype=np.uint8)
        for s in range(self.m):
            sub = vecs[:, s * self.dsub : (s + 1) * self.dsub]
            d2 = ((sub[:, None, :] - self.codebooks[s][None, :, :]) ** 2).sum(-1)
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        return codes

    def adc_table(self, query: np.ndarray) -> np.ndarray:
        """(m, ksub) table of squared-L2 partial distances from the unit
        query to every centroid — the asymmetric-distance lookup table."""
        q = np.asarray(query, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        tab = np.empty((self.m, self.ksub), dtype=np.float64)
        for s in range(self.m):
            qs = q[s * self.dsub : (s + 1) * self.dsub]
            tab[s] = ((self.codebooks[s] - qs[None, :]) ** 2).sum(-1)
        return tab


def pq_topk(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 5,
    m: int = 16,
    ksub: int = 16,
    sample_fraction: float = 1.0,
    max_train: int = 100_000,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Product-quantization approximate top-k — the memory-scale ANN path:
    each vector compresses to ``m`` bytes (64-dim float32 → 16 bytes, 16×),
    so a 100 TB embedding corpus's codes fit a fraction of the object store
    and scoring is ``m`` table lookups + adds per candidate instead of a
    d-dim dot product (Jégou et al. 2011, IEEE TPAMI — public method).

    Plan: codebooks train on the deterministic hash sample (id-sorted — the
    same layout-independence argument as ivf_topk); the (index, ADC table)
    broadcast once via ``ray.put``; one stateless ``map_batches`` pass
    encodes each block and emits its local top-k by quantized distance; a
    small ``sort().limit(k)`` finalizes. Output: (vec_id, adc_dist) rounded
    to 6, ordered by (adc_dist asc, vec_id asc). Approximate by
    construction; gate-compared against an independent scalar golden and a
    pinned recall@k contract vs the exact path.
    """
    sample = _deterministic_sample(
        ds, sample_fraction, seed, id_col, vec_col, 4 * ksub, max_rows=max_train
    )
    index = PQIndex(np.asarray([r[vec_col] for r in sample]), m=m, ksub=ksub)
    tab = index.adc_table(np.asarray(query_vec, dtype=np.float64))
    ref = ray.put((index, tab))

    def local_topk(batch: pa.Table) -> pa.Table:
        pq_idx, adc = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_arrays([pa.array([], pa.int64()), pa.array([], pa.float64())],
                                        names=[id_col, "adc_dist"])
        codes = pq_idx.encode(vec_matrix(batch.column(vec_col)))
        dist = round_half_away(
            adc[np.arange(pq_idx.m)[None, :], codes.astype(np.int64)].sum(axis=1), 6
        )
        take = min(k, len(ids))
        sel = np.lexsort((ids, dist))[:take]
        return pa.Table.from_arrays(
            [pa.array(ids[sel], pa.int64()), pa.array(dist[sel], pa.float64())],
            names=[id_col, "adc_dist"],
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
    return local.sort(["adc_dist", id_col]).limit(k)


def _deterministic_sample(
    ds: ray.data.Dataset,
    fraction: float,
    seed: int,
    id_col: str,
    vec_col: str,
    min_rows: int,
    max_rows: int = 100_000,
):
    """Hash-gated, id-sorted training sample — layout-independent
    throughout (Dataset.random_sample would tie the trained index to Ray's
    block layout; ivf_topk predates this helper and keeps its own inline
    gate to protect its pinned recall contract). The gate reuses
    ops/sampling's hash contract (one implementation of the Fibonacci-hash
    arithmetic, including its negative-int-key refusal). ``max_rows`` is
    the driver-memory guard: the collected sample HARD-CAPS at the
    id-sorted prefix via per-block truncation + a distributed sort/limit —
    size ``fraction`` so fraction×N lands near the cap rather than relying
    on it; codebook quality saturates long before 10^5 training rows. A
    too-small gated sample falls back to the id-sorted prefix of the WHOLE
    dataset (same truncation plan), which is also layout-independent."""
    from pdftext_ray.ops.sampling import _BUCKETS, _key_buckets

    gate = int(min(max(fraction, 0.0), 1.0) * _BUCKETS)

    def hash_gate(t: pa.Table) -> pa.Table:
        b = _key_buckets(t.column(id_col).combine_chunks(), seed)
        return t.filter(pa.array(b < gate))

    def local_head(n: int):
        # per-block truncation keeps the cap shuffle payload bounded
        def head(t: pa.Table) -> pa.Table:
            if len(t) <= n:
                return t
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.take(pa.array(np.argsort(ids, kind="stable")[:n], pa.int64()))

        return head

    def sorted_prefix(source: ray.data.Dataset, n: int):
        return (
            source.map_batches(local_head(n), batch_format="pyarrow")
            .sort(id_col)
            .limit(n)
            .take_all()
        )

    sample = sorted_prefix(ds.map_batches(hash_gate, batch_format="pyarrow"), max_rows)
    if len(sample) < min_rows:
        sample = sorted_prefix(ds, min_rows)
    return sorted(sample, key=lambda r: r[id_col])


class SQ8Index:
    """Scalar quantization to 8-bit codes (the FAISS ScalarQuantizer QT_8bit
    shape — public method): per-dimension [min, max] learned from a training
    sample of UNIT vectors; each vector stores as d uint8 codes (64-dim
    float32 → 64 bytes, 4×; vs PQ's 16 bytes but with far lower distortion).

    Determinism contract (shared with goldens.expected_sq8_table): train on
    the id-sorted unit-normalized prefix; code = clip(floor(t·255 + 0.5), 0,
    255) with t = (x − vmin)/span (floor(+0.5) half-up — identical in numpy
    and scalar Python, no round-half-even ambiguity); zero-span dims code 0
    and reconstruct to vmin; score = Σ(recon·q) via numpy pairwise sum,
    rounded half-away to 6.
    """

    def __init__(self, sample: np.ndarray):
        unit = _unit(np.asarray(sample, dtype=np.float64))
        self.vmin = unit.min(axis=0)
        self.span = unit.max(axis=0) - self.vmin

    def encode(self, vecs: np.ndarray) -> np.ndarray:
        unit = _unit(np.asarray(vecs, dtype=np.float64))
        safe = np.where(self.span > 0, self.span, 1.0)
        t = (unit - self.vmin) / safe * 255.0
        codes = np.clip(np.floor(t + 0.5), 0, 255)
        codes[:, self.span == 0] = 0
        return codes.astype(np.uint8)

    def reconstruct(self, codes: np.ndarray) -> np.ndarray:
        return self.vmin + codes.astype(np.float64) * (self.span / 255.0)


def sq8_topk(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 5,
    sample_fraction: float = 1.0,
    max_train: int = 100_000,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Scalar-quantized approximate top-k — the low-distortion compression
    point between brute force (full floats) and PQ (16-byte codes): codes
    are 1 byte/dim, scoring is one reconstruct + dot per block, recall on
    random embeddings is near-exact (vs PQ's 0.5 — see the pinned recall
    gates).

    Plan mirrors pq_topk: the quantizer trains on the deterministic
    id-sorted capped sample (layout-independent), broadcasts once via
    ``ray.put``; one stateless ``map_batches`` encodes + scores each block
    and emits its local top-k; a small ``sort().limit(k)`` finalizes.
    Output: (vec_id, sq8_score) rounded to 6, ordered by (score desc,
    vec_id asc).
    """
    sample = _deterministic_sample(ds, sample_fraction, seed, id_col, vec_col, 256, max_rows=max_train)
    index = SQ8Index(np.asarray([r[vec_col] for r in sample]))
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    ref = ray.put((index, q))

    def local_topk(batch: pa.Table) -> pa.Table:
        sq_idx, qv = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_arrays([pa.array([], pa.int64()), pa.array([], pa.float64())],
                                        names=[id_col, "sq8_score"])
        recon = sq_idx.reconstruct(sq_idx.encode(vec_matrix(batch.column(vec_col))))
        scores = round_half_away((recon * qv).sum(axis=1), 6)
        take = min(k, len(ids))
        sel = np.lexsort((ids, -scores))[:take]
        return pa.Table.from_arrays(
            [pa.array(ids[sel], pa.int64()), pa.array(scores[sel], pa.float64())],
            names=[id_col, "sq8_score"],
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
    return local.sort(["sq8_score", id_col], descending=[True, False]).limit(k)
