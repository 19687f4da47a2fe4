"""Deduplication operators: exact, prefix-fingerprint, MinHash+LSH, SimHash,
n-gram Jaccard verification, embedding-cosine near-dup.

Scale pattern (ray_guide / SURVEY.md §4): hash/signature computation is a
vectorized ``map_batches`` stage (stateless, shuffle-free); only the tiny
signature/bucket tables shuffle (``groupby`` on hash or band keys) — the
full document text never participates in an all-to-all exchange except as
pre-shrunk shingle-hash arrays needed for candidate verification.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdftext_ray.ops import round_half_away

# 31-bit Mersenne prime: a, b, x < p keeps a*x + b < 2^63, so the minhash
# permutations h_i(x) = (a_i·x + b_i) mod p run fully vectorized in uint64 —
# no object-dtype bigint fallback in the hot path.
_MERSENNE = (1 << 31) - 1


def _md5_hex(values: List[str]) -> List[str]:
    return [hashlib.md5(v.encode("utf-8")).hexdigest() for v in values]


def _text_hash_batch(batch: pa.Table, column: str) -> pa.Table:
    return batch.append_column("text_hash", pa.array(_md5_hex(batch.column(column).to_pylist()), pa.string()))


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact dedup: hash-partition on content hash, keep the smallest id.

    Output: (text_hash, keep_doc_id, dup_count). The shuffle carries only
    (text_hash, doc_id) pairs — pre-projected before the groupby.
    """
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: _text_hash_batch(b, text_col).select([id_col, "text_hash"]),
        batch_format="pyarrow",
    )
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="keep_doc_id"), Count(alias_name="dup_count")
    )


def prefix_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text", n_tokens: int = 50
) -> ray.data.Dataset:
    """Near-exact dedup on the first-N-token fingerprint (catches documents
    differing only in a tail/boilerplate suffix)."""
    from ray.data.aggregate import Count, Min

    def fp(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch.column(text_col))
        prefixes = [" ".join([t for t in row if t][:n_tokens]) for row in toks.to_pylist()]
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(_md5_hex(prefixes), pa.string())],
            names=[id_col, "prefix_hash"],
        )

    return ds.map_batches(fp, batch_format="pyarrow").groupby("prefix_hash").aggregate(
        Min(id_col, alias_name="keep_doc_id"), Count(alias_name="dup_count")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Deterministic 61-bit hashes of word n-gram shingles."""
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, gm in enumerate(grams):
        out[i] = int.from_bytes(hashlib.blake2b(gm.encode("utf-8"), digest_size=8).digest(), "big") % _MERSENNE
    return out


class MinHasher:
    """Actor-pool stage: seeded permutation parameters built once per actor
    (ST-style warm state), signatures vectorized per doc via numpy."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.ngram)
        if len(sh) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # h_i(x) = (a_i * x + b_i) mod p, vectorized (num_perm × n_shingles)
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return np.min(prod, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sigs, shingles = [], []
        for t in texts:
            sigs.append(self.signature(t).astype(np.int64).tolist())
            shingles.append(np.unique(_shingle_hashes(t, self.ngram)).astype(np.int64).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(ids),
                pa.array(sigs, pa.list_(pa.int64())),
                pa.array(shingles, pa.list_(pa.int64())),
            ],
            names=[self.id_col, "minhash", "shingles"],
        )


def _jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Set Jaccard over UNIQUE sorted shingle hashes (MinHasher stores
    np.unique output; mixing multiset lengths with unique intersections
    under-scores docs with repeated shingles — even identical docs)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: Optional[int] = None,
) -> ray.data.Dataset:
    """MinHash+LSH near-dup candidate generation + exact Jaccard verification.

    shingle→minhash (actor pool) → band explode (bucket keys ONLY — the
    shuffle carries (bucket, doc_id) pairs, never shingle arrays) →
    list-collecting aggregate per bucket → candidate pairs → exact Jaccard
    verification against a broadcast shingle store. Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b, deduped across bands.

    Scale note: the broadcast shingle store is O(corpus shingles) — right up
    to ~10⁷ docs per run; beyond that, shard this op by a corpus partition
    key and hash-join pairs back to shingles instead of broadcasting.
    """
    import ray as _ray
    from ray.data.aggregate import AggregateFn, Max

    rows = num_perm // bands
    kwargs = dict(batch_format="pyarrow", batch_size=1024)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    # signatures computed once, pinned (small table: ids + 64 ints + shingle
    # hashes per doc), consumed twice: store build + banding
    sigs = ds.map_batches(MinHasher(num_perm, ngram, 7, id_col, text_col), **kwargs).materialize()

    # broadcast the shingle store once (verification side data)
    shingle_map = {}
    for b in sigs.select_columns([id_col, "shingles"]).iter_batches(batch_format="pyarrow"):
        for did, sh in zip(b.column(id_col).to_pylist(), b.column("shingles").to_pylist()):
            shingle_map[did] = np.asarray(sh, dtype=np.int64)
    store_ref = _ray.put(shingle_map)

    # band explode, bucket keys only: (band-qualified hash, doc_id)
    def band_keys(batch: pa.Table) -> pa.Table:
        o_bucket, o_id = [], []
        for did, sig in zip(batch.column(id_col).to_pylist(), batch.column("minhash").to_pylist()):
            for b in range(bands):
                chunk = tuple(sig[b * rows:(b + 1) * rows])
                o_bucket.append(f"{b}:{hashlib.blake2b(repr(chunk).encode(), digest_size=8).hexdigest()}")
                o_id.append(did)
        return pa.table({"bucket": o_bucket, id_col: o_id})

    banded = sigs.map_batches(band_keys, batch_format="pyarrow")

    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_row=lambda acc, row: acc + [row[id_col]],
        name="docs",
    )
    buckets = banded.groupby("bucket").aggregate(collect)

    def emit_pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        store = _ray.get(store_ref)
        seen = set()
        for docs in batch.column("docs").to_pylist():
            if len(docs) < 2:
                continue
            docs = sorted(set(docs))
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    key = (docs[i], docs[j])
                    if key in seen:
                        continue
                    seen.add(key)
                    ja = _jaccard_sorted(store[docs[i]], store[docs[j]])
                    if ja >= threshold:
                        out_a.append(docs[i])
                        out_b.append(docs[j])
                        out_j.append(float(round_half_away(ja, 6)))
        return pa.table({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})

    pairs = buckets.map_batches(emit_pairs, batch_format="pyarrow", batch_size=8192)
    # a pair can surface from several bands/blocks — dedup on (doc_a, doc_b)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("jaccard", alias_name="jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """64-bit SimHash over token hashes; emitted as 4×16-bit chunk columns
    (the banding keys for Hamming-distance candidate search)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    hashes, chunks = [], [[], [], [], []]
    for t in texts:
        acc = np.zeros(64, dtype=np.int64)
        for tok in t.split():
            h = int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), 1, -1)
        sh = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        hashes.append(sh)
        for c in range(4):
            chunks[c].append((sh >> (16 * c)) & 0xFFFF)
    arrays = [pa.array(ids), pa.array([f"{h:016x}" for h in hashes], pa.string())]
    names = [id_col, "simhash"]
    for c in range(4):
        arrays.append(pa.array(chunks[c], pa.int32()))
        names.append(f"chunk{c}")
    return pa.Table.from_arrays(arrays, names=names)


def simhash_pairs(
    ds: ray.data.Dataset, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Near-dup pairs within Hamming distance ``max_hamming`` (≤ 3 guarantees
    at least one of the 4 16-bit chunks matches — pigeonhole banding)."""
    sigs = ds.map_batches(lambda b: simhash_batch(b, id_col, text_col), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        o_key, o_id, o_sim = [], [], []
        ids = batch.column(id_col).to_pylist()
        sims = batch.column("simhash").to_pylist()
        for c in range(4):
            vals = batch.column(f"chunk{c}").to_pylist()
            for did, sim, v in zip(ids, sims, vals):
                o_key.append(f"{c}:{v}")
                o_id.append(did)
                o_sim.append(sim)
        return pa.Table.from_arrays(
            [pa.array(o_key, pa.string()), pa.array(o_id), pa.array(o_sim, pa.string())],
            names=["bucket", id_col, "simhash"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = group.sort_values(id_col).reset_index(drop=True)
        out_a, out_b, out_h = [], [], []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if g[id_col][i] == g[id_col][j]:
                    continue
                d = bin(int(g["simhash"][i], 16) ^ int(g["simhash"][j], 16)).count("1")
                if d <= max_hamming:
                    out_a.append(g[id_col][i])
                    out_b.append(g[id_col][j])
                    out_h.append(d)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    pairs = sigs.map_batches(explode, batch_format="pyarrow").groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard similarity self-join (pairs ≥ threshold).

    Semantics mirror the SQL oracle exactly: tokens = \\S+ runs; grams only
    when the doc has ≥ n tokens; distinct gram sets; jaccard = |∩| / |∪|.
    The distinct-gram sets (small side data) are broadcast once via
    ``ray.put``; each batch compares its docs against all docs with id
    greater than its own, so every pair is emitted exactly once, no shuffle.
    """
    import re

    import ray as _ray

    tok_re = re.compile(r"\S+")

    def grams_of(text: str) -> frozenset:
        t = tok_re.findall(text)
        if len(t) < n:
            return frozenset()
        return frozenset(" ".join(t[i:i + n]) for i in range(len(t) - n + 1))

    full = ds.select_columns([id_col, text_col]).take_all()
    gram_map = {r[id_col]: grams_of(r[text_col]) for r in full}
    all_ids = sorted(gram_map)
    ref = _ray.put((all_ids, gram_map))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_b = batch.column(id_col).to_pylist()
        o_a, o_b, o_j = [], [], []
        a_ids, store = _ray.get(ref)
        for ida in ids_b:
            ga = store[ida]
            for idb in a_ids:
                if idb <= ida:
                    continue
                gb = store[idb]
                union = len(ga | gb)
                j = len(ga & gb) / max(union, 1)
                if j >= threshold:
                    o_a.append(ida)
                    o_b.append(idb)
                    o_j.append(float(round_half_away(j, 6)))
        return pa.table({"id_a": o_a, "id_b": o_b, "jaccard": o_j})

    return ds.select_columns([id_col]).map_batches(pairs, batch_format="pyarrow", batch_size=256)


def embedding_pairs_bruteforce(
    ds: ray.data.Dataset,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine similarity self-join: all pairs with cosine ≥ threshold.

    The full (id, unit-vector) matrix is broadcast ONCE via ``ray.put``
    (embeddings are the small side: n×d floats); each batch computes its rows
    against the broadcast matrix with one matmul and emits pairs where
    batch_id < other_id — every pair produced exactly once, no shuffle.
    O(n²/p) compute, O(n·d) memory per worker: the right plan up to ~10⁶
    vectors; beyond that use the LSH variant.
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).take_all()
    ids_all = np.asarray([r[id_col] for r in full], dtype=np.int64)
    mat_all = _unit_rows(np.asarray([r[vec_col] for r in full], dtype=np.float64))
    ref = ray.put((ids_all, mat_all))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_b = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids_b) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["id_a", "id_b", "cosine"],
            )
        vecs_b = _unit_rows(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64))
        ids_o, mat_o = ray.get(ref)
        sims = vecs_b @ mat_o.T
        bi, oj = np.nonzero((sims >= threshold) & (ids_b[:, None] < ids_o[None, :]))
        return pa.Table.from_arrays(
            [
                pa.array(ids_b[bi], pa.int64()),
                pa.array(ids_o[oj], pa.int64()),
                pa.array(round_half_away(sims[bi, oj], 4), pa.float64()),
            ],
            names=["id_a", "id_b", "cosine"],
        )

    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=2048)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    if mat.size == 0:
        return mat
    from pdftext_ray.ops.similarity import _unit

    return _unit(mat)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Near-dup pairs by embedding cosine ≥ threshold.

    Random-hyperplane LSH buckets (seeded, broadcast planes) → exact cosine
    verification within buckets. Multi-probe: each vector also lands in the
    buckets at Hamming distance 1, so near-identical vectors split across a
    plane boundary still meet (recall/cost knob: n_planes).
    """
    def bucketize(batch: pa.Table) -> pa.Table:
        rng = np.random.RandomState(seed)
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        planes = rng.standard_normal((vecs.shape[1] if vecs.size else 0, n_planes))
        ids = batch.column(id_col).to_pylist()
        if not ids:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.list_(pa.float64()))],
                names=["bucket", id_col, vec_col],
            )
        unit = _unit_rows(vecs)
        codes = (unit @ planes > 0).astype(np.uint32)
        base = (codes << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
        o_bucket, o_id, o_vec = [], [], []
        for i, (bkt, did) in enumerate(zip(base.tolist(), ids)):
            probes = [bkt] + [bkt ^ (1 << p) for p in range(n_planes)]
            for pr in probes:
                o_bucket.append(pr)
                o_id.append(did)
                o_vec.append(unit[i].tolist())
        return pa.Table.from_arrays(
            [pa.array(o_bucket, pa.int64()), pa.array(o_id), pa.array(o_vec, pa.list_(pa.float64()))],
            names=["bucket", id_col, vec_col],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = group.sort_values(id_col).drop_duplicates(id_col).reset_index(drop=True)
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        mat = np.asarray(g[vec_col].tolist(), dtype=np.float64)
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": g[id_col].values[ia[keep]],
                "id_b": g[id_col].values[ib[keep]],
                "cosine": round_half_away(sims[ia, ib][keep], 6),
            }
        )

    pairs = ds.map_batches(bucketize, batch_format="pyarrow").groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("cosine", alias_name="cosine"))
