"""Golden-parquet builders for the gate queries whose semantics are not
SQL-expressible (VERDICT r1 item 1: tables, dictionary, winnowing, SimHash,
media features).

Pattern (proven by the extraction oracles in corpus_io): an INDEPENDENT
implementation — plain Python loops, no Ray, no shared vectorized kernels —
writes a parquet file once; ``oracle_sql()`` reads it back with DuckDB. The
Ray pipeline and the golden builder then cross two execution paths end to
end.

* SimHash / winnowing goldens are scalar reimplementations of the operator
  math (``ops/textstats.py`` / ``ops/dedup.py`` use numpy + banding; these
  use per-character Python loops and O(n²) pair scans).
* The media golden re-derives the histogram features with nested Python
  loops (the numpy path uses ``np.histogram`` + fancy-indexed resize); only
  the codec boundary (seeded RandomState pixel synthesis) is shared, since
  it IS the deterministic stand-in codec.
* Tables / dictionary goldens run the single-document kernel oracle
  (pdftext/tables.py:59-109, pdftext/extraction.py:110-131 parity) per doc
  on the driver — same independence level as the extraction goldens.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def materialize_golden(path: str, builder) -> str:
    """Idempotent atomic golden writer: build+write only if absent."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(builder(), tmp)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# SimHash (independent scalar path for ops/dedup.simhash_pairs)
# ---------------------------------------------------------------------------

def simhash64_scalar(text: str) -> int:
    """64-bit SimHash, one bit at a time (mirrors dedup.simhash_batch
    semantics: blake2b-8 token hashes, +1/-1 bit votes, sign threshold)."""
    acc = [0] * 64
    for tok in text.split():
        h = int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")
        for j in range(64):
            acc[j] += 1 if (h >> j) & 1 else -1
    sh = 0
    for j in range(64):
        if acc[j] > 0:
            sh |= 1 << j
    return sh


def expected_simhash_pairs_table(doc_ids: List[int], texts: List[str], max_hamming: int = 3) -> pa.Table:
    """All-pairs Hamming scan (no banding): (doc_a, doc_b, hamming) with
    hamming ≤ max_hamming, doc_a < doc_b. The pigeonhole-banded pipeline
    must find exactly this set for max_hamming ≤ 3 (4 × 16-bit chunks)."""
    order = np.argsort(np.asarray(doc_ids))
    ids = [doc_ids[i] for i in order]
    sigs = [simhash64_scalar(texts[i]) for i in order]
    o_a, o_b, o_h = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(sigs[i] ^ sigs[j]).count("1")
            if d <= max_hamming:
                o_a.append(ids[i])
                o_b.append(ids[j])
                o_h.append(d)
    return pa.table({
        "doc_a": pa.array(o_a, pa.int64()),
        "doc_b": pa.array(o_b, pa.int64()),
        "hamming": pa.array(o_h, pa.int64()),
    })


# ---------------------------------------------------------------------------
# Winnowing (independent scalar path for ops/textstats.winnow_fingerprints)
# ---------------------------------------------------------------------------

def winnow_scalar(text: str, k: int = 5, window: int = 4) -> List[int]:
    """Schleimer winnowing, pure Python: Rabin-Karp k-gram hashes over UTF-8
    bytes, distinct window minima (textstats.winnow_fingerprints_batch
    semantics, reimplemented without numpy)."""
    data = text.encode("utf-8", "ignore")
    n = len(data)
    if n < k:
        return []
    M = (1 << 31) - 1
    B = 257
    powers = [pow(B, k - 1 - j, M) for j in range(k)]
    hashes = [sum(data[i + j] * powers[j] for j in range(k)) % M for i in range(n - k + 1)]
    if len(hashes) <= window:
        return [min(hashes)]
    sel = set()
    for i in range(len(hashes) - window + 1):
        sel.add(min(hashes[i:i + window]))
    return sorted(sel)


def expected_winnow_table(doc_ids: List[int], texts: List[str], k: int = 5, window: int = 4) -> pa.Table:
    """Exploded golden: one row per (doc_id, fingerprint)."""
    o_id, o_fp = [], []
    for did, t in zip(doc_ids, texts):
        for fp in winnow_scalar(t, k, window):
            o_id.append(did)
            o_fp.append(fp)
    return pa.table({
        "doc_id": pa.array(o_id, pa.int64()),
        "fingerprint": pa.array(o_fp, pa.int64()),
    })


# ---------------------------------------------------------------------------
# Media features (independent scalar path for ops/media.MediaFeaturizer)
# ---------------------------------------------------------------------------

def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    # The deterministic stand-in codec (ops/media.FakeCodec) — the one piece
    # shared by construction: it DEFINES the synthetic pixels.
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def expected_media_features_table(n: int, seed: int = 3, out_size: int = 32, frame_stride: int = 4) -> pa.Table:
    """Exploded golden: (media_ref, media_type, out_width, out_height,
    frames_sampled, feat_idx, feat_value). Histogram + resize re-derived
    with nested Python loops (the pipeline uses np.histogram + np.ix_)."""
    from pdftext_ray.ops.media import synth_media_table

    src = synth_media_table(n, seed)
    o_ref, o_type, o_fs, o_idx, o_val = [], [], [], [], []
    for row in src.to_pylist():
        nf = row["n_frames"]
        w, h = row["width"], row["height"]
        if row["media_type"] == "video":
            frame_ids = list(range(0, max(nf, 1), frame_stride))
        else:
            frame_ids = [0]
        int_acc = [0] * 48
        ys = [min(y * h // out_size, h - 1) for y in range(out_size)]
        xs = [min(x * w // out_size, w - 1) for x in range(out_size)]
        for fi in frame_ids:
            img = _fake_decode(row["payload"] + fi.to_bytes(4, "big"), w, h)
            for y in ys:
                for x in xs:
                    for c in range(3):
                        int_acc[c * 16 + int(img[y, x, c]) // 16] += 1
        acc = np.asarray(int_acc, dtype=np.float64)
        acc /= max(len(frame_ids), 1)
        feats = (acc / max(acc.sum(), 1e-9)).astype(np.float32)
        for i, v in enumerate(feats):
            o_ref.append(row["media_ref"])
            o_type.append(row["media_type"])
            o_fs.append(len(frame_ids))
            o_idx.append(i)
            o_val.append(float(v))
    k = len(o_ref)
    return pa.table({
        "media_ref": pa.array(o_ref, pa.string()),
        "media_type": pa.array(o_type, pa.string()),
        "out_width": pa.array([out_size] * k, pa.int32()),
        "out_height": pa.array([out_size] * k, pa.int32()),
        "frames_sampled": pa.array(o_fs, pa.int32()),
        "feat_idx": pa.array(o_idx, pa.int32()),
        "feat_value": pa.array(o_val, pa.float64()),
    })


def _scalar_feature(payload: bytes, mtype: str, w: int, h: int, nf: int,
                    out_size: int = 32, frame_stride: int = 4):
    """Scalar re-derivation of MediaFeaturizer for ONE media row — nested
    Python loops (the pipeline uses np.histogram + np.ix_). Returns
    (frames_sampled, 48 float32 feature values)."""
    if mtype == "video":
        frame_ids = list(range(0, max(nf, 1), frame_stride))
    else:
        frame_ids = [0]
    int_acc = [0] * 48
    ys = [min(y * h // out_size, h - 1) for y in range(out_size)]
    xs = [min(x * w // out_size, w - 1) for x in range(out_size)]
    for fi in frame_ids:
        img = _fake_decode(payload + fi.to_bytes(4, "big"), w, h)
        for y in ys:
            for x in xs:
                for c in range(3):
                    int_acc[c * 16 + int(img[y, x, c]) // 16] += 1
    acc = np.asarray(int_acc, dtype=np.float64)
    acc /= max(len(frame_ids), 1)
    return len(frame_ids), (acc / max(acc.sum(), 1e-9)).astype(np.float32)


def expected_interleaved_media_table(flat_path: str) -> pa.Table:
    """Golden for the composed interleaved pipeline: the expected_flat span
    golden's media refs, hydrated through the shared synthetic blob-store
    definition (ops/media.hydrate_ref_scalar) and featurized with the scalar
    loop above. Exploded to (doc_id, media_ref, media_type, frames_sampled,
    feat_idx, feat_value) rows for full-value comparison."""
    import pyarrow.parquet as _pq

    from pdftext_ray.ops.media import hydrate_ref_scalar

    flat = _pq.read_table(flat_path, columns=["doc_id", "kind", "media_ref"])
    o_doc, o_ref, o_type, o_fs, o_idx, o_val = [], [], [], [], [], []
    for doc_id, kind, ref in sorted(
        zip(flat.column("doc_id").to_pylist(), flat.column("kind").to_pylist(),
            flat.column("media_ref").to_pylist())
    ):
        if kind != "media":
            continue
        r = hydrate_ref_scalar(ref)
        fs, feats = _scalar_feature(
            r["payload"], r["media_type"], r["width"], r["height"], r["n_frames"]
        )
        for i, v in enumerate(feats):
            o_doc.append(doc_id)
            o_ref.append(ref)
            o_type.append(r["media_type"])
            o_fs.append(fs)
            o_idx.append(i)
            o_val.append(float(v))
    return pa.table({
        "doc_id": pa.array(o_doc, pa.string()),
        "media_ref": pa.array(o_ref, pa.string()),
        "media_type": pa.array(o_type, pa.string()),
        "frames_sampled": pa.array(o_fs, pa.int32()),
        "feat_idx": pa.array(o_idx, pa.int32()),
        "feat_value": pa.array(o_val, pa.float64()),
    })


# ---------------------------------------------------------------------------
# Table-cell extraction golden (T1/T2, single-doc kernel oracle)
# ---------------------------------------------------------------------------

def flatten_table_rows(doc_id: str, page: int, table_idx: int, cells: List[dict]) -> dict:
    """Shared flat shaping for one (doc, page, table) row — used by BOTH the
    Ray query's map_batches flattener and the golden builder so the compared
    columns are constructed identically from each side's cell structs."""
    return {
        "doc_id": doc_id,
        "page": page,
        "table_idx": table_idx,
        "n_cells": len(cells),
        "cell_texts": ";".join(c["text"] for c in cells),
        "cell_boxes": ";".join(",".join(f"{v:.3f}" for v in c["bbox"]) for c in cells),
    }


_TABLE_FLAT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page", pa.int32()),
    ("table_idx", pa.int32()),
    ("n_cells", pa.int32()),
    ("cell_texts", pa.string()),
    ("cell_boxes", pa.string()),
])


def expected_tables_flat_table(n_docs: int, seed: int = 42, profile: str = "mixed") -> pa.Table:
    """Golden flat table-cell rows via the single-doc oracle (no Ray):
    decode → cluster → table_output per document (pdftext/extraction.py:
    134-155, tables.py:59-109 parity)."""
    from pdftext_ray.corpus import generate_document
    from pdftext_ray.kernel.document import ExtractConfig, process_document, table_output

    cfg = ExtractConfig(keep_chars=True)
    rows = {name: [] for name in _TABLE_FLAT_SCHEMA.names}
    for i in range(n_docs):
        doc = generate_document(i, seed, profile)
        payloads = [s["text"] for s in doc["spans"] if s["kind"] == "text"]
        pages = process_document(payloads, cfg)
        for page, tables in zip(pages, table_output(pages)):
            for t_idx, cells in enumerate(tables):
                flat = flatten_table_rows(doc["doc_id"], page["page"], t_idx, cells)
                for name in rows:
                    rows[name].append(flat[name])
    return pa.table({n: pa.array(rows[n], _TABLE_FLAT_SCHEMA.field(n).type) for n in _TABLE_FLAT_SCHEMA.names})


# ---------------------------------------------------------------------------
# Dictionary-output golden (M9, full nested shape flattened to span rows)
# ---------------------------------------------------------------------------

_DICT_FLAT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page", pa.int32()),
    ("page_width", pa.int32()),
    ("page_height", pa.int32()),
    ("page_rotation", pa.int32()),
    ("n_refs", pa.int32()),
    ("refs", pa.string()),
    ("block", pa.int32()),
    ("line", pa.int32()),
    ("span", pa.int32()),
    ("text", pa.string()),
    ("x0", pa.float64()),
    ("y0", pa.float64()),
    ("x1", pa.float64()),
    ("y1", pa.float64()),
    ("font_name", pa.string()),
    ("font_flags", pa.int32()),
    ("font_size", pa.float64()),
    ("font_weight", pa.float64()),
    ("char_start_idx", pa.int32()),
    ("char_end_idx", pa.int32()),
    ("span_rotation", pa.float64()),
    ("url", pa.string()),
    ("superscript", pa.bool_()),
    ("subscript", pa.bool_()),
])


def flatten_dictionary_rows(doc_id: str, pages: List[dict], rows: dict) -> None:
    """Append one flat row per span of a doc's dictionary output (covers the
    FULL nested shape: page dims/rotation, refs, block/line/span nesting,
    bboxes, font structs, char offsets, scripts, urls). Shared by the Ray
    query flattener and the golden builder — upstream of this shaping the
    two sides run entirely different paths (distributed nested-Arrow
    round-trip vs driver-side kernel oracle)."""
    for pg in pages:
        refs = ";".join(
            f"{r['idx']}:{r['page']}:{r['coord'][0]:.3f},{r['coord'][1]:.3f}" for r in pg["refs"]
        )
        for bi, blk in enumerate(pg["blocks"]):
            for li, line in enumerate(blk["lines"]):
                for si, span in enumerate(line["spans"]):
                    bbox = span["bbox"]
                    font = span["font"]
                    rows["doc_id"].append(doc_id)
                    rows["page"].append(pg["page"])
                    rows["page_width"].append(pg["width"])
                    rows["page_height"].append(pg["height"])
                    rows["page_rotation"].append(pg["rotation"])
                    rows["n_refs"].append(len(pg["refs"]))
                    rows["refs"].append(refs)
                    rows["block"].append(bi)
                    rows["line"].append(li)
                    rows["span"].append(si)
                    rows["text"].append(span["text"])
                    rows["x0"].append(bbox[0])
                    rows["y0"].append(bbox[1])
                    rows["x1"].append(bbox[2])
                    rows["y1"].append(bbox[3])
                    rows["font_name"].append(font["name"])
                    rows["font_flags"].append(font["flags"])
                    rows["font_size"].append(font["size"])
                    rows["font_weight"].append(font["weight"])
                    rows["char_start_idx"].append(span["char_start_idx"])
                    rows["char_end_idx"].append(span["char_end_idx"])
                    rows["span_rotation"].append(span["rotation"])
                    rows["url"].append(span["url"])
                    rows["superscript"].append(span["superscript"])
                    rows["subscript"].append(span["subscript"])


def dict_flat_rows_to_table(rows: dict) -> pa.Table:
    return pa.table({n: pa.array(rows[n], _DICT_FLAT_SCHEMA.field(n).type) for n in _DICT_FLAT_SCHEMA.names})


def new_dict_flat_rows() -> dict:
    return {name: [] for name in _DICT_FLAT_SCHEMA.names}


def expected_dictionary_flat_table(n_docs: int, seed: int = 42, profile: str = "mixed") -> pa.Table:
    """Golden span-level dictionary rows via the single-doc oracle (no Ray)."""
    from pdftext_ray.corpus import generate_document
    from pdftext_ray.kernel.document import ExtractConfig, process_document, shape_dictionary

    cfg = ExtractConfig()
    rows = new_dict_flat_rows()
    for i in range(n_docs):
        doc = generate_document(i, seed, profile)
        payloads = [s["text"] for s in doc["spans"] if s["kind"] == "text"]
        flatten_dictionary_rows(doc["doc_id"], shape_dictionary(process_document(payloads, cfg), cfg), rows)
    return dict_flat_rows_to_table(rows)


# ---------------------------------------------------------------------------
# K-means (independent scalar path for ops/cluster.kmeans_assign)
# ---------------------------------------------------------------------------

def expected_kmeans_table(
    ids: List[int], vecs: np.ndarray, k: int = 8, iters: int = 5
) -> pa.Table:
    """Golden Lloyd k-means — single-machine, per-cluster mask loops and
    broadcast distance tensors (the Ray op uses the expanded-dot form with
    per-block partial sums). Shares only the determinism CONTRACT with the
    op: init = k lowest-id vectors, centroids rounded half-away to 6
    decimals after every update, empty clusters keep their centroid, dist =
    direct euclidean norm rounded to 6."""
    from pdftext_ray.ops import round_half_away

    ids = np.asarray(ids, dtype=np.int64)
    vecs = np.asarray(vecs, dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    cents = round_half_away(vecs[:k].copy(), 6)
    for _ in range(iters):
        diff = vecs[:, None, :] - cents[None, :, :]
        assign = np.argmin((diff * diff).sum(-1), axis=1)
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = round_half_away(cents, 6)
    diff = vecs[:, None, :] - cents[None, :, :]
    assign = np.argmin((diff * diff).sum(-1), axis=1)
    dist = round_half_away(np.sqrt(((vecs - cents[assign]) ** 2).sum(-1)), 6)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster": pa.array(assign.astype(np.int64), pa.int64()),
        "dist": pa.array(dist, pa.float64()),
    })


# ---------------------------------------------------------------------------
# HyperLogLog (independent scalar path for ops/stats.approx_distinct)
# ---------------------------------------------------------------------------

def _splitmix64_scalar(x: int) -> int:
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def expected_hll_table(values, p: int = 10) -> pa.Table:
    """Golden HLL estimate — per-value Python loop, ``int.bit_length`` for
    the leading-zero run and a sequential register sum (the op uses
    vectorized shift-cascade clz and np.maximum.at). Shares only the
    splitmix64/blake2b hash boundary and the published estimator formula."""
    import math

    m = 1 << p
    reg = [0] * m
    for v in values:
        if isinstance(v, (int, np.integer)):
            h = _splitmix64_scalar(int(np.uint64(v)))
        else:
            h = int.from_bytes(
                hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "big"
            )
        idx = h >> (64 - p)
        w = (h << p) & ((1 << 64) - 1)
        rho = min(64 - w.bit_length(), 64 - p) + 1
        if rho > reg[idx]:
            reg[idx] = rho
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = 0.0
    for r in reg:
        s += 2.0 ** -r
    est = alpha * m * m / s
    zeros = reg.count(0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    from pdftext_ray.ops import round_half_away

    return pa.table({"approx_n": pa.array([float(round_half_away(est, 3))], pa.float64())})


def expected_cms_table(values, threshold: int, depth: int = 4, width: int = 2048) -> pa.Table:
    """Golden count-min heavy hitters — sequential dict-free scalar loop
    (the op uses vectorized np.add.at matrices and a broadcast probe pass).
    Shares the splitmix64/blake2b hash boundary by design."""
    M = (1 << 64) - 1

    def base_hash(v):
        if isinstance(v, (int, np.integer)):
            return _splitmix64_scalar(int(np.uint64(v)))
        return int.from_bytes(
            hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "big"
        )

    mat = [[0] * width for _ in range(depth)]
    for v in values:
        h = base_hash(v)
        for j in range(depth):
            mat[j][_splitmix64_scalar((h + j * 0x9E3779B9) & M) % width] += 1
    out = {}
    for v in values:
        if v in out:
            continue
        h = base_hash(v)
        est = min(
            mat[j][_splitmix64_scalar((h + j * 0x9E3779B9) & M) % width]
            for j in range(depth)
        )
        if est >= threshold:
            out[v] = est
    keys = sorted(out)
    vtype = pa.int64() if keys and isinstance(keys[0], (int, np.integer)) else pa.string()
    return pa.table({
        "value": pa.array(keys, vtype),
        "est_count": pa.array([out[k] for k in keys], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Product quantization (independent scalar path for ops/similarity.pq_topk)
# ---------------------------------------------------------------------------

def expected_pq_table(
    ids: List[int],
    vecs: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    m: int = 16,
    ksub: int = 16,
    iters: int = 8,
    max_train: int = 100_000,
) -> pa.Table:
    """Golden PQ top-k — scalar per-row/per-centroid loops throughout (the
    Ray op trains and encodes with broadcast tensors). Shares only the
    determinism CONTRACT with ops/similarity.PQIndex: id-sorted unit-
    normalized training rows, per-subspace init = first ksub sub-vectors,
    centroids rounded half-away to 6 after every update, empty clusters
    keep their centroid, encode = first-minimum argmin, adc_dist rounded
    to 6, output ordered by (adc_dist, vec_id) limit k."""
    from pdftext_ray.ops import round_half_away

    ids = np.asarray(ids, dtype=np.int64)
    vecs = np.asarray(vecs, dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    unit = np.empty_like(vecs)
    for i in range(len(vecs)):
        unit[i] = vecs[i] / max(float(np.linalg.norm(vecs[i])), 1e-12)
    d = unit.shape[1]
    dsub = d // m

    # mirror pq_topk's driver-memory guard: codebooks train on the id-sorted
    # PREFIX capped at max_train rows (ops/similarity._deterministic_sample
    # with sample_fraction=1.0); the scan below still covers ALL rows. On
    # any corpus beyond max_train embeddings the two sides would otherwise
    # train on different sets and diverge (ADVICE r2).
    train = unit[:max_train]
    codebooks = []
    for s in range(m):
        sub = train[:, s * dsub : (s + 1) * dsub]
        cents = [round_half_away(sub[c].copy(), 6) for c in range(ksub)]
        for _ in range(iters):
            assign = []
            for row in sub:
                best, best_d = 0, float("inf")
                for c in range(ksub):
                    dd = float(((row - cents[c]) ** 2).sum())
                    if dd < best_d:
                        best, best_d = c, dd
                assign.append(best)
            for c in range(ksub):
                members = [sub[i] for i, a in enumerate(assign) if a == c]
                if members:
                    cents[c] = round_half_away(np.mean(members, axis=0), 6)
                else:
                    cents[c] = round_half_away(cents[c], 6)
        codebooks.append(cents)

    q = np.asarray(query, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    rows = []
    for i in range(len(ids)):
        total = 0.0
        for s in range(m):
            sub = unit[i, s * dsub : (s + 1) * dsub]
            best, best_d = 0, float("inf")
            for c in range(ksub):
                dd = float(((sub - codebooks[s][c]) ** 2).sum())
                if dd < best_d:
                    best, best_d = c, dd
            qs = q[s * dsub : (s + 1) * dsub]
            total += float(((qs - codebooks[s][best]) ** 2).sum())
        rows.append((int(ids[i]), float(round_half_away(total, 6))))
    rows.sort(key=lambda r: (r[1], r[0]))
    rows = rows[:k]
    return pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "adc_dist": pa.array([r[1] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Scalar quantization (independent scalar path for ops/similarity.sq8_topk)
# ---------------------------------------------------------------------------

def expected_sq8_table(
    ids: List[int],
    vecs: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    max_train: int = 100_000,
) -> pa.Table:
    """Golden SQ8 top-k — per-row/per-dim scalar control flow (the Ray op
    trains and encodes with broadcast tensors). Shares only the determinism
    CONTRACT with ops/similarity.SQ8Index: id-sorted unit-normalized
    training prefix capped at max_train, per-dim [min, max], code =
    clip(floor(t·255 + 0.5), 0, 255), zero-span dims code 0 / reconstruct
    to vmin, score = Σ(recon·q) by numpy pairwise sum rounded half-away to
    6, output ordered by (score desc, vec_id asc) limit k."""
    from pdftext_ray.ops import round_half_away

    ids = np.asarray(ids, dtype=np.int64)
    vecs = np.asarray(vecs, dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    unit = np.empty_like(vecs)
    for i in range(len(vecs)):
        unit[i] = vecs[i] / max(float(np.linalg.norm(vecs[i])), 1e-12)
    d = unit.shape[1]

    train = unit[:max_train]
    vmin = np.empty(d)
    span = np.empty(d)
    for j in range(d):
        col = train[:, j]
        vmin[j] = float(col.min())
        span[j] = float(col.max()) - vmin[j]

    q = np.asarray(query, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    rows = []
    for i in range(len(ids)):
        recon = np.empty(d)
        for j in range(d):
            if span[j] == 0.0:
                recon[j] = vmin[j]
                continue
            t = (unit[i, j] - vmin[j]) / span[j] * 255.0
            code = min(max(float(np.floor(t + 0.5)), 0.0), 255.0)
            recon[j] = vmin[j] + code * (span[j] / 255.0)
        score = float(round_half_away((recon * q).sum(), 6))
        rows.append((int(ids[i]), score))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "sq8_score": pa.array([r[1] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Fixed-point PageRank (independent scalar path for ops/graph.pagerank)
# ---------------------------------------------------------------------------

def expected_pagerank_table(
    edges,
    n_iter: int = 8,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> pa.Table:
    """Golden PageRank — pure-dict scalar control flow (the Ray op runs
    numpy over broadcast vectors). Shares only the fixed-point CONTRACT
    with ops/graph.pagerank: distinct edges; contrib = rank // outdeg;
    exact int sums; dangling share = D // N; rank' = (100-d)*scale //
    (100*N) + d*(S + dd) // 100; output (node, rank_fp, rank=rank_fp/scale
    rounded half-away to 10) sorted by node."""
    from pdftext_ray.ops import round_half_away

    edge_set = sorted({(int(s), int(d)) for s, d in edges})
    nodes = sorted({s for s, _ in edge_set} | {d for _, d in edge_set})
    n = len(nodes)
    if n == 0:
        return pa.table({
            "node": pa.array([], pa.int64()),
            "rank_fp": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64()),
        })
    outdeg: dict = {}
    for s, _ in edge_set:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = (100 - damping_pct) * scale // (100 * n)
    for _ in range(n_iter):
        sums = {v: 0 for v in nodes}
        for s, d in edge_set:
            sums[d] += rank[s] // outdeg[s]
        dangling = sum(rank[v] for v in nodes if v not in outdeg)
        dd = dangling // n
        rank = {v: base + damping_pct * (sums[v] + dd) // 100 for v in nodes}
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "rank_fp": pa.array([rank[v] for v in nodes], pa.int64()),
        "rank": pa.array(
            [float(round_half_away(rank[v] / scale, 10)) for v in nodes], pa.float64()
        ),
    })


# ---------------------------------------------------------------------------
# Unigram LM perplexity (independent scalar path for ops/textstats.lm_perplexity)
# ---------------------------------------------------------------------------

def expected_lm_table(doc_ids, texts) -> pa.Table:
    """Golden unigram-LM bits-per-token — single-pass scalar control flow
    (the Ray op trains via a distributed keyed merge and scores with a
    broadcast dict). Shares only the model CONTRACT: \\S+ lowercased
    tokens; p(w) = (c+1)/(T+V+1), OOV p = 1/(T+V+1); per-token cost
    L = round(-log2(p)*1e6) int64 via scalar math.log2; score =
    sum(L)/(1e6*n) rounded half-away to 6, empty docs 0.0."""
    import math
    import re
    from collections import Counter

    from pdftext_ray.ops import round_half_away

    find = re.compile(r"\S+").findall
    tok_lists = [find(t.lower()) if t else [] for t in texts]
    counts = Counter(w for toks in tok_lists for w in toks)
    total = sum(counts.values())
    denom = total + len(counts) + 1
    costs = {
        w: int(round_half_away(-math.log2((c + 1) / denom) * 1e6, 0))
        for w, c in counts.items()
    }
    oov = int(round_half_away(-math.log2(1 / denom) * 1e6, 0)) if denom > 1 else 0
    n_tokens = []
    bits = []
    for toks in tok_lists:
        if not toks:
            n_tokens.append(0)
            bits.append(0.0)
            continue
        s = sum(costs.get(w, oov) for w in toks)
        n_tokens.append(len(toks))
        bits.append(float(round_half_away(s / (1e6 * len(toks)), 6)))
    return pa.table({
        "doc_id": pa.array([int(d) for d in doc_ids], pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "bits_per_token": pa.array(bits, pa.float64()),
    })


# ---------------------------------------------------------------------------
# PMI collocations (independent scalar path for ops/textstats.pmi_collocations)
# ---------------------------------------------------------------------------

def expected_pmi_table(texts, min_count: int = 5, k: int = 50) -> pa.Table:
    """Golden PMI top-k — single-pass Counter control flow. Shares only the
    CONTRACT with ops/textstats.pmi_collocations: lowercased \\S+ tokens;
    pmi_fp = round((log2(c_ab) + 2*log2(T1) - log2(c_a) - log2(c_b) -
    log2(T2)) * 1e6) with scalar math.log2 in exactly that term order;
    qualifying bigrams count >= min_count; order (pmi_fp desc, gram asc)
    limit k; pmi = pmi_fp / 1e6 (plain IEEE division, no rounding)."""
    import math
    import re
    from collections import Counter

    from pdftext_ray.ops import round_half_away

    find = re.compile(r"\S+").findall
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = find(t.lower()) if t else []
        uni.update(toks)
        for j in range(len(toks) - 1):
            bi[toks[j] + " " + toks[j + 1]] += 1
    t1 = sum(uni.values())
    t2 = sum(bi.values())
    rows = []
    for g, c_ab in bi.items():
        if c_ab < min_count:
            continue
        a, b = g.split(" ", 1)
        val = (
            math.log2(c_ab) + 2 * math.log2(t1)
            - math.log2(uni[a]) - math.log2(uni[b]) - math.log2(t2)
        )
        rows.append((g, int(c_ab), int(round_half_away(val * 1e6, 0))))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:k]
    return pa.table({
        "gram": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "pmi": pa.array([r[2] / 1e6 for r in rows], pa.float64()),
    })


def expected_grouped_hll_table(groups, values, p: int = 10) -> pa.Table:
    """Golden per-group HLL — partitions the values scalar-side and reuses
    expected_hll_table's per-value register loop per group (merge-free:
    the golden never splits a group, which is exactly what the op's
    commutative register max must be equivalent to). Sorted by group."""
    by_group: dict = {}
    for g, v in zip(groups, values):
        by_group.setdefault(g, []).append(v)
    keys = sorted(by_group)
    ests = [
        expected_hll_table(by_group[g], p=p).column("approx_n")[0].as_py() for g in keys
    ]
    return pa.table({
        "event_type": pa.array([str(k) for k in keys], pa.string()),
        "approx_n": pa.array(ests, pa.float64()),
    })


def expected_resize_table(n: int, seed: int = 11, out_w: int = 16, out_h: int = 12) -> pa.Table:
    """Golden PPM resize — per-pixel scalar loops and a hand-rolled header
    parse (the Ray op uses PpmCodec + np.ix_ gather). Shares the input
    synthesis (the table under test) and the index-map CONTRACT
    src = dst*src_dim // dst_dim only."""
    import hashlib

    from pdftext_ray.ops.media import synth_ppm_table

    t = synth_ppm_table(n, seed=seed)
    refs = t.column("media_ref").to_pylist()
    payloads = t.column("payload").to_pylist()
    sums, shas, outs = [], [], []
    for payload in payloads:
        # encode_ppm writes exactly: b"P6\n<w> <h>\n255\n" + raster
        header_end = payload.index(b"\n255\n") + len(b"\n255\n")
        dims = payload[3 : payload.index(b"\n255\n")].split()
        w, h = int(dims[0]), int(dims[1])
        raster = payload[header_end:]
        resized = bytearray()
        total = 0
        for y in range(out_h):
            sy = y * h // out_h
            for x in range(out_w):
                sx = x * w // out_w
                off = (sy * w + sx) * 3
                px = raster[off : off + 3]
                resized += px
                total += px[0] + px[1] + px[2]
        enc = b"P6\n%d %d\n255\n" % (out_w, out_h) + bytes(resized)
        outs.append(enc)
        sums.append(total)
        shas.append(hashlib.sha256(enc).hexdigest())
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "out_width": pa.array([out_w] * n, pa.int32()),
        "out_height": pa.array([out_h] * n, pa.int32()),
        "pixel_sum": pa.array(sums, pa.int64()),
        "payload_sha": pa.array(shas, pa.string()),
    })


def expected_pca_table(vecs: np.ndarray, scale: int = 10**6, n_iter: int = 30) -> pa.Table:
    """Golden top-PC — single-block exact integer moments (int addition is
    associative, so one-block totals equal the op's distributed combine
    bit-for-bit) + the same pinned power-iteration formulas written
    independently. Shares the CONTRACT: round(x*scale) int64 quantization;
    C = n*Sxx - Sx*Sx^T in exact ints, ONE float conversion; all-ones
    start, n_iter fixed, norm-normalized, sign pinned to first nonzero
    positive; weight/eigenvalue rounded half-away to 6 (eigenvalue in
    original units: /(n^2 * scale^2))."""
    from pdftext_ray.ops import round_half_away

    x = np.asarray(vecs, dtype=np.float64)
    xi = np.asarray(round_half_away(x * scale, 0), dtype=np.int64)
    n, d = xi.shape
    s = [int(t) for t in xi.sum(axis=0)]
    ss = xi.T @ xi
    c = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(d):
            c[i, j] = float(n * int(ss[i, j]) - s[i] * s[j])
    v = np.ones(d, dtype=np.float64)
    v /= np.linalg.norm(v)
    for _ in range(n_iter):
        v = c @ v
        v /= np.linalg.norm(v)
    nz = np.flatnonzero(np.abs(v) > 1e-12)
    if len(nz) and v[nz[0]] < 0:
        v = -v
    eig = float(v @ (c @ v))
    return pa.table({
        "dim_idx": pa.array(list(range(d)), pa.int64()),
        "weight": pa.array([float(round_half_away(t, 6)) for t in v], pa.float64()),
        "eigenvalue": pa.array(
            [float(round_half_away(eig / (float(n) ** 2 * scale * scale), 6))] * d, pa.float64()
        ),
        "n_rows": pa.array([n] * d, pa.int64()),
    })


def expected_describe_table(table: pa.Table, columns=None, p: int = 10) -> pa.Table:
    """Golden table profile — whole-column scalar control flow (the op
    merges per-block mergeable partials). Shares the contracts: Python
    str() stringification of raw min/max, the splitmix64/blake2b HLL
    boundary (via expected_hll_table), round-half-away-3 estimates.
    ``columns`` pins the profiled list to the query's (golden and op must
    enumerate the SAME columns, not coincide via the file schema)."""
    rows = []
    for c in (list(columns) if columns is not None else table.column_names):
        col = table.column(c)
        vals = [v for v in col.to_pylist() if v is not None]
        est = expected_hll_table(vals, p=p).column("approx_n")[0].as_py()
        rows.append((
            c, str(col.type), len(col), len(col) - len(vals),
            str(min(vals)) if vals else None,
            str(max(vals)) if vals else None,
            float(est),
        ))
    return pa.table({
        "column": pa.array([r[0] for r in rows], pa.string()),
        "dtype": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
        "n_null": pa.array([r[3] for r in rows], pa.int64()),
        "min_str": pa.array([r[4] for r in rows], pa.string()),
        "max_str": pa.array([r[5] for r in rows], pa.string()),
        "approx_distinct": pa.array([r[6] for r in rows], pa.float64()),
    })


def expected_bpe_table(texts, n_merges: int = 30) -> pa.Table:
    """Golden BPE merge list — Counter-based scalar control flow (the op
    counts words through a distributed keyed merge and mutates tuple
    sequences). Shares only the SPEC: lowercased \\S+ words as char
    symbols; per round max-count pair, ties to lexicographically smallest
    (left, right); left-to-right non-overlapping application; stop when
    the best pair count < 2."""
    import re
    from collections import Counter

    find = re.compile(r"\S+").findall
    wc = Counter(w for t in texts for w in (find(t.lower()) if t else []))
    symbols = {w: list(w) for w in wc}
    rows = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in wc.items():
            s = symbols[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best_cnt = max(pairs.values())
        if best_cnt < 2:
            break
        left, right = min(p for p, c in pairs.items() if c == best_cnt)
        for w in symbols:
            s = symbols[w]
            j = 0
            ns = []
            while j < len(s):
                if j + 1 < len(s) and s[j] == left and s[j + 1] == right:
                    ns.append(left + right)
                    j += 2
                else:
                    ns.append(s[j])
                    j += 1
            symbols[w] = ns
        rows.append((rank, left, right, left + right, best_cnt))
    return pa.table({
        "rank": pa.array([r[0] for r in rows], pa.int64()),
        "left": pa.array([r[1] for r in rows], pa.string()),
        "right": pa.array([r[2] for r in rows], pa.string()),
        "merged": pa.array([r[3] for r in rows], pa.string()),
        "count": pa.array([r[4] for r in rows], pa.int64()),
    })


def expected_audio_table(n: int, seed: int = 13, window: int = 256, hop: int = 128) -> pa.Table:
    """Golden framed RMS — hand-rolled RIFF parse + per-sample scalar loops
    (the Ray op uses WavCodec + numpy frame slices). Shares the input
    synthesis and the exactness contract: integer energy sums, one int/int
    division, math.sqrt (IEEE correctly-rounded), round half-away to 6."""
    import math
    import struct

    from pdftext_ray.ops import round_half_away
    from pdftext_ray.ops.media import synth_wav_table

    t = synth_wav_table(n, seed=seed)
    refs_out, idx_out, rms_out = [], [], []
    for ref, payload in zip(
        t.column("media_ref").to_pylist(), t.column("payload").to_pylist()
    ):
        # independent parse: trust the writer's fixed 44-byte header layout
        assert payload[:4] == b"RIFF" and payload[36:40] == b"data"
        n_bytes = struct.unpack("<I", payload[40:44])[0]
        samples = [
            struct.unpack("<h", payload[44 + 2 * i : 46 + 2 * i])[0]
            for i in range(n_bytes // 2)
        ]
        fi = 0
        start = 0
        last_start = max(len(samples) - window, 0)
        while start <= last_start:
            frame = samples[start : start + window]
            if not frame:
                break
            e = 0
            for v in frame:
                e += v * v
            rms_out.append(float(round_half_away(math.sqrt(e / len(frame)), 6)))
            refs_out.append(ref)
            idx_out.append(fi)
            fi += 1
            start += hop
        # (matches the op's range(0, max(len-window+1, 1), hop) frame walk)
    return pa.table({
        "media_ref": pa.array(refs_out, pa.string()),
        "frame_idx": pa.array(idx_out, pa.int64()),
        "rms": pa.array(rms_out, pa.float64()),
    })


def expected_video_table(n: int, seed: int = 17, stride: int = 2) -> pa.Table:
    """Golden PPMV frame stats — hand-rolled container walk + per-pixel
    scalar sums (the op seeks with PpmvCodec + numpy channel sums). Shares
    the input synthesis and the exactness contract: integer pixel sums,
    one int/int division per channel, round half-away 6."""
    import struct

    from pdftext_ray.ops import round_half_away
    from pdftext_ray.ops.media import synth_ppmv_table

    t = synth_ppmv_table(n, seed=seed)
    refs_out, idx_out = [], []
    chans = ([], [], [])
    for ref, payload in zip(
        t.column("media_ref").to_pylist(), t.column("payload").to_pylist()
    ):
        assert payload[:4] == b"PPMV"
        nf = struct.unpack("<I", payload[4:8])[0]
        pos = 8
        frames = []
        for _ in range(nf):
            size = struct.unpack("<I", payload[pos : pos + 4])[0]
            frames.append(payload[pos + 4 : pos + 4 + size])
            pos += 4 + size
        for fi in range(0, nf, stride):
            blob = frames[fi]
            # encode_ppm layout: b"P6\n<w> <h>\n255\n" + raster
            hdr_end = blob.index(b"\n255\n") + 5
            w, h = (int(x) for x in blob[3 : blob.index(b"\n255\n")].split())
            raster = blob[hdr_end:]
            sums = [0, 0, 0]
            for px in range(w * h):
                for c in range(3):
                    sums[c] += raster[px * 3 + c]
            refs_out.append(ref)
            idx_out.append(fi)
            for c in range(3):
                chans[c].append(float(round_half_away(sums[c] / (w * h), 6)))
    return pa.table({
        "media_ref": pa.array(refs_out, pa.string()),
        "frame_idx": pa.array(idx_out, pa.int64()),
        "mean_r": pa.array(chans[0], pa.float64()),
        "mean_g": pa.array(chans[1], pa.float64()),
        "mean_b": pa.array(chans[2], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Incremental MinHash (independent scalar path for
# ops/dedup.incremental_minhash_dedup over the even/odd gate split)
# ---------------------------------------------------------------------------

def expected_incremental_minhash_table(
    doc_ids: List[int],
    texts: List[str],
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.5,
    seed: int = 7,
) -> pa.Table:
    """Scalar reference for the incremental near-dup verdicts: even ids are
    the persisted baseline, odd ids the increment. Signature formula,
    identical-signature collapse, band buckets, the signature-agreement
    estimator and the per-doc argmax are all re-derived with plain Python
    loops and dicts (the pipeline uses numpy + keyed shuffles). The seeded
    RandomState permutation draw is shared — it IS the deterministic
    parameter set, like the media codec boundary."""
    M = (1 << 31) - 1
    rng = np.random.RandomState(seed)
    A = [int(x) for x in rng.randint(1, M, size=num_perm, dtype=np.uint64)]
    B = [int(x) for x in rng.randint(0, M, size=num_perm, dtype=np.uint64)]
    rows = num_perm // bands

    def sig_of(text: str):
        toks = text.split()
        if len(toks) < ngram:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i:i + ngram]) for i in range(len(toks) - ngram + 1)]
        if not grams:
            return tuple([M] * num_perm)
        hs = [
            int.from_bytes(hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "big") % M
            for g in grams
        ]
        return tuple(min((a * x + b) % M for x in hs) for a, b in zip(A, B))

    base = [(i, sig_of(t)) for i, t in zip(doc_ids, texts) if i % 2 == 0]
    newd = [(i, sig_of(t)) for i, t in zip(doc_ids, texts) if i % 2 == 1]

    groups: dict = {}
    for i, s in base:
        groups.setdefault(s, []).append((0, i))
    for i, s in newd:
        groups.setdefault(s, []).append((1, i))

    best: dict = {}
    reps = []
    for s, members in groups.items():
        members.sort()
        _, head = members[0]
        for isn, i in members:
            if isn == 1 and i != head:
                best[i] = (1.0, head)
        reps.append((head, s, members[0][0]))

    buckets: dict = {}
    for rid, s, isn in reps:
        for b in range(bands):
            chunk = tuple(int(x) for x in s[b * rows:(b + 1) * rows])
            d = hashlib.blake2b(repr((b, chunk)).encode(), digest_size=8).digest()
            buckets.setdefault(int.from_bytes(d, "big") >> 1, []).append((rid, s, isn))

    seen = set()
    for members in buckets.values():
        for nid, ns, nisn in members:
            if nisn != 1:
                continue
            for mid, ms, misn in members:
                if not (misn == 0 or (misn == 1 and mid < nid)):
                    continue
                if (nid, mid) in seen:
                    continue
                seen.add((nid, mid))
                est = sum(1 for x, y in zip(ns, ms) if x == y) / num_perm
                if est >= threshold:
                    cur = best.get(nid)
                    if cur is None or est > cur[0] or (est == cur[0] and mid < cur[1]):
                        best[nid] = (est, mid)

    import math

    out_ids = sorted(best)
    return pa.table({
        "doc_id": pa.array(out_ids, pa.int64()),
        "dup_of": pa.array([best[i][1] for i in out_ids], pa.int64()),
        "est_jaccard": pa.array(
            [math.floor(best[i][0] * 1e6 + 0.5) / 1e6 for i in out_ids], pa.float64()
        ),
    })
