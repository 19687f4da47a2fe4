"""Streaming first-seen dedup against a SHARED MUTABLE hash index.

This is the one shape the Dataset API deliberately can't express — state
that every batch reads AND writes while the stream is in flight (task brief:
"drop to raw Ray actors only where the Dataset API genuinely can't express
the semantics, e.g. a shared mutable index"). The index is a pool of
``n_shards`` tiny actors, each owning a hash-partitioned slice of the
seen-set; a ``map_batches`` task routes its batch's keys to the owning
shards in ONE message per shard (vectorized membership, not per-row RPCs)
and keeps only rows whose key is seen for the first time anywhere in the
stream.

Scale notes:

* shard state is ``dict[bytes16 → count]`` — memory is bounded by DISTINCT
  keys / n_shards per actor, and the shard count is the scale dial (256
  nodes → hundreds of shards, each placed by Ray wherever there's room);
* WHICH duplicate survives depends on arrival order (inherent to streaming
  dedup — retries/backpressure reorder batches), so only ORDER-INDEPENDENT
  outputs are contract-worthy: the surviving key SET, the per-key totals,
  and the survivor count. ``streaming_dedup_counts`` returns exactly those
  (the batch-level dedup is ``streaming_dedup`` for pipelines that want the
  surviving rows and accept arrival-order survivor choice);
* vs ``ops.dedup.exact_dedup`` (groupby shuffle): the actor index needs NO
  all-to-all over the corpus and yields survivors INCREMENTALLY — right for
  ingest-time dedup where the stream must stay a stream; the shuffle form
  is right for batch jobs wanting deterministic min-id survivors.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0.25)
class _SeenShard:
    """One hash-partitioned slice of the shared seen-set.

    Offers are IDEMPOTENT per batch: each carries the LOGICAL identity of
    its originating batch — (Ray task id, batch sequence within the task),
    see ``_task_batch_fp`` — and a replayed offer (a task retry after worker
    death/OOM re-running the same block in the same logical task) returns
    the cached answer instead of re-counting (ADVICE r2). Identity is
    positional, NOT content-based: two byte-identical batches at different
    stream positions are genuine duplicate data and must both count (a
    content fingerprint would silently absorb them — round-3 review). The
    replay cache stores only the batch's duplicate positions (first-seen
    rows need no entry), so its memory is O(#batches + #duplicate
    rows)/shard; a production deployment would evict entries behind a
    checkpoint barrier."""

    def __init__(self):
        self._counts: dict = {}
        self._done: dict = {}

    def offer(self, batch_fp: bytes, keys: List[bytes]) -> List[int]:
        """Atomically record each key and return its PRIOR occurrence count
        (0 = first seen in the whole stream). One message per batch-shard
        pair — the actor's single-threaded event loop IS the atomicity."""
        cached = self._done.get(batch_fp)
        if cached is not None:
            n, dup_idx, dup_val = cached
            out = [0] * n
            for i, v in zip(dup_idx, dup_val):
                out[i] = v
            return out
        counts = self._counts
        out = []
        for k in keys:
            c = counts.get(k, 0)
            counts[k] = c + 1
            out.append(c)
        self._done[batch_fp] = (
            len(out),
            [i for i, v in enumerate(out) if v],
            [v for v in out if v],
        )
        return out

    def totals(self) -> List[tuple]:
        """(key, total occurrences) for this shard's slice."""
        return list(self._counts.items())

    def n_distinct(self) -> int:
        return len(self._counts)


def _digest16(texts: List) -> List[bytes]:
    return [
        hashlib.md5(t.encode("utf-8")).digest() if t is not None else b"\x00" * 16
        for t in texts
    ]


def _route(keys: List[bytes], n_shards: int) -> np.ndarray:
    # first 4 digest bytes pick the shard — independent of the dict-key bytes
    return np.array([int.from_bytes(k[:4], "big") % n_shards for k in keys], dtype=np.int64)


# per-worker batch sequence counters for _task_batch_fp, keyed by task id
_TASK_SEQ: dict = {}


def _task_batch_fp() -> bytes:
    """POSITIONAL identity of the current batch: (Ray task id, sequence of
    this batch within the task). A task retry after worker death re-executes
    the same logical task — same task id, blocks re-processed in the same
    order on a fresh worker whose counters start at zero — so every replayed
    batch reproduces its original fingerprint and the shard cache absorbs
    it, while byte-identical batches at DIFFERENT stream positions (genuine
    duplicate data) get distinct fingerprints and count. Residual edge: a
    retry scheduled onto the SAME live worker process would continue the old
    counter and mis-sequence — then keys re-offer, dup counts inflate, and
    the survivors-vs-index invariant check fails LOUDLY (never silently
    wrong); in practice retries follow worker death, which clears the
    counter with the process."""
    tid = ray.get_runtime_context().get_task_id() or "driver"
    if tid not in _TASK_SEQ:
        # a worker executes ONE map task at a time, so a new task id means
        # every older entry is a finished task: clearing bounds the dict
        # (round-3 review: unbounded growth in long-lived workers) AND makes
        # a retry that lands after any intervening task restart at seq 0,
        # reproducing its original fingerprints
        _TASK_SEQ.clear()
    seq = _TASK_SEQ.get(tid, 0)
    _TASK_SEQ[tid] = seq + 1
    return f"{tid}:{seq}".encode()


def streaming_dedup(
    ds: ray.data.Dataset,
    n_shards: int = 8,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Keep the FIRST-ARRIVING row per exact text; duplicates drop as they
    stream past the shared index. Survivor choice follows arrival order (see
    module docstring); the surviving key set and count are deterministic.

    The result is MATERIALIZED before returning: the dedup pass mutates the
    shard index as a side effect, so executing the lineage twice (a consumer
    calling count() then take_all(), or Ray reconstructing evicted blocks)
    would re-offer every key against the already-populated index and return
    zero rows (ADVICE r2). Pinning the blocks makes the side-effectful pass
    run exactly once; per-batch replay absorption (``_task_batch_fp``)
    additionally makes task RETRIES within that single pass idempotent."""
    shards = [_SeenShard.remote() for _ in range(n_shards)]

    def dedup_batch(t: pa.Table) -> pa.Table:
        keys = _digest16(t.column(text_col).to_pylist())
        if not keys:
            return t
        fp = _task_batch_fp()
        shard_of = _route(keys, n_shards)
        prior = np.empty(len(keys), dtype=np.int64)
        futures, slots = [], []
        for s in range(n_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx):
                futures.append(shards[s].offer.remote(fp, [keys[i] for i in idx]))
                slots.append(idx)
        for idx, res in zip(slots, ray.get(futures)):
            prior[idx] = res
        return t.filter(pa.array(prior == 0))

    out = ds.map_batches(dedup_batch, batch_format="pyarrow").materialize()
    # survivors-vs-index invariant, LOUD like streaming_dedup_counts: each
    # distinct key has exactly one prior==0 row, so any retry the positional
    # fingerprint failed to absorb (back-to-back re-execution on the same
    # live worker with no intervening task) shows up here as a mismatch
    # instead of silently dropped rows (round-3 review)
    n_survivors = out.count()
    n_distinct = sum(ray.get([s.n_distinct.remote() for s in shards]))
    if n_survivors != n_distinct:
        raise RuntimeError(
            f"streaming_dedup invariant violation: {n_survivors} survivors vs "
            f"{n_distinct} distinct keys in the shard index — an unabsorbed "
            "task retry re-offered keys; rerun the pass"
        )
    return out


def streaming_dedup_counts(
    ds: ray.data.Dataset,
    n_shards: int = 8,
    text_col: str = "text",
) -> pa.Table:
    """Run the stream through the shared index and return the
    ORDER-INDEPENDENT contract: (text_hash hex, dup_count) per distinct
    text, plus implicitly the survivor count (= row count). The stream is
    consumed (survivors counted, not kept); the totals come from one
    ``totals()`` sweep over the shards afterwards."""
    shards = [_SeenShard.remote() for _ in range(n_shards)]

    def dedup_batch(t: pa.Table) -> pa.Table:
        keys = _digest16(t.column(text_col).to_pylist())
        if not keys:
            return t.select([text_col])
        fp = _task_batch_fp()
        shard_of = _route(keys, n_shards)
        futures, slots = [], []
        for s in range(n_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx):
                futures.append(shards[s].offer.remote(fp, [keys[i] for i in idx]))
                slots.append(idx)
        prior = np.empty(len(keys), dtype=np.int64)
        for idx, res in zip(slots, ray.get(futures)):
            prior[idx] = res
        return t.select([text_col]).filter(pa.array(prior == 0))

    survivors = ds.map_batches(dedup_batch, batch_format="pyarrow").count()

    rows = []
    for s in shards:
        rows.extend(ray.get(s.totals.remote()))
    if survivors != len(rows):
        raise AssertionError(
            f"streaming dedup invariant broken: {survivors} survivors vs "
            f"{len(rows)} distinct keys in the index"
        )
    rows.sort()
    return pa.table({
        "text_hash": pa.array([k.hex() for k, _ in rows], pa.string()),
        "dup_count": pa.array([c for _, c in rows], pa.int64()),
    })
