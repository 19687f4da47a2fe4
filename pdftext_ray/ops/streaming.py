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


# ---------------------------------------------------------------------------
# Streaming tumbling-window aggregate (actor-held open windows + watermark)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0.25)
class _WindowShard:
    """Open tumbling windows for one hash slice of the key space.

    Accumulators are INTEGER cents — exact addition commutes, so the final
    window totals are arrival-order independent even though the stream
    is not (same contract split as the dedup shards: only order-
    independent outputs are gate-worthy; late-DROP counts depend on
    arrival order and are exposed for controlled/sequential use only).
    Offers carry the positional batch fingerprint for retry absorption."""

    def __init__(self, width_sec: int, allowed_lateness_sec=None):
        self._width = width_sec
        self._late = allowed_lateness_sec
        self._open: dict = {}     # (window_start_sec, key) -> [n, cents]
        self._watermark = None    # max EVENT time seen (sec) — not window start
        self._dropped = 0
        self._seen = 0  # rows received (accepted + dropped) — invariant side
        self._done: set = set()

    def offer(self, batch_fp: bytes, windows, keys, cents, max_ts=None) -> int:
        """``max_ts`` is the batch-shard's max event time — the watermark
        advances from TRUE event time, so a window closes exactly
        ``allowed_lateness`` after its end passes the stream's frontier
        (advancing from window starts would hold windows open up to a
        full width longer than the documented semantics)."""
        if batch_fp in self._done:
            return 0
        self._done.add(batch_fp)
        dropped = 0
        for w, k, c in zip(windows, keys, cents):
            if self._late is not None and self._watermark is not None and (
                w + self._width + self._late <= self._watermark
            ):
                dropped += 1  # beyond allowed lateness: row is dropped
                continue
            acc = self._open.setdefault((w, k), [0, 0])
            acc[0] += 1
            acc[1] += c
        if self._late is not None and max_ts is not None and (
            self._watermark is None or max_ts > self._watermark
        ):
            self._watermark = max_ts
        self._dropped += dropped
        self._seen += len(windows)
        return dropped

    def n_seen(self) -> int:
        return self._seen

    def flush(self):
        """All held window accumulators: [(w, key, n, cents)]."""
        return [(w, k, v[0], v[1]) for (w, k), v in self._open.items()]

    def n_dropped(self) -> int:
        return self._dropped


def streaming_window_counts(
    ds: ray.data.Dataset,
    width_sec: int = 3600,
    n_shards: int = 8,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    allowed_lateness_sec=None,
) -> pa.Table:
    """Tumbling event-time windows held OPEN in a shard-actor pool while
    the stream flows — the true streaming-window shape (state every batch
    writes mid-flight), vs relational.events_hourly_window's batch
    partial-aggregate plan which needs the input bounded.

    One message per batch-shard pair routes (window, key, cents) triples
    to the owning shard (hash of key — a key's windows co-locate);
    integer-cents accumulators make the flushed totals arrival-order
    independent, which is the gate contract. With ``allowed_lateness_sec``
    set, each shard tracks an event-time watermark and DROPS rows whose
    window closed more than the lateness before it — order-dependent by
    nature, so that mode is for controlled/sequential feeds (unit-tested
    via direct actor calls), not the gate.

    Returns the flushed table: (window_start timestamp-sec, key, n_events,
    sum_value round 2).
    """
    import pandas as pd

    from pdftext_ray.ops import round_half_away as _rha

    shards = [
        _WindowShard.remote(width_sec, allowed_lateness_sec) for _ in range(n_shards)
    ]

    def feed(t: pa.Table) -> pa.Table:
        from pdftext_ray.ops import round_half_away

        n = len(t)
        if n == 0:
            return pa.table({"fed": pa.array([0], pa.int64())})
        fp = _task_batch_fp()
        epoch = t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        windows = (epoch // width_sec * width_sec).astype(np.int64)
        keys = t.column(key_col).to_pylist()
        cents = np.asarray(
            round_half_away(t.column(value_col).to_numpy(zero_copy_only=False) * 100.0, 0),
            dtype=np.int64,
        )
        shard_of = _route(_digest16(keys), n_shards)
        futures = []
        for s in range(n_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx):
                futures.append(shards[s].offer.remote(
                    fp, windows[idx].tolist(), [keys[i] for i in idx],
                    cents[idx].tolist(), int(epoch[idx].max()),
                ))
        ray.get(futures)
        return pa.table({"fed": pa.array([n], pa.int64())})

    # side-effectful pass: materialize so the lineage runs exactly once
    fed = ds.map_batches(feed, batch_format="pyarrow").materialize()
    n_fed = sum(r["fed"] for r in fed.take_all())
    n_seen = sum(ray.get([sh.n_seen.remote() for sh in shards]))
    if n_fed != n_seen:
        # LOUD on shard state loss (an actor died and restarted empty mid-
        # stream: its windows are gone and its counters reset) or an
        # unabsorbed replay — never a silently short window table
        # (streaming_dedup's survivors-vs-index contract)
        raise RuntimeError(
            f"streaming_window invariant violation: {n_fed} rows fed vs "
            f"{n_seen} rows seen by shard actors — a shard lost state or a "
            "retry was not absorbed; rerun the pass"
        )
    rows = [r for s in ray.get([sh.flush.remote() for sh in shards]) for r in s]
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table({
        "window_start": pa.array(
            pd.to_datetime([r[0] for r in rows], unit="s"), pa.timestamp("us")
        ),
        key_col: pa.array([r[1] for r in rows], pa.string()),
        "n_events": pa.array([r[2] for r in rows], pa.int64()),
        "sum_value": pa.array(
            # invariant 2: gate-compared float columns go through
            # round_half_away (numerically inert here — cents/100 already
            # has 2 decimals — but the convention must hold if scale changes)
            [float(_rha(r[3] / 100.0, 2)) for r in rows], pa.float64()
        ),
    })
