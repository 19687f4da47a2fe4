"""Graph operators over int64 edge tables — PageRank power iteration.

The reference has no graph code; this is an engine-side addition for
link-graph corpus curation (domain authority weighting, crawl-frontier
prioritization — the PageRank use the original paper describes, Page &
Brin 1998).

Scale shape: edge dedup + out-degree annotation are ONE few-partition hash
shuffle on src (equal pairs share src, so src co-location suffices for
pair dedup); each power iteration is a stateless vectorized map over the
materialized edge table (rank vector broadcast ONCE per iteration via
``ray.put``) + a driver-side np.add.at merge of per-block partial
contribution vectors (≤ #nodes rows per block — no per-iteration
shuffle). The rank vector itself is a bounded driver-side collect —
#nodes entries, the same contract as k-means' k×dim centroid collect
(ops/cluster.py); a node set beyond driver memory needs the co-partitioned
rank-join variant (documented extension, not implemented).

Determinism: ALL rank arithmetic is int64 fixed point (units of
1/scale) — contributions are ``rank // outdeg``, damping is
``85·x // 100``, the dangling share is ``D // N``. Integer addition
commutes exactly, so the result is layout/batch-order independent by
construction (invariant 11); float accumulation would drift in the last
bits across layouts. The tiny mass leak from floor division is part of
the published contract (the golden replicates it bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pdftext_ray.ops import from_pandas_clean, round_half_away


def _dedup_edges_with_outdeg(
    edges: ray.data.Dataset, src: str, dst: str
) -> ray.data.Dataset:
    """Distinct (src, dst) pairs annotated with src's out-degree. One hash
    shuffle on src: equal pairs co-locate (they share src), so per-partition
    drop_duplicates is globally exact, and the out-degree is computable in
    the same pass (src's edges are all present)."""
    from pdftext_ray.ops import default_num_partitions
    from pdftext_ray.ops.relational import _key_part_tag

    n_parts = default_num_partitions()

    def local(t: pa.Table) -> pa.Table:
        df = t.select([src, dst]).to_pandas().drop_duplicates()
        return from_pandas_clean(df)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[src, dst]].drop_duplicates()
        g["outdeg"] = g.groupby(src)[dst].transform("size").astype("int64")
        return from_pandas_clean(g)

    return (
        edges.map_batches(local, batch_format="pyarrow")
        .map_batches(_key_part_tag(src, n_parts), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


def pagerank(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 8,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> ray.data.Dataset:
    """Fixed-point PageRank over a directed int64 edge table.

    Per iteration (all int64):
      contrib(s→t) = rank[s] // outdeg[s]
      S[t]         = Σ contribs into t        (exact integer sums)
      dangling dd  = (Σ rank over outdeg-0 nodes) // N
      rank'[v]     = (100−d)·scale // (100·N) + d·(S[v] + dd) // 100

    Headroom: scale=10¹² keeps every term < 8.5·10¹³ ≪ 2⁶³, and partial
    sums < 2⁵³ so even a float64 staging copy would be exact.

    Output: (node, rank_fp int64, rank double rounded to 10) — rank_fp is
    the exact comparable; rank is the human-readable value.
    """
    deduped = _dedup_edges_with_outdeg(edges, src, dst).materialize()

    # node universe + initial uniform rank (bounded collect: #nodes)
    from pdftext_ray.ops.relational import hash_grouped_agg

    def node_partial(t: pa.Table) -> pa.Table:
        # src rows carry their (globally final) outdeg, dst rows 0 — a MAX
        # merge yields the node universe AND per-node out-degree in the one
        # pass (dangling nodes never appear as src, so their max stays 0)
        s_arr = t.column(src).to_numpy(zero_copy_only=False)
        d_arr = t.column(dst).to_numpy(zero_copy_only=False)
        od_arr = t.column("outdeg").to_numpy(zero_copy_only=False)
        node = np.concatenate([s_arr, d_arr])
        deg = np.concatenate([od_arr, np.zeros(len(d_arr), np.int64)])
        df = pd.DataFrame({"node": node, "outdeg": deg}).groupby(
            "node", as_index=False
        )["outdeg"].max()
        return from_pandas_clean(df)

    nodes_df = hash_grouped_agg(
        deduped.map_batches(node_partial, batch_format="pyarrow"),
        "node",
        {"outdeg": ("outdeg", "max")},
    ).to_pandas()
    if "node" not in nodes_df.columns:  # zero-batch (empty) input
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_fp": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64()),
        }))
    order = np.argsort(nodes_df["node"].to_numpy())
    node_ids = nodes_df["node"].to_numpy().astype(np.int64)[order]
    outdeg = nodes_df["outdeg"].to_numpy().astype(np.int64)[order]
    n = len(node_ids)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_fp": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64()),
        }))
    ranks = np.full(n, scale // n, dtype=np.int64)

    base = (100 - damping_pct) * scale // (100 * n)
    # node_ids never change: broadcast ONCE; only the rank vector re-ships
    ids_ref = ray.put(node_ids)
    for _ in range(n_iter):
        ranks_ref = ray.put(ranks)

        def contrib(t: pa.Table) -> pa.Table:
            # per-block partial: contributions pre-summed by dst, emitted as
            # POSITIONS into the broadcast node vector, so the driver merge
            # is one np.add.at — no per-iteration shuffle (the collect is
            # ≤ #nodes rows per block, the op's bounded contract; k-means'
            # centroid partials use the same pattern, ops/cluster.py)
            ids, r = ray.get(ids_ref), ray.get(ranks_ref)
            s = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
            d = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
            od = t.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
            c = r[np.searchsorted(ids, s)] // od
            didx = np.searchsorted(ids, d)
            u, inv = np.unique(didx, return_inverse=True)
            sums = np.zeros(len(u), dtype=np.int64)
            np.add.at(sums, inv, c)
            return pa.table({"pos": pa.array(u, pa.int64()),
                             "c": pa.array(sums, pa.int64())})

        s_vec = np.zeros(n, dtype=np.int64)
        for part in deduped.map_batches(
            contrib, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            np.add.at(
                s_vec,
                part.column("pos").to_numpy(zero_copy_only=False),
                part.column("c").to_numpy(zero_copy_only=False),
            )
        dangling = int(ranks[outdeg == 0].sum())
        ranks = base + damping_pct * (s_vec + dangling // n) // 100

    out = pd.DataFrame({
        "node": node_ids,
        "rank_fp": ranks,
        "rank": round_half_away(ranks / scale, 10),
    })
    return ray.data.from_arrow(from_pandas_clean(out))
