"""ops/graph.pagerank: fixed-point power iteration — exact golden match,
layout independence, dangling handling, and rank-order sanity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pdftext_ray.ops import graph
from pdftext_ray.pipelines.goldens import expected_pagerank_table


def _edges_ds(pairs, repartition=None):
    t = pa.table({
        "src": pa.array([s for s, _ in pairs], pa.int64()),
        "dst": pa.array([d for _, d in pairs], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    return ds.repartition(repartition) if repartition else ds


def test_pagerank_matches_scalar_golden_exactly():
    # small web: 0↔1 strongly connected, 2 feeds both, 3 dangling sink
    pairs = [(0, 1), (1, 0), (2, 0), (2, 1), (0, 3), (1, 3), (0, 1)]  # dup edge
    got = graph.pagerank(_edges_ds(pairs), n_iter=8).to_pandas().sort_values("node")
    want = expected_pagerank_table(pairs, n_iter=8).to_pandas()
    assert got["node"].tolist() == want["node"].tolist()
    assert got["rank_fp"].tolist() == want["rank_fp"].tolist()  # EXACT ints
    assert got["rank"].tolist() == want["rank"].tolist()


def test_pagerank_layout_independent():
    rng = np.random.RandomState(7)
    pairs = list(zip(rng.randint(0, 40, 500).tolist(), rng.randint(0, 40, 500).tolist()))
    a = graph.pagerank(_edges_ds(pairs), n_iter=6).to_pandas().sort_values("node")
    b = graph.pagerank(_edges_ds(pairs[::-1], repartition=9), n_iter=6).to_pandas().sort_values("node")
    assert a["rank_fp"].tolist() == b["rank_fp"].tolist()


def test_pagerank_order_and_dangling():
    # hub: everyone links to node 9; node 9 links nowhere (dangling)
    pairs = [(i, 9) for i in range(9)]
    out = graph.pagerank(_edges_ds(pairs), n_iter=10).to_pandas()
    ranked = out.sort_values("rank_fp", ascending=False)
    assert ranked["node"].iloc[0] == 9  # the hub dominates
    # all sources are symmetric → identical ranks
    src_ranks = out[out["node"] < 9]["rank_fp"].unique()
    assert len(src_ranks) == 1
    # total mass stays ~1 (floor-division leak only: < N ulps of 1e-12 per term)
    assert abs(out["rank_fp"].sum() / 1e12 - 1.0) < 1e-6


def test_pagerank_empty_edges():
    out = graph.pagerank(_edges_ds([]), n_iter=3).to_pandas()
    assert len(out) == 0


def test_pagerank_dataset_mode_bit_identical():
    # the dataset-resident plan must produce the SAME int64 rank_fp as the
    # driver plan — integer fixed-point sums commute, so the physical plan
    # cannot change a single bit
    rng = np.random.RandomState(11)
    pairs = list(zip(rng.randint(0, 60, 800).tolist(), rng.randint(0, 60, 800).tolist()))
    a = graph.pagerank(_edges_ds(pairs), n_iter=5, mode="driver").to_pandas().sort_values("node")
    b = graph.pagerank(
        _edges_ds(pairs[::-1], repartition=7), n_iter=5, mode="dataset"
    ).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["rank_fp"].tolist() == b["rank_fp"].tolist()
    assert a["rank"].tolist() == b["rank"].tolist()


def test_pagerank_dataset_mode_dangling_golden():
    # dataset plan vs the independent scalar golden, dangling-heavy graph
    pairs = [(0, 1), (1, 0), (2, 0), (2, 1), (0, 3), (1, 3), (0, 1)]
    got = graph.pagerank(_edges_ds(pairs), n_iter=8, mode="dataset").to_pandas().sort_values("node")
    want = expected_pagerank_table(pairs, n_iter=8).to_pandas()
    assert got["node"].tolist() == want["node"].tolist()
    assert got["rank_fp"].tolist() == want["rank_fp"].tolist()


def test_pagerank_driver_guard_and_auto_switch():
    import pytest

    pairs = [(0, 1), (1, 2), (2, 0)]
    # mode='driver' past the guard raises loudly with remedies
    with pytest.raises(ValueError, match="max_driver_nodes"):
        graph.pagerank(_edges_ds(pairs), n_iter=2, mode="driver", max_driver_nodes=2)
    # mode='auto' past the guard silently takes the dataset plan instead
    out = graph.pagerank(
        _edges_ds(pairs), n_iter=2, mode="auto", max_driver_nodes=2
    ).to_pandas().sort_values("node")
    ref = graph.pagerank(_edges_ds(pairs), n_iter=2, mode="driver").to_pandas().sort_values("node")
    assert out["rank_fp"].tolist() == ref["rank_fp"].tolist()
    with pytest.raises(ValueError, match="mode"):
        graph.pagerank(_edges_ds(pairs), mode="bogus")


def test_pagerank_dataset_mode_empty_edges():
    out = graph.pagerank(_edges_ds([]), n_iter=3, mode="dataset").to_pandas()
    assert len(out) == 0
