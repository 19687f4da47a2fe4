"""Sequence packing: global prefix-sum placement must equal the scalar
single-pass replication, independent of block layout."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pdftext_ray.ops import pack


def _docs(n=200, seed=3):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(f"w{j}" for j in range(rng.integers(0, 40)))
        for _ in range(n)
    ]
    # shuffle ids so arrival order != doc_id order
    ids = rng.permutation(n)
    return pa.table({"doc_id": ids, "text": [texts[i] for i in ids]})


def _scalar_pack(t: pa.Table, budget: int):
    rows = sorted(
        ((i, len(s.split()) if s else 0) for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())),
    )
    out, off = {}, 0
    for i, n in rows:
        seq = off // budget
        nseq = ((off + max(n, 1) - 1) // budget - seq + 1) if n > 0 else 0
        out[i] = (n, off, seq, off % budget, nseq)
        off += n
    return out


def test_pack_sequences_matches_scalar_replication():
    t = _docs()
    got = pack.pack_sequences(ray.data.from_arrow(t), budget=64).to_pandas()
    want = _scalar_pack(t, 64)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.doc_id] == (r.n_tokens, r.start_offset, r.seq_id, r.seq_pos, r.n_seqs)


def test_pack_sequences_layout_independent():
    t = _docs(n=120, seed=9)
    a = pack.pack_sequences(ray.data.from_arrow(t), budget=32).to_pandas()
    b = (
        pack.pack_sequences(ray.data.from_arrow(t).repartition(11), budget=32)
        .to_pandas()
    )
    assert (
        a.sort_values("doc_id").reset_index(drop=True).equals(
            b.sort_values("doc_id").reset_index(drop=True)
        )
    )


def test_pack_sequences_empty_doc_spans_zero():
    t = pa.table({"doc_id": [5, 6, 7], "text": ["a b c", "", "d"]})
    got = (
        pack.pack_sequences(ray.data.from_arrow(t), budget=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert got.loc[6, "n_seqs"] == 0 and got.loc[6, "n_tokens"] == 0
    # doc 5 has 3 tokens over budget 2 → spans sequences 0..1
    assert got.loc[5, "n_seqs"] == 2
    # doc 7 starts at offset 3 (empty doc contributes nothing)
    assert got.loc[7, "start_offset"] == 3 and got.loc[7, "seq_id"] == 1


def test_pack_sequences_rejects_bad_budget():
    with pytest.raises(ValueError, match="budget"):
        pack.pack_sequences(ray.data.from_arrow(_docs(10)), budget=0)
