"""Property-based tests over the PURE cores of the round-3 continuation
ops (no Ray in the loop — batch fns and index classes called directly, so
hypothesis can afford hundreds of examples)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

ascii_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=5), min_size=0, max_size=40
)


@given(st.lists(st.lists(st.floats(-5, 5, allow_nan=False, width=32), min_size=4, max_size=4),
                min_size=3, max_size=60))
@settings(max_examples=100, deadline=None)
def test_sq8_roundtrip_error_bound(vec_rows):
    from pdftext_ray.ops.similarity import SQ8Index, _unit

    vecs = np.asarray(vec_rows, dtype=np.float64)
    if not np.all(np.linalg.norm(vecs, axis=1) > 1e-6):
        return  # near-zero vectors normalize to noise; out of contract
    idx = SQ8Index(vecs)
    unit = _unit(vecs)
    recon = idx.reconstruct(idx.encode(vecs))
    # per-dim quantization error ≤ half a code step (span/255/2) + fp slack
    bound = idx.span / 255.0 / 2.0 + 1e-9
    assert np.all(np.abs(recon - unit) <= bound + 1e-12)
    # determinism: encoding twice is identical
    assert np.array_equal(idx.encode(vecs), idx.encode(vecs))


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=200),
       st.integers(0, 2**40))
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives_pure(keys, probe):
    from pdftext_ray.ops.joins import _bloom_positions

    m, k = 1 << 12, 4
    arr = np.asarray(keys, dtype=np.int64)
    pos = _bloom_positions(arr, m, k)
    assert pos.shape == (len(keys), k)
    assert pos.min() >= 0 and pos.max() < m
    bits = np.zeros(m, dtype=bool)
    bits[pos.ravel()] = True
    # every inserted key is a member (no false negatives, by construction)
    member = np.all(bits[_bloom_positions(arr, m, k)], axis=1)
    assert member.all()


@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=80))
@settings(max_examples=60, deadline=None)
def test_pagerank_golden_mass_and_positivity(pairs):
    from pdftext_ray.pipelines.goldens import expected_pagerank_table

    t = expected_pagerank_table(pairs, n_iter=5).to_pandas()
    assert (t["rank_fp"] > 0).all()
    # fixed-point floor leaks only: total mass within n ulps of 1.0
    assert 0.98 <= t["rank_fp"].sum() / 1e12 <= 1.0 + 1e-9


@given(ascii_words)
@settings(max_examples=150, deadline=None)
def test_ngram_repetition_invariants(words):
    from pdftext_ray.ops.textstats import ngram_repetition_batch

    text = " ".join(words)
    out = ngram_repetition_batch(
        pa.table({"doc_id": [0], "text": [text]})
    ).to_pylist()[0]
    assert out["top_ngram_frac"] >= 0 and out["dup_ngram_frac"] >= 0
    if out["top_ngram"]:
        # the reported gram really occurs in the token stream
        toks = text.split()
        grams = {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}
        assert out["top_ngram"] in grams
    if len(set(words)) == len(words):
        assert out["dup_ngram_frac"] == 0.0  # unique tokens → no repeated 5-gram


@given(st.lists(st.text(alphabet="abc ", max_size=30), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_lm_golden_cost_ordering(texts):
    from pdftext_ray.pipelines.goldens import expected_lm_table

    t = expected_lm_table(list(range(len(texts))), texts).to_pandas()
    assert (t["bits_per_token"] >= 0).all()
    assert (t.loc[t["n_tokens"] == 0, "bits_per_token"] == 0).all()
