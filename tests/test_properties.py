"""Property-based tests (hypothesis) over the text/geometry kernels —
invariants that must hold for arbitrary inputs, beyond the golden cases."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdftext_ray import geometry as g
from pdftext_ray import textops as T

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_postprocess_idempotent(s):
    once = T.postprocess_text(s)
    assert T.postprocess_text(once) == once


@given(texts)
@settings(max_examples=200, deadline=None)
def test_postprocess_strips_all_controls_except_sentinel(s):
    import unicodedata

    out = T.postprocess_text(s)
    for c in out:
        ok = unicodedata.category(c)[0] != "C" or c == "\x02" or c in T.WHITESPACE_CHARS
        assert ok, repr(c)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_dehyphenation_removes_sentinel_and_never_grows(s):
    out = T.handle_hyphens(s)
    assert "\x02" not in out
    assert len(out) <= max(len(s) - 1, 0) or len(s) == 0


@given(texts)
@settings(max_examples=100, deadline=None)
def test_keep_hyphens_roundtrips_sentinel_count(s):
    out = T.handle_hyphens(s, keep_hyphens=True)
    assert out.count("-\n") >= s.count("\x02")


boxes = st.tuples(
    st.floats(0, 500), st.floats(0, 500), st.floats(0, 500), st.floats(0, 500)
).map(lambda t: [min(t[0], t[2]), min(t[1], t[3]), max(t[0], t[2]), max(t[1], t[3])])


@given(boxes)
@settings(max_examples=200, deadline=None)
def test_rotate_180_twice_is_identity(b):
    w, h = 612.0, 792.0
    out = g.rotate(g.rotate(b, w, h, 180), w, h, 180)
    assert all(abs(a - c) < 1e-9 for a, c in zip(out, b))


@given(boxes)
@settings(max_examples=200, deadline=None)
def test_rotate_preserves_area(b):
    w, h = 612.0, 792.0
    for rot in (90, 180, 270):
        assert abs(g.area(g.rotate(b, w, h, rot)) - g.area(b)) < 1e-6


@given(boxes, boxes)
@settings(max_examples=200, deadline=None)
def test_intersection_symmetric_and_bounded(a, b):
    ia = g.intersection_area(a, b)
    assert abs(ia - g.intersection_area(b, a)) < 1e-9
    assert ia <= min(g.area(a), g.area(b)) + 1e-9
    assert 0 <= g.intersection_pct(a, b) <= 1.0 + 1e-9


@given(st.lists(st.tuples(st.floats(0, 700), st.floats(0, 500)), max_size=30))
@settings(max_examples=100, deadline=None)
def test_sort_blocks_idempotent_and_preserving(points):
    blocks = [{"bbox": [x, y, x + 10, y + 10], "i": i} for i, (x, y) in enumerate(points)]
    once = T.sort_blocks(blocks)
    assert T.sort_blocks(once) == once
    assert sorted(b["i"] for b in once) == sorted(b["i"] for b in blocks)


def test_dedup_idempotent_on_corpus_pages():
    from pdftext_ray.corpus import NUM_CASES, generate_document
    from pdftext_ray.kernel import cluster
    from pdftext_ray.kernel.decode import decode_page

    for i in range(NUM_CASES):
        doc = generate_document(i)
        for s in doc["spans"]:
            if s["kind"] != "text":
                continue
            once = cluster.deduplicate_chars(decode_page(s["text"]).chars)
            assert cluster.deduplicate_chars(once) == once


# ---------------------------------------------------------------------------
# round 2: scalar-golden ⇄ vectorized-operator equivalences (the property the
# golden-parquet oracles rely on, fuzzed over arbitrary unicode text)
# ---------------------------------------------------------------------------

_fuzz_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(_fuzz_texts)
@settings(max_examples=150, deadline=None)
def test_winnow_scalar_equals_vectorized(text):
    import pyarrow as pa

    from pdftext_ray.ops.textstats import winnow_fingerprints_batch
    from pdftext_ray.pipelines.goldens import winnow_scalar

    t = pa.table({"doc_id": [0], "text": [text]})
    got = winnow_fingerprints_batch(t).column("fingerprints").to_pylist()[0]
    assert got == winnow_scalar(text)


@given(_fuzz_texts)
@settings(max_examples=150, deadline=None)
def test_simhash_scalar_equals_vectorized(text):
    import pyarrow as pa

    from pdftext_ray.ops.dedup import simhash_batch
    from pdftext_ray.pipelines.goldens import simhash64_scalar

    t = pa.table({"doc_id": [0], "text": [text]})
    got = int(simhash_batch(t).column("simhash").to_pylist()[0], 16)
    assert got == simhash64_scalar(text)


@given(st.lists(st.text(alphabet="ab ", max_size=30), min_size=0, max_size=8))
@settings(max_examples=100, deadline=None)
def test_jaccard_empty_convention(texts):
    """_jaccard_sorted follows the SQL |∩|/greatest(|∪|,1) convention —
    empty vs anything scores 0 (round-2 review finding)."""
    import numpy as np

    from pdftext_ray.ops.dedup import _jaccard_sorted, _shingle_hashes

    sets = [np.unique(_shingle_hashes(t, 3, short_fallback=False)) for t in texts]
    for a in sets:
        for b in sets:
            j = _jaccard_sorted(a, b)
            if len(a) == 0 or len(b) == 0:
                assert j == 0.0
            else:
                inter = len(np.intersect1d(a, b))
                assert j == inter / (len(a) + len(b) - inter)
