"""Property test: the vectorized decode+dedup fast path is char-for-char
equivalent to decode_page + cluster.deduplicate_chars on every corpus case."""

from pdftext_ray.corpus import NUM_CASES, generate_document
from pdftext_ray.kernel import cluster
from pdftext_ray.kernel.decode import decode_page, decode_page_dedup


def test_fastpath_equivalent_on_all_cases():
    for i in range(2 * NUM_CASES):
        doc = generate_document(i)
        for s in doc["spans"]:
            if s["kind"] != "text":
                continue
            slow = cluster.deduplicate_chars(decode_page(s["text"]).chars)
            fast = decode_page_dedup(s["text"]).chars
            assert slow == fast, (doc["doc_id"], doc["_case"])


def test_fastpath_quote_loosebox_respected():
    doc = generate_document(18)  # quote_char case
    payload = next(s["text"] for s in doc["spans"] if s["kind"] == "text")
    a = decode_page_dedup(payload, quote_loosebox=False).chars
    b = cluster.deduplicate_chars(decode_page(payload, quote_loosebox=False).chars)
    assert a == b


def _span_key(s):
    return (
        s["text"], s["bbox"], s["rotation"], s["font"],
        s["char_start_idx"], s["char_end_idx"], list(s["chars"]),
    )


def test_array_span_fold_equivalent_on_all_cases():
    """get_spans_from_arrays (hot path) must equal the scalar get_spans fold
    on every corpus case, including the lazily-materialized char tuples."""
    for i in range(2 * NUM_CASES):
        doc = generate_document(i)
        for s in doc["spans"]:
            if s["kind"] != "text":
                continue
            page = decode_page_dedup(s["text"])
            if page.arrays is None:
                continue
            fast = cluster.get_spans_from_arrays(page.arrays)
            slow = cluster.get_spans(page.chars)
            assert [_span_key(x) for x in fast] == [_span_key(x) for x in slow], (
                doc["doc_id"], doc["_case"])


def test_array_span_fold_superscript_geometry_break():
    """A planted superscript (short char above the running line, to the
    right) must split the span at the same index in both folds."""
    from pdftext_ray.payload import PayloadWriter

    w = PayloadWriter(0, [0.0, 0.0, 200.0, 100.0])
    font = ("F", 0, 10.0, 400.0)
    x = 5.0
    for ch in "abc":
        w.add_char(ch, (x, 50.0, x + 6.0, 60.0), font)
        x += 6.0
    # superscript digit in RAW bottom-left coords: higher y than the run
    # (flips to a smaller top-left y1), short, right of the run's x2
    w.add_char("2", (x + 1.0, 58.0, x + 5.0, 63.0), font)
    page = decode_page_dedup(w.build())
    fast = cluster.get_spans_from_arrays(page.arrays)
    slow = cluster.get_spans(page.chars)
    assert [_span_key(x) for x in fast] == [_span_key(x) for x in slow]
    assert len(fast) == 2 and fast[1]["text"] == "2"
