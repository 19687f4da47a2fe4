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
