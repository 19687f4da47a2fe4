"""URL canonicalization + URL dedup (ops/urls.py): contract cases for the
RE2 chain, keep-min dedup, and empty-input robustness. The cross-engine
oracle equality itself is exercised by tests/test_gate_extras.py
(url_canonicalize / url_dedup entries)."""

import pyarrow as pa
import ray

from pdftext_ray.ops import urls

CASES = {
    # case noise + default port + utm + fragment, all in one
    "HTTP://SiteA.ORG:80/PathX?utm_source=x&q=7#frag": "http://sitea.org/pathx?q=7",
    # bare host gains the trailing slash; default https port dropped
    "https://CDN3.net": "https://cdn3.net/",
    "https://cdn3.net:443": "https://cdn3.net/",
    # ALL utm params go, separators collapse, trailing '?' stripped
    "https://h.com/a?utm_a=1&utm_b=2": "https://h.com/a",
    "https://h.com/a?x=1&utm_a=1&y=2": "https://h.com/a?x=1&y=2",
    # NON-default port survives (the :80-inside-:8080 regression)
    "http://h.com:8080/keep": "http://h.com:8080/keep",
    # port strip anchored to the authority, path case lowercased by contract
    "https://H.com:443/B?q=1#x": "https://h.com/b?q=1",
}


def test_canonicalize_contract_cases():
    got = urls.canonicalize_array(pa.array(list(CASES))).to_pylist()
    assert got == list(CASES.values())


def test_url_dedup_keeps_min_id(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([5, 3, 9, 1], pa.int64()),
            "url": pa.array(
                [
                    "HTTP://A.com:80/x#f",  # canonical http://a.com/x
                    "http://a.com/x",  # same group
                    "http://a.com/x?utm_z=1",  # same group
                    "http://b.com/y",  # own group
                ]
            ),
        }
    )
    out = urls.url_dedup(ray.data.from_arrow(t)).to_pandas()
    out = out.sort_values("canonical_url").reset_index(drop=True)
    assert list(out["canonical_url"]) == ["http://a.com/x", "http://b.com/y"]
    assert list(out["keep_doc_id"]) == [3, 1]
    assert list(out["dup_count"]) == [3, 1]


def test_urls_empty_input(ray_session):
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "url": pa.array([], pa.string())}
    )
    assert urls.canonicalize_urls(ray.data.from_arrow(empty)).count() == 0
    assert urls.url_dedup(ray.data.from_arrow(empty)).count() == 0
