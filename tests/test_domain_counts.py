"""URL → domain grouped stats: occurrence and distinct-doc counts."""

import pyarrow as pa
import ray.data

from pdftext_ray.ops import textstats


def test_url_domain_counts_occurrences_and_distinct_docs():
    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "see http://a.org/x and http://a.org/y plus https://b.net/",
            "nothing here",
            "again http://a.org/z",
            "",
        ],
    })
    got = (
        textstats.url_domain_counts(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("domain")
        .sort_index()
    )
    assert got.loc["a.org", "n_urls"] == 3
    assert got.loc["a.org", "n_docs"] == 2
    assert got.loc["b.net", "n_urls"] == 1 and got.loc["b.net", "n_docs"] == 1
    assert len(got) == 2


def test_url_domain_counts_layout_independent():
    rows = [(i, f"http://d{i % 3}.com/p{i} x http://d{i % 3}.com/q") for i in range(60)]
    t = pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    a = textstats.url_domain_counts(ray.data.from_arrow(t)).to_pandas()
    b = (
        textstats.url_domain_counts(ray.data.from_arrow(t).repartition(7))
        .to_pandas()
    )
    key = ["domain", "n_urls", "n_docs"]
    assert a.sort_values("domain")[key].reset_index(drop=True).equals(
        b.sort_values("domain")[key].reset_index(drop=True)
    )
    assert a["n_urls"].sum() == 120
