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


def test_top_ngrams_counts_and_tiebreak():
    from pdftext_ray.ops import textstats

    t = pa.table({"text": ["a b a b c", "b c b c", "a b", ""]})
    got = textstats.top_ngrams(ray.data.from_arrow(t), n=2, k=3).to_pandas()
    assert list(got["gram"]) == ["a b", "b c", "b a"]
    assert list(got["n"]) == [3, 3, 1]


def test_top_ngrams_layout_independent():
    from pdftext_ray.ops import textstats

    texts = [f"tok{i % 5} tok{(i + 1) % 5} tok{i % 3}" for i in range(80)]
    t = pa.table({"text": texts})
    a = textstats.top_ngrams(ray.data.from_arrow(t), n=2, k=10).to_pandas()
    b = textstats.top_ngrams(ray.data.from_arrow(t).repartition(9), n=2, k=10).to_pandas()
    assert a.equals(b)
