"""HTML main-content extraction (boilerplate strip / DOM heuristics)."""

import pyarrow as pa
import ray

from pdftext_ray.ops import webdoc


def test_contract_on_adversarial_html():
    html = (
        "<html><body>"
        "<nav><p>long navigation paragraph that would otherwise be kept</p></nav>"
        "<header><nav><li>nested drop depth two levels deep here</li></nav>"
        "<p>still inside header so still dropped even after inner nav closed</p></header>"
        "<p>genuine content paragraph with enough characters to survive</p>"
        "<p><a href='x'>link</a> <a href='y'>only</a> <a href='z'>paragraph text</a></p>"
        "<p>short</p>"
        "<div><aside><p>sidebar text long enough to pass the length rule</p></aside></div>"
        "<!-- a comment -->"
        "<p>second real paragraph &amp; entities decoded with <b>bold</b> inline</p>"
        "<pre>preformatted   code    block with     enough length</pre>"
        "<script><p>script content never text</p></script>"
        "</body></html>"
    )
    kept, n_total = webdoc.extract_main_blocks(html)
    assert kept == [
        "genuine content paragraph with enough characters to survive",
        "second real paragraph & entities decoded with bold inline",
        "preformatted code block with enough length",
    ]
    # visible (non-dropped-subtree) non-empty blocks: 3 kept + all-link + short
    assert n_total == 5


def test_link_density_boundary():
    # exactly 1/3 link density SURVIVES (<=); just above is dropped
    third = "<p><a href='x'>abcde</a> fghij klmno</p>"      # 5/15 < 1/3 → kept
    over = "<p><a href='x'>abcdef</a> ghijk lmnop</p>"      # 6/16 > 1/3 → dropped
    kept, _ = webdoc.extract_main_blocks(third + over, min_chars=10)
    assert kept == ["abcde fghij klmno"]


def test_pipeline_matches_planted_ground_truth(ray_session):
    n = 80
    out = (
        webdoc.extract_main_content(ray.data.from_arrow(webdoc.synth_html_table(n)))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = webdoc.expected_main_content_table(n).to_pandas()
    assert out["main_text"].tolist() == want["main_text"].tolist()
    assert out["n_blocks_kept"].tolist() == want["n_blocks_kept"].tolist()
    # boilerplate really is being dropped, not absent
    assert (out["n_blocks_total"] > out["n_blocks_kept"]).all()


def test_malformed_html_never_crashes():
    for frag in ["<p>unclosed", "</p>stray close", "<p><a>nested <p>reopen</p>",
                 "", "plain text only no tags at all but quite long indeed"]:
        kept, _ = webdoc.extract_main_blocks(frag)
        assert isinstance(kept, list)


def test_br_inside_dropped_subtree_is_invisible():
    """Markup INSIDE a dropped subtree must not leak separators into an
    enclosing open block (round-3 review: <br> in <nav> injected a space)."""
    kept, _ = webdoc.extract_main_blocks(
        "<p>foo<nav>hidden<br>stuff</nav>bar and enough filler text here</p>"
    )
    assert kept == ["foobar and enough filler text here"]
