"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north rule names the main-content-extraction family explicitly ("HTML
boilerplate strip, PDF/layout parse, DOM heuristics"); the PDF side is the
kernel, this module is the HTML side. No HTML library ships in this
container, so parsing uses the stdlib ``html.parser`` state machine — a real
DOM-event parser, not a regex.

Heuristic CONTRACT (the public boilerpipe/Readability feature pair —
Kohlschütter et al., WSDM 2010 "Boilerplate Detection using Shallow Text
Features": block text length + link density; subtree roles per the HTML5
sectioning semantics):

* subtrees under ``script style noscript template nav header footer aside
  form`` are dropped wholesale (role boilerplate);
* block elements are ``p li h1-h6 blockquote pre``; a block's text is its
  character data with whitespace runs collapsed (entity references decoded
  by the parser);
* a block SURVIVES iff its normalized text has ≥ ``min_chars`` (default 25)
  non-whitespace-preserving length AND its link density — non-space chars
  inside ``<a>`` / non-space chars total — is ≤ ``max_link_density``
  (default 1/3);
* ``main_text`` is the surviving blocks joined with blank lines in document
  order.

The oracle strategy is LABELED SYNTHESIS: ``synth_html_doc`` plants content
paragraphs (long, link-sparse) and boilerplate (role subtrees, link-dense
lists, sub-threshold teasers) whose classification under the contract is
decided BY CONSTRUCTION — the ground truth is the planted content list, not
a second parser. Extraction must recover it exactly.
"""

from __future__ import annotations

import random
from html.parser import HTMLParser
from typing import List, Optional

import pyarrow as pa
import ray.data

DROP_SUBTREES = frozenset(
    "script style noscript template nav header footer aside form".split()
)
BLOCK_TAGS = frozenset("p li h1 h2 h3 h4 h5 h6 blockquote pre".split())
VOID_TAGS = frozenset("br hr img meta link input area base col embed source track wbr".split())


class _BlockParser(HTMLParser):
    """DOM-event pass collecting (normalized_text, link_char_count) blocks."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: List[tuple] = []
        self._drop = 0          # depth inside dropped-role subtrees
        self._a_depth = 0       # depth inside <a> (within a block)
        self._parts: Optional[List[str]] = None
        self._link_chars = 0

    def _flush(self):
        if self._parts is not None:
            text = " ".join("".join(self._parts).split())
            self.blocks.append((text, self._link_chars))
        self._parts = None
        self._link_chars = 0
        self._a_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in DROP_SUBTREES:
            self._drop += 1
            return
        if self._drop:
            return  # EVERYTHING inside a dropped subtree is invisible — incl. <br>
        if tag in VOID_TAGS:
            if tag == "br" and self._parts is not None:
                self._parts.append(" ")
            return
        if tag in BLOCK_TAGS:
            self._flush()  # blocks never nest in this contract
            self._parts = []
        elif tag == "a" and self._parts is not None:
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in DROP_SUBTREES:
            self._drop = max(0, self._drop - 1)
            return
        if self._drop:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_data(self, data):
        if self._drop or self._parts is None:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_chars += len("".join(data.split()))

    def close(self):
        super().close()
        self._flush()


def extract_main_blocks(html: str, min_chars: int = 25, max_link_density: float = 1 / 3):
    """One document → (kept_block_texts, n_blocks_total)."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    kept = []
    for text, link_chars in p.blocks:
        if not text:
            continue
        solid = len("".join(text.split()))
        if len(text) >= min_chars and (link_chars / max(solid, 1)) <= max_link_density:
            kept.append(text)
    n_total = sum(1 for t, _ in p.blocks if t)
    return kept, n_total


class MainContentExtractor:
    """Actor-pool stage: HTML → main content. The parser class/tag tables are
    per-actor warm state; parsing is inherently per-row (a DOM is a document
    property), the batch boundary is Arrow."""

    def __init__(self, html_col: str = "html", id_col: str = "doc_id",
                 min_chars: int = 25, max_link_density: float = 1 / 3):
        self.html_col = html_col
        self.id_col = id_col
        self.min_chars = min_chars
        self.max_link_density = max_link_density

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts, kept_n, total_n = [], [], []
        for html in batch.column(self.html_col).to_pylist():
            kept, n_total = extract_main_blocks(html, self.min_chars, self.max_link_density)
            texts.append("\n\n".join(kept))
            kept_n.append(len(kept))
            total_n.append(n_total)
        return pa.table({
            self.id_col: ids,
            "main_text": pa.array(texts, pa.string()),
            "n_blocks_kept": pa.array(kept_n, pa.int64()),
            "n_blocks_total": pa.array(total_n, pa.int64()),
        })


def extract_main_content(
    ds: ray.data.Dataset,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 25,
    max_link_density: float = 1 / 3,
    batch_size: int = 128,
    concurrency=None,
) -> ray.data.Dataset:
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        MainContentExtractor(html_col, id_col, min_chars, max_link_density), **kwargs
    )


# ---------------------------------------------------------------------------
# labeled synthetic HTML corpus (ground truth by construction)
# ---------------------------------------------------------------------------

_WORDS = (
    "stream engine arrow block shuffle actor batch window corpus document "
    "extract cluster spill lance index partition schema column vector token "
    "sample filter merge sort anchor layout decode entity replica quorum"
).split()


def synth_html_doc(index: int, seed: int = 42) -> dict:
    """One labeled page: {doc_id, html, main_text, n_content_blocks}.

    Content paragraphs are constructed to SURVIVE the contract (≥ 8 words →
    well over min_chars; at most one 1-word link → density ≪ 1/3) and
    boilerplate to be DROPPED (role subtrees; a link-dense related-list; a
    sub-min_chars teaser) — the label is decided by construction, so the
    ground truth needs no second parser."""
    rng = random.Random((seed << 20) ^ (index * 2654435761 % (1 << 31)))

    def words(n):
        return [_WORDS[rng.randrange(len(_WORDS))] for _ in range(n)]

    content: List[str] = []
    body: List[str] = []

    body.append("<header><h1>site %d</h1><nav><a href='/'>home</a> <a href='/a'>a</a></nav></header>" % index)
    body.append("<nav><ul>" + "".join(f"<li><a href='/m{j}'>menu{j}</a></li>" for j in range(4)) + "</ul></nav>")

    n_paras = 2 + rng.randrange(4)
    for pidx in range(n_paras):
        toks = words(8 + rng.randrange(10))
        plain = " ".join(toks)
        if pidx == 1:
            # one inline link + markup + an entity: survives (density ~ 1/10)
            toks2 = list(toks)
            toks2[2] = f"<a href='/x{index}'>{toks2[2]}</a>"
            toks2[4] = f"<em>{toks2[4]}</em>"
            html_para = " ".join(toks2) + " &amp; more"
            plain = " ".join(toks) + " & more"
        else:
            html_para = plain
        content.append(plain)
        body.append(f"<p>{html_para}</p>")
        if rng.random() < 0.4:
            body.append("<div class='ad'><aside><a href='/ad'>sponsored result</a></aside></div>")

    body.append("<p>read more</p>")  # teaser: < min_chars → dropped
    body.append("<div class='related'><ul>" + "".join(
        f"<li><a href='/r{j}'>related article {j} title words</a></li>" for j in range(3)
    ) + "</ul></div>")               # link-density 1.0 blocks → dropped
    body.append("<script>var x = 1; document.write('junk');</script>")
    body.append("<footer><p>© site %d — <a href='/terms'>terms</a></p></footer>" % index)

    mid = body[2:-4]
    rng.shuffle(mid)   # layout order of content+ads varies per doc…
    body[2:-4] = mid   # …and the ground truth re-derives document order below
    ordered_content = []
    for frag in body:
        if frag.startswith("<p>") and not frag.startswith("<p>read more"):
            text = frag[3:-4]
            text = text.replace("&amp;", "&")
            # strip inline tags the same way the parser will (data concat)
            for t in ("<em>", "</em>"):
                text = text.replace(t, "")
            while "<a " in text:
                s = text.index("<a ")
                e = text.index(">", s)
                text = text[:s] + text[s + (e - s) + 1:]
            text = text.replace("</a>", "")
            ordered_content.append(" ".join(text.split()))
    html = "<html><body>" + "".join(body) + "</body></html>"
    return {
        "doc_id": index,
        "html": html,
        "main_text": "\n\n".join(ordered_content),
        "n_content_blocks": len(ordered_content),
    }


def synth_html_table(n: int, seed: int = 42) -> pa.Table:
    docs = [synth_html_doc(i, seed) for i in range(n)]
    return pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
        "html": pa.array([d["html"] for d in docs], pa.string()),
    })


def expected_main_content_table(n: int, seed: int = 42) -> pa.Table:
    """Golden: the planted ground truth (no parser involved)."""
    docs = [synth_html_doc(i, seed) for i in range(n)]
    return pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
        "main_text": pa.array([d["main_text"] for d in docs], pa.string()),
        "n_blocks_kept": pa.array([d["n_content_blocks"] for d in docs], pa.int64()),
    })
