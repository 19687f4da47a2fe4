"""Per-document link resolution (J1-J4) — spatial argmax join + span splitting.

Reimplements pdftext/pdf/links.py:125-231 and the PageReference registry
(pdftext/schema.py:205-225). All state is per-document (links never cross
documents), so this runs entirely inside one UDF invocation — never cluster
state (SURVEY.md §2.3 ST2).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pdftext_ray import geometry as g
from pdftext_ray.kernel.cluster import _extend, _new_span
from pdftext_ray.kernel.decode import BBOX


class PageRefs:
    """Anchor-target registry; dedups by exact coord equality
    (pdftext/schema.py:205-225)."""

    def __init__(self):
        self.page_ref_map: Dict[int, List[dict]] = {}

    def add_ref(self, page: int, coord: List[float]) -> dict:
        refs = self.page_ref_map.setdefault(page, [])
        for ref in refs:
            if ref["coord"] == coord:
                return ref
        ref = {"idx": len(refs), "page": page, "coord": coord}
        refs.append(ref)
        return ref

    def get_refs(self, page: int) -> List[dict]:
        return self.page_ref_map.get(page, [])


def ref_url(ref: dict) -> str:
    return f"#page-{ref['page']}-{ref['idx']}"


def _split_span_by_links(orig_span: dict, links: List[dict]) -> List[dict]:
    """J3: char-granular re-segmentation by max-intersection link URL
    (pdftext/pdf/links.py:179-221)."""
    spans: List[dict] = []
    span: Optional[dict] = None
    link_bboxes = [ln["bbox"] for ln in links]

    for char in orig_span["chars"]:
        cb = char[BBOX]
        if g.area(cb) > 0:
            probe = cb
        else:
            probe = g.ensure_nonzero_area(cb)
        intersections = []
        for i, lb in enumerate(link_bboxes):
            a = g.intersection_area(lb, probe)
            if a > 0:
                intersections.append((a, links[i]))

        current_url = ""
        if intersections:
            intersections.sort(key=lambda x: x[0], reverse=True)
            current_url = intersections[0][1]["url"]

        if span is None or current_url != span["url"]:
            span = _new_span(char)
            span["url"] = current_url
            spans.append(span)
        else:
            _extend(span, char)
    return spans


def merge_links(page: dict, links: List[dict], refs: PageRefs) -> None:
    """J2: assign each link to the argmax-intersection span, build internal
    anchor URLs, split affected spans (pdftext/pdf/links.py:125-176)."""
    page_id = page["page"]
    spans = [s for blk in page["blocks"] for line in blk["lines"] for s in line["spans"]]
    span_bboxes = [s["bbox"] for s in spans]
    link_bboxes = [ln["bbox"] for ln in links]

    mat = g.matrix_intersection_area(link_bboxes, span_bboxes)

    span_link_map: Dict[int, List[dict]] = {}
    for link_idx, link in enumerate(links):
        row = mat[link_idx]
        if row.sum() == 0:
            continue
        max_idx = int(row.argmax())

        dest_page = link["dest_page"]
        if dest_page is not None:
            if link["dest_pos"]:
                dest_pos = link["dest_pos"]
            else:
                if dest_page == page_id:
                    continue  # don't self-link without a position
                dest_pos = [0.0, 0.0]
            ref = refs.add_ref(dest_page, dest_pos)
            link["url"] = ref_url(ref)

        span_link_map.setdefault(max_idx, []).append(link)

    span_idx = 0
    for blk in page["blocks"]:
        for line in blk["lines"]:
            new_spans = []
            for s in line["spans"]:
                if span_idx in span_link_map:
                    new_spans.extend(_split_span_by_links(s, span_link_map[span_idx]))
                else:
                    new_spans.append(s)
                span_idx += 1
            line["spans"] = new_spans


def add_links_and_refs(pages: List[dict], page_links: List[List[dict]]) -> None:
    """Run J2 over all pages of one document, then attach each page's anchor
    targets (pdftext/pdf/links.py:224-231)."""
    refs = PageRefs()
    for page, links in zip(pages, page_links):
        merge_links(page, links, refs)
    for page in pages:
        page["refs"] = refs.get_refs(page["page"])
