"""Table-cell extraction (T1/T2) with the dynamic 80th-percentile gap
threshold (A2). Reimplements pdftext/tables.py:8-109."""

from __future__ import annotations

from typing import List

import numpy as np

from pdftext_ray import geometry as g
from pdftext_ray.kernel.decode import BBOX, CH
from pdftext_ray.textops import sort_blocks


def get_dynamic_gap_thresh(page: dict, img_size: List[float], default_thresh: float = 0.01, min_chars: int = 100) -> float:
    """A2: 80th percentile of successive normalized inter-char gaps,
    rotation-aware axis (pdftext/tables.py:8-25)."""
    dists: List[float] = []
    rot = page["rotation"]
    for blk in page["blocks"]:
        for line in blk["lines"]:
            for span in line["spans"]:
                chars = span["chars"]
                for i in range(1, len(chars)):
                    b1 = chars[i - 1][BBOX]
                    b2 = chars[i][BBOX]
                    if rot == 90:
                        dists.append((b2[0] - b1[2]) / img_size[0])
                    elif rot == 180:
                        dists.append((b2[1] - b1[3]) / img_size[1])
                    elif rot == 270:
                        dists.append((b1[0] - b2[2]) / img_size[0])
                    else:
                        dists.append((b1[1] - b2[3]) / img_size[1])
    if len(dists) > min_chars:
        return float(np.percentile(dists, 80))
    return default_thresh


def is_same_span(bbox, curr_box, img_size, space_thresh, rotation) -> bool:
    """T2: same-cell adjacency predicate (pdftext/tables.py:28-56)."""

    def nd(a, b, dim, mult=1.0, use_abs=True):
        d = a - b
        if use_abs:
            d = abs(d)
        return d / img_size[dim] < space_thresh * mult

    if rotation == 90:
        return nd(bbox[0], curr_box[0], 0, use_abs=False) and nd(bbox[1], curr_box[3], 1) and nd(bbox[0], curr_box[0], 0, mult=5)
    if rotation == 180:
        return nd(bbox[2], curr_box[0], 0, use_abs=False) and nd(bbox[1], curr_box[1], 1) and nd(bbox[2], curr_box[0], 1, mult=5)
    if rotation == 270:
        return nd(bbox[0], curr_box[0], 0, use_abs=False) and nd(bbox[3], curr_box[1], 1) and nd(bbox[0], curr_box[0], 1, mult=5)
    return nd(bbox[0], curr_box[2], 0, use_abs=False) and nd(bbox[1], curr_box[1], 1) and nd(bbox[0], curr_box[2], 1, mult=5)


def table_cell_text(tables: List[List[float]], page: dict, img_size: List[float],
                    table_thresh: float = 0.8, space_thresh: float = 0.01) -> List[List[dict]]:
    """T1: cluster chars into table cells per table bbox
    (pdftext/tables.py:59-109). ``page`` is a processed page whose spans still
    carry ``chars``."""
    assert all(len(t) == 4 for t in tables), "tables must be bboxes of 4 coords"
    assert len(img_size) == 2, "img_size must be [w, h]"

    space_thresh = max(space_thresh, get_dynamic_gap_thresh(page, img_size, default_thresh=space_thresh))
    # the reference runs on dictionary_output pages where rotation 90/270 has
    # already swapped width/height (pdftext/extraction.py:128-130) before
    # Bbox.rescale divides by them — mirror that swap here since we operate
    # on the unshaped working pages
    pw, ph = page["width"], page["height"]
    rotation = page["rotation"]
    if rotation in (90, 270):
        pw, ph = ph, pw
    out: List[List[dict]] = []
    for table in tables:
        cells: List[dict] = []
        for blk in page["blocks"]:
            for line in blk["lines"]:
                line_bbox = g.rescale(line["bbox"], img_size, pw, ph)
                if g.intersection_pct(line_bbox, table) < table_thresh:
                    continue
                curr_text = None
                curr_box = None
                for span in line["spans"]:
                    for char in span["chars"]:
                        cb = g.rescale(char[BBOX], img_size, pw, ph)
                        if curr_text is None:
                            curr_text, curr_box = char[CH], cb
                        elif is_same_span(cb, curr_box, img_size, space_thresh, rotation):
                            curr_text += char[CH]
                            curr_box = g.merge(curr_box, cb)
                        else:
                            if curr_text.strip():
                                cells.append({"text": curr_text, "bbox": curr_box})
                            curr_text, curr_box = char[CH], cb
                if curr_text is not None and curr_text.strip():
                    cells.append({"text": curr_text, "bbox": curr_box})
        for cell in cells:
            b = cell["bbox"]
            cell["bbox"] = [b[0] - table[0], b[1] - table[1], b[2] - table[0], b[3] - table[1]]
        out.append(sort_blocks(cells))
    return out
