"""Char-level decode stage — the pypdfium2-style S3 transform.

Parses a page payload (pdftext_ray/payload.py) and applies the exact
coordinate semantics of pdftext's pdfium adapter:

* origin shift + y-flip into top-left coords, min/max normalisation, then
  rotation into the page rotation (pdftext/pdf/chars.py:26-35);
* page width/height = ``math.ceil(abs(...))`` of the page bbox
  (pdftext/pdf/chars.py:13-15, pdftext/pdf/pages.py:279-280);
* loose-vs-tight charbox gate: loose only when char angle == 0 and
  (char != "'" or quote_loosebox) (pdftext/pdf/chars.py:21-23). Our synthetic
  payload carries the loose box; the tight box is derived deterministically by
  shrinking the box 10% of its height at the bottom (stands in for pdfium's
  tight metrics);
* link rects: same shift/flip, rounded to 0 decimals, rotated
  (pdftext/pdf/links.py:29-44); dest positions via a ±1 expand then [:2]
  (pdftext/pdf/links.py:47-48).

A decoded char is the tuple ``(ch, bbox, rot, font, char_idx)`` where ``font``
is the tuple ``(name, flags, size, weight)``.
"""

from __future__ import annotations

import math
from typing import List, Optional

from pdftext_ray import geometry as g
from pdftext_ray.payload import RawPage, parse_payload

# decoded char tuple slots
CH, BBOX, ROT, FONT, IDX = 0, 1, 2, 3, 4


class DecodedPage:
    __slots__ = (
        "page_idx", "page_bbox", "width", "height", "rotation",
        "chars", "media", "links", "tables", "img_size",
    )

    def __init__(self):
        self.chars: List[tuple] = []
        self.media: List[tuple] = []
        self.links: List[dict] = []
        self.tables: List[List[float]] = []
        self.img_size: Optional[List[float]] = None


def _scale_rect(rect, x_start, y_start, page_width, page_height, page_rotation, do_round):
    cx1 = rect[0] - x_start
    cy1 = rect[1] - y_start
    cx2 = rect[2] - x_start
    cy2 = rect[3] - y_start
    ty1 = page_height - cy1
    ty2 = page_height - cy2
    bbox = [min(cx1, cx2), min(ty1, ty2), max(cx1, cx2), max(ty1, ty2)]
    if do_round:
        bbox = [round(v, 0) for v in bbox]
    return g.rotate(bbox, page_width, page_height, page_rotation)


def decode_page(payload: str, quote_loosebox: bool = True) -> DecodedPage:
    import numpy as np

    raw: RawPage = parse_payload(payload)
    out = DecodedPage()
    out.page_idx = raw.page_idx
    out.page_bbox = raw.page_bbox
    out.rotation = raw.rotation

    x_start, y_start, x_end, y_end = raw.page_bbox
    page_width = math.ceil(abs(x_end - x_start))
    page_height = math.ceil(abs(y_end - y_start))
    out.width = page_width
    out.height = page_height

    n = len(raw.cp)
    if n:
        # the whole S3 coordinate transform runs vectorized (float64 numpy ops
        # are bit-identical to the scalar Python arithmetic they replace)
        cb = raw.cb
        cx1, cy1, cx2, cy2 = cb[:, 0].copy(), cb[:, 1].copy(), cb[:, 2], cb[:, 3].copy()
        tight = ~((raw.cr == 0) & ((raw.cp != 39) | quote_loosebox))  # 39 == "'"
        if tight.any():
            # deterministic synthetic tight box: bottom raised by 10% height
            cy1 = np.where(tight, cy1 + 0.1 * (cy2 - cy1), cy1)
        cx1 = cx1 - x_start
        cx2 = cx2 - x_start
        ty1 = page_height - (cy1 - y_start)
        ty2 = page_height - (cy2 - y_start)
        bx1 = np.minimum(cx1, cx2)
        by1 = np.minimum(ty1, ty2)
        bx2 = np.maximum(cx1, cx2)
        by2 = np.maximum(ty1, ty2)
        boxes = np.stack([bx1, by1, bx2, by2], axis=1)
        if raw.rotation:
            rot = raw.rotation
            if rot == 90:
                boxes = np.stack([page_height - by2, bx1, page_height - by1, bx2], axis=1)
            elif rot == 180:
                boxes = np.stack([page_width - bx2, page_height - by2, page_width - bx1, page_height - by1], axis=1)
            elif rot == 270:
                boxes = np.stack([by1, page_width - bx2, by2, page_width - bx1], axis=1)
            else:
                raise ValueError("Rotation must be one of [0, 90, 180, 270] degrees.")
        fonts = raw.fonts
        out.chars = list(
            zip(
                map(chr, raw.cp.tolist()),
                boxes.tolist(),
                raw.cr.tolist(),
                [fonts[f] for f in raw.cf.tolist()],
                range(n),
            )
        )

    out.media = raw.media
    out.tables = raw.tables
    out.img_size = raw.img_size

    for ln in raw.links:
        bbox = _scale_rect(ln["rect"], x_start, y_start, page_width, page_height, raw.rotation, do_round=True)
        dest_pos = None
        if ln["dest_pos"] is not None:
            dx, dy = ln["dest_pos"]
            dest_pos = _scale_rect(
                [dx - 1, dy - 1, dx + 1, dy + 1],
                x_start, y_start, page_width, page_height, raw.rotation, do_round=True,
            )[:2]
        out.links.append(
            {
                "page": raw.page_idx,
                "bbox": bbox,
                "dest_page": ln["dest_page"],
                "dest_pos": dest_pos,
                "url": ln["url"],
            }
        )
    return out
