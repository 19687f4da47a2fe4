"""Axis-aligned bbox geometry over plain ``[x1, y1, x2, y2]`` float lists.

Semantics match the reference's ``Bbox`` class (pdftext/schema.py:7-126) but
are expressed as free functions over plain lists (no wrapper objects in the
hot path) plus numpy batch kernels for the pairwise-intersection join
(pdftext/pdf/utils.py:41-59).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

Box = List[float]


def width(b: Sequence[float]) -> float:
    return b[2] - b[0]


def height(b: Sequence[float]) -> float:
    return b[3] - b[1]


def area(b: Sequence[float]) -> float:
    return (b[2] - b[0]) * (b[3] - b[1])


def center(b: Sequence[float]) -> List[float]:
    return [(b[0] + b[2]) / 2, (b[1] + b[3]) / 2]


def merge(a: Sequence[float], b: Sequence[float]) -> Box:
    """Bounding union; mirrors Bbox.merge (pdftext/schema.py:58-64)."""
    return [
        a[0] if a[0] < b[0] else b[0],
        a[1] if a[1] < b[1] else b[1],
        a[2] if a[2] > b[2] else b[2],
        a[3] if a[3] > b[3] else b[3],
    ]


def overlap_x(a: Sequence[float], b: Sequence[float]) -> float:
    return max(0.0, min(a[2], b[2]) - max(a[0], b[0]))


def overlap_y(a: Sequence[float], b: Sequence[float]) -> float:
    return max(0.0, min(a[3], b[3]) - max(a[1], b[1]))


def intersection_area(a: Sequence[float], b: Sequence[float]) -> float:
    return overlap_x(a, b) * overlap_y(a, b)


def intersection_pct(a: Sequence[float], b: Sequence[float]) -> float:
    """Fraction of ``a``'s area covered by ``b`` (pdftext/schema.py:75-80)."""
    a_area = area(a)
    if a_area == 0:
        return 0.0
    return intersection_area(a, b) / a_area


def ensure_nonzero_area(b: Sequence[float]) -> Box:
    """Pad degenerate boxes (+1 on each max edge); pdftext/schema.py:8-14."""
    return [b[0], b[1], max(b[0], b[2] + 1), max(b[1], b[3] + 1)]


def rotate(b: Sequence[float], page_width: float, page_height: float, rotation: int) -> Box:
    """Rotate a top-left-origin bbox into the page rotation.

    Mirrors Bbox.rotate (pdftext/schema.py:82-114) including the ValueError on
    rotations outside {0, 90, 180, 270} and the min/max normalisation.
    """
    if rotation not in (0, 90, 180, 270):
        raise ValueError("Rotation must be one of [0, 90, 180, 270] degrees.")
    x1, y1, x2, y2 = b[0], b[1], b[2], b[3]
    if rotation == 0:
        return [x1, y1, x2, y2]
    if rotation == 90:
        nx1, ny1, nx2, ny2 = page_height - y2, x1, page_height - y1, x2
    elif rotation == 180:
        nx1, ny1, nx2, ny2 = page_width - x2, page_height - y2, page_width - x1, page_height - y1
    else:  # 270
        nx1, ny1, nx2, ny2 = y1, page_width - x2, y2, page_width - x1
    return [min(nx1, nx2), min(ny1, ny2), max(nx1, nx2), max(ny1, ny2)]


def rescale(b: Sequence[float], img_size: Sequence[float], page_width: float, page_height: float) -> Box:
    """Scale page coords into image coords (pdftext/schema.py:116-126)."""
    ws = img_size[0] / page_width
    hs = img_size[1] / page_height
    return [b[0] * ws, b[1] * hs, b[2] * ws, b[3] * hs]


def matrix_intersection_area(boxes1: Sequence[Sequence[float]], boxes2: Sequence[Sequence[float]]) -> np.ndarray:
    """(N, M) pairwise intersection areas — the spatial theta-join kernel.

    Mirrors pdftext/pdf/utils.py:41-59 (numpy broadcast).
    """
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)))
    a = np.asarray(boxes1, dtype=np.float64)[:, None, :]
    b = np.asarray(boxes2, dtype=np.float64)[None, :, :]
    w = np.maximum(0.0, np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0]))
    h = np.maximum(0.0, np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1]))
    return w * h
