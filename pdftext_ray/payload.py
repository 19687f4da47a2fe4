"""Deterministic page-payload format — the engine's stand-in for a PDF page.

A document in the public input table (``doc_id``, ``spans`` per
BASELINE.json ``input_hint``) carries one ``kind='text'`` span per page whose
``text`` field is a serialized char-stream payload in this format, plus
``kind='media'`` spans for embedded media. The decode stage
(kernel/decode.py) parses this payload and applies the same coordinate
transforms pdftext applies to pdfium output (pdftext/pdf/chars.py:10-55).

Line-oriented records, ``|``-separated fields; chars are encoded as integer
codepoints so no raw control character ever appears in the payload:

    P|page_idx|x1,y1,x2,y2|rotation      page header (raw pdfium-space bbox)
    F|name|flags|size|weight             font declaration (id = appearance order)
    C|cp|fid|rot|x1,y1,x2,y2             char: codepoint, font id, char angle,
                                         RAW charbox (pre-shift / pre-flip)
    M|ref|x1,y1,x2,y2|offset             media item (top-left page coords)
    L|x1,y1,x2,y2|dest_page|dx,dy|url    link annotation (raw rect + dest)
    T|x1,y1,x2,y2                        table bbox (image coords)
    I|w,h                                image size for table extraction

Floats are serialized with ``repr`` so encode→decode round-trips exactly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence
from urllib.parse import quote, unquote


def _f(vals: Sequence[float]) -> str:
    return ",".join(repr(float(v)) for v in vals)


class PayloadWriter:
    """Builds one page payload string."""

    def __init__(self, page_idx: int, page_bbox: Sequence[float], rotation: int = 0):
        self.lines: List[str] = [f"P|{page_idx}|{_f(page_bbox)}|{rotation}"]
        self._fonts: dict = {}

    def _font_id(self, name: str, flags: int, size: float, weight: float) -> int:
        key = (name, int(flags), float(size), float(weight))
        fid = self._fonts.get(key)
        if fid is None:
            fid = len(self._fonts)
            self._fonts[key] = fid
            self.lines.append(f"F|{quote(name, safe='')}|{int(flags)}|{repr(float(size))}|{repr(float(weight))}")
        return fid

    def add_char(self, ch: str, bbox: Sequence[float], font: Sequence, rotation: float = 0.0) -> None:
        fid = self._font_id(font[0], font[1], font[2], font[3])
        self.lines.append(f"C|{ord(ch)}|{fid}|{repr(float(rotation))}|{_f(bbox)}")

    def add_media(self, media_ref: str, bbox: Sequence[float], offset: int) -> None:
        self.lines.append(f"M|{quote(media_ref, safe='')}|{_f(bbox)}|{int(offset)}")

    def add_link(
        self,
        rect: Sequence[float],
        dest_page: Optional[int] = None,
        dest_pos: Optional[Sequence[float]] = None,
        url: Optional[str] = None,
    ) -> None:
        dp = "" if dest_page is None else str(int(dest_page))
        pos = "" if dest_pos is None else _f(dest_pos)
        u = "" if url is None else quote(url, safe="")
        self.lines.append(f"L|{_f(rect)}|{dp}|{pos}|{u}")

    def add_table(self, bbox: Sequence[float]) -> None:
        self.lines.append(f"T|{_f(bbox)}")

    def set_img_size(self, size: Sequence[float]) -> None:
        self.lines.append(f"I|{_f(size)}")

    def build(self) -> str:
        return "\n".join(self.lines)


class RawPage:
    """Parsed (undecoded) payload: raw coordinates exactly as serialized."""

    __slots__ = ("page_idx", "page_bbox", "rotation", "chars", "media", "links", "tables", "img_size", "fonts")

    def __init__(self):
        self.page_idx = 0
        self.page_bbox = [0.0, 0.0, 0.0, 0.0]
        self.rotation = 0
        # (cp:int, fid:int, rot:float, bbox:[4])
        self.chars: List[tuple] = []
        # (media_ref:str, bbox:[4], offset:int)
        self.media: List[tuple] = []
        # dicts: {rect, dest_page, dest_pos, url}
        self.links: List[dict] = []
        self.tables: List[List[float]] = []
        self.img_size: Optional[List[float]] = None
        self.fonts: List[tuple] = []  # type: ignore[assignment]


def parse_payload(payload: str) -> RawPage:
    page = RawPage()
    fonts: List[tuple] = []
    chars = page.chars
    for line in payload.split("\n"):
        if not line:
            continue
        tag = line[0]
        if tag == "C":
            _, cp, fid, rot, box = line.split("|")
            x1, y1, x2, y2 = box.split(",")
            chars.append((int(cp), int(fid), float(rot), [float(x1), float(y1), float(x2), float(y2)]))
        elif tag == "F":
            _, name, flags, size, weight = line.split("|")
            fonts.append((unquote(name), int(flags), float(size), float(weight)))
        elif tag == "P":
            _, idx, box, rot = line.split("|")
            page.page_idx = int(idx)
            page.page_bbox = [float(v) for v in box.split(",")]
            page.rotation = int(rot)
        elif tag == "M":
            _, ref, box, off = line.split("|")
            page.media.append((unquote(ref), [float(v) for v in box.split(",")], int(off)))
        elif tag == "L":
            _, rect, dp, pos, url = line.split("|")
            page.links.append(
                {
                    "rect": [float(v) for v in rect.split(",")],
                    "dest_page": int(dp) if dp else None,
                    "dest_pos": [float(v) for v in pos.split(",")] if pos else None,
                    "url": unquote(url) if url else None,
                }
            )
        elif tag == "T":
            page.tables.append([float(v) for v in line[2:].split(",")])
        elif tag == "I":
            page.img_size = [float(v) for v in line[2:].split(",")]
    page.fonts = fonts
    return page
