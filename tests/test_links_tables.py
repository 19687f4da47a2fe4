"""Golden tests for link resolution (J1-J4) and table-cell extraction (T1/T2)
on hand-built payloads."""

from pdftext_ray.kernel.document import ExtractConfig, process_document, table_output
from pdftext_ray.payload import PayloadWriter

FONT = ("Times", 0, 12.0, 400.0)
PAGE = [0.0, 0.0, 612.0, 792.0]


def _word(w: PayloadWriter, text: str, x: float, y: float, size: float = 12.0):
    """Render text at layout position (top-left coords) into raw coords."""
    cw = 0.6 * size
    for i, ch in enumerate(text):
        # layout → raw: raw_y = H - layout_y (page origin at 0)
        w.add_char(ch, [x + i * cw, 792.0 - y, x + (i + 1) * cw, 792.0 - (y + size)], FONT)
    return x + len(text) * cw


def test_external_link_splits_span():
    w = PayloadWriter(0, PAGE, 0)
    _word(w, "click here now\n", 50, 40)
    # link over "here" (chars 6-9): layout x 50+6*7.2 .. 50+10*7.2, raw rect
    w.add_link([50 + 6 * 7.2, 792.0 - 40, 50 + 10 * 7.2, 792.0 - 52], url="https://x.test/a")
    pages = process_document([w.build()])
    spans = [s for b in pages[0]["blocks"] for l in b["lines"] for s in l["spans"]]
    texts_urls = [(s["text"], s["url"]) for s in spans]
    # the span is re-segmented char-wise around the link (links.py:179-221)
    assert any(u == "https://x.test/a" for _, u in texts_urls)
    linked = "".join(t for t, u in texts_urls if u)
    assert "here" in linked and "click" not in linked


def test_internal_links_share_ref_and_dedup():
    w0 = PayloadWriter(0, PAGE, 0)
    _word(w0, "goto next\n", 50, 40)
    # two links to the same dest coord on page 1 → ONE shared ref (schema.py:212-218)
    w0.add_link([50, 792.0 - 40, 80, 792.0 - 52], dest_page=1, dest_pos=[100.0, 700.0])
    w0.add_link([85, 792.0 - 40, 110, 792.0 - 52], dest_page=1, dest_pos=[100.0, 700.0])
    w1 = PayloadWriter(1, PAGE, 0)
    _word(w1, "target page\n", 50, 40)
    pages = process_document([w0.build(), w1.build()])
    # refs attach to the TARGET page (links.py:224-231)
    assert pages[0]["refs"] == []
    assert len(pages[1]["refs"]) == 1
    urls = {s["url"] for b in pages[0]["blocks"] for l in b["lines"] for s in l["spans"] if s["url"]}
    assert urls == {"#page-1-0"}


def test_goto_without_pos_links_to_page_top_but_not_self():
    w0 = PayloadWriter(0, PAGE, 0)
    _word(w0, "ab cd\n", 50, 40)
    w0.add_link([50, 792.0 - 40, 62, 792.0 - 52], dest_page=0)  # self, no pos → dropped
    w0.add_link([68, 792.0 - 40, 90, 792.0 - 52], dest_page=1)  # → top of page 1
    w1 = PayloadWriter(1, PAGE, 0)
    _word(w1, "x\n", 50, 40)
    pages = process_document([w0.build(), w1.build()])
    assert len(pages[1]["refs"]) == 1 and pages[1]["refs"][0]["coord"] == [0.0, 0.0]
    urls = [s["url"] for b in pages[0]["blocks"] for l in b["lines"] for s in l["spans"]]
    assert "#page-1-0" in urls


def _table_page(scale: float):
    """3×2 grid with tight intra-cell, wide inter-cell gaps + table annotation."""
    w = PayloadWriter(0, PAGE, 0)
    ty = 100.0
    for r in range(2):
        y = ty + r * 20.0
        x = 60.0
        for c in range(3):
            _word(w, f"c{r}{c}", x, y, size=10.0)
            x += 3 * 6.0 + 30.0
        w.add_char("\n", [x, 792.0 - y, x, 792.0 - (y + 10.0)], FONT)
    img = [612.0 * scale, 792.0 * scale]
    w.set_img_size(img)
    w.add_table([50.0 * scale, 90.0 * scale, 250.0 * scale, 150.0 * scale])
    return w.build()


def test_table_cells_golden_counts_and_values():
    pages = process_document([_table_page(1.0)], ExtractConfig(disable_links=True))
    tables = table_output(pages)[0]
    assert len(tables) == 1
    cells = tables[0]
    assert len(cells) == 6
    assert [c["text"] for c in cells] == ["c00", "c01", "c02", "c10", "c11", "c12"]
    # bboxes are table-relative (tables.py:101-107)
    assert all(c["bbox"][0] >= 0 for c in cells)


def test_table_cells_scale_invariant():
    """Reference runs its golden table test at 0.5× and 2× image scale
    (tests/test_tables.py:3-12)."""
    for scale in (0.5, 2.0):
        pages = process_document([_table_page(scale)], ExtractConfig(disable_links=True))
        cells = table_output(pages)[0][0]
        assert [c["text"] for c in cells] == ["c00", "c01", "c02", "c10", "c11", "c12"], scale
