"""Per-document extraction: page processing, output shaping, span sequence.

Mirrors the reference pipeline lifecycle (pdftext/extraction.py:93-155,
pdftext/pdf/pages.py:260-301) on one document:

    decode (S3) → deduplicate_chars (M1) → get_spans (M2) → get_lines (M3)
    → assign_scripts (M4) → get_blocks (M5) → links (J1-J4)
    → output shaping (M8/M9) / merge_text (M10) / span sequence (north rule).

``process_document`` is the single-document ORACLE for tests and the exact
code the Ray Data stages execute per row — orchestration (batching, actor
pools, shuffles) lives in pdftext_ray/stages, semantics live here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pdftext_ray.kernel import cluster, links as klinks
from pdftext_ray.kernel.decode import DecodedPage, decode_page, decode_page_dedup
from pdftext_ray.kernel.tables import table_cell_text
from pdftext_ray.textops import handle_hyphens, postprocess_text, sort_blocks


@dataclass(frozen=True)
class ExtractConfig:
    """Tunable knobs — the reference's kwargs surface
    (pdftext/extraction.py:93-101, pdftext/pdf/pages.py:260-266)."""

    quote_loosebox: bool = True
    # merge form-field (annotation) char streams into page content before
    # decode — the FPDFPage_Flatten + init_forms analog (reference
    # pdftext/pdf/utils.py:14-17, pdftext/extraction.py:18-24). False leaves
    # form text invisible, exactly like an un-flattened pdfium text page.
    flatten_pdf: bool = False
    superscript_height_threshold: float = 0.7
    line_distance_threshold: float = 0.1
    disable_links: bool = False
    sort: bool = True
    keep_chars: bool = False
    hyphens: bool = False  # plain-text mode: keep hyphens?


DEFAULT_CONFIG = ExtractConfig()


def process_page(decoded: DecodedPage, cfg: ExtractConfig = DEFAULT_CONFIG, pre_deduped: bool = False) -> dict:
    """Run the per-page clustering chain (pdftext/pdf/pages.py:270-301)."""
    if pre_deduped and decoded.arrays is not None:
        # hot path: span fold directly on the decoded arrays (no char tuples)
        spans = cluster.get_spans_from_arrays(
            decoded.arrays,
            superscript_height_threshold=cfg.superscript_height_threshold,
            line_distance_threshold=cfg.line_distance_threshold,
        )
    else:
        chars = decoded.chars if pre_deduped else cluster.deduplicate_chars(decoded.chars)
        spans = cluster.get_spans(
            chars,
            superscript_height_threshold=cfg.superscript_height_threshold,
            line_distance_threshold=cfg.line_distance_threshold,
        )
    lines = cluster.get_lines(spans)
    cluster.assign_scripts(
        lines,
        height_threshold=cfg.superscript_height_threshold,
        line_distance_threshold=cfg.line_distance_threshold,
    )
    blocks = cluster.get_blocks(lines)
    return {
        "page": decoded.page_idx,
        "bbox": decoded.page_bbox,
        "width": decoded.width,
        "height": decoded.height,
        "rotation": decoded.rotation,
        "blocks": blocks,
        "media": decoded.media,
        "links": decoded.links,
        "tables": decoded.tables,
        "img_size": decoded.img_size,
    }


def process_document(payloads: List[str], cfg: ExtractConfig = DEFAULT_CONFIG, backend=None) -> List[dict]:
    """Decode + cluster every page, then resolve links document-wide.

    ``backend`` is a kernel.backend.DecoderBackend for alternative page-source
    formats (None = the default synthetic-payload decode, same semantics as
    backend=PayloadBackend())."""
    decode = (
        (lambda p: decode_page_dedup(p, cfg.quote_loosebox, cfg.flatten_pdf))
        if backend is None
        else (lambda p: backend.decode(p, cfg.quote_loosebox, cfg.flatten_pdf))
    )
    pages = [process_page(decode(p), cfg, pre_deduped=True) for p in payloads]
    if not cfg.disable_links:
        klinks.add_links_and_refs(pages, [pg["links"] for pg in pages])
    else:
        for pg in pages:
            pg["refs"] = []
    return pages


def _shape_span(span: dict, keep_chars: bool) -> dict:
    """M8: span output shaping (pdftext/extraction.py:83-90)."""
    out = {
        "bbox": span["bbox"],
        "text": handle_hyphens(postprocess_text(span["text"]), keep_hyphens=True),
        "font": {
            "name": span["font"][0],
            "flags": span["font"][1],
            "size": span["font"][2],
            "weight": span["font"][3],
        },
        "char_start_idx": span["char_start_idx"],
        "char_end_idx": span["char_end_idx"],
        "rotation": span["rotation"],
        "url": span["url"],
        "superscript": span["superscript"],
        "subscript": span["subscript"],
    }
    if keep_chars:
        out["chars"] = [
            {"char": c[0], "bbox": c[1], "rotation": c[2], "char_idx": c[4]}
            for c in span["chars"]
        ]
    return out


def shape_dictionary(pages: List[dict], cfg: ExtractConfig = DEFAULT_CONFIG) -> List[dict]:
    """M9: prune to the JSON output shape, optional reading-order sort,
    rotated page dim swap (pdftext/extraction.py:110-131)."""
    out_pages = []
    for page in pages:
        blocks = [
            {
                "bbox": blk["bbox"],
                "lines": [
                    {
                        "bbox": line["bbox"],
                        "spans": [_shape_span(s, cfg.keep_chars) for s in line["spans"]],
                    }
                    for line in blk["lines"]
                ],
            }
            for blk in page["blocks"]
        ]
        if cfg.sort:
            blocks = sort_blocks(blocks)
        width, height = page["width"], page["height"]
        bbox = page["bbox"]
        if page["rotation"] in (90, 270):
            width, height = height, width
            bbox = [bbox[2], bbox[3], bbox[0], bbox[1]]
        out_pages.append(
            {
                "page": page["page"],
                "bbox": bbox,
                "width": width,
                "height": height,
                "rotation": page["rotation"],
                "blocks": blocks,
                "refs": [
                    {"idx": r["idx"], "page": r["page"], "coord": r["coord"]}
                    for r in page.get("refs", [])
                ],
            }
        )
    return out_pages


def merge_text(page: dict, sort: bool = False, hyphens: bool = False) -> str:
    """M10: flatten one page to plain text (pdftext/postprocessing.py:95-113)."""
    blocks = page["blocks"]
    if sort:
        blocks = sort_blocks(blocks)
    text = ""
    for blk in blocks:
        block_text = ""
        for line in blk["lines"]:
            line_text = "".join(s["text"] for s in line["spans"])
            line_text = postprocess_text(line_text)
            block_text += line_text.rstrip() + "\n"
        text += block_text.rstrip() + "\n\n"
    return handle_hyphens(text, keep_hyphens=hyphens)


def plain_text(pages: List[dict], sort: bool = False, hyphens: bool = False) -> str:
    """Reference ``plain_text_output``: per-page merge_text stripped, joined
    with \\n (pdftext/extraction.py:71-81)."""
    return "\n".join(merge_text(pg, sort=sort, hyphens=hyphens).strip() for pg in pages)


def span_sequence(pages: List[dict]) -> List[dict]:
    """The flagship north-rule output: per-document interleaved span sequence.

    Per page, text blocks and media items (pseudo-blocks with their layout
    bbox) are merged in reading order using the reference's sort_blocks
    quantization (y-bucket tolerance 1.25, then x — postprocessing.py:76-92);
    text blocks flatten to their spans (dictionary-output text semantics,
    pdftext/extraction.py:83-90), each media item emits one
    ``kind='media'`` span. ``order`` is the global running index per doc.
    """
    seq: List[dict] = []
    order = 0
    for page in pages:
        entries = [
            {"bbox": blk["bbox"], "_blk": blk, "_media": None}
            for blk in page["blocks"]
        ]
        entries.extend(
            {"bbox": m[1], "_blk": None, "_media": m[0]} for m in page["media"]
        )
        for entry in sort_blocks(entries):
            if entry["_media"] is not None:
                seq.append({"kind": "media", "text": "", "media_ref": entry["_media"], "order": order})
                order += 1
            else:
                for line in entry["_blk"]["lines"]:
                    for span in line["spans"]:
                        seq.append(
                            {
                                "kind": "text",
                                "text": handle_hyphens(postprocess_text(span["text"]), keep_hyphens=True),
                                "media_ref": "",
                                "order": order,
                            }
                        )
                        order += 1
    return seq


def extract_document(payloads: List[str], cfg: ExtractConfig = DEFAULT_CONFIG, backend=None) -> dict:
    """One-call flagship: payloads → span sequence + per-doc metrics."""
    pages = process_document(payloads, cfg, backend=backend)
    seq = span_sequence(pages)
    return {
        "spans": seq,
        "n_pages": len(pages),
        "n_chars": sum(len(s["chars"]) for pg in pages for b in pg["blocks"] for l in b["lines"] for s in l["spans"]),
    }


def table_output(pages: List[dict]) -> List[List[List[dict]]]:
    """Reference ``table_output`` (pdftext/extraction.py:134-155): per page,
    extract cell text for each annotated table region (J5 zip is implicit —
    table bboxes ride in the page payload)."""
    out = []
    for page in pages:
        if page["tables"] and page["img_size"]:
            out.append(table_cell_text(page["tables"], page, page["img_size"]))
        else:
            out.append([])
    return out
