"""Error isolation and nested dictionary-output structure."""

import pyarrow as pa
import ray

from pdftext_ray.kernel.document import ExtractConfig
from pdftext_ray.pipelines import corpus_io, extract as P


def test_corrupt_doc_isolated_not_fatal():
    """One malformed payload must fail ONLY its row (error column), not the
    block or the job (SURVEY.md §4 stragglers/retries)."""
    good = corpus_io.generate_corpus_table(4).select(["doc_id", "spans"])
    bad = pa.Table.from_arrays(
        [
            pa.array(["doc-bad"], good.schema.field("doc_id").type),
            pa.array(
                [[{"kind": "text", "text": "P|0|not,a,valid|payload\nCB|zz", "media_ref": "", "offset": 0}]],
                good.schema.field("spans").type,
            ),
        ],
        schema=good.schema,
    )
    ds = ray.data.from_arrow(pa.concat_tables([good, bad]))
    out = P.extract_spans(ds, batch_size=8).to_pandas()
    assert len(out) == 5
    failed = out[out["doc_id"] == "doc-bad"]
    assert len(failed) == 1 and failed.iloc[0]["error"] != ""
    assert (out[out["doc_id"] != "doc-bad"]["error"] == "").all()


def test_dictionary_output_nested_structure_and_keep_chars():
    table = corpus_io.generate_corpus_table(6).select(["doc_id", "spans"])
    ds = ray.data.from_arrow(table)
    out = P.extract_dictionary(ds, ExtractConfig(keep_chars=True)).to_pandas()
    assert len(out) == 6
    doc = out[out["doc_id"] == "doc-00000000"].iloc[0]
    page = doc["pages"][0]
    # reference page shape: page/bbox/width/height/rotation/blocks/refs
    assert set(page.keys()) == {"page", "bbox", "width", "height", "rotation", "blocks", "refs"}
    assert page["width"] == 612 and page["height"] == 792
    span = page["blocks"][0]["lines"][0]["spans"][0]
    assert {"bbox", "text", "font", "rotation", "url", "superscript", "subscript",
            "char_start_idx", "char_end_idx", "chars"} <= set(span.keys())
    # keep_chars exposes per-char bbox (reference tests/test_extraction.py:24-27)
    ch = span["chars"][0]
    assert len(ch["bbox"]) == 4 and len(ch["char"]) == 1
    # without keep_chars the chars field is absent
    out2 = P.extract_dictionary(ds, ExtractConfig(keep_chars=False)).to_pandas()
    span2 = out2.iloc[0]["pages"][0]["blocks"][0]["lines"][0]["spans"][0]
    assert "chars" not in span2
