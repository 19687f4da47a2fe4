"""Multimodal loop-closure: extracted media spans → decoded features.

The flagship extraction emits ``kind='media'`` spans with ``media_ref`` URIs
interleaved at their layout positions. This pipeline joins those refs against
a media payload table (binary blobs + typed metadata) and runs the
decode/resize/frame-sample featurizer (ops/media.py, codec stubbed per the
task brief), producing one feature row per referenced media item.

Plan: flatten media refs (vectorized) → inner join refs⋈payloads. The join is
a broadcast when the payload table is given in-memory, or Ray's native
hash-partitioned join for a large on-disk media table — media payloads are
WIDE rows, so only referenced payloads flow into the featurizer.
"""

from __future__ import annotations

from typing import Optional, Union

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from pdftext_ray.ops.media import MEDIA_SCHEMA, featurize_media


def referenced_media(span_seq: ray.data.Dataset) -> ray.data.Dataset:
    """Span-sequence rows → (doc_id, media_ref) rows, one per media span
    (vectorized; a doc referencing the same media twice yields two rows)."""
    def refs(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        if len(spans) == 0 or pa.types.is_null(spans.type.value_type):
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "media_ref": pa.array([], pa.string())})
        import numpy as np

        counts = pc.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), counts)
        flat = spans.flatten()
        mask = pc.equal(flat.field("kind"), "media")
        refs_arr = flat.field("media_ref").filter(mask)
        kept_docs = pa.array(doc_ids, pa.string()).filter(mask)
        return pa.table({"doc_id": kept_docs, "media_ref": refs_arr})

    return span_seq.map_batches(refs, batch_format="pyarrow")


def featurize_referenced_media(
    span_seq: ray.data.Dataset,
    media_payloads: Union[pa.Table, ray.data.Dataset],
    out_size: int = 32,
    frame_stride: int = 4,
) -> ray.data.Dataset:
    """Features for every media item referenced by the extracted spans."""
    refs = referenced_media(span_seq)
    if isinstance(media_payloads, pa.Table):
        # collect the DISTINCT ref set once (small: ids only), filter the
        # payload table once — a per-batch filter would re-emit a payload for
        # every refs batch that mentions it (duplicates, partition-dependent)
        distinct = set()
        for b in refs.select_columns(["media_ref"]).iter_batches(batch_format="pyarrow"):
            distinct.update(b.column("media_ref").to_pylist())
        mask = pc.is_in(media_payloads.column("media_ref"), value_set=pa.array(sorted(distinct)))
        media = ray.data.from_arrow(media_payloads.filter(mask))
    else:
        media = refs.join(
            media_payloads, join_type="inner", num_partitions=16, on=("media_ref",)
        ).select_columns([f.name for f in MEDIA_SCHEMA])
    return featurize_media(media, out_size=out_size, frame_stride=frame_stride, batch_size=16)


def synth_payloads_for_corpus(span_seq: ray.data.Dataset, seed: int = 3) -> pa.Table:
    """Deterministic media payload table covering every ref in the corpus."""
    import hashlib

    import numpy as np

    refs = sorted(
        set(
            r["media_ref"]
            for b in referenced_media(span_seq).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )
    )
    types, payloads, ws, hs, fs = [], [], [], [], []
    for ref in refs:
        h = hashlib.blake2b(f"{seed}:{ref}".encode(), digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        mtype = ["image", "video", "audio"][rng.randint(0, 3)]
        types.append(mtype)
        payloads.append(rng.bytes(256))
        ws.append(int(rng.randint(16, 96)))
        hs.append(int(rng.randint(16, 96)))
        fs.append(int(rng.randint(1, 24)) if mtype == "video" else 1)
    return pa.Table.from_arrays(
        [
            pa.array(refs, pa.string()), pa.array(types, pa.string()),
            pa.array(payloads, pa.binary()), pa.array(ws, pa.int32()),
            pa.array(hs, pa.int32()), pa.array(fs, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )
