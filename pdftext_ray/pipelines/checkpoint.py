"""Checkpointed, resumable extraction runs (north rule: per-partition lineage).

Partition unit = a deterministic chunk of the input's parquet fragment files
(one output directory per input shard, per the resumable-output pattern).
Each partition is processed as its own Ray Data pipeline, written atomically
(tmp dir → rename) together with a ``_manifest/part-{i}.json`` recording the
input fingerprint, row count and basic metrics. A killed run restarted with
the same arguments skips every partition whose manifest is present and whose
input fingerprint still matches — no re-extraction of completed work.

The reference has no checkpoint/resume at all (SURVEY.md §4); this is the
engine-side addition the 100 TB target requires.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import List, Optional

import ray.data

from pdftext_ray.kernel.document import ExtractConfig
from pdftext_ray.pipelines import extract as P


def _input_files(input_path: str) -> List[str]:
    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "**", "*.parquet"), recursive=True))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    return files


def _fingerprint(files: List[str], root: str) -> dict:
    # key by path relative to the input root: hive layouts repeat basenames
    # across partition dirs, and basename keys would collide/mask changes.
    # size + mtime_ns: a rewrite that keeps the byte count equal must not be
    # silently skipped on resume as already-done (ADVICE r1)
    return {
        os.path.relpath(f, root): [os.path.getsize(f), os.stat(f).st_mtime_ns]
        for f in files
    }


def run_checkpointed(
    input_path: str,
    output_dir: str,
    cfg: Optional[ExtractConfig] = None,
    num_partitions: int = 8,
    skew_aware: bool = True,
) -> dict:
    """Run (or resume) a full extraction over ``input_path``.

    Skew handling composes with checkpointing through the ingest layout: if
    the input is hive-partitioned by ``size_bucket`` (pdftext_ray ingest),
    files from the ``large`` bucket form their own partitions and take the
    page-exploded plan; everything else takes the fused doc-parallel plan —
    each partition reads its files exactly once. Returns
    {"partitions": n, "processed": k, "skipped": m, "rows": total}.
    """
    cfg = cfg or ExtractConfig()
    files = _input_files(input_path)
    small_files = [f for f in files if f"size_bucket=large{os.sep}" not in f]
    large_files = [f for f in files if f"size_bucket=large{os.sep}" in f]

    n_small = min(max(1, num_partitions - (1 if large_files else 0)), max(len(small_files), 1))
    chunks = [(small_files[i::n_small], "small") for i in range(n_small) if small_files]
    if large_files:
        chunks.append((large_files, "large"))
    num_partitions = len(chunks)

    manifest_dir = os.path.join(output_dir, "_manifest")
    os.makedirs(manifest_dir, exist_ok=True)

    processed = skipped = total_rows = 0
    for i, (chunk, bucket) in enumerate(chunks):
        mpath = os.path.join(manifest_dir, f"part-{i}.json")
        fp = _fingerprint(chunk, input_path)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("status") == "done" and manifest.get("fingerprint") == fp:
                skipped += 1
                total_rows += manifest.get("rows", 0)
                continue
        part_dir = os.path.join(output_dir, f"part-{i}")
        tmp_dir = part_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)

        _t0 = time.monotonic()
        ds = ray.data.read_parquet(chunk, columns=["doc_id", "spans"])
        if bucket == "large":
            out = P.extract_spans_exploded(ds, cfg, page_batch_size=32)
        elif skew_aware and not any("size_bucket=" in f for f in chunk):
            # un-bucketed input: size in flight (second pass over the chunk)
            out = P.extract_spans_skew_aware(ds, cfg)
        else:
            out = P.extract_spans(ds, cfg)
        out.write_parquet(tmp_dir)
        wall_s = round(time.monotonic() - _t0, 3)

        # per-partition metrics ride in the manifest (lineage + observability)
        part = ray.data.read_parquet(tmp_dir, columns=["n_pages", "n_chars", "error"])
        rows = part.count()
        errors = part.filter(expr="error != ''").count()
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        with open(mpath + ".tmp", "w") as f:
            json.dump(
                {
                    "status": "done",
                    "partition": i,
                    "bucket": bucket,
                    "fingerprint": fp,
                    "rows": rows,
                    "errors": errors,
                    "wall_s": wall_s,
                    "docs_per_sec": round(rows / wall_s, 1) if wall_s > 0 else None,
                    "input_files": [os.path.basename(c) for c in chunk],
                },
                f,
            )
        os.replace(mpath + ".tmp", mpath)
        processed += 1
        total_rows += rows

    return {
        "partitions": num_partitions,
        "processed": processed,
        "skipped": skipped,
        "rows": total_rows,
    }


def run_partitioned_stage(
    input_path: str,
    stage_dir: str,
    stage_fn,
    num_partitions: int = 8,
    columns: Optional[List[str]] = None,
) -> dict:
    """Generic resumable partitioned map stage (the run_checkpointed loop,
    factored for composed pipelines): split the input's parquet files into
    deterministic chunks, run ``stage_fn(Dataset) -> Dataset`` per chunk,
    write each result atomically (tmp → rename) under ``stage_dir/part-i``
    with a fingerprinted manifest. A restarted run skips every partition
    whose manifest matches its input fingerprint. Returns
    {"partitions", "processed", "skipped", "rows", "part_files"} where
    part_files flat-lists the parquet files of parts that produced rows (an
    all-gated-out chunk writes a manifest but no parquet; Ray's
    read_parquet takes files, not a list of directories)."""
    files = _input_files(input_path)
    n = min(max(1, num_partitions), len(files))
    chunks = [files[i::n] for i in range(n)]

    manifest_dir = os.path.join(stage_dir, "_manifest")
    os.makedirs(manifest_dir, exist_ok=True)

    def _part_files(part_dir: str) -> List[str]:
        return sorted(
            os.path.join(part_dir, f)
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )

    processed = skipped = total_rows = 0
    part_files: List[str] = []
    for i, chunk in enumerate(chunks):
        mpath = os.path.join(manifest_dir, f"part-{i}.json")
        part_dir = os.path.join(stage_dir, f"part-{i}")
        fp = _fingerprint(chunk, input_path)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("status") == "done" and manifest.get("fingerprint") == fp:
                skipped += 1
                total_rows += manifest.get("rows", 0)
                if manifest.get("rows", 0):
                    part_files.extend(_part_files(part_dir))
                continue
        tmp_dir = part_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)

        _t0 = time.monotonic()
        out = stage_fn(ray.data.read_parquet(chunk, columns=columns))
        out.write_parquet(tmp_dir)
        wall_s = round(time.monotonic() - _t0, 3)
        # a fully-filtered partition writes no files — and Ray then doesn't
        # even create the directory; the rename below still needs one
        os.makedirs(tmp_dir, exist_ok=True)
        wrote = any(f.endswith(".parquet") for f in os.listdir(tmp_dir))
        rows = ray.data.read_parquet(tmp_dir).count() if wrote else 0
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        with open(mpath + ".tmp", "w") as f:
            json.dump(
                {
                    "status": "done",
                    "partition": i,
                    "fingerprint": fp,
                    "rows": rows,
                    "wall_s": wall_s,
                    "rows_per_sec": round(rows / wall_s, 1) if wall_s > 0 else None,
                    "input_files": [os.path.relpath(c, input_path) for c in chunk],
                },
                f,
            )
        os.replace(mpath + ".tmp", mpath)
        processed += 1
        total_rows += rows
        if rows:
            part_files.extend(_part_files(part_dir))

    return {
        "partitions": n,
        "processed": processed,
        "skipped": skipped,
        "rows": total_rows,
        "part_files": part_files,
    }


def _finalize_atomic(ds: ray.data.Dataset, final_dir: str) -> int:
    """Write the (cheap, global) phase-2 result atomically; returns rows."""
    tmp = final_dir + ".tmp"
    if os.path.isdir(tmp):
        import shutil

        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)  # an empty write creates no directory
    if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
        # empty result: still write one schema-carrying part so the final
        # dir reads back as an empty TYPED dataset (the _write_orc parity)
        import pyarrow as pa
        import pyarrow.parquet as pq

        sch = ds.schema()
        empty = (
            pa.table({n: pa.array([], t) for n, t in zip(sch.names, sch.base_schema.types)})
            if sch is not None else pa.table({})
        )
        pq.write_table(empty, os.path.join(tmp, "part-empty.parquet"))
        rows = 0
    else:
        rows = ray.data.read_parquet(tmp).count()
    if os.path.isdir(final_dir):
        import shutil

        shutil.rmtree(final_dir)
    os.rename(tmp, final_dir)
    return rows


def run_clean_checkpointed(
    input_path: str,
    output_dir: str,
    num_partitions: int = 8,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.5,
    min_stop_ratio: float = 0.02,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Resumable clean_corpus (VERDICT r3 item 6: at 100 TB a 20-hour dedup
    that cannot resume is operationally broken).

    Phase 1 — the full-text scan (gate + content hash), the expensive part —
    is checkpointed per input chunk via run_partitioned_stage: a killed run
    redoes only unfinished chunks. Phase 2 — the global min-id dedup over
    survivor STATS (never text; orders of magnitude smaller) — re-runs every
    invocation and lands atomically under ``output_dir/final``. Correctness:
    gating is row-local and the dedup reduce is associative, so the final
    table EQUALS clean_corpus(full input) regardless of partitioning
    (tested). Returns phase-1 stats + {"final_rows": n, "final_dir": path}.
    """
    import functools

    from pdftext_ray.ops.relational import hash_grouped_agg
    from pdftext_ray.pipelines.clean import quality_gate_batch

    gate = functools.partial(
        quality_gate_batch,
        min_tokens=min_tokens,
        min_alpha_ratio=min_alpha_ratio,
        min_stop_ratio=min_stop_ratio,
        id_col=id_col,
        text_col=text_col,
    )
    stats = run_partitioned_stage(
        input_path,
        os.path.join(output_dir, "gated"),
        lambda ds: ds.map_batches(gate, batch_format="pyarrow"),
        num_partitions=num_partitions,
        columns=[id_col, text_col],
    )
    final_dir = os.path.join(output_dir, "final")
    if not stats["part_files"]:  # every doc gated out
        import pyarrow as pa

        empty = ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "alpha_ratio": pa.array([], pa.float64()),
            "stop_ratio": pa.array([], pa.float64()),
        }))
        rows = _finalize_atomic(empty, final_dir)
        return {**stats, "final_rows": rows, "final_dir": final_dir}
    gated = ray.data.read_parquet(stats["part_files"])
    final = hash_grouped_agg(
        gated,
        "text_hash",
        {
            id_col: (id_col, "min"),
            "n_tokens": ("n_tokens", "min"),
            "alpha_ratio": ("alpha_ratio", "min"),
            "stop_ratio": ("stop_ratio", "min"),
        },
    ).drop_columns(["text_hash"])
    rows = _finalize_atomic(final, final_dir)
    return {**stats, "final_rows": rows, "final_dir": final_dir}


def run_mixture_checkpointed(
    input_path: str,
    output_dir: str,
    num_partitions: int = 8,
    budget: int = 512,
    alpha: float = 0.5,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.5,
    min_stop_ratio: float = 0.02,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 17,
) -> dict:
    """Resumable training_mixture: phase 1 (gate + hash, checkpointed per
    chunk) feeds the identical global dedup→rebalance→pack phase
    (mixture_from_gated) every run; output lands atomically under
    ``output_dir/final`` and EQUALS training_mixture(full input)."""
    import functools

    from pdftext_ray.pipelines.clean import quality_gate_batch
    from pdftext_ray.pipelines.mixture import mixture_from_gated

    gate = functools.partial(
        quality_gate_batch,
        min_tokens=min_tokens,
        min_alpha_ratio=min_alpha_ratio,
        min_stop_ratio=min_stop_ratio,
        id_col=id_col,
        text_col=text_col,
        keep_cols=(lang_col,),
    )
    stats = run_partitioned_stage(
        input_path,
        os.path.join(output_dir, "gated"),
        lambda ds: ds.map_batches(gate, batch_format="pyarrow"),
        num_partitions=num_partitions,
        columns=[id_col, lang_col, text_col],
    )
    final_dir = os.path.join(output_dir, "final")
    if not stats["part_files"]:
        import pyarrow as pa

        empty = ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            lang_col: pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "start_offset": pa.array([], pa.int64()),
            "seq_id": pa.array([], pa.int64()),
            "seq_pos": pa.array([], pa.int64()),
            "n_seqs": pa.array([], pa.int64()),
        }))
        rows = _finalize_atomic(empty, final_dir)
        return {**stats, "final_rows": rows, "final_dir": final_dir}
    gated = ray.data.read_parquet(stats["part_files"])
    final = mixture_from_gated(
        gated, budget=budget, alpha=alpha,
        lang_col=lang_col, id_col=id_col, seed=seed,
    )
    rows = _finalize_atomic(final, final_dir)
    return {**stats, "final_rows": rows, "final_dir": final_dir}
