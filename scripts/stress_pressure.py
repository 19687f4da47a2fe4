"""Object-store-pressure evidence run (VERDICT r3 item 7).

Runs the flagship extraction and an extraction→exact-dedup composition over
a 1M-doc corpus (~8.4 GB parquet, a multiple of that as in-flight Arrow)
inside a Ray session whose object store is deliberately capped far below
the working set (default 4 GB). The claim under test: the streaming
executor backpressures and SPILLS rather than OOMing — block counts, spill
bytes and restore bytes are printed from Ray's own memory accounting.

Usage (from /root/repo, owns its Ray session):
    python scripts/stress_pressure.py [corpus_path] [object_store_gb] [phase]
where phase is one of flagship | dedup | both (default both).
Prints one JSON line; paste into BASELINE.md.
"""
import glob
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.getcwd())  # run from /root/repo; workers resolve via cwd

import ray


def spill_stats() -> dict:
    """Spill/restore accounting without grpc (sandbox has no grpcio):
    parse the raylet's own state dump + spill log lines."""
    out = {}
    logs = "/tmp/ray/ray/session_latest/logs"
    try:
        txt = open(os.path.join(logs, "debug_state.txt")).read()
        for label, key in [
            (r"cumulative spill requests: (\d+)", "cumulative_spill_requests"),
            (r"num bytes currently spilled: (\d+)", "bytes_currently_spilled"),
            (r"pinned objects size: (\d+)", "pinned_bytes"),
        ]:
            m = re.search(label, txt)
            if m:
                out[key] = int(m.group(1))
    except OSError:
        pass
    try:
        spilled = restored = None
        for line in open(os.path.join(logs, "raylet.out"), errors="replace"):
            m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
            if m:
                spilled = (int(m.group(1)), int(m.group(2)))
            m = re.search(r"Restored (\d+) MiB, (\d+) objects", line)
            if m:
                restored = (int(m.group(1)), int(m.group(2)))
        if spilled:
            out["spilled_mib"], out["spilled_objects"] = spilled
        if restored:
            out["restored_mib"], out["restored_objects"] = restored
    except OSError:
        pass
    # fsck the spill directory itself — ground truth for bytes on disk
    spill_files = glob.glob(
        "/tmp/ray/ray/session_latest/ray_spilled_objects*/**/*", recursive=True)
    out["spill_dir_bytes"] = sum(
        os.path.getsize(f) for f in spill_files if os.path.isfile(f))
    return out


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/pdftext_ray_corpus/bench_n1000000_s42_v8"
    store_gb = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    phase = sys.argv[3] if len(sys.argv) > 3 else "both"
    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
        object_store_memory=int(store_gb * 1024**3),
    )
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from pdftext_ray.ops.dedup import exact_dedup
    from pdftext_ray.pipelines import extract as P

    out_dir = "/tmp/pdftext_ray_pressure"
    shutil.rmtree(out_dir, ignore_errors=True)
    result = {"probe": "object-store pressure (capped plasma)",
              "corpus": corpus, "object_store_gb": store_gb}

    if phase in ("flagship", "both"):
        t0 = time.perf_counter()
        P.extract_corpus_skew_aware(corpus).write_parquet(
            os.path.join(out_dir, "spans"))
        flagship_sec = round(time.perf_counter() - t0, 1)
        n_docs = ray.data.read_parquet(
            os.path.join(out_dir, "spans"), columns=["doc_id"]).count()
        result["flagship"] = {"sec": flagship_sec, "docs": n_docs,
                              **spill_stats()}

    if phase in ("dedup", "both"):
        t0 = time.perf_counter()
        survivors = exact_dedup(
            P.extract_plain_text_corpus_skew_aware(corpus),
            id_col="doc_id", text_col="text",
        ).count()
        dedup_sec = round(time.perf_counter() - t0, 1)
        result["plain_exact_dedup"] = {
            "sec": dedup_sec, "survivors": survivors, **spill_stats()}

    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
