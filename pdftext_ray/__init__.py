"""pdftext_ray — a Ray-Data-native structured text-extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
VikParuchuri/pdftext (reference at /root/reference, studied for behavior only)
as a streaming Ray Data pipeline over Arrow tables of interleaved text+media
documents, plus the large-scale training-data operators (dedup, similarity
search, text analysis) such a corpus pipeline needs.
"""

__version__ = "0.1.0"

import os as _os


def _blas_env_guard() -> None:
    """Pin OpenBLAS to one thread per process.

    Ray map_batches tasks run in 1-CPU slots (and Ray already exports
    OMP_NUM_THREADS=1 to workers), but this numpy's OpenBLAS is a pthreads
    build (USE_OPENMP unset) that ignores OMP_NUM_THREADS — at 32
    concurrent tasks a second spinning BLAS thread per worker only
    oversubscribes. Must run before numpy first loads libopenblas, so
    entry points import pdftext_ray before ray/numpy; ``setdefault`` keeps
    explicit user overrides authoritative. Ray workers inherit the var via
    the raylet when ray.init runs after this import.
    """
    _os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")


_blas_env_guard()
