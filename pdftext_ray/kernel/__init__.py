"""Per-page / per-document extraction kernel (pure Python, no Ray).

These functions define the engine's semantics: they are used both by the
single-document oracle (tests) and by the Ray Data batch stages
(pdftext_ray/stages). All algorithms reimplement the behaviors cataloged in
SURVEY.md §2 with citations into /root/reference.
"""

from pdftext_ray.kernel.document import process_document  # noqa: F401
