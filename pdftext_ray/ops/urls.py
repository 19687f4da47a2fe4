"""URL canonicalization + URL-level dedup — the Common-Crawl-style first
pass of a web training-data pipeline (dedup by canonical URL before any
content hashing touches the text).

The canonicalization contract is an ordered chain of RE2 whole-string
replaces, chosen so the DuckDB oracle can mirror every step verbatim
(``regexp_replace(..., 'g')``); both sides run the SAME regexes over the
SAME input, so agreement is a real cross-engine check, not a replay:

  1. lowercase the whole URL (CC-index key convention)
  2. strip the fragment            ``#.*``        -> ''
  3. drop utm_* tracking params    ``utm_[a-z]+=[^&]*`` -> ''
  4. collapse separator runs       ``([?&])&+``   -> ``\\1``
  5. strip a trailing '?' / '&'    ``[?&]+$``     -> ''
  6. strip default ports           ``^(https?://[^/?:]+):(?:80|443)([/?]|$)`` -> ``\\1\\2``
  7. bare host gains a '/'         ``^(https?://[^/?]+)$`` -> ``\\1/``

Scale notes: canonicalization is a stateless vectorized ``map_batches``
(pure Arrow RE2, zero Python per row). ``url_dedup`` shuffles ONLY the
(id, canonical_url) projection on a few-partition hash of the canonical
URL and keeps the smallest id per group — the same co-located vectorized
aggregate as exact content dedup (``ops/dedup.exact_dedup``), so document
text never enters the exchange.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (pattern, replacement) — applied in order after utf8_lower. Mirrored
# token-for-token by url_canon_sql() for the DuckDB oracle.
URL_CANON_STEPS = (
    (r"#.*", ""),
    (r"utm_[a-z]+=[^&]*", ""),
    (r"([?&])&+", r"\1"),
    (r"[?&]+$", ""),
    (r"^(https?://[^/?:]+):(?:80|443)([/?]|$)", r"\1\2"),
    (r"^(https?://[^/?]+)$", r"\1/"),
)


def canonicalize_array(urls) -> pa.ChunkedArray:
    """Apply the canonicalization chain to a string array (Arrow RE2)."""
    out = pc.utf8_lower(urls)
    for pat, rep in URL_CANON_STEPS:
        out = pc.replace_substring_regex(out, pat, rep)
    return out


def url_canon_sql(expr: str) -> str:
    """The identical chain as a nested DuckDB expression over ``expr``."""
    out = f"lower({expr})"
    for pat, rep in URL_CANON_STEPS:
        # patterns contain no quotes; \1 backrefs pass through DuckDB's
        # default (non-escaping) string literals verbatim
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


def canonicalize_urls(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Append ``canonical_url`` (stateless vectorized map_batches)."""

    def run(b: pa.Table) -> pa.Table:
        return b.append_column("canonical_url", canonicalize_array(b.column(url_col)))

    return ds.map_batches(run, batch_format="pyarrow")


def url_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id", url_col: str = "url"
) -> ray.data.Dataset:
    """Keep the smallest id per canonical URL.

    Output: (canonical_url, keep_doc_id, dup_count). Only the
    (id, canonical_url) projection shuffles — few-partition hash groups,
    one vectorized aggregate per partition.
    """
    from pdftext_ray.ops.relational import hash_grouped_agg

    def project(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column(id_col), canonicalize_array(b.column(url_col))],
            names=[id_col, "canonical_url"],
        )

    return hash_grouped_agg(
        ds.map_batches(project, batch_format="pyarrow"),
        "canonical_url",
        {"keep_doc_id": (id_col, "min"), "dup_count": (id_col, "size")},
    )
