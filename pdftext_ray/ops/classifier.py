"""Model-scoring stage: a linear (fasttext-style) quality classifier run as
batched inference over an actor pool.

This is the canonical Ray Data model-inference shape (ray_guide: stateful
stages are actor pools; broadcast small sides with ``ray.put``): the weight
vector is put in the object store ONCE, every actor fetches it ONCE in
``__init__`` (never per batch), and ``__call__`` scores a whole Arrow batch
vectorized (token counting via list-offset segment sums, one int matmul).

Determinism contract (so the DuckDB oracle can mirror it bit-exactly):
weights are INTEGERS and the keep label is decided on the integer logit
numerator ``S = Σ w_i · count_i`` BEFORE any float division — FP summation
order can differ between numpy and SQL, integer sums cannot. The reported
score is ``sigmoid(S / max(n_tokens, 1))`` rounded to 6 decimals (one
deterministic IEEE division; exp differs by at most 1 ulp across libms,
far below the rounding grid).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# A stand-in for weights trained elsewhere: positive evidence words first,
# negative (spam-ish / filler) words after. Integer weights by contract.
DEFAULT_VOCAB: List[str] = ["fast", "data", "value", "merge", "slow", "big", "scan", "filter"]
DEFAULT_WEIGHTS: List[int] = [30, 20, 10, 5, -30, -20, -10, -5]


def _token_match_counts(texts, vocab: Sequence[str]) -> np.ndarray:
    """(n_rows × len(vocab)) int64 counts of exact lowercase-token matches,
    vectorized per vocab word via list-offset prefix sums."""
    chunks = texts.chunks if isinstance(texts, pa.ChunkedArray) else [texts]
    out = np.zeros((len(texts), len(vocab)), dtype=np.int64)
    pos = 0
    for chunk in chunks:
        toks = pc.utf8_split_whitespace(pc.utf8_lower(chunk))
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        base = offsets - offsets[0]
        for j, word in enumerate(vocab):
            hits = pc.equal(flat, word)
            h = hits.to_numpy(zero_copy_only=False).astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(h)])
            out[pos:pos + len(chunk), j] = csum[base[1:]] - csum[base[:-1]]
        pos += len(chunk)
    return out


class LinearTextScorer:
    """Actor-pool UDF: fetches the broadcast (vocab, weights) once per actor."""

    def __init__(self, model_ref, id_col: str = "doc_id", text_col: str = "text"):
        self.vocab, self.weights = ray.get(model_ref)
        self.w = np.asarray(self.weights, dtype=np.int64)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pdftext_ray.ops import round_half_away

        text = batch.column(self.text_col)
        counts = _token_match_counts(text, self.vocab)
        s = counts @ self.w  # exact integer logit numerator
        n_tokens = np.maximum(
            pc.count_substring_regex(text, r"\S+").to_numpy(zero_copy_only=False).astype(np.int64),
            1,
        )
        z = s.astype(np.float64) / n_tokens.astype(np.float64)
        score = round_half_away(1.0 / (1.0 + np.exp(-z)), 6)
        label = np.where(s >= 0, "keep", "drop")
        return pa.Table.from_arrays(
            [
                batch.column(self.id_col),
                pa.array(score),
                pa.array(counts.sum(axis=1), pa.int64()),
                pa.array(label, pa.string()),
            ],
            names=[self.id_col, "score", "n_matched", "label"],
        )


def classify_quality(
    ds: ray.data.Dataset,
    vocab: Optional[Sequence[str]] = None,
    weights: Optional[Sequence[int]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=(2, 4),
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Score every document with the linear classifier (actor pool, broadcast
    weights). Output: (id, score, n_matched, label)."""
    vocab = list(DEFAULT_VOCAB if vocab is None else vocab)
    weights = list(DEFAULT_WEIGHTS if weights is None else weights)
    if len(vocab) != len(weights):
        raise ValueError(f"vocab ({len(vocab)}) and weights ({len(weights)}) must align")
    if any(int(w) != w for w in weights):
        raise ValueError("weights must be integers (the label contract is integer-exact)")
    model_ref = ray.put((vocab, [int(w) for w in weights]))
    return ds.map_batches(
        LinearTextScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "id_col": id_col, "text_col": text_col},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def classifier_sql(vocab: Sequence[str], weights: Sequence[int], text_expr: str = "text") -> str:
    """The classifier's select-list as DuckDB SQL (mirrors LinearTextScorer):
    integer logit numerator, sigmoid of S/n rounded to 6, integer-sign label."""
    # vocab words land inside SQL string literals — escape quotes (ADVICE
    # r3: a word containing ' would break/inject the oracle SQL; harmless
    # with DEFAULT_VOCAB, but the function accepts arbitrary vocab).
    # text_expr is an SQL EXPRESSION by contract (caller-trusted), not a
    # literal, so it is interpolated as-is.
    counts = [
        "len(list_filter(regexp_extract_all(lower({e}), '\\S+'), x -> x = '{w}'))".format(
            e=text_expr, w=w.replace("'", "''")
        )
        for w in vocab
    ]
    s = " + ".join(f"{int(wt)} * c{j}" for j, wt in enumerate(weights))
    c_defs = ", ".join(f"{expr} AS c{j}" for j, expr in enumerate(counts))
    total = " + ".join(f"c{j}" for j in range(len(vocab)))
    return (
        f"SELECT doc_id, round(1.0 / (1.0 + exp(-(CAST(s AS DOUBLE) / n))), 6) AS score, "
        f"CAST({total} AS BIGINT) AS n_matched, "
        "CASE WHEN s >= 0 THEN 'keep' ELSE 'drop' END AS label "
        f"FROM (SELECT doc_id, {c_defs}, {s} AS s, "
        f"greatest(len(regexp_extract_all({text_expr}, '\\S+')), 1) AS n FROM documents) scored"
    )
