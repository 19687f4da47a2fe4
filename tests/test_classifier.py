"""Linear quality classifier (ops/classifier.py): integer-exact label
contract, vectorized token-match counting, actor-pool + broadcast plumbing.
Oracle equality runs in tests/test_gate_extras.py (quality_classifier)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdftext_ray.ops import classifier


def test_token_match_counts_exact_tokens_only():
    texts = pa.array(["Fast data fastest", "slow slow BIG", ""])
    c = classifier._token_match_counts(texts, ["fast", "slow", "big"])
    # 'fastest' must NOT count as 'fast' (exact token equality, lowercased)
    assert c.tolist() == [[1, 0, 0], [0, 2, 1], [0, 0, 0]]


def test_classify_quality_labels_and_scores(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "fast data",  # S = 30 + 20 = 50, n = 2
                        "slow slow big",  # S = -80, n = 3
                        "nothing matches here",  # S = 0 -> keep at sigmoid 0.5
                    ]
                ),
            }
        )
    )
    out = classifier.classify_quality(ds, concurrency=2).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "label"] == "keep" and out.loc[1, "n_matched"] == 2
    assert out.loc[2, "label"] == "drop" and out.loc[2, "n_matched"] == 3
    assert out.loc[3, "label"] == "keep" and out.loc[3, "score"] == 0.5
    assert out.loc[1, "score"] == round(1 / (1 + np.exp(-50 / 2)), 6)
    assert out.loc[2, "score"] == round(1 / (1 + np.exp(80 / 3)), 6)


def test_classify_quality_validates_model():
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    with pytest.raises(ValueError, match="must align"):
        classifier.classify_quality(empty, vocab=["a"], weights=[1, 2])
    with pytest.raises(ValueError, match="integer"):
        classifier.classify_quality(empty, vocab=["a"], weights=[0.5])


def test_classify_quality_empty_input(ray_session):
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert classifier.classify_quality(empty).count() == 0
