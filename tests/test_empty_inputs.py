"""Empty-input robustness: at 100 TB, empty partitions, empty shards and
zero-match filters are routine — every op family must return an empty result
(or raise its documented guard), never crash on a 0-row typed table."""

import pyarrow as pa
import pytest
import ray

from pdftext_ray.ops import cluster, dedup, media, pack, sampling, streaming, textstats

DOCS = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
EMB = pa.table({"vec_id": pa.array([], pa.int64()), "embedding": pa.array([], pa.list_(pa.float64()))})
PAIRS = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
CHUNKS = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "chunk_idx": pa.array([], pa.int64()),
    "text": pa.array([], pa.string()),
})


def _mk(t):
    return ray.data.from_arrow(t)


EMPTY_OK = [
    ("exact_dedup", lambda: dedup.exact_dedup(_mk(DOCS))),
    ("prefix_dedup", lambda: dedup.prefix_dedup(_mk(DOCS))),
    ("substring_dedup", lambda: dedup.substring_dedup(_mk(DOCS))),
    ("minhash_lsh_pairs", lambda: dedup.minhash_lsh_pairs(_mk(DOCS))),
    ("minhash_exact_recall", lambda: dedup.minhash_lsh_pairs(_mk(DOCS), exact_recall=True)),
    ("simhash_pairs", lambda: dedup.simhash_pairs(_mk(DOCS))),
    ("ngram_jaccard_pairs", lambda: dedup.ngram_jaccard_pairs(_mk(DOCS))),
    ("embedding_pairs_bruteforce", lambda: dedup.embedding_pairs_bruteforce(_mk(EMB))),
    ("embedding_dup_pairs", lambda: dedup.embedding_dup_pairs(_mk(EMB))),
    ("paragraph_dedup", lambda: dedup.paragraph_dedup(_mk(CHUNKS))),
    ("line_frequency_dedup", lambda: dedup.line_frequency_dedup(_mk(DOCS))),
    ("token_counts", lambda: textstats.token_counts(_mk(DOCS))),
    ("quality_scores", lambda: textstats.quality_scores(_mk(DOCS))),
    ("gopher_quality", lambda: textstats.gopher_quality(_mk(DOCS))),
    ("tfidf_topk", lambda: textstats.tfidf_topk(_mk(DOCS))),
    ("top_ngrams", lambda: textstats.top_ngrams(_mk(DOCS))),
    ("winnow_fingerprints", lambda: textstats.winnow_fingerprints(_mk(DOCS))),
    ("hash_sample", lambda: sampling.hash_sample(_mk(DOCS), 0.1)),
    ("hash_split", lambda: sampling.hash_split(_mk(DOCS), {"a": 0.5, "b": 0.5})),
    ("shuffle_rank", lambda: sampling.shuffle_rank(_mk(DOCS))),
    ("pack_sequences", lambda: pack.pack_sequences(_mk(DOCS), budget=128)),
    ("connected_components", lambda: cluster.connected_components_distributed(_mk(PAIRS))),
    ("incremental_exact_dedup", lambda: dedup.incremental_exact_dedup(
        _mk(DOCS), _mk(pa.table({"text_hash": pa.array([], pa.string())})))),
    ("incremental_minhash_dedup", lambda: dedup.incremental_minhash_dedup(
        _mk(DOCS), _mk(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "minhash": pa.array([], pa.list_(pa.int64())),
        })))),
    ("incremental_embedding_dedup", lambda: dedup.incremental_embedding_dedup(
        _mk(EMB), _mk(EMB))),
    ("streaming_dedup", lambda: streaming.streaming_dedup(_mk(DOCS), n_shards=2)),
    ("ngram_repetition", lambda: textstats.ngram_repetition(_mk(DOCS))),
    ("chunk_documents", lambda: textstats.chunk_documents(_mk(DOCS))),
    ("extract_matches", lambda: textstats.extract_matches(_mk(DOCS), "aa")),
    ("lm_perplexity", lambda: textstats.lm_perplexity(_mk(DOCS))),
    ("pmi_collocations", lambda: textstats.pmi_collocations(_mk(DOCS))),
    ("bpe_train", lambda: textstats.bpe_train(_mk(DOCS))),
]


EMPTY_OK += [
    ("audio_features", lambda: media.audio_features(_mk(media.MEDIA_SCHEMA.empty_table()))),
    ("video_frame_stats", lambda: media.video_frame_stats(_mk(media.MEDIA_SCHEMA.empty_table()))),
]


def _graph_empty():
    from pdftext_ray.ops import graph

    edges = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    return graph.pagerank(_mk(edges), n_iter=2)


def _windows_empty():
    import pandas as pd

    from pdftext_ray.ops import relational

    df = pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "value": pd.Series([], dtype="float64"),
    })
    return relational.events_window_functions(ray.data.from_pandas(df))


def _upsert_empty():
    from pdftext_ray.ops import relational

    t = pa.table({
        "k": pa.array([], pa.int64()),
        "version": pa.array([], pa.int64()),
        "payload": pa.array([], pa.string()),
    })
    return relational.upsert_latest(_mk(t), "k", "version")


EMPTY_OK += [
    ("pagerank", _graph_empty),
    ("events_window_functions", _windows_empty),
    ("upsert_latest", _upsert_empty),
]


@pytest.mark.parametrize("name,fn", EMPTY_OK, ids=[n for n, _ in EMPTY_OK])
def test_empty_input_yields_empty_result(name, fn, ray_session):
    assert len(fn().to_pandas()) == 0


def test_kmeans_empty_raises_documented_guard(ray_session):
    with pytest.raises(ValueError, match="kmeans needs"):
        cluster.kmeans_assign(_mk(EMB)).to_pandas()


def test_empty_minhash_preserves_string_id_type(ray_session):
    """The typed-empty pair result must carry the INPUT's id type (string
    here), so it unions cleanly with non-empty runs (round-3 review: the
    guard hardcoded int64)."""
    t = pa.table({"doc_id": pa.array([], pa.string()), "text": pa.array([], pa.string())})
    out = dedup.minhash_lsh_pairs(_mk(t), exact_recall=True)
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["doc_a"] == pa.string()
    assert types["doc_b"] == pa.string()
    assert types["jaccard"] == pa.float64()
