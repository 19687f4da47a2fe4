"""Tests for the training-data operators: planted duplicates must be found,
approximate search must hit high recall vs brute force, media plumbing must
round-trip deterministically."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pdftext_ray.ops import dedup, media, similarity, textstats


def _doc_table(rows):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(rows))), "text": rows})
    )


BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into the woods "
    "where a stream flows past tall trees under a bright morning sky"
)


def test_exact_dedup_groups_identical_texts():
    ds = _doc_table([BASE, BASE, BASE + " extra", "totally different words here"])
    out = dedup.exact_dedup(ds).to_pandas().sort_values("keep_doc_id").reset_index(drop=True)
    assert len(out) == 3
    grp = out[out["keep_doc_id"] == 0].iloc[0]
    assert grp["dup_count"] == 2


@pytest.mark.parametrize("inc_plan", ["broadcast", "shuffle"])
def test_incremental_dedup_suppresses_baseline_and_keeps_min(inc_plan):
    import hashlib

    known = BASE
    fresh = "a brand new document about arrow shuffles"
    # increment: one doc already in the baseline, one fresh doc duplicated
    ds = _doc_table([known, fresh, fresh])
    baseline = ray.data.from_arrow(pa.table({
        "text_hash": [hashlib.md5(known.encode()).hexdigest()]
    }))
    out = dedup.incremental_exact_dedup(ds, baseline, plan=inc_plan).to_pandas()
    assert len(out) == 1  # the known doc is suppressed entirely
    assert out.iloc[0]["keep_doc_id"] == 1 and out.iloc[0]["dup_count"] == 2


@pytest.mark.parametrize("inc_plan", ["broadcast", "shuffle"])
def test_incremental_dedup_empty_baseline_equals_exact_dedup(inc_plan):
    ds = _doc_table([BASE, BASE, BASE + " extra"])
    baseline = ray.data.from_arrow(pa.table({"text_hash": pa.array([], pa.string())}))
    inc = (
        dedup.incremental_exact_dedup(ds, baseline, plan=inc_plan)
        .to_pandas().sort_values("text_hash").reset_index(drop=True)
    )
    ref = (
        dedup.exact_dedup(ds)
        .to_pandas().sort_values("text_hash").reset_index(drop=True)
    )
    assert inc[["text_hash", "keep_doc_id", "dup_count"]].equals(
        ref[["text_hash", "keep_doc_id", "dup_count"]]
    )


@pytest.mark.parametrize("inc_plan", ["broadcast", "shuffle"])
def test_incremental_minhash_verdicts(inc_plan):
    near = BASE.replace("morning", "evening")
    base_docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 2],
        "text": [BASE, "completely unrelated text about ray data pipelines and arrow"],
    }))
    sigs = dedup.minhash_signatures(base_docs)
    new_docs = ray.data.from_arrow(pa.table({
        "doc_id": [11, 13, 15, 17],
        "text": [BASE, near, "a totally novel doc about something else entirely", BASE],
    }))
    out = (
        dedup.incremental_minhash_dedup(new_docs, sigs, threshold=0.4, plan=inc_plan)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # exact copies collapse to est 1.0 vs the baseline doc; the near-dup is
    # flagged below 1.0; the novel doc is absent
    assert list(out["doc_id"]) == [11, 13, 17]
    assert list(out["dup_of"]) == [0, 0, 0]
    assert out.loc[0, "est_jaccard"] == 1.0 and out.loc[2, "est_jaccard"] == 1.0
    assert 0.4 <= out.loc[1, "est_jaccard"] < 1.0


@pytest.mark.parametrize("inc_plan", ["broadcast", "shuffle"])
def test_incremental_minhash_within_increment_keep_first(inc_plan):
    # no baseline at all: two identical new docs — the larger id is flagged
    # against the smaller, the smaller is unflagged
    sigs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "minhash": pa.array([], pa.list_(pa.int64())),
    }))
    new_docs = ray.data.from_arrow(pa.table({
        "doc_id": [5, 9], "text": [BASE, BASE],
    }))
    out = dedup.incremental_minhash_dedup(new_docs, sigs, plan=inc_plan).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["doc_id"] == 9 and out.iloc[0]["dup_of"] == 5
    assert out.iloc[0]["est_jaccard"] == 1.0


@pytest.mark.parametrize("inc_plan", ["broadcast", "shuffle"])
def test_incremental_embedding_verdicts(inc_plan):
    rng = np.random.RandomState(3)
    base_vecs = rng.standard_normal((4, 16))
    base = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 2, 4, 6], pa.int64()),
        "embedding": pa.array([v.tolist() for v in base_vecs], pa.list_(pa.float64())),
    }))
    # new: a tiny perturbation of base vec 2 (id 4), an exact copy of base
    # vec 0 (id 0), and an orthogonal novel direction
    novel = np.zeros(16); novel[7] = 1.0
    new = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([11, 13, 15], pa.int64()),
        "embedding": pa.array([
            (base_vecs[2] + 0.01 * rng.standard_normal(16)).tolist(),
            base_vecs[0].tolist(),
            novel.tolist(),
        ], pa.list_(pa.float64())),
    }))
    out = (
        dedup.incremental_embedding_dedup(
            new, base, threshold=0.9, n_planes=4, probe_radius=4, plan=inc_plan)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert list(out["vec_id"]) == [11, 13]
    assert out.loc[0, "dup_of"] == 4 and out.loc[0, "cosine"] > 0.99
    assert out.loc[1, "dup_of"] == 0 and out.loc[1, "cosine"] == 1.0


@pytest.mark.parametrize("inc_plan", ["broadcast", "shuffle"])
def test_incremental_embedding_within_increment_keep_first(inc_plan):
    v = np.ones(8)
    base = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    new = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([5, 9], pa.int64()),
        "embedding": pa.array([v.tolist(), v.tolist()], pa.list_(pa.float64())),
    }))
    out = dedup.incremental_embedding_dedup(
        new, base, threshold=0.9, n_planes=4, probe_radius=4, plan=inc_plan).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["vec_id"] == 9 and out.iloc[0]["dup_of"] == 5
    assert out.iloc[0]["cosine"] == 1.0


def test_incremental_ops_honor_custom_id_col():
    # round-4 ADVICE: a custom id_col used to come back renamed doc_id/vec_id
    sigs = dedup.minhash_signatures(
        ray.data.from_arrow(pa.table({"page_id": [0], "text": [BASE]})),
        id_col="page_id",
    )
    new_docs = ray.data.from_arrow(pa.table({"page_id": [7], "text": [BASE]}))
    out = dedup.incremental_minhash_dedup(new_docs, sigs, id_col="page_id").to_pandas()
    assert list(out.columns) == ["page_id", "dup_of", "est_jaccard"]
    assert out.iloc[0]["page_id"] == 7 and out.iloc[0]["dup_of"] == 0

    v = np.ones(8)
    base = ray.data.from_arrow(pa.table({
        "img_id": pa.array([0], pa.int64()),
        "embedding": pa.array([v.tolist()], pa.list_(pa.float64())),
    }))
    new = ray.data.from_arrow(pa.table({
        "img_id": pa.array([7], pa.int64()),
        "embedding": pa.array([v.tolist()], pa.list_(pa.float64())),
    }))
    out = dedup.incremental_embedding_dedup(
        new, base, threshold=0.9, n_planes=4, probe_radius=4, id_col="img_id"
    ).to_pandas()
    assert list(out.columns) == ["img_id", "dup_of", "cosine"]
    assert out.iloc[0]["img_id"] == 7 and out.iloc[0]["dup_of"] == 0


def test_minhash_finds_planted_near_dups():
    near = BASE.replace("morning", "evening")  # one token changed
    ds = _doc_table([BASE, near, "completely unrelated text about ray data pipelines and arrow"])
    out = dedup.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].values.tolist()))
    assert (0, 1) in pairs
    assert all(p in {(0, 1)} for p in pairs)
    ja = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)]["jaccard"].iloc[0]
    assert 0.5 <= ja < 1.0


def test_simhash_finds_planted_near_dups():
    near = BASE + " tail"
    ds = _doc_table([BASE, near, "completely unrelated text about spark flink beam and presto engines"])
    out = dedup.simhash_pairs(ds, max_hamming=6).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].values.tolist()))
    assert (0, 1) in pairs


def test_embedding_lsh_finds_planted_dups():
    rng = np.random.RandomState(0)
    base = rng.standard_normal((20, 16))
    dup = base[3] + rng.standard_normal(16) * 0.01  # near-identical to row 3
    vecs = np.vstack([base, dup[None, :]])
    ds = ray.data.from_arrow(
        pa.table({"vec_id": list(range(21)), "embedding": [v.tolist() for v in vecs]})
    )
    out = dedup.embedding_dup_pairs(ds, threshold=0.99, n_planes=8).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    assert (3, 20) in pairs


def test_embedding_bruteforce_matches_numpy():
    rng = np.random.RandomState(1)
    vecs = rng.standard_normal((50, 8))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": list(range(50)), "embedding": [v.tolist() for v in vecs]})
    )
    out = dedup.embedding_pairs_bruteforce(ds, threshold=0.5).to_pandas()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    ia, ib = np.triu_indices(50, k=1)
    want = {(int(a), int(b)) for a, b in zip(ia[sims[ia, ib] >= 0.5], ib[sims[ia, ib] >= 0.5])}
    got = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    assert got == want


def test_ivf_recall_vs_brute_force():
    rng = np.random.RandomState(2)
    vecs = rng.standard_normal((400, 32))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": list(range(400)), "embedding": [v.tolist() for v in vecs]})
    )
    q = vecs[7]
    exact = similarity.brute_force_topk(ds, q, k=10).to_pandas()
    approx = similarity.ivf_topk(ds, q, k=10, n_centroids=8, n_probe=4, sample_fraction=0.5).to_pandas()
    assert exact.iloc[0]["vec_id"] == 7 and exact.iloc[0]["score"] == 1.0
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_pq_topk_matches_scalar_golden_and_layouts():
    from pdftext_ray.pipelines.goldens import expected_pq_table

    rng = np.random.RandomState(4)
    vecs = rng.standard_normal((300, 32))
    ids = list(range(300))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})
    )
    q = vecs[5]
    got = similarity.pq_topk(ds, q, k=10, m=8, ksub=16).to_pandas()
    want = expected_pq_table(ids, vecs, q, k=10, m=8, ksub=16).to_pandas()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["adc_dist"].tolist() == want["adc_dist"].tolist()
    # layout-independent: reversed 7-block layout gives identical output
    ds2 = ray.data.from_arrow(
        pa.table({"vec_id": ids[::-1], "embedding": [v.tolist() for v in vecs[::-1]]})
    ).repartition(7)
    got2 = similarity.pq_topk(ds2, q, k=10, m=8, ksub=16).to_pandas()
    assert got2["vec_id"].tolist() == got["vec_id"].tolist()


def test_pq_quantized_self_distance_is_smallest():
    # the query's own row should quantize closest to the query on clustered
    # data (PQ preserves coarse geometry even if exact ranks shuffle)
    rng = np.random.RandomState(9)
    centers = rng.standard_normal((4, 32)) * 5
    vecs = np.vstack([centers[i % 4] + 0.1 * rng.standard_normal(32) for i in range(200)])
    ds = ray.data.from_arrow(
        pa.table({"vec_id": list(range(200)), "embedding": [v.tolist() for v in vecs]})
    )
    out = similarity.pq_topk(ds, vecs[3], k=50, m=8, ksub=16).to_pandas()
    assert 3 in set(out["vec_id"])  # own cluster retrieved
    # all top-50 from the query's cluster (coarse geometry preserved)
    assert all(v % 4 == 3 for v in out["vec_id"])


def test_pq_index_validates_inputs():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        similarity.PQIndex(np.zeros((40, 30)), m=8, ksub=4)
    with _pytest.raises(ValueError, match="sample rows"):
        similarity.PQIndex(np.zeros((4, 32)), m=8, ksub=16)


def test_sq8_topk_matches_scalar_golden_and_layouts():
    from pdftext_ray.pipelines.goldens import expected_sq8_table

    rng = np.random.RandomState(6)
    vecs = rng.standard_normal((300, 32))
    vecs[:, 11] = 0.25  # zero-span dim after unit-normalization varies — pin a constant raw dim
    ids = list(range(300))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})
    )
    q = vecs[5]
    got = similarity.sq8_topk(ds, q, k=10).to_pandas()
    want = expected_sq8_table(ids, vecs, q, k=10).to_pandas()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["sq8_score"].tolist() == want["sq8_score"].tolist()
    # layout-independent: reversed 7-block layout gives identical output
    ds2 = ray.data.from_arrow(
        pa.table({"vec_id": ids[::-1], "embedding": [v.tolist() for v in vecs[::-1]]})
    ).repartition(7)
    got2 = similarity.sq8_topk(ds2, q, k=10).to_pandas()
    assert got2["vec_id"].tolist() == got["vec_id"].tolist()
    assert got2["sq8_score"].tolist() == got["sq8_score"].tolist()


def test_sq8_recall_beats_pq_on_random_vectors():
    # SQ8 keeps 1 byte/dim (32 bytes here) vs PQ's m=8 bytes; on isotropic
    # random vectors (the adversarial case for both) SQ8's distortion is
    # far lower — assert the ranking is near-exact
    rng = np.random.RandomState(12)
    vecs = rng.standard_normal((400, 32))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": list(range(400)), "embedding": [v.tolist() for v in vecs]})
    )
    q = vecs[7]
    exact = similarity.brute_force_topk(ds, q, k=10).to_pandas()
    approx = similarity.sq8_topk(ds, q, k=10).to_pandas()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert approx.iloc[0]["vec_id"] == 7  # own row survives quantization
    assert recall >= 0.9, f"SQ8 recall too low: {recall}"


def test_sq8_zero_span_dims_reconstruct_to_vmin():
    idx = similarity.SQ8Index(np.array([[1.0, 2.0], [1.0, 4.0]]))
    # dim 0 is constant after unit-norm scaling differences? use raw check:
    codes = idx.encode(np.array([[1.0, 2.0], [1.0, 4.0]]))
    recon = idx.reconstruct(codes)
    assert np.all(codes[:, idx.span == 0] == 0)
    assert np.allclose(recon[:, idx.span == 0], idx.vmin[idx.span == 0])


def test_ngram_repetition_hand_cases():
    docs = [
        "a b a b a b",        # top 2-gram "a b" ×3 (len 3); 5-grams all distinct-ish
        "x y z x y z x y z",  # 5-gram "x y z x y" appears twice... check below
        "one two",            # exactly 2 tokens: one 2-gram, no 5-grams
        "solo",               # 1 token: no grams at all
        "",                   # empty
    ]
    out = textstats.ngram_repetition(_doc_table(docs)).to_pandas().sort_values("doc_id")
    r0 = out.iloc[0]
    # "a b" count 3, len 3, n_chars 11 → 9/11
    assert r0["top_ngram"] == "a b" and r0["top_ngram_frac"] == round(9 / 11, 6)
    r1 = out.iloc[1]
    # 9 tokens → 5 five-grams: xyzxy yzxyz zxyzx xyzxy yzxyz → "x y z x y"×2,
    # "y z x y z"×2, "z x y z x"×1 → dup chars = (2-1)*9 + (2-1)*9 = 18 over 17
    assert r1["dup_ngram_frac"] == round(18 / 17, 6)
    # tie at count 2: "x y" ties "y z" (and "z x") → lexicographically smallest
    assert r1["top_ngram"] == "x y"
    r2 = out.iloc[2]
    assert r2["top_ngram"] == "one two" and r2["top_ngram_frac"] == round(7 / 7, 6)
    assert r2["dup_ngram_frac"] == 0.0
    assert out.iloc[3]["top_ngram"] == "" and out.iloc[3]["top_ngram_frac"] == 0.0
    assert out.iloc[4]["top_ngram"] == "" and out.iloc[4]["dup_ngram_frac"] == 0.0


def test_pmi_collocations_semantics_and_layouts():
    import math

    # "new york" always together (high PMI); "the of" random filler (low)
    docs = ["new york " * 6 + "the of the the of of", "the of " * 8 + "new york new york"]
    out = textstats.pmi_collocations(_doc_table(docs), min_count=2, k=10).to_pandas()
    assert out["gram"].iloc[0] in ("new york", "york new")  # collocation wins
    ny = out[out["gram"] == "new york"].iloc[0]
    assert ny["n"] == 8
    # golden equality + layout independence
    from pdftext_ray.pipelines.goldens import expected_pmi_table

    want = expected_pmi_table(docs, min_count=2, k=10).to_pandas()
    assert out["gram"].tolist() == want["gram"].tolist()
    assert out["pmi"].tolist() == want["pmi"].tolist()
    out2 = (
        textstats.pmi_collocations(_doc_table(docs).repartition(4), min_count=2, k=10)
        .to_pandas()
    )
    assert out2["pmi"].tolist() == out["pmi"].tolist()
    # hand-check: c_ab=8, c_a=c_b=8, T1=18+20=38 tokens, T2=17+19=36 bigrams
    val = math.log2(8) + 2 * math.log2(38) - math.log2(8) - math.log2(8) - math.log2(36)
    assert ny["pmi"] == int(round(val * 1e6)) / 1e6


def test_chunk_documents_windows_and_overlap():
    docs = [" ".join(f"t{i}" for i in range(10)), "a b", ""]
    out = (
        textstats.chunk_documents(_doc_table(docs), window=4, overlap=1)
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    d0 = out[out["doc_id"] == 0]
    # starts 0,3,6,9 → windows [0:4],[3:7],[6:10],[9:10]
    assert d0["chunk_tokens"].tolist() == [4, 4, 4, 1]
    assert d0["chunk_text"].iloc[0] == "t0 t1 t2 t3"
    assert d0["chunk_text"].iloc[1] == "t3 t4 t5 t6"  # shares exactly 1 token
    assert d0["chunk_text"].iloc[3] == "t9"
    d1 = out[out["doc_id"] == 1]
    assert d1["chunk_text"].tolist() == ["a b"]
    assert (out["doc_id"] == 2).sum() == 0  # empty doc → no chunks
    with pytest.raises(ValueError, match="overlap"):
        textstats.chunk_documents(_doc_table(docs), window=4, overlap=4)


def test_salted_join_left_outer_null_extension():
    import pandas as pd

    from pdftext_ray.ops.joins import salted_hash_join

    left = pd.DataFrame({"rid": [0, 1, 2, 3], "k": [1, 1, 2, 9], "v": [0.1, 0.2, 0.3, 0.4]})
    right = pd.DataFrame({"k2": [1, 2], "rk": [10, 20], "label": ["x", "y"]})
    ds_out = salted_hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        "k", "k2", salt_col="rid",
        left_cols=["rid", "k", "v"], right_cols=["k2", "rk", "label"],
        hot_threshold=2, num_salts=3, how="left",
    )
    # ARROW schema keeps right int columns int64-with-null (no float64
    # promotion crossing blocks); pandas view necessarily shows NaN/float
    sch = dict(zip(ds_out.schema().names, ds_out.schema().base_schema.types))
    assert str(sch["rk"]) == "int64", sch
    out = ds_out.to_pandas().sort_values("rid").reset_index(drop=True)
    assert len(out) == 4  # every left row exactly once
    assert out["label"].tolist()[:3] == ["x", "x", "y"]
    assert pd.isna(out["label"].iloc[3]) and pd.isna(out["rk"].iloc[3])
    assert out["rk"].tolist()[:3] == [10.0, 10.0, 20.0]


def test_lm_perplexity_hand_case_and_layouts():
    # corpus "a a" + "b": c(a)=2, c(b)=1, T=3, V=2, denom=6
    # p(a)=3/6 → L=1_000_000; p(b)=2/6 → L=round(log2(3)·1e6)=1_584_963
    docs = ["a a", "b", ""]
    out = textstats.lm_perplexity(_doc_table(docs)).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [2, 1, 0]
    assert out["bits_per_token"].tolist() == [1.0, 1.584963, 0.0]
    # layout independence: same corpus split across 3 blocks
    out2 = (
        textstats.lm_perplexity(_doc_table(docs).repartition(3))
        .to_pandas().sort_values("doc_id")
    )
    assert out2["bits_per_token"].tolist() == out["bits_per_token"].tolist()
    # golden equality on a larger random-ish corpus
    from pdftext_ray.pipelines.goldens import expected_lm_table

    texts = [" ".join(f"w{(i * j) % 17}" for j in range(i % 30)) for i in range(60)]
    got = textstats.lm_perplexity(_doc_table(texts)).to_pandas().sort_values("doc_id")
    want = expected_lm_table(list(range(60)), texts).to_pandas()
    assert got["bits_per_token"].tolist() == want["bits_per_token"].tolist()


def test_lm_perplexity_vocab_cap_refuses():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_vocab"):
        textstats.lm_perplexity(_doc_table(["a b c d e f g h"]), max_vocab=3)


def test_textstats_token_semantics():
    ds = _doc_table(["the  quick\tfox", ""])
    out = textstats.token_counts(ds).to_pandas().sort_values("doc_id")
    assert list(out["n_tokens"]) == [3, 0]
    q = textstats.quality_scores(ds).to_pandas().sort_values("doc_id")
    assert 0 < q.iloc[0]["alpha_ratio"] <= 1
    assert q.iloc[1]["alpha_ratio"] == 0


def test_media_featurize_deterministic_and_shaped():
    t = media.synth_media_table(12)
    ds = ray.data.from_arrow(t)
    a = media.featurize_media(ds, out_size=16).to_pandas().sort_values("media_ref").reset_index(drop=True)
    b = media.featurize_media(ray.data.from_arrow(t), out_size=16).to_pandas().sort_values("media_ref").reset_index(drop=True)
    assert len(a) == 12
    assert (a["out_width"] == 16).all()
    # video rows sample multiple frames
    vids = a[a["media_type"] == "video"]
    assert (vids["frames_sampled"] >= 1).all() and vids["frames_sampled"].max() > 1
    for fa, fb in zip(a["feature"], b["feature"]):
        assert np.allclose(fa, fb)
    # features are normalized histograms
    assert all(abs(sum(f) - 1.0) < 1e-3 for f in a["feature"])


def test_real_codec_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        media.RealCodec().decode(b"x", 4, 4)


def test_winnow_fingerprints_detect_shared_content():
    """Winnowing fingerprint sets overlap heavily for near-identical docs and
    barely for unrelated docs (the MOSS-style copy-detection property)."""
    from pdftext_ray.ops.textstats import winnow_fingerprints

    near = BASE.replace("morning", "evening")
    ds = _doc_table([BASE, near, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll"])
    out = winnow_fingerprints(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    f0, f1, f2 = (set(out["fingerprints"][i]) for i in range(3))
    sim01 = len(f0 & f1) / len(f0 | f1)
    sim02 = len(f0 & f2) / len(f0 | f2)
    assert sim01 > 0.6 and sim02 < 0.1
    assert (out["n_fingerprints"] > 0).all()


def test_bpe_token_count_semantics():
    from pdftext_ray.ops.textstats import bpe_token_counts

    ds = _doc_table(["don't stop-me now 42x", ""])
    out = bpe_token_counts(ds).to_pandas().sort_values("doc_id")
    assert list(out["n_bpe_tokens"]) == [9, 0]


def test_hash_grouped_agg_keeps_null_keys():
    """Null keys form their own group (parity with Ray-native aggregates) —
    rows must not silently vanish (round-2 review finding)."""
    from pdftext_ray.ops.relational import hash_grouped_agg

    ds = ray.data.from_arrow(
        pa.table({"k": ["a", "a", None, "b", None], "v": [1, 2, 3, 4, 5]})
    )
    out = hash_grouped_agg(ds, "k", {"n": ("v", "size"), "mn": ("v", "min")}).to_pandas()
    assert int(out["n"].sum()) == 5
    null_row = out[out["k"].isna()]
    assert len(null_row) == 1 and int(null_row["n"].iloc[0]) == 2 and int(null_row["mn"].iloc[0]) == 3


def test_paragraph_dedup_keep_first_and_empty_doc_retained():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "text": ["p1\np2\np3", "p2\npX", "p1\np2"],
            }
        )
    )
    got = dedup.paragraph_dedup(ds).to_pandas().set_index("doc_id").sort_index()
    # 'a' is first for p1/p2/p3; 'b' keeps only pX; 'c' loses everything
    assert got.loc["a", "text"] == "p1\np2\np3" and got.loc["a", "n_dropped"] == 0
    assert got.loc["b", "text"] == "pX" and got.loc["b", "n_dropped"] == 1
    assert got.loc["c", "text"] == "" and got.loc["c", "n_dropped"] == 2
    assert got["n_paras"].tolist() == [3, 2, 2]


def test_line_frequency_dedup_removes_all_copies():
    """Boilerplate lines (>= min_docs distinct docs) lose EVERY occurrence —
    including the first (vs paragraph_dedup's keep-first) and duplicates
    WITHIN one doc don't count toward the distinct-doc threshold."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "text": [
                    "nav\nbody-a\nnav",  # nav twice in one doc: 1 distinct doc
                    "nav\nbody-b",
                    "nav\nbody-b2",  # nav now in 3 distinct docs -> removed
                ],
            }
        )
    )
    got = dedup.line_frequency_dedup(ds, min_docs=3).to_pandas().set_index("doc_id").sort_index()
    assert got.loc["a", "text"] == "body-a" and got.loc["a", "n_removed"] == 2
    assert got.loc["b", "text"] == "body-b" and got.loc["b", "n_removed"] == 1
    assert got.loc["c", "text"] == "body-b2" and got.loc["c", "n_removed"] == 1
    assert got["n_lines"].tolist() == [3, 2, 2]
    # below the threshold nothing is removed
    kept = dedup.line_frequency_dedup(ds, min_docs=4).to_pandas()
    assert int(kept["n_removed"].sum()) == 0


def test_line_frequency_dedup_fully_boilerplate_doc_emits_row():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ["a", "b"], "text": ["same", "same"]})
    )
    got = dedup.line_frequency_dedup(ds, min_docs=2).to_pandas().set_index("doc_id")
    assert got["text"].tolist() == ["", ""] and got["n_removed"].tolist() == [1, 1]


def test_chunk_text_batch_windows():
    t = pa.table({"doc_id": ["d"], "text": ["one two three four five"]})
    out = dedup.chunk_text_batch(t, n_tokens=2)
    assert out.column("text").to_pylist() == ["one two\nthree four\nfive"]


def test_gopher_quality_flags_repetitive_doc():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["clean", "spam"],
                "text": [
                    "a varied sentence with many distinct words in it",
                    "buy buy buy buy buy buy buy buy buy now",
                ],
            }
        )
    )
    got = textstats.gopher_quality(ds).to_pandas().set_index("doc_id")
    assert got.loc["clean", "gopher_keep"] == 1
    assert got.loc["spam", "gopher_keep"] == 0
    assert got.loc["spam", "max_word_rep_frac"] == 0.9


def test_brute_force_topk_many_matches_single():
    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 8)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": list(range(60)), "embedding": [list(map(float, v)) for v in vecs]})
    )
    many = (
        similarity.brute_force_topk_many(ds, vecs[:3], query_ids=[0, 1, 2], k=5)
        .to_pandas()
        .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    for q in range(3):
        single = similarity.brute_force_topk(ds, vecs[q], k=5).to_pandas()
        got = many[many["query_id"] == q][["vec_id", "score"]].reset_index(drop=True)
        assert got.values.tolist() == single.values.tolist()


def test_pii_scrub_replaces_and_counts():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b"],
                "text": [
                    "mail me at jo.doe+x@ex-ample.co.uk or see https://a.b/c?d=1 now",
                    "no pii here",
                ],
            }
        )
    )
    got = textstats.pii_scrub(ds).to_pandas().set_index("doc_id")
    assert got.loc["a", "text"] == "mail me at <EMAIL> or see <URL> now"
    assert got.loc["a", "n_emails"] == 1 and got.loc["a", "n_urls"] == 1
    assert got.loc["b", "text"] == "no pii here"
    assert got.loc["b", "n_emails"] == 0 and got.loc["b", "n_urls"] == 0


def test_normalize_text_nfc_case_whitespace():
    import unicodedata

    from pdftext_ray.ops import textstats

    decomposed = "Cafe\u0301   du  MONDE"  # NFD accent + runs of spaces
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": [decomposed, "  plain  ascii ", "UPPER\t\ntext"]})
    )
    out = textstats.normalize_text(ds).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["caf\u00e9 du monde", "plain ascii", "upper text"]
    # composed output: the accent is NFC (single codepoint), not NFD
    assert unicodedata.is_normalized("NFC", out["text"].iloc[0])
    assert "\u0301" not in out["text"].iloc[0]
    # ascii-only batches stay on the pure-Arrow path (same result either way)
    ds2 = ray.data.from_arrow(pa.table({"doc_id": [9], "text": ["A  B"]}))
    assert textstats.normalize_text(ds2).take_all()[0]["text"] == "a b"


def test_semantic_dedup_prunes_within_cluster():
    rng = np.random.RandomState(5)
    blob_a = np.array([5.0] * 8) + rng.randn(20, 8) * 0.5
    blob_b = np.array([-5.0] * 8) + rng.randn(20, 8) * 0.5
    # interleave so lowest-id k-means seeds hit both blobs
    vecs = np.empty((40, 8))
    vecs[0::2], vecs[1::2] = blob_a, blob_b
    # plant exact duplicates of rows 0 and 1 at high ids
    vecs = np.concatenate([vecs, vecs[:2]])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(42, dtype=np.int64),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    }))
    kept = dedup.semantic_dedup(ds, k=2, iters=4, threshold=0.9995).to_pandas()
    kept_ids = set(kept["vec_id"])
    # the duplicate copies (ids 40, 41) are dropped; originals survive
    assert 40 not in kept_ids and 41 not in kept_ids
    assert {0, 1} <= kept_ids and len(kept_ids) == 40
    # force the multi-block scan path (block of ~3 rows): identical result
    kept2 = dedup.semantic_dedup(
        ds, k=2, iters=4, threshold=0.9995, scan_block_bytes=512
    ).to_pandas()
    assert set(kept2["vec_id"]) == kept_ids
    # the loud OOM guard: a too-small k for the corpus raises, never OOMs
    with pytest.raises(ValueError, match="max_cluster_rows"):
        dedup.semantic_dedup(ds, k=1, iters=2, max_cluster_rows=10).to_pandas()


def test_cms_heavy_hitters_one_sided_and_layout_invariant():
    from pdftext_ray.ops.stats import cms_heavy_hitters
    from pdftext_ray.pipelines.goldens import expected_cms_table

    rng = np.random.RandomState(9)
    # two heavy values (500, 300) over a long tail of 2000 singletons
    vals = np.concatenate([
        np.full(500, 7, dtype=np.int64),
        np.full(300, 42, dtype=np.int64),
        np.arange(1000, 3000, dtype=np.int64),
    ])
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    out = cms_heavy_hitters(ds, "v", threshold=200).to_pandas().sort_values("value")
    out7 = cms_heavy_hitters(
        ray.data.from_arrow(pa.table({"v": vals})).repartition(7), "v", threshold=200
    ).to_pandas().sort_values("value")
    assert out.values.tolist() == out7.values.tolist()  # sketch merge commutes
    got = dict(zip(out["value"], out["est_count"]))
    assert set(got) == {7, 42}
    assert got[7] >= 500 and got[42] >= 300  # one-sided overestimate
    assert got[7] <= 500 + 20 and got[42] <= 300 + 20  # ≤ 2n/width slack
    golden = expected_cms_table(vals.tolist(), threshold=200).to_pandas()
    assert dict(zip(golden["value"], golden["est_count"])) == got


def test_events_props_summary_json_parse():
    from pdftext_ray.ops.relational import events_props_summary

    df = pd.DataFrame({
        "event_type": ["a", "a", "b"],
        "props": ['{"k": 1}', '{"k": 2}', '{"k": 10}'],
    })
    out = events_props_summary(ray.data.from_pandas(df)).to_pandas()
    rows = {r.event_type: (r.n, r.sum_k, r.avg_k) for r in out.itertuples()}
    assert rows == {"a": (2, 3, 1.5), "b": (1, 10, 10.0)}


def test_approx_distinct_accuracy_and_layout_invariance():
    from pdftext_ray.ops.stats import approx_distinct
    from pdftext_ray.pipelines.goldens import expected_hll_table

    vals = np.arange(10_000, dtype=np.int64) * 7 + 3
    # duplicates must not change the sketch
    with_dups = np.concatenate([vals, vals[:3000]])
    t = pa.table({"x": with_dups})
    e1 = approx_distinct(ray.data.from_arrow(t), "x", p=10).to_pandas()["approx_n"][0]
    e2 = approx_distinct(
        ray.data.from_arrow(t).repartition(7), "x", p=10
    ).to_pandas()["approx_n"][0]
    assert e1 == e2  # register max-merge → bit-identical across layouts
    assert abs(e1 - 10_000) / 10_000 < 0.08  # ~1.04/sqrt(1024) expected error
    golden = expected_hll_table(with_dups.tolist(), p=10).to_pandas()["approx_n"][0]
    assert e1 == golden
    # string path agrees with its golden too
    svals = [f"user-{i}" for i in range(500)]
    es = approx_distinct(
        ray.data.from_arrow(pa.table({"x": svals})), "x", p=10
    ).to_pandas()["approx_n"][0]
    gs = expected_hll_table(svals, p=10).to_pandas()["approx_n"][0]
    assert es == gs and abs(es - 500) / 500 < 0.1


def test_bm25_topk_matches_manual_formula():
    texts = [
        "apple apple banana",          # tf(apple)=2, dl=3
        "apple pear pear pear",        # tf=1, dl=4
        "pear pear",                   # tf=0, dl=2
        "apple " * 10,                 # tf=10, dl=10 (repetition saturates)
    ]
    ds = _doc_table(texts)
    out = textstats.bm25_topk(ds, ["apple"], topk=4).to_pandas()
    n, avgdl = 4, (3 + 4 + 2 + 10) / 4
    df = 3
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1)
    def s(tf, dl):
        return round(idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
    want = {0: s(2, 3), 1: s(1, 4), 2: 0.0, 3: s(10, 10)}
    got = dict(zip(out["doc_id"], out["score"]))
    assert got == pytest.approx(want)
    # saturation: tf=10 scores highest but far below 5x the tf=2 score
    assert out.iloc[0]["doc_id"] == 3 and got[3] < 2.5 * got[0]


def test_decontaminate_counts_shared_ngrams():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta gamma delta",        # benchmark
            "alpha beta gamma epsilon",      # shares 2 distinct 3-grams? no: "alpha beta gamma" only
            "zeta eta theta iota",           # clean
            "Alpha BETA gamma delta",        # case-insensitive full match: 2 grams
        ],
        "source": ["bench", "train", "train", "train"],
    }))
    from pdftext_ray.ops.textstats import decontaminate

    out = decontaminate(docs, bench_col="source", bench_value="bench", n=3).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == {1: 1, 3: 2}


def test_pricing_rollup_levels_sum():
    df = pd.DataFrame({
        "l_returnflag": ["A", "A", "B", "B"],
        "l_linestatus": ["O", "F", "O", "O"],
        "l_quantity": [1.0, 2.0, 3.0, 4.0],
        "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
    })
    from pdftext_ray.ops.relational import lineitem_pricing_rollup

    out = lineitem_pricing_rollup(ray.data.from_pandas(df)).to_pandas()
    rows = {(r.l_returnflag, r.l_linestatus): (r.sum_qty, r.sum_price, r.n_rows)
            for r in out.itertuples()}
    assert rows[("A", "O")] == (1.0, 10.0, 1)
    assert rows[("A", "ALL")] == (3.0, 30.0, 2)
    assert rows[("B", "ALL")] == (7.0, 70.0, 2)
    assert rows[("ALL", "ALL")] == (10.0, 100.0, 4)
    assert len(rows) == 6  # 3 base + 2 flag subtotals + grand total


def test_tfidf_topk_scores_and_order():
    import math

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "text": ["rare common common", "common common", "unique common"],
            }
        )
    )
    got = textstats.tfidf_topk(ds, k=2).to_pandas()
    a = got[got["doc_id"] == "a"].sort_values("score", ascending=False)
    # 'rare' appears in 1 of 3 docs: score = 1 * ln(3/1); 'common' in all 3 → 0
    assert a.iloc[0]["term"] == "rare"
    assert abs(a.iloc[0]["score"] - round(math.log(3.0), 6)) < 1e-9
    assert a.iloc[1]["term"] == "common" and a.iloc[1]["score"] == 0.0
    assert len(got[got["doc_id"] == "b"]) == 1  # only one distinct term


def test_streaming_dedup_shared_index():
    from pdftext_ray.ops import streaming

    texts = [BASE, BASE, BASE + " x", BASE + " x", BASE + " y", "", ""]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    # surviving rows: exactly one per distinct text (which one is
    # arrival-order-dependent and deliberately not asserted)
    out = streaming.streaming_dedup(ds, n_shards=4).to_pandas()
    assert len(out) == 4
    assert sorted(out["text"]) == sorted(set(texts))
    # order-independent contract: per-text totals are exact
    counts = streaming.streaming_dedup_counts(
        ray.data.from_arrow(pa.table({"text": texts})).repartition(3), n_shards=4
    ).to_pandas()
    import hashlib as _h

    want = {
        _h.md5(t.encode()).hexdigest(): texts.count(t) for t in set(texts)
    }
    assert dict(zip(counts["text_hash"], counts["dup_count"])) == want


def test_streaming_dedup_result_survives_reexecution():
    """streaming_dedup materializes its result: consuming it twice (or Ray
    reconstructing blocks from lineage) must NOT re-offer keys against the
    already-populated index and come back empty (ADVICE r2)."""
    from pdftext_ray.ops import streaming

    texts = [BASE, BASE, BASE + " z"]
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
    out = streaming.streaming_dedup(ds, n_shards=2)
    assert out.count() == 2
    assert len(out.take_all()) == 2  # second consumption, same answer


def test_streaming_shard_offer_replay_absorbed():
    """A Ray task retry re-offers the SAME batch (same fingerprint): the
    shard must return the cached answer and leave totals untouched."""
    from pdftext_ray.ops import streaming

    shard = streaming._SeenShard.remote()
    keys = [b"a" * 16, b"b" * 16, b"a" * 16]
    first = ray.get(shard.offer.remote(b"batch-1", keys))
    replay = ray.get(shard.offer.remote(b"batch-1", keys))
    assert first == replay == [0, 0, 1]
    assert dict(ray.get(shard.totals.remote())) == {b"a" * 16: 2, b"b" * 16: 1}
    # a DIFFERENT batch with the same keys is genuinely new input
    second = ray.get(shard.offer.remote(b"batch-2", keys))
    assert second == [2, 1, 3]


def test_streaming_dedup_counts_identical_distinct_blocks():
    """Two byte-identical blocks at different stream positions are genuine
    duplicate data — both must COUNT (round-3 review: a content-based batch
    fingerprint silently absorbed the second block as a 'retry')."""
    from pdftext_ray.ops import streaming

    t = pa.table({"doc_id": [0], "text": [BASE]})
    out = streaming.streaming_dedup(ray.data.from_arrow([t, t]), n_shards=2)
    assert out.count() == 1  # second identical block deduped, not absorbed


def test_pca_top_component_matches_golden_and_known_axis():
    from pdftext_ray.ops import cluster as _cluster
    from pdftext_ray.pipelines.goldens import expected_pca_table

    rng = np.random.RandomState(8)
    # dominant variance along a known axis in 8-d
    axis = np.zeros(8)
    axis[3] = 1.0
    vecs = rng.standard_normal((400, 8)) * 0.1 + np.outer(rng.standard_normal(400) * 3.0, axis)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(400)), "embedding": [v.tolist() for v in vecs]
    }))
    got = _cluster.pca_top_component(ds).to_pandas()
    want = expected_pca_table(vecs).to_pandas()
    assert got["weight"].tolist() == want["weight"].tolist()  # bit-exact
    assert got["eigenvalue"].iloc[0] == want["eigenvalue"].iloc[0]
    # the recovered component is the planted axis
    assert abs(got["weight"].iloc[3]) > 0.99
    assert got["weight"].iloc[3] > 0  # sign pinned positive
    # layout independence
    ds2 = ray.data.from_arrow(pa.table({
        "vec_id": list(range(400))[::-1], "embedding": [v.tolist() for v in vecs[::-1]]
    })).repartition(7)
    got2 = _cluster.pca_top_component(ds2).to_pandas()
    assert got2["weight"].tolist() == got["weight"].tolist()


def test_extract_matches_rejects_capturing_groups():
    with pytest.raises(ValueError, match="capturing groups"):
        textstats.extract_matches(_doc_table(["ab"]), r"a(b)c")


def test_bpe_train_hand_case_and_golden():
    # "banana" x3, "bandana" x2: first merge must be ('a','n') — count 3*2+2*2=10
    docs = ["banana banana", "banana bandana", "bandana"]
    out = textstats.bpe_train(_doc_table(docs), n_merges=5).to_pandas()
    assert (out["left"].iloc[0], out["right"].iloc[0]) == ("a", "n")
    assert out["count"].iloc[0] == 10
    assert out["merged"].iloc[0] == "an"
    # golden equality (independent Counter trainer, shared spec)
    from pdftext_ray.pipelines.goldens import expected_bpe_table

    want = expected_bpe_table(docs, n_merges=5).to_pandas()
    assert out.values.tolist() == want.values.tolist()
    # layout independence
    out2 = textstats.bpe_train(_doc_table(docs).repartition(3), n_merges=5).to_pandas()
    assert out2.values.tolist() == out.values.tolist()
    # merges stop when nothing repeats
    tiny = textstats.bpe_train(_doc_table(["ab cd"]), n_merges=10).to_pandas()
    assert len(tiny) == 0  # every pair occurs once → best < 2 → stop


def test_vec_matrix_bit_identical_to_pylist_path():
    import numpy as np
    import pyarrow as pa
    import pytest

    from pdftext_ray.ops import vec_matrix

    rng = np.random.default_rng(7)
    vals = rng.standard_normal((50, 16))
    for typ in (pa.float64(), pa.float32()):
        arr = pa.array([list(map(float, r)) for r in vals], pa.list_(typ))
        want = np.asarray(arr.to_pylist(), dtype=np.float64)
        got = vec_matrix(arr)
        assert got.dtype == np.float64 and np.array_equal(got, want)
        # sliced view (non-zero offset) and chunked columns take the same path
        sl = arr.slice(7, 21)
        assert np.array_equal(vec_matrix(sl), np.asarray(sl.to_pylist(), dtype=np.float64))
        ch = pa.chunked_array([arr.slice(0, 13), arr.slice(13, 37)])
        assert np.array_equal(vec_matrix(ch), want)
    # contract violations raise instead of silently misaligning
    with pytest.raises(ValueError, match="ragged"):
        vec_matrix(pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())))
    with pytest.raises(ValueError, match="null"):
        vec_matrix(pa.array([[1.0], None], pa.list_(pa.float64())))
    assert vec_matrix(pa.array([], pa.list_(pa.float64()))).shape == (0, 0)


def test_incremental_dedup_plans_agree_on_random_overlap():
    # 120 increment docs with planted copies, ~half the distinct texts
    # already in the baseline: both plans must produce identical novel sets
    rng = np.random.default_rng(7)
    texts = [f"document body number {i} with shared filler tokens" for i in range(40)]
    inc_rows = [texts[rng.integers(0, 40)] for _ in range(120)]
    ds = _doc_table(inc_rows)
    import hashlib
    baseline = ray.data.from_arrow(pa.table({
        "text_hash": [hashlib.md5(t.encode()).hexdigest() for t in texts[:20]]
    }))
    def run(plan):
        return (dedup.incremental_exact_dedup(ds, baseline, plan=plan)
                .to_pandas().sort_values("text_hash").reset_index(drop=True))
    b, s = run("broadcast"), run("shuffle")
    assert b.equals(s) and len(b) > 0


def test_incremental_minhash_plans_agree_on_mixed_corpus():
    # exact copies straddling the baseline, near-dups, novel docs, and
    # within-increment dup saturation: both plans must emit identical
    # verdict frames (the broadcast plan's candidate filter and per-batch
    # uncollapsed baseline copies must not change any argmax)
    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(200)]
    def doc(k, mut=0):
        idx = rng.integers(0, 200, size=30)
        t = [words[i] for i in idx]
        for _ in range(mut):
            t[rng.integers(0, 30)] = words[rng.integers(0, 200)]
        return " ".join(t)
    base_texts = [doc(i) for i in range(20)]
    base = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": base_texts + [],
    }))
    # increment: copies of baseline docs, near-dups, novel, and 5x one copy
    inc_texts = ([base_texts[3]] * 5 + [base_texts[7]]
                 + [base_texts[1].replace("tok", "tok", 1)]  # exact again
                 + [doc(100 + i) for i in range(10)])
    new_docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(100, 100 + len(inc_texts)), pa.int64()),
        "text": inc_texts,
    }))
    sigs = dedup.minhash_signatures(base)
    def run(plan):
        return (dedup.incremental_minhash_dedup(new_docs, sigs, threshold=0.3, plan=plan)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b, s = run("broadcast"), run("shuffle")
    assert b.equals(s) and len(b) >= 7


def test_incremental_minhash_new_sigs_passthrough():
    # the daily roll-forward computes increment signatures once and shares
    # them — results must equal the in-op signature pass exactly
    base_docs = ray.data.from_arrow(pa.table({"doc_id": [0], "text": [BASE]}))
    new_docs = ray.data.from_arrow(pa.table({
        "doc_id": [7, 9], "text": [BASE, BASE.replace("morning", "evening")]}))
    sigs = dedup.minhash_signatures(base_docs)
    pre = dedup.minhash_signatures(new_docs).materialize()
    a = (dedup.incremental_minhash_dedup(new_docs, sigs, threshold=0.3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup.incremental_minhash_dedup(new_docs, sigs, threshold=0.3, new_sigs=pre)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b) and len(a) == 2
