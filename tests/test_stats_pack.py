"""Tests for corpus statistics (exact percentiles, z-score) and stratified
sampling: distributed results must equal direct scalar computation."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pdftext_ray.ops import sampling, stats


def _int_table(values, extra=None):
    cols = {"doc_id": list(range(len(values))), "n_chars": list(values)}
    if extra:
        cols.update(extra)
    return ray.data.from_arrow(pa.table(cols))


def _quantile_disc(values, p):
    # the SQL rank rule: 0-based index ceil(p*n) - 1 over sorted values
    s = sorted(values)
    return s[math.ceil(p * len(s)) - 1]


def test_exact_percentiles_matches_rank_rule():
    rng = np.random.default_rng(3)
    vals = rng.integers(10, 5000, size=997).tolist()
    out = stats.exact_percentiles(_int_table(vals), "n_chars", (0.5, 0.9, 0.99))
    got = {p: v for p, v in zip(out.column("pct").to_pylist(), out.column("value").to_pylist())}
    for p in (0.5, 0.9, 0.99):
        assert got[p] == _quantile_disc(vals, p)
    assert out.column("n_rows").to_pylist() == [997] * 3


def test_exact_percentiles_heavy_ties_and_edges():
    vals = [7] * 50 + [9] * 50  # p<=0.5 -> 7, p>0.5 -> 9
    out = stats.exact_percentiles(_int_table(vals), "n_chars", (0.5, 0.51, 1.0))
    assert out.column("value").to_pylist() == [7, 9, 9]


def test_exact_percentiles_refuses_unbounded_domains():
    with pytest.raises(ValueError, match="distinct"):
        stats.exact_percentiles(_int_table(list(range(100))), "n_chars", (0.5,), max_distinct=10)


def test_interp_percentiles_matches_numpy_linear():
    # quantile_cont == numpy's 'linear' method on integer data
    rng = np.random.default_rng(11)
    vals = rng.integers(10, 5000, size=997).tolist()
    out = stats.interp_percentiles(_int_table(vals), "n_chars", (0.0, 0.25, 0.5, 0.9, 1.0)).to_pandas()
    for _, row in out.iterrows():
        want = float(np.quantile(np.array(vals, dtype=np.float64), row["pct"], method="linear"))
        assert abs(row["value"] - round(want, 6)) < 1e-9, (row["pct"], row["value"], want)
    assert (out["n_rows"] == 997).all()


def test_interp_percentiles_interpolates_between_ties():
    # n=4 → p=0.5 lands at RN=1.5 between the two middle values
    out = stats.interp_percentiles(_int_table([10, 20, 30, 40]), "n_chars", (0.5,)).to_pandas()
    assert out["value"].iloc[0] == 25.0
    # heavy ties: interpolation between equal values stays exact
    out2 = stats.interp_percentiles(_int_table([7] * 50 + [9] * 50), "n_chars", (0.25, 0.75)).to_pandas()
    assert out2["value"].tolist() == [7.0, 9.0]


def test_describe_table_profile_and_merge():
    from pdftext_ray.ops.stats import describe_table

    t = pa.table({
        "k": pa.array([99, 100, 5, None, 7], pa.int64()),
        "s": pa.array(["b", None, "a", "z", "a"], pa.string()),
    })
    out = (
        describe_table(ray.data.from_arrow(t).repartition(4), ["k", "s"])
        .to_pandas().set_index("column")
    )
    # int min/max merged NUMERICALLY across blocks (not "100" < "99")
    assert out.loc["k", "min_str"] == "5" and out.loc["k", "max_str"] == "100"
    assert out.loc["k", "n"] == 5 and out.loc["k", "n_null"] == 1
    assert out.loc["s", "min_str"] == "a" and out.loc["s", "max_str"] == "z"
    assert abs(out.loc["k", "approx_distinct"] - 4) < 1.5
    assert abs(out.loc["s", "approx_distinct"] - 3) < 1.5
    # layout independence (mergeable partials)
    out2 = (
        describe_table(ray.data.from_arrow(t), ["k", "s"]).to_pandas().set_index("column")
    )
    assert out.loc["k", "approx_distinct"] == out2.loc["k", "approx_distinct"]


def test_histogram_buckets_edges_and_counts():
    from pdftext_ray.ops.stats import histogram_buckets

    out = histogram_buckets(_int_table(list(range(100))), "n_chars", n_buckets=10).to_pandas()
    assert out["n"].tolist() == [10] * 10  # uniform 0..99 → equal buckets
    assert out["lo"].iloc[0] == 0.0 and out["hi"].iloc[9] == 99.0
    # max value lands in the LAST bucket (clamped), empty buckets emitted
    out2 = histogram_buckets(_int_table([0, 100]), "n_chars", n_buckets=4).to_pandas()
    assert out2["n"].tolist() == [1, 0, 0, 1]
    # degenerate single-value domain: everything in bucket 0
    out3 = histogram_buckets(_int_table([7, 7, 7]), "n_chars", n_buckets=4).to_pandas()
    assert out3["n"].tolist() == [3, 0, 0, 0]


def test_exact_corr_matches_closed_form():
    from pdftext_ray.ops.stats import exact_corr

    rng = np.random.default_rng(2)
    x = rng.integers(1, 50, 500).astype(float)
    y = (2.0 * x + rng.normal(0, 5, 500)).round(2)
    ds = ray.data.from_arrow(pa.table({"x": x.tolist(), "y": y.tolist()}))
    out = exact_corr(ds, "x", "y").to_pandas()
    want = np.corrcoef(np.round(x * 100), np.round(y * 100))[0, 1]
    assert abs(out["corr"].iloc[0] - want) < 1e-6
    assert out["n"].iloc[0] == 500
    # layout independence: exact integer moments, any split
    out2 = exact_corr(ds.repartition(7), "x", "y").to_pandas()
    assert out["corr"].iloc[0] == out2["corr"].iloc[0]
    with pytest.raises(ValueError, match="variance"):
        exact_corr(ray.data.from_arrow(pa.table({"x": [1.0, 1.0], "y": [1.0, 2.0]})), "x", "y")


def test_grouped_hll_accuracy_and_layouts():
    from pdftext_ray.ops.stats import grouped_approx_distinct

    rng = np.random.default_rng(4)
    n = 6000
    groups = np.where(rng.random(n) < 0.5, "a", "b")
    vals = np.where(groups == "a", rng.integers(0, 500, n), rng.integers(0, 50, n))
    ds = ray.data.from_arrow(pa.table({"g": groups.tolist(), "v": vals.tolist()}))
    out = grouped_approx_distinct(ds, "g", "v", p=10).to_pandas().set_index("g")
    true_a = len(set(vals[groups == "a"]))
    true_b = len(set(vals[groups == "b"]))
    assert abs(out.loc["a", "approx_n"] - true_a) / true_a < 0.15
    assert abs(out.loc["b", "approx_n"] - true_b) / true_b < 0.15
    # merge is commutative/idempotent → identical across layouts
    out2 = grouped_approx_distinct(ds.repartition(11), "g", "v", p=10).to_pandas().set_index("g")
    assert out.loc["a", "approx_n"] == out2.loc["a", "approx_n"]
    assert out.loc["b", "approx_n"] == out2.loc["b", "approx_n"]


def test_funnel_conversion_semantics():
    from pdftext_ray.ops import relational

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: click then purchase inside the window → converts
        (1, base, "click"), (1, base + pd.Timedelta(hours=2), "purchase"),
        # user 2: purchase BEFORE the first click → no conversion
        (2, base, "purchase"), (2, base + pd.Timedelta(hours=1), "click"),
        # user 3: purchase after window → no conversion
        (3, base, "click"), (3, base + pd.Timedelta(hours=30), "purchase"),
        # user 4: click only
        (4, base, "click"),
        # user 5: purchase only (never entered)
        (5, base, "purchase"),
        # user 6: second click earlier than first? first click at t0, purchase at exactly t0+24h → edge inclusive
        (6, base, "click"), (6, base + pd.Timedelta(hours=24), "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = relational.funnel_conversion(ray.data.from_pandas(df).repartition(3)).to_pandas()
    assert out["n_entered"].iloc[0] == 5  # users 1,2,3,4,6
    assert out["n_converted"].iloc[0] == 2  # users 1 and 6 (boundary inclusive)
    assert out["conversion_rate"].iloc[0] == 0.4


def test_sort_rank_matches_window_semantics():
    from pdftext_ray.ops import relational

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 50, size=233)  # heavy ties
    ds = _int_table(vals.tolist())
    out = relational.sort_rank(ds, "n_chars", "doc_id", descending=True, n_buckets=7).to_pandas()
    df = pd.DataFrame({"doc_id": range(233), "n_chars": vals}).sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    df["rank"] = df.index + 1
    merged = out.merge(df, on=["doc_id", "n_chars"], suffixes=("", "_want"))
    assert (merged["rank"] == merged["rank_want"]).all()
    # ntile: bucket sizes differ by <= 1, larger first (233 = 7*33 + 2)
    sizes = out.groupby("bucket").size().sort_index()
    assert sizes.tolist() == [34, 34, 33, 33, 33, 33, 33]
    # ranks are a permutation of 1..n
    assert sorted(out["rank"]) == list(range(1, 234))
    # ascending + layout independence
    a = relational.sort_rank(ds, "n_chars", "doc_id", descending=False).to_pandas()
    b = relational.sort_rank(ds.repartition(9), "n_chars", "doc_id", descending=False).to_pandas()
    m = a.merge(b, on="doc_id", suffixes=("", "_b"))
    assert (m["rank"] == m["rank_b"]).all()
    asc_first = a.sort_values("rank").iloc[0]
    assert asc_first["n_chars"] == vals.min()


def test_grouped_percentiles_per_group_rank():
    rng = np.random.default_rng(5)
    langs = ["en", "de", "zh"]
    df = pd.DataFrame({
        "doc_id": range(600),
        "lang": [langs[i % 3] for i in range(600)],
        "n_chars": rng.integers(1, 300, size=600),
    })
    ds = ray.data.from_arrow(pa.table(df.to_dict("list")))
    out = stats.grouped_percentiles(ds, "lang", "n_chars", (0.5, 0.9)).to_pandas()
    for lang in langs:
        vals = df[df["lang"] == lang]["n_chars"].tolist()
        for p in (0.5, 0.9):
            row = out[(out["lang"] == lang) & (out["pct"] == p)]
            assert len(row) == 1
            assert row["value"].iloc[0] == _quantile_disc(vals, p)
            assert row["n_rows"].iloc[0] == len(vals)


def test_zscore_matches_scalar_formula():
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    out = stats.zscore_normalize(_int_table(vals), "n_chars").to_pandas().sort_values("doc_id")
    s, ss, c = float(sum(vals)), float(sum(v * v for v in vals)), float(len(vals))
    mean = s / c
    std = math.sqrt(ss / c - mean * mean)
    got = out["zscore"].tolist()
    for v, z in zip(vals, got):
        assert abs(z - (v - mean) / std) < 1e-6
    # exact ints -> layout-independent: rerun equals first run
    again = stats.zscore_normalize(_int_table(vals), "n_chars").to_pandas().sort_values("doc_id")
    assert got == again["zscore"].tolist()


def test_zscore_rejects_degenerate_inputs():
    with pytest.raises(ValueError, match="variance"):
        stats.zscore_normalize(_int_table([5, 5, 5]), "n_chars")


def test_stratified_sample_respects_group_fractions():
    n = 4000
    langs = ["en" if i % 2 else "zh" for i in range(n)]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n)), "lang": langs}))
    out = sampling.stratified_sample(ds, "lang", {"zh": 1.0, "en": 0.25}).to_pandas()
    zh = out[out["lang"] == "zh"]
    en = out[out["lang"] == "en"]
    assert len(zh) == n // 2  # fraction 1.0 keeps every row
    assert 0.15 < len(en) / (n // 2) < 0.35
    # deterministic + layout-independent: same keep set from a different block layout
    out2 = sampling.stratified_sample(
        ray.data.from_arrow(pa.table({"doc_id": list(range(n)), "lang": langs})).repartition(7),
        "lang",
        {"zh": 1.0, "en": 0.25},
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_stratified_sample_default_fraction_zero_drops_unlisted():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(100)), "lang": ["fr"] * 100})
    )
    assert sampling.stratified_sample(ds, "lang", {"en": 1.0}).count() == 0


def _skewed_source_table(n=3000):
    # 80/15/5 source skew — the temperature rule should flatten it
    src = ["web"] * (n * 80 // 100) + ["books"] * (n * 15 // 100) + ["code"] * (n * 5 // 100)
    return ray.data.from_arrow(pa.table({"doc_id": list(range(len(src))), "source": src}))


def test_temperature_sample_flattens_dominant_groups():
    n = 3000
    out = sampling.temperature_sample(_skewed_source_table(n), alpha=0.5).to_pandas()
    got = out.groupby("source").size().to_dict()
    # scalar replication of the rule: rate_g = min(1, N * c^a / Z / c)
    c = {"web": n * 80 // 100, "books": n * 15 // 100, "code": n * 5 // 100}
    z = sum(v**0.5 for v in sorted(float(v) for v in c.values()))
    total = float(sum(c.values()))
    for g, cnt in c.items():
        rate = min(1.0, total * cnt**0.5 / z / cnt)
        if rate >= 1.0:
            assert got.get(g, 0) == cnt  # rare groups kept whole
        else:
            assert abs(got.get(g, 0) / cnt - rate) < 0.05
    # alpha=0.5 must strictly shrink the dominant group's share
    assert got["web"] / len(out) < 0.80
    # deterministic + layout-independent
    out2 = sampling.temperature_sample(
        _skewed_source_table(n).repartition(7), alpha=0.5
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_temperature_sample_alpha_one_is_identity():
    ds = _skewed_source_table(1000)
    assert sampling.temperature_sample(ds, alpha=1.0).count() == 1000


def test_temperature_sample_rejects_bad_alpha():
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_sample(_skewed_source_table(100), alpha=1.5)


def _es_priorities(ids, weights, seed=17):
    # scalar replication of the weighted_sample priority contract
    K = 0x9E3779B97F4A7C15
    out = []
    for i, w in zip(ids, weights):
        h52 = (((i + seed) * K) % (1 << 64)) >> 12
        u = (h52 + 1) / float(1 << 52)
        out.append(math.floor(math.log(u) / w * 4294967296.0))
    return out


def test_weighted_sample_matches_scalar_race_and_layouts():
    rng = np.random.default_rng(11)
    n = 2000
    w = rng.integers(1, 900, size=n).tolist()
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n)), "n_chars": w}))
    out = sampling.weighted_sample(ds, k=40, weight_col="n_chars").to_pandas()
    assert len(out) == 40
    # exactly the top-40 scalar priorities, in (priority desc, id asc) order
    pri = _es_priorities(range(n), w)
    want = sorted(zip(pri, range(n)), key=lambda t: (-t[0], t[1]))[:40]
    assert list(zip(out["priority"], out["doc_id"])) == [(p, i) for p, i in want]
    # layout-independent: reversed 7-block layout selects the same rows
    ds2 = ray.data.from_arrow(
        pa.table({"doc_id": list(range(n - 1, -1, -1)), "n_chars": w[::-1]})
    ).repartition(7)
    out2 = sampling.weighted_sample(ds2, k=40, weight_col="n_chars").to_pandas()
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()


def test_weighted_sample_prefers_heavy_rows():
    # weights 1 vs 1000: the heavy half should dominate the sample
    n = 1000
    w = [1 if i < n // 2 else 1000 for i in range(n)]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n)), "n_chars": w}))
    out = sampling.weighted_sample(ds, k=100, weight_col="n_chars").to_pandas()
    heavy = (out["doc_id"] >= n // 2).sum()
    assert heavy > 90


def test_weighted_sample_rejects_nonpositive_weights():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1, 2], "n_chars": [5, 0]}))
    # the ValueError surfaces wrapped in Ray's task error; match the message
    with pytest.raises(Exception, match="finite and > 0"):
        sampling.weighted_sample(ds, k=1, weight_col="n_chars").take_all()


def test_weighted_sample_tiny_weights_saturate_not_invert():
    # weights below ~2e-9 overflow the int64 grid; they must SATURATE (and
    # lose to ordinary weights), not wrap around and win the sample
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4], "w": [1e-12, 1e-12, 1000.0, 2000.0]})
    )
    out = sampling.weighted_sample(ds, k=2, weight_col="w").to_pandas()
    assert sorted(out["doc_id"]) == [3, 4]
    assert (out["priority"] > -(2**62)).all()


def test_sample_quantiles_full_sample_is_exact_and_layout_independent():
    rng = np.random.default_rng(7)
    vals = rng.integers(10, 100000, size=900).tolist()
    ds = _int_table(vals)
    # sample_size >= n: the "sample" is the whole corpus -> exact quantiles
    out = stats.sample_quantiles(ds, "n_chars", sample_size=2000)
    got = dict(zip(out.column("pct").to_pylist(), out.column("value").to_pylist()))
    for p in (0.5, 0.9, 0.99):
        assert got[p] == _quantile_disc(vals, p)
    # bottom-k subsample: deterministic across block layouts
    a = stats.sample_quantiles(ds, "n_chars", sample_size=128)
    ds2 = ray.data.from_arrow(
        pa.table({"doc_id": list(range(899, -1, -1)), "n_chars": vals[::-1]})
    ).repartition(9)
    b = stats.sample_quantiles(ds2, "n_chars", sample_size=128)
    assert a.to_pydict() == b.to_pydict()
    assert a.column("sample_n").to_pylist() == [128] * 3
    # and close to the exact answer (uniform sample, n=128)
    approx = dict(zip(a.column("pct").to_pylist(), a.column("value").to_pylist()))
    exact = _quantile_disc(vals, 0.5)
    assert abs(approx[0.5] - exact) / exact < 0.2


def test_shuffle_rank_is_a_permutation_and_layout_independent():
    import numpy as np

    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(500))}))
    a = sampling.shuffle_rank(ds).to_pandas().sort_values("doc_id")
    assert sorted(a["shuffle_rank"]) == list(range(500))
    b = (
        sampling.shuffle_rank(
            ray.data.from_arrow(pa.table({"doc_id": list(range(499, -1, -1))})).repartition(7)
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert np.array_equal(a["shuffle_rank"].values, b["shuffle_rank"].values)
    # actually shuffled: rank order differs from key order
    assert not np.array_equal(a["shuffle_rank"].values, np.arange(500))
    # scalar replication: rank = position in sort by (h32, key)
    K = 0x9E3779B97F4A7C15
    h = [(((i + 17) * K) % (1 << 64)) >> 32 for i in range(500)]
    want = {i: r for r, (hh, i) in enumerate(sorted(zip(h, range(500))))}
    got = dict(zip(a["doc_id"], a["shuffle_rank"]))
    assert got == want


def test_describe_table_empty_and_unsupported():
    from pdftext_ray.ops.stats import describe_table

    empty = pa.table({"k": pa.array([], pa.int64()), "s": pa.array([], pa.string())})
    out = describe_table(ray.data.from_arrow(empty), ["k", "s"]).to_pandas()
    assert out["n"].tolist() == [0, 0]
    assert out["min_str"].isna().all() and out["approx_distinct"].tolist() == [0.0, 0.0]
    with pytest.raises(TypeError, match="int/float/string"):
        describe_table(
            ray.data.from_arrow(pa.table({"b": pa.array([True], pa.bool_())})), ["b"]
        )
    with pytest.raises(ValueError, match="no column"):
        describe_table(ray.data.from_arrow(empty), ["missing"])


def _scalar_group_cap(ids, groups, cap, seed=17):
    # independent scalar replication of group_cap's rank contract
    K = 0x9E3779B97F4A7C15
    by_group = {}
    for i, g in zip(ids, groups):
        h = (((i + seed) * K) % (1 << 64)) >> 32
        by_group.setdefault(g, []).append((h, i))
    out = []
    for g, rows in by_group.items():
        for rank, (_, i) in enumerate(sorted(rows), start=1):
            if rank <= cap:
                out.append((i, g, rank))
    return sorted(out)


def test_group_cap_matches_scalar_and_layouts():
    rng = np.random.default_rng(5)
    n = 1500
    groups = [f"host{int(x)}" for x in rng.integers(0, 40, size=n)]
    ids = list(range(n))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "source": groups}))
    out = sampling.group_cap(ds, cap=7, group_col="source").to_pandas()
    got = sorted(zip(out["doc_id"], out["source"], out["group_rank"]))
    assert got == _scalar_group_cap(ids, groups, cap=7)
    # every group capped at 7; groups smaller than 7 keep everything
    sizes = out.groupby("source").size()
    assert sizes.max() <= 7
    # layout-independent: reversed 9-block layout keeps the same rows
    ds2 = ray.data.from_arrow(
        pa.table({"doc_id": ids[::-1], "source": groups[::-1]})
    ).repartition(9)
    out2 = sampling.group_cap(ds2, cap=7, group_col="source").to_pandas()
    assert sorted(zip(out2["doc_id"], out2["source"], out2["group_rank"])) == got


def test_group_cap_rejects_bad_cap():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "source": ["a"]}))
    with pytest.raises(ValueError, match="cap"):
        sampling.group_cap(ds, cap=0)
