"""Structural invariants of the clustering folds under random char streams:
whatever the input, spans partition the deduped chars in order, lines
partition the spans, blocks partition the lines, and every bbox contains its
children. These hold for ANY input — they catch fold bookkeeping bugs the
golden cases can't."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdftext_ray.kernel import cluster

FONTS = [("A", 0, 10.0, 400.0), ("B", 1, 12.0, 700.0)]


@st.composite
def char_streams(draw):
    n = draw(st.integers(0, 120))
    chars = []
    for i in range(n):
        cp = draw(st.sampled_from([97, 98, 99, 32, 10, 2, 0x221E]))  # a b c space \n \x02 ∞
        x = draw(st.floats(0, 600, allow_nan=False))
        y = draw(st.floats(0, 780, allow_nan=False))
        w = draw(st.floats(0, 20, allow_nan=False))
        h = draw(st.floats(0, 20, allow_nan=False))
        font = FONTS[draw(st.integers(0, 1))]
        rot = draw(st.sampled_from([0.0, 90.0]))
        chars.append((chr(cp), [x, y, x + w, y + h], rot, font, i))
    return chars


def _contains(outer, inner):
    return (
        outer[0] <= inner[0] + 1e-9 and outer[1] <= inner[1] + 1e-9
        and outer[2] >= inner[2] - 1e-9 and outer[3] >= inner[3] - 1e-9
    )


@given(char_streams())
@settings(max_examples=150, deadline=None)
def test_fold_partition_invariants(chars):
    deduped = cluster.deduplicate_chars(chars)
    # dedup only removes chars, never reorders or mutates
    assert [c[4] for c in deduped] == sorted(c[4] for c in deduped)
    dedup_set = set(id(c) for c in deduped)
    assert dedup_set <= set(id(c) for c in chars)

    spans = cluster.get_spans(deduped)
    # spans partition the deduped chars, in order
    flat = [c for s in spans for c in s["chars"]]
    assert flat == deduped
    for s in spans:
        assert s["text"] == "".join(c[0] for c in s["chars"])
        assert s["char_start_idx"] == s["chars"][0][4]
        assert s["char_end_idx"] == s["chars"][-1][4]
        for c in s["chars"]:
            assert _contains(s["bbox"], c[1])
            assert c[3] == s["font"] and c[2] == s["rotation"]

    lines = cluster.get_lines(spans)
    assert [sp for ln in lines for sp in ln["spans"]] == spans
    for ln in lines:
        for sp in ln["spans"]:
            assert _contains(ln["bbox"], sp["bbox"])

    cluster.assign_scripts(lines, height_threshold=0.7)

    blocks = cluster.get_blocks(lines)
    assert [ln for b in blocks for ln in b["lines"]] == lines
    for b in blocks:
        for ln in b["lines"]:
            assert _contains(b["bbox"], ln["bbox"])


@given(char_streams())
@settings(max_examples=100, deadline=None)
def test_dedup_idempotent(chars):
    out = cluster.deduplicate_chars(chars)
    assert cluster.deduplicate_chars(out) == out


def test_dedup_keeps_first_occurrence_specifically():
    """The SURVIVOR of a duplicate word must be the first-seen one (distinct
    char_idx values distinguish the copies)."""
    f = ("F", 0, 10.0, 400.0)
    first = [("h", [10.0, 10.0, 16.0, 20.0], 0.0, f, 0),
             ("i", [16.0, 10.0, 22.0, 20.0], 0.0, f, 1),
             (" ", [22.0, 10.0, 25.0, 20.0], 0.0, f, 2)]
    copy = [("h", [10.0, 10.0, 16.0, 20.0], 0.0, f, 3),
            ("i", [16.0, 10.0, 22.0, 20.0], 0.0, f, 4),
            (" ", [22.0, 10.0, 25.0, 20.0], 0.0, f, 5)]
    out = cluster.deduplicate_chars(first + copy)
    assert [c[4] for c in out] == [0, 1, 2]  # first copy's indices survive
