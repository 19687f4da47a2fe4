"""Golden tests pinning the reference text-processing quirks (SURVEY.md §7
"hard parts"). Expected values derived by hand from the cited reference
behaviors — these pin OUR semantics so kernel refactors can't drift."""

from pdftext_ray import textops as T


def test_dehyphenation_joins_word_and_drops_final_char():
    # postprocessing.py:31-53 — the scan stops at len-1, dropping the last char
    assert T.handle_hyphens("exam\x02\nple next") == "example\nnex"
    assert T.handle_hyphens("abc") == "ab"
    assert T.handle_hyphens("") == ""


def test_dehyphenation_state_persists_past_linebreaks():
    # after \x02, line breaks are swallowed until the next space
    assert T.handle_hyphens("a\x02\n\nbc d!") == "abc\nd"


def test_keep_hyphens_rewrites_sentinel():
    assert T.handle_hyphens("exam\x02ple", keep_hyphens=True) == "exam-\nple"


def test_postprocess_ligatures_and_controls():
    assert T.postprocess_text("diﬃcult ﬁx") == "difficult fix"
    assert T.postprocess_text("a\x01b") == "ab"          # control char stripped
    assert T.postprocess_text("a\x02b") == "a\x02b"      # hyphen sentinel kept
    assert T.postprocess_text("a\r\nb") == "a\nb"
    assert T.postprocess_text("a\xa0b ") == "a b "  # only listed spaces normalize


def test_sort_blocks_quantized_reading_order():
    # postprocessing.py:76-92 — y-bucket (tolerance 1.25), then x
    blocks = [
        {"bbox": [300.0, 10.3, 400, 20], "id": "right-top"},
        {"bbox": [10.0, 10.1, 100, 20], "id": "left-top"},
        {"bbox": [10.0, 50.0, 100, 60], "id": "left-bottom"},
    ]
    assert [b["id"] for b in T.sort_blocks(blocks)] == ["left-top", "right-top", "left-bottom"]


def test_is_math_symbol():
    assert T.is_math_symbol("∞")
    assert not T.is_math_symbol("a")
    assert not T.is_math_symbol("ab")
