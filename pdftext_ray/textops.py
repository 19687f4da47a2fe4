"""Scalar text post-processing functions (reference M6/M7/O1 semantics).

Reimplements the behavior of pdftext/postprocessing.py:7-92 — including the
documented quirks that the exact-match invariant depends on:

* the dehyphenation path iterates ``range(len(text) - 1)`` and therefore DROPS
  the final character (pdftext/postprocessing.py:39);
* after a soft hyphen, the "found hyphen" state persists until the next space
  (line breaks are swallowed, letters are joined);
* ``sort_blocks`` quantizes y with Python banker's rounding
  (pdftext/postprocessing.py:80).
"""

from __future__ import annotations

import unicodedata
from typing import Dict, List

# Character classes — pdftext/pdf/utils.py:8-11.
LINE_BREAKS = ("\n", "\u000D", "\u000A")
TABS = ("\t", "\u0009", "\x09")
SPACES = (" ", "\ufffe", "\uFEFF", "\xa0")
WHITESPACE_CHARS = ("\n", "\r", "\f", "\t", " ")

HYPHEN_CHAR = "\x02"  # soft-hyphen sentinel injected by the decoder (postprocessing.py:16)

# Ligature expansion table — pdftext/postprocessing.py:7-15.
LIGATURES: Dict[str, str] = {
    "ﬀ": "ff",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬆ": "st",
    "ﬅ": "st",
}

_SPECIAL_MAP = {}
for _c in SPACES:
    _SPECIAL_MAP[_c] = " "
for _c in LINE_BREAKS:
    _SPECIAL_MAP.setdefault(_c, "\n")
for _c in TABS:
    _SPECIAL_MAP.setdefault(_c, "\t")

_WS_KEEP = set(WHITESPACE_CHARS) | {HYPHEN_CHAR}


def replace_special_chars(text: str) -> str:
    """Normalize whitespace classes (postprocessing.py:56-63).

    The reference applies sequential ``str.replace`` passes (SPACES, then
    LINE_BREAKS, then TABS); since the classes are disjoint single chars a
    single translate pass is equivalent and faster.
    """
    return text.translate(_SPECIAL_TRANS)


_SPECIAL_TRANS = str.maketrans(_SPECIAL_MAP)


class _ControlCharTable(dict):
    """Lazily-built ``str.translate`` table: codepoint → None (delete) for
    category-C chars outside the whitespace keep-set, else the codepoint
    itself. One category lookup per DISTINCT codepoint ever seen; the
    per-char scan runs in C."""

    def __missing__(self, cp: int):
        ch = chr(cp)
        v = None if (unicodedata.category(ch)[0] == "C" and ch not in _WS_KEEP) else cp
        self[cp] = v
        return v


_CTRL_TRANS = _ControlCharTable()


def replace_control_chars(text: str) -> str:
    """Strip Unicode category-C chars except \\x02 and whitespace (postprocessing.py:66-67)."""
    return text.translate(_CTRL_TRANS)


def replace_ligatures(text: str) -> str:
    for lig, rep in LIGATURES.items():
        if lig in text:
            text = text.replace(lig, rep)
    return text


def postprocess_text(text: str) -> str:
    """\\r\\n fold + whitespace normalize + control strip + ligature expand
    (postprocessing.py:22-28)."""
    if "\r\n" in text:
        text = text.replace("\r\n", "\n")
    text = replace_special_chars(text)
    text = replace_control_chars(text)
    text = replace_ligatures(text)
    return text


_LINE_BREAK_SET = set(LINE_BREAKS)
_SPACE_SET = set(SPACES)


def handle_hyphens(text: str, keep_hyphens: bool = False) -> str:
    """Soft-hyphen handling (postprocessing.py:31-53).

    ``keep_hyphens=True``: each \\x02 becomes ``-\\n``. Otherwise a stateful
    scan dehyphenates: the hyphen char is dropped, following line breaks are
    swallowed, and the first following space is replaced by
    ``rstrip() + "\\n"``. Faithfully replicates the reference's
    dropped-final-character quirk (the scan stops at ``len(text) - 1``).
    """
    if keep_hyphens:
        return text.replace(HYPHEN_CHAR, "-\n")
    if len(text) == 0:
        return text
    if HYPHEN_CHAR not in text:
        # hyphen-free fast path: the scan below copies chars 0..len-2
        # verbatim (found_hyphen never fires), i.e. exactly text[:-1]
        return text[:-1]
    out: List[str] = []
    found_hyphen = False
    for i in range(len(text) - 1):
        c = text[i]
        if c == HYPHEN_CHAR:
            found_hyphen = True
        elif found_hyphen:
            if c in _LINE_BREAK_SET:
                pass
            elif c in _SPACE_SET:
                joined = "".join(out).rstrip()
                out = [joined, "\n"]
                found_hyphen = False
            else:
                out.append(c)
        else:
            out.append(c)
    return "".join(out)


def sort_blocks(blocks: List[dict], tolerance: float = 1.25) -> List[dict]:
    """Reading-order sort: bucket by quantized y0, then sort by x0
    (postprocessing.py:76-92). Per-page LOCAL sort — never a cluster sort.

    ``blocks`` items need a ``"bbox"`` entry indexable at [0]/[1].
    """
    vertical_groups: Dict[float, List[dict]] = {}
    for block in blocks:
        key = round(block["bbox"][1] / tolerance) * tolerance
        vertical_groups.setdefault(key, []).append(block)
    out: List[dict] = []
    for _, group in sorted(vertical_groups.items()):
        out.extend(sorted(group, key=lambda b: b["bbox"][0]))
    return out


def is_math_symbol(char: str) -> bool:
    """Unicode category Sm test (pdftext/pdf/pages.py:15-20)."""
    if len(char) != 1:
        return False
    return unicodedata.category(char) == "Sm"
