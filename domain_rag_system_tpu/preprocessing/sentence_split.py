"""Deterministic rule-based sentence splitting.

The reference splits long sections with SciSpacy's ``en_core_sci_sm``
(``src/preprocessing/chunker.py:324-380``) and — a known bug — reloads the
spaCy model on *every call* (``chunker.py:329``). SciSpacy is unavailable in
this environment and, more importantly, a model-based splitter is a poor fit
for a deterministic, testable indexing pipeline. This module implements a
fast rule-based splitter tuned for biomedical abstracts:

  * splits on ``. ! ?`` followed by whitespace and an uppercase/digit start;
  * protects common abbreviations (``e.g.``, ``Fig.``, ``et al.`` ...),
    initials (``J. Smith``), and decimal numbers (``p < 0.05``);
  * never splits inside parentheses or brackets spanning < 200 chars.
"""

from __future__ import annotations

import re
from typing import List

# Abbreviations that end with '.' but do not terminate a sentence.
_ABBREVIATIONS = {
    "e.g", "i.e", "etc", "vs", "cf", "al", "fig", "figs", "eq", "eqs",
    "ref", "refs", "no", "nos", "vol", "ca", "approx", "resp",
    "dr", "mr", "mrs", "ms", "prof", "st", "jr", "sr",
    "inc", "ltd", "co", "dept", "univ", "min", "max", "wk", "hr", "sec",
    "mon", "tue", "wed", "thu", "fri", "sat", "sun",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept",
    "oct", "nov", "dec",
}

# Candidate boundary: terminator, optional closing quote/bracket, whitespace,
# then an upper-case letter, digit, or any non-ASCII character (Greek /
# Cyrillic / CJK sentences previously never split because the lookahead
# demanded [A-Z0-9]; ASCII-punctuation starts keep the old no-split
# behavior so English chunking is unchanged).
_BOUNDARY = re.compile(r'([.!?])(["\')\]]*)(\s+)(?=["\'(\[]?(?!\s)[A-Z0-9\u0080-\U0010ffff])')


def _token_before(text: str, idx: int) -> str:
    """Word immediately preceding position ``idx`` (lowercased, no dots)."""
    j = idx
    while j > 0 and not text[j - 1].isspace():
        j -= 1
    return text[j:idx].lower().rstrip(".")


def split_sentences(text: str) -> List[str]:
    """Split ``text`` into sentences; whitespace-stripped, non-empty."""
    if not text:
        return []

    boundaries: List[int] = []
    depth = 0
    # Track bracket depth so boundaries inside short parentheticals are skipped.
    bracket_open = {"(": 1, "[": 1}
    bracket_close = {")": 1, "]": 1}
    depth_at = [0] * (len(text) + 1)
    for i, ch in enumerate(text):
        if ch in bracket_open:
            depth += 1
        elif ch in bracket_close and depth > 0:
            depth -= 1
        depth_at[i + 1] = depth

    for m in _BOUNDARY.finditer(text):
        end = m.end(2)  # position just after terminator (+ closing quotes)
        term = m.group(1)
        if depth_at[m.start(1)] > 0:
            continue  # inside a parenthetical
        if term == ".":
            prev = _token_before(text, m.start(1))
            if prev in _ABBREVIATIONS:
                continue
            # Single capital initial: "J. Smith" — only UPPERCASE single
            # letters are initials (a lowercase one-letter word, e.g. Greek
            # "δ.", is a legitimate sentence end)
            if (len(prev) == 1 and prev.isalpha()
                    and text[m.start(1) - 1].isupper()):
                continue
            # Decimal number continued: "0." followed by digits was excluded by
            # the lookahead only when next char is a digit start — guard anyway.
            if prev.isdigit() and m.end() < len(text) and text[m.end()].isdigit():
                continue
        boundaries.append(end)

    sentences: List[str] = []
    start = 0
    for b in boundaries:
        s = text[start:b].strip()
        if s:
            sentences.append(s)
        start = b
    tail = text[start:].strip()
    if tail:
        sentences.append(tail)
    return sentences
