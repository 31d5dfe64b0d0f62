"""Pure-Python fuzzy string ratios (rapidfuzz-compatible semantics).

The reference evaluates with ``rapidfuzz.fuzz.ratio`` / ``token_sort_ratio``
(reference src/utils/evaluation.py:66,79,160,194). rapidfuzz is not available
in this environment, so we implement the same definitions:

- ``ratio(a, b)`` = normalized Indel similarity * 100
  = 100 * (1 - indel_distance / (len(a)+len(b)))
  where indel_distance = len(a) + len(b) - 2 * LCS(a, b)
  (Levenshtein with substitution cost 2 — exactly rapidfuzz's fuzz.ratio).
- ``token_sort_ratio(a, b)`` = ratio(" ".join(sorted(a.split())), ...).

These run only inside grouped pandas UDFs on short strings (company names),
where O(len_a * len_b) per pair is negligible; the hot relational path never
calls them.
"""

from __future__ import annotations


def _lcs_len(a: str, b: str) -> int:
    """Classic O(n*m) LCS length with O(min) memory (bit-parallel not needed
    at company-name lengths)."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        p0 = prev
        append = cur.append
        for j, cb in enumerate(b):
            if ca == cb:
                append(p0[j] + 1)
            else:
                x, y = cur[j], p0[j + 1]
                append(x if x >= y else y)
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """rapidfuzz fuzz.ratio semantics, 0-100 float."""
    a = a or ""
    b = b or ""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / total


def token_sort_ratio(a: str, b: str) -> float:
    """rapidfuzz fuzz.token_sort_ratio: whitespace-tokenize, sort, re-join,
    then Indel ratio."""
    a_s = " ".join(sorted((a or "").split()))
    b_s = " ".join(sorted((b or "").split()))
    return ratio(a_s, b_s)
