"""Entity-name normalization — bit-compatible with the reference.

The reference normalizes names before disambiguation
(reference src/db/neo4j_handler.py:36-68): lowercase → strip one trailing
legal suffix written with dot/comma (inc|corp|co|ltd|llc) → non-word chars to
spaces → drop suffix stopwords and 1-char words → rejoin. Both a Catalyst
column-expression version (the hot path) and a pure-Python twin (used in
tests to prove bit-equality on golden pairs) are provided.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference src/db/neo4j_handler.py:54-57
COMMON_SUFFIXES = [
    "inc", "incorporated", "corp", "corporation", "llc", "ltd", "limited",
    "company", "co", "group", "holdings", "plc", "ag", "gmbh", "sa", "nv", "bv",
]

_TRAILING = r"[\s,]+(inc|corp|co|ltd|llc)\.?$"   # reference :60
_NONWORD = r"[^\w\s]"                            # reference :63 (Python twin)
# Engine twin of _NONWORD: Java regex / RE2 \w is ASCII-only while the
# reference's Python \w is Unicode (L* ∪ N* ∪ _), so the raw pattern would
# mangle 'Société Générale' → 'soci rale' in production while the reference
# keeps it. Replacing everything OUTSIDE the Unicode word class with a
# space is token-equivalent to the reference pipeline: in both, the final
# tokens are the maximal runs of word characters (whitespace and replaced
# chars are equally separators).
_NONWORD_ENGINE = r"[^\p{L}\p{N}_]"


def normalize_name_expr(col: Column | str) -> Column:
    """Catalyst-native normalization; whole-stage-codegen friendly."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, _TRAILING, "")
    c = F.regexp_replace(c, _NONWORD_ENGINE, " ")
    words = F.filter(
        F.split(c, r"\s+"),
        lambda w: (F.length(w) > 1) & ~w.isin(*COMMON_SUFFIXES),
    )
    return F.array_join(words, " ")


def norm_tokens_expr(col: Column | str) -> Column:
    """Token array of the normalized name (blocking keys / Jaccard input)."""
    return F.filter(F.split(normalize_name_expr(col), " "), lambda w: w != F.lit(""))


def normalize_name_py(name: str) -> str:
    """Pure-Python twin of the reference's _normalize_entity_name
    (reference src/db/neo4j_handler.py:36-68) — test oracle only."""
    if not name:
        return ""
    name = name.lower()
    name = re.sub(_TRAILING, "", name)
    name = re.sub(_NONWORD, " ", name)
    words = [w for w in name.split() if w not in COMMON_SUFFIXES and len(w) > 1]
    return " ".join(words)
