"""Normalization golden pairs (Spark expr == reference-twin Python) and
fuzzy-ratio definition checks."""

import pytest

from financial_knowledge_graphs_spark.functions.fuzz import ratio, token_sort_ratio
from financial_knowledge_graphs_spark.operators.normalize import (
    normalize_name_expr,
    normalize_name_py,
)

GOLDEN_NAMES = [
    "GlobalTech, Inc.",
    "GlobalTech Inc",
    "GLOBALTECH",
    "Meridian Global Bank Corp",
    "Quantum Capital Holdings",
    "A.B.C. Industries Ltd.",
    "Sterling Tech Holdings",
    "X",                     # 1-char word dropped -> empty
    "Co Co Co",              # all suffix words
    "  Apex  Energy   PLC ",
    "Nimbus-Tech (Europe) S.A.",
    "",
]


def test_python_twin_matches_reference_examples():
    # hand-checked against the reference algorithm (src/db/neo4j_handler.py:36-68)
    assert normalize_name_py("GlobalTech, Inc.") == "globaltech"
    assert normalize_name_py("GlobalTech Inc") == "globaltech"
    assert normalize_name_py("Quantum Capital Holdings") == "quantum capital"
    assert normalize_name_py("A.B.C. Industries Ltd.") == "industries"
    assert normalize_name_py("Meridian Global Bank Corp") == "meridian global bank"
    assert normalize_name_py("") == ""


def test_spark_expr_bit_equals_python_twin(spark):
    df = spark.createDataFrame([(n,) for n in GOLDEN_NAMES], "name: string")
    got = [r[0] for r in df.select(normalize_name_expr("name")).collect()]
    want = [normalize_name_py(n) for n in GOLDEN_NAMES]
    assert got == want


def test_ratio_definition():
    assert ratio("abcd", "abcd") == 100.0
    assert ratio("", "") == 100.0
    assert ratio("abc", "") == 0.0
    # indel: LCS("abc","abd")=2 -> 2*2/6*100
    assert ratio("abc", "abd") == pytest.approx(200 * 2 / 6)


def test_token_sort_ratio_order_insensitive():
    assert token_sort_ratio("bank global", "global bank") == 100.0
    assert token_sort_ratio("global bank", "global bank corp") < 100.0
    a = token_sort_ratio("meridian global bank", "global meridian bank")
    assert a == 100.0


def test_property_spark_expr_matches_python_twin_on_random_strings(spark):
    """Property check: the Catalyst normalization expression and the pure-
    Python reference twin agree on arbitrary names — including non-ASCII
    letters/digits, where Java regex \\w is ASCII-only and the engine must
    use the explicit Unicode word class to match Python's \\w (the twin is
    itself asserted against reference examples above)."""
    import random
    import string

    rnd = random.Random(1234)
    alphabet = (string.ascii_letters + string.digits + " .,&-'()/:;$%"
                + "éàüßñçØœ株式会社№٣")
    suffixes = ["", " Inc.", ", Inc", " Corp", " Co.", " Ltd", " llc",
                " Group", " Holdings", " co", "  ", " a", " AB"]
    names = []
    for _ in range(300):
        n_words = rnd.randint(1, 5)
        words = ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 10)))
                 for _ in range(n_words)]
        names.append(" ".join(words) + rnd.choice(suffixes))
    names += ["", " ", "a", "AB", "x.y.z", "...", "&&&", "ab, inc."]

    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {r["name"]: r["norm"] for r in df.select(
        "name", normalize_name_expr("name").alias("norm")).collect()}
    for n in names:
        assert got[n] == normalize_name_py(n), repr(n)
