"""Salted-join correctness + distribution: result multiset equals the plain
join; the hot key's rows spread across all salt buckets."""

import pyspark.sql.functions as F

from financial_knowledge_graphs_spark.operators.skew import SALT_COL, salted_join


def test_salted_join_equals_plain_join(spark):
    # hub key 'bigbank' dominates the big side
    big = spark.createDataFrame(
        [("bigbank", i) for i in range(900)] + [("tiny", i) for i in range(10)],
        "name string, mention_id int",
    )
    small = spark.createDataFrame(
        [("bigbank", "E1"), ("tiny", "E2"), ("absent", "E3")],
        "name string, entity_id string",
    )
    plain = big.join(small, ["name"]).select("name", "mention_id", "entity_id")
    salted = salted_join(big, small, ["name"], salt=8).select(
        "name", "mention_id", "entity_id"
    )
    assert salted.count() == plain.count() == 910
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_spreads_hot_key(spark):
    big = spark.createDataFrame(
        [("bigbank", i) for i in range(2000)], "name string, mention_id int"
    )
    from financial_knowledge_graphs_spark.operators import skew
    salted = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.col("name")), F.lit(8)).cast("int"),
    )
    buckets = salted.groupBy(SALT_COL).count().collect()
    assert len(buckets) == 8                      # all salts used
    assert max(r["count"] for r in buckets) < 2000 * 0.25  # no bucket hogs


def test_left_join_preserves_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("nomatch", 2)], "name string, v int")
    small = spark.createDataFrame([("a", "E1")], "name string, entity_id string")
    out = salted_join(big, small, ["name"], salt=4, how="left")
    assert out.count() == 2
    assert out.filter(F.col("entity_id").isNull()).count() == 1


def test_salted_join_rejects_multiplicity_breaking_how(spark):
    """right/full outer would replicate unmatched small-side rows salt
    times (ADVICE r1) — must raise, not silently corrupt."""
    import pytest

    big = spark.createDataFrame([("a", 1)], "k string, v int")
    small = spark.createDataFrame([("a", 9)], "k string, w int")
    for bad in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, ["k"], salt=4, how=bad)


def test_key_profile_hand_checked(spark):
    from financial_knowledge_graphs_spark.operators.skew import key_profile

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [(r["k"], r["n_rows"], r["rank"], round(r["share"], 6))
           for r in key_profile(df, ["k"], top_n=3).orderBy("rank").collect()]
    # tie between b and c broken by key asc
    assert got == [("a", 5, 1, round(5 / 12, 6)),
                   ("b", 3, 2, 0.25),
                   ("c", 3, 3, 0.25)]


def test_key_profile_plan_is_take_ordered(spark):
    from financial_knowledge_graphs_spark.operators.skew import key_profile

    df = spark.range(1000).select((F.col("id") % 37).alias("k"))
    plan = key_profile(df, ["k"], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
