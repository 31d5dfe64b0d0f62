"""Skew-aware join utilities (north-star axis: salted keys for hub entities).

Where skew is handled in this engine, in order of preference:

1. **Collapse before joining** — mentions dedupe to DISTINCT (type, name)
   surface keys before any similarity join (linking.py), so a bank appearing
   in 30% of documents contributes a handful of rows, not 10^11.
2. **Broadcast the small side** — the canonical mapping table is tiny
   relative to mentions; Catalyst broadcasts it and no shuffle (hence no
   skew) exists at all.
3. **AQE skew-join** — `spark.sql.adaptive.skewJoin.enabled` splits
   oversized shuffle partitions at runtime for any join that does shuffle.
4. **Explicit salting (this module)** — the regime where none of the above
   apply: both sides too big to broadcast AND the hot keys are so heavy that
   even AQE's split granularity leaves stragglers (e.g. joining raw mentions
   of 10^12 docs against a 10^8-row mapping on (type, name) where one bank
   holds billions of rows). Salting bounds the per-task row count
   deterministically at plan time.

``salted_join``: the skewed (big) side gets a uniform random-ish salt in
[0, salt); the small-but-unbroadcastable side is replicated salt times via
``explode``; the join key becomes (keys..., salt). Row multiplicity is
unchanged — each big-side row matches exactly the one replica with its salt.
Salt is derived from a hash of the row's whole key tuple plus a per-row
monotonic id, so it needs no extra column and is deterministic per run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                salt: int = 16, how: str = "inner",
                row_id: str | None = None) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with the big side salted into
    ``salt`` sub-partitions per key.

    Correctness: every big row carries one salt value s; the small side is
    replicated once per salt value, so (keys..., s) matches exactly one
    replica — the result multiset equals the unsalted join. The shuffle key
    (keys..., salt) spreads a hot key over ``salt`` reducers.

    Only big-side-preserving join types are valid: for how='right'/'full' an
    unmatched SMALL-side row survives once per replica and would appear
    ``salt`` times null-extended (ADVICE r1) — rejected here.

    ``row_id``: optional stable per-row discriminator column. When given,
    the salt hashes only that column — cheaper than hashing a wide row, and
    it spreads IDENTICAL duplicate rows of a hot key (which the full-row
    hash sends to one salt partition; ADVICE r3). Without it, byte-identical
    duplicate rows of a hot key stay unspread — acceptable when duplicates
    are rare, documented here because a deduplicating upstream usually makes
    them so. (monotonically_increasing_id is NOT a substitute: it changes on
    task retry/speculation and a nondeterministic shuffle key loses or
    duplicates rows when a map task is recomputed after some reducers
    already fetched its old output.)
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join preserves multiplicity only for {sorted(allowed)}; "
            f"got how={how!r} (unmatched small-side rows would be replicated "
            f"{salt}x under right/full outer)"
        )
    # the salt must be DETERMINISTIC per row: monotonically_increasing_id
    # changes on task retry/speculation, and a nondeterministic shuffle key
    # silently loses/duplicates rows when a map task is recomputed after
    # some reducers already fetched its old output. Hash the whole row
    # instead — stable across retries, and it still spreads a hot key's
    # distinct payload rows over the salt space.
    salt_src = [F.col(row_id)] if row_id else [F.col(c) for c in big.columns]
    big_s = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*salt_src), F.lit(salt)).cast("int"),
    )
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, [*keys, SALT_COL], how).drop(SALT_COL)


def key_profile(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Heavy-hitter diagnostics: the top-N join/group keys by row count,
    with each key's share of the table — the measurement that decides
    WHICH tier of the skew strategy above a key needs (broadcast? AQE?
    explicit salt?) before a 100 TB join is launched.

    Plan shape: one partial-agg groupBy (map-side combine), then a
    DISTRIBUTED top-K (`orderBy().limit()` compiles to
    TakeOrderedAndProject — per-partition heaps + a driver merge of N
    rows, never a global sort), and a broadcast 1-row total for the share.
    Deterministic under ties: rank orders by (count DESC, keys ASC)."""
    from pyspark.sql import Window

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    # total from the SAME aggregate (sum of per-key counts == count(*)):
    # Catalyst reuses the groupBy exchange instead of scanning df twice
    total = counts.agg(F.sum("n_rows").alias("__total"))
    order = [F.desc("n_rows")] + [F.asc(k) for k in keys]
    top = counts.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)  # top_n rows only: trivial single task
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share",
                    F.col("n_rows").cast("double") / F.col("__total").cast("double"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .drop("__total")
    )
