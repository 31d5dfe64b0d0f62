"""Property-style tests: randomized (seeded, deterministic) inputs checked
against independent pure-Python models — the round-1 normalization-twin
pattern extended to the round-2 operators."""

import os
import random

from pyspark.sql import functions as F

from financial_knowledge_graphs_spark.operators import materialize


def test_merge_upsert_model_based(spark, tmp_warehouse):
    """Random sequence of upsert/delete batches == a dict model.
    Exercises bucket installs, delete-emptied buckets, key collisions,
    and replays across 6 merges."""
    rng = random.Random(1234)
    t = os.path.join(tmp_warehouse, "tbl")
    model: dict[str, int] = {}
    keyspace = [f"k{i}" for i in range(60)]

    for step in range(7):
        if step == 6:  # delete-only batch (no upserts at all)
            ups = {}
            pool = list(model) or keyspace
            dels = {rng.choice(pool) for _ in range(3)}
        else:
            ups = {rng.choice(keyspace): rng.randrange(1000)
                   for _ in range(rng.randrange(1, 15))}
            dels = {rng.choice(keyspace) for _ in range(rng.randrange(0, 5))} - set(ups)
        up_df = spark.createDataFrame(list(ups.items()), "k string, v long")
        del_df = (
            spark.createDataFrame([(d,) for d in dels], "k string") if dels else None
        )
        materialize.merge_upsert(spark, t, up_df, ["k"], n_buckets=4, deletes=del_df)
        if rng.random() < 0.3:  # crash-replay: re-deliver the same batch
            materialize.merge_upsert(spark, t, up_df, ["k"], n_buckets=4)
        model.update(ups)
        for d in dels:
            model.pop(d, None)
        # the replay is a no-op on the model: same keys, same values, and
        # its key set is disjoint from this batch's deletes

        got = {r["k"]: r["v"] for r in materialize.read_graph_table(spark, t).collect()}
        assert got == model, f"divergence at step {step}"


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing property (Schleimer et al. theorem): two documents sharing
    a run of >= window+k-1 tokens share at least one fingerprint. Batch of
    randomized doc pairs checked in ONE Spark job."""
    from financial_knowledge_graphs_spark.operators.text import winnow_fingerprints

    rng = random.Random(77)
    k, window = 3, 4
    run_len = window + k - 1  # 6 tokens guaranteed-shared run
    rows = []
    for i in range(20):
        shared = [f"s{i}_{j}" for j in range(run_len + rng.randrange(0, 4))]
        a = [f"a{i}_{j}" for j in range(rng.randrange(0, 10))] + shared + [
            f"az{i}_{j}" for j in range(rng.randrange(0, 10))]
        b = [f"b{i}_{j}" for j in range(rng.randrange(0, 10))] + shared + [
            f"bz{i}_{j}" for j in range(rng.randrange(0, 10))]
        rows.append((f"a{i}", " ".join(a), i))
        rows.append((f"b{i}", " ".join(b), i))
    docs = spark.createDataFrame(rows, "doc_id string, text string, pair int")
    fps = winnow_fingerprints(docs, k=k, window=window)
    with_pair = fps.join(docs.select("doc_id", "pair"), "doc_id")
    hits = (
        with_pair.alias("x").join(
            with_pair.alias("y"),
            (F.col("x.pair") == F.col("y.pair"))
            & (F.col("x.fp") == F.col("y.fp"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.pair").distinct().count()
    )
    assert hits == 20, f"only {hits}/20 pairs share a fingerprint"


def test_connected_components_random_vs_union_find(spark):
    """CC on random graphs == a pure-Python union-find twin (both the
    driver path and the distributed path)."""
    from financial_knowledge_graphs_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(5)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [
        tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
        for _ in range(90)
    ]
    edges = [e for e in set(edges) if e[0] != e[1]]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    want = {n: find(n) for n in nodes}

    ndf = spark.createDataFrame([(n,) for n in nodes], "key string")
    edf = spark.createDataFrame(edges, "key_a string, key_b string")
    for threshold in (2_000_000, 0):  # driver union-find AND distributed path
        got = {
            r["key"]: r["comp"]
            for r in connected_components(ndf, edf, driver_threshold=threshold).collect()
        }
        assert got == want, f"threshold={threshold}"


def test_asof_join_model_based(spark):
    """Randomized as-of join == a pure-Python per-key scan model, for both
    the plain and the hub-chunked path (chunk boundaries landing anywhere
    relative to the data)."""
    import datetime as dt

    from financial_knowledge_graphs_spark.operators.timeseries import asof_join

    rng = random.Random(4242)
    base = dt.datetime(2026, 1, 1)
    rights = [
        (rng.randrange(4), base + dt.timedelta(seconds=rng.randrange(0, 5000)),
         rid, float(rng.randrange(100)))
        for rid in range(120)
    ]
    lefts = [
        (rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(0, 5200)), lid)
        for lid in range(200)
    ]
    r_df = spark.createDataFrame(rights, "key long, qt timestamp, qid long, px double")
    l_df = spark.createDataFrame(lefts, "key long, tt timestamp, tid long")

    # model: per left row, right row with max (qt, qid) among qt <= tt
    def model(key, tt):
        cand = [(qt, qid, px) for (k, qt, qid, px) in rights if k == key and qt <= tt]
        if not cand:
            return (None, None)
        qt, qid, px = max(cand)
        return (qid, px)

    want = {tid: model(key, tt) for (key, tt, tid) in lefts}
    kw = dict(on=["key"], left_time="tt", right_time="qt",
              payload=["qid", "px"], tiebreak="qid")
    for chunk in (None, 700):
        got = {
            r["tid"]: (r["qid"], r["px"])
            for r in asof_join(l_df, r_df, hub_chunk_seconds=chunk, **kw).collect()
        }
        assert got == want, f"chunk={chunk}"


def test_sessionize_model_based(spark):
    """Randomized sessionization == a pure-Python per-key gap scan."""
    import datetime as dt
    from collections import defaultdict

    from financial_knowledge_graphs_spark.operators.timeseries import sessionize

    rng = random.Random(999)
    base = dt.datetime(2026, 1, 1)
    rows = [
        (rng.randrange(6), base + dt.timedelta(seconds=rng.randrange(0, 100000)), eid)
        for eid in range(300)
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, eid long")
    gap = 1800.0

    per_key = defaultdict(list)
    for (u, ts, eid) in rows:
        per_key[u].append((ts, eid))
    want = {}
    for u, evs in per_key.items():
        evs.sort()
        sess, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap:
                sess += 1
            want[eid] = sess
            prev = ts
    got = {
        r["eid"]: r["session_num"]
        for r in sessionize(df, "user", "ts", gap, "eid").collect()
    }
    assert got == want


def test_merge_modes_and_maintenance_model_based(spark, tmp_warehouse):
    """Random interleaving of cow/mor merges, deletes, replays and the
    maintenance ops (compact / cluster / rebucket) == a dict model at
    every step; afterwards a CDC-fed replica (streaming source + apply)
    converges to the same state."""
    import random as _random

    from financial_knowledge_graphs_spark.streaming.cdc_source import (
        stream_apply_changes,
    )

    rng = _random.Random(777)
    t = os.path.join(tmp_warehouse, "mixed")
    dst = os.path.join(tmp_warehouse, "mixed_replica")
    ckpt = os.path.join(tmp_warehouse, "mixed_ckpt")
    model: dict[str, int] = {}
    keyspace = [f"k{i}" for i in range(40)]

    def check(step):
        got = {r["k"]: r["v"]
               for r in materialize.read_graph_table(spark, t).collect()}
        assert got == model, f"divergence at step {step}"

    def drain():
        q = stream_apply_changes(spark, t, dst, ["k"], n_buckets=2,
                                 checkpoint=ckpt)
        q.awaitTermination(180)
        got = {r["k"]: r["v"]
               for r in materialize.read_graph_table(spark, dst).collect()}
        assert got == model

    for step in range(8):
        ups = {rng.choice(keyspace): rng.randrange(1000)
               for _ in range(rng.randrange(1, 10))}
        dels = ({rng.choice(list(model))} - set(ups)) if model and rng.random() < 0.4 else set()
        up_df = spark.createDataFrame(list(ups.items()), "k string, v long")
        del_df = (spark.createDataFrame([(d,) for d in dels], "k string")
                  if dels else None)
        mode = "mor" if rng.random() < 0.5 else "cow"
        materialize.merge_upsert(spark, t, up_df, ["k"], n_buckets=4,
                                 deletes=del_df, mode=mode)
        if rng.random() < 0.25:  # crash-replay of the same upserts
            materialize.merge_upsert(spark, t, up_df, ["k"], n_buckets=4,
                                     mode=mode)
        model.update(ups)
        for d in dels:
            model.pop(d, None)
        # keep the CDC consumer within the retention window
        if step in (1, 4):
            drain()
        if step == 2:
            materialize.compact_table(spark, t)
        if step == 5:
            materialize.cluster_table(spark, t, "v", files_per_bucket=2)
        if step == 6:
            materialize.rebucket_table(spark, t, ["k"], 8)
        check(step)
    drain()
    # point lookups agree with the model through the final mixed layout
    for k in list(model)[:3]:
        got = materialize.lookup_by_key(spark, t, ["k"], (k,)).collect()
        assert [(r["k"], r["v"]) for r in got] == [(k, model[k])]
