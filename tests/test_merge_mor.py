"""Merge-on-read (Iceberg format-v2 row-level deletes): merge_upsert
mode="mor" writes equality-delete files instead of rewriting matched
buckets; every reader resolves them through _snapshot_scan with sequence
scoping (a delete hides only LOWER-sequence data files). Compaction
reconciles MOR state back to clean copy-on-write files."""

import os

from pyspark.sql import functions as F

from financial_knowledge_graphs_spark.operators import materialize


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _content(spark, t):
    return {
        (r["k"], r["v"])
        for r in materialize.read_graph_table(spark, t).collect()
    }


def _live(t):
    return materialize.snapshots(t)[-1]


def test_mor_merge_matches_cow_and_never_rewrites(spark, tmp_warehouse):
    """Same merge sequence under cow and mor → identical content; the mor
    table's matched buckets keep their original data dirs (no rewrite)."""
    base = [(f"k{i}", i) for i in range(60)]
    upd = [("k3", 303), ("k17", 1717), ("brand_new", 1)]
    cow = os.path.join(tmp_warehouse, "cow")
    mor = os.path.join(tmp_warehouse, "mor")
    for t, mode in ((cow, "cow"), (mor, "mor")):
        materialize.merge_upsert(spark, t, _mk(spark, base), ["k"], n_buckets=4)
        before = dict(_live(t)["buckets"])
        materialize.merge_upsert(
            spark, t, _mk(spark, upd), ["k"], n_buckets=4, mode=mode
        )
        after = _live(t)
        if mode == "mor":
            # every pre-existing data dir is still referenced (append-only)
            for b, vs in before.items():
                assert set(vs) <= set(after["buckets"][b])
            assert after["deletes"], "mor merge must record delete files"
            assert after["delete_keys"] == ["k"]
    assert _content(spark, cow) == _content(spark, mor)
    got = dict(_content(spark, mor))
    assert got["k3"] == 303 and got["k17"] == 1717 and got["brand_new"] == 1
    assert len(got) == 61


def test_mor_delete_branch_and_sequence_scoping(spark, tmp_warehouse):
    """WHEN MATCHED DELETE via a delete file; a LATER re-insert of the same
    key must survive (its data sequence exceeds the delete's)."""
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"], n_buckets=2
    )
    materialize.merge_upsert(
        spark, t, _mk(spark, []).limit(0), ["k"], n_buckets=2,
        deletes=spark.createDataFrame([("b",)], "k string"), mode="mor",
    )
    assert _content(spark, t) == {("a", 1), ("c", 3)}
    # re-insert the deleted key: the old delete (lower seq) must not hide it
    materialize.merge_upsert(
        spark, t, _mk(spark, [("b", 22)]), ["k"], n_buckets=2, mode="mor"
    )
    assert _content(spark, t) == {("a", 1), ("b", 22), ("c", 3)}
    # chained updates keep only the latest image
    materialize.merge_upsert(
        spark, t, _mk(spark, [("b", 33)]), ["k"], n_buckets=2, mode="mor"
    )
    assert _content(spark, t) == {("a", 1), ("b", 33), ("c", 3)}


def test_mor_replay_is_idempotent(spark, tmp_warehouse):
    """Crash-replay contract: re-running the identical mor merge leaves the
    visible content unchanged (the replay's delete hides the first run's
    rows, its data file re-inserts them)."""
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 1), ("b", 2)]), ["k"], n_buckets=2
    )
    upd = _mk(spark, [("a", 10), ("new", 5)])
    materialize.merge_upsert(spark, t, upd, ["k"], n_buckets=2, mode="mor")
    first = _content(spark, t)
    materialize.merge_upsert(spark, t, upd, ["k"], n_buckets=2, mode="mor")
    assert _content(spark, t) == first == {("a", 10), ("b", 2), ("new", 5)}


def test_mor_time_travel_and_changelog(spark, tmp_warehouse):
    """Snapshots before a mor commit still read the old image; CDC over the
    mor commit yields delete(old)+insert(new), and the append fast path is
    untouched for buckets without new deletes."""
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 1), ("b", 2)]), ["k"], n_buckets=1
    )
    s1 = _live(t)["snapshot_id"]
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 11)]), ["k"], n_buckets=1, mode="mor"
    )
    s2 = _live(t)["snapshot_id"]
    old = {
        (r["k"], r["v"])
        for r in materialize.read_graph_table(spark, t, snapshot=s1).collect()
    }
    assert old == {("a", 1), ("b", 2)}
    changes = {
        (r["k"], r["v"], r["_change_type"])
        for r in materialize.read_table_changes(spark, t, s1, s2).collect()
    }
    assert changes == {("a", 1, "delete"), ("a", 11, "insert")}
    # from-zero CDC reconstructs the resolved live image
    from_zero = {
        (r["k"], r["v"], r["_change_type"])
        for r in materialize.read_table_changes(spark, t, 0, s2).collect()
    }
    assert from_zero == {("a", 11, "insert"), ("b", 2, "insert")}


def test_mor_lookup_by_key_applies_deletes(spark, tmp_warehouse):
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [(f"k{i}", i) for i in range(40)]), ["k"],
        n_buckets=8,
    )
    materialize.merge_upsert(
        spark, t, _mk(spark, [("k5", 500)]), ["k"], n_buckets=8, mode="mor"
    )
    got = materialize.lookup_by_key(spark, t, ["k"], ("k5",)).collect()
    assert [(r["k"], r["v"]) for r in got] == [("k5", 500)]
    materialize.merge_upsert(
        spark, t, _mk(spark, []).limit(0), ["k"], n_buckets=8,
        deletes=spark.createDataFrame([("k5",)], "k string"), mode="mor",
    )
    assert materialize.lookup_by_key(spark, t, ["k"], ("k5",)).count() == 0


def test_mor_compaction_clears_deletes(spark, tmp_warehouse):
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [(f"k{i}", i) for i in range(30)]), ["k"],
        n_buckets=2,
    )
    materialize.merge_upsert(
        spark, t, _mk(spark, [("k1", 100), ("k2", 200)]), ["k"], n_buckets=2,
        mode="mor",
    )
    assert _live(t)["deletes"]
    before = _content(spark, t)
    materialize.compact_table(spark, t)
    snap = _live(t)
    assert not snap["deletes"], "compaction must reconcile delete files"
    assert all(len(vs) == 1 for vs in snap["buckets"].values())
    assert _content(spark, t) == before
    got = dict(before)
    assert got["k1"] == 100 and got["k2"] == 200


def test_mor_folds_to_cow_past_file_cap(spark, tmp_warehouse):
    """A matched bucket at the AUTO_COMPACT_FILES cap takes the
    copy-on-write path instead of accumulating unbounded delete files."""
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 0)]), ["k"], n_buckets=1
    )
    for i in range(1, materialize.AUTO_COMPACT_FILES + 3):
        materialize.merge_upsert(
            spark, t, _mk(spark, [("a", i)]), ["k"], n_buckets=1, mode="mor"
        )
    snap = _live(t)
    n_data = len(snap["buckets"]["bucket=0"])
    n_dels = len((snap["deletes"] or {}).get("bucket=0", []))
    assert n_data <= materialize.AUTO_COMPACT_FILES
    assert n_dels <= materialize.AUTO_COMPACT_FILES
    assert _content(spark, t) == {("a", materialize.AUTO_COMPACT_FILES + 2)}


def test_mor_key_set_must_be_stable(spark, tmp_warehouse):
    t = os.path.join(tmp_warehouse, "tbl")
    df = spark.createDataFrame([("a", 1, 9)], "k string, v long, w long")
    materialize.merge_upsert(spark, t, df, ["k"], n_buckets=1)
    materialize.merge_upsert(
        spark, t, spark.createDataFrame([("a", 2, 9)], "k string, v long, w long"),
        ["k"], n_buckets=1, mode="mor",
    )
    import pytest

    with pytest.raises(ValueError, match="stable key set"):
        materialize.merge_upsert(
            spark, t,
            spark.createDataFrame([("a", 3, 9)], "k string, v long, w long"),
            ["k", "w"], n_buckets=1, mode="mor",
        )


def test_mor_pruned_scan_keeps_delete_files(spark, tmp_warehouse):
    """Manifest-bounds pruning may skip data dirs but never delete dirs —
    a range scan over a MOR table must not resurrect deleted rows."""
    t = os.path.join(tmp_warehouse, "tbl")
    rows = [(f"k{i}", i) for i in range(20)]
    materialize.merge_upsert(spark, t, _mk(spark, rows), ["k"], n_buckets=2)
    materialize.merge_upsert(
        spark, t, _mk(spark, [("k5", 5000)]), ["k"], n_buckets=2, mode="mor"
    )
    got = {
        (r["k"], r["v"])
        for r in materialize.read_graph_table_pruned(
            spark, t, {"v": (0, 10)}
        ).collect()
    }
    assert ("k5", 5) not in got  # the old image is MOR-hidden
    assert got == {(f"k{i}", i) for i in range(11) if i != 5}


def test_mor_rollback_restores_delete_state(spark, tmp_warehouse):
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 1), ("b", 2)]), ["k"], n_buckets=1
    )
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 10)]), ["k"], n_buckets=1, mode="mor"
    )
    s_mor = _live(t)["snapshot_id"]
    mor_img = _content(spark, t)
    materialize.merge_upsert(
        spark, t, _mk(spark, [("b", 20)]), ["k"], n_buckets=1, mode="mor"
    )
    materialize.rollback_table(t, s_mor)
    assert _content(spark, t) == mor_img == {("a", 10), ("b", 2)}
    assert _live(t)["deletes"]  # the rolled-back snapshot's MOR state carried


def test_mor_merge_read_does_not_resurrect(spark, tmp_warehouse):
    """A COW merge over a table holding pending MOR deletes must apply them
    when rewriting (survivor read resolves deletes) — the hidden old image
    must not reappear in the rewritten bucket."""
    t = os.path.join(tmp_warehouse, "tbl")
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"], n_buckets=1
    )
    materialize.merge_upsert(
        spark, t, _mk(spark, [("a", 10)]), ["k"], n_buckets=1, mode="mor"
    )
    # cow merge on another key rewrites the bucket and clears its deletes
    materialize.merge_upsert(
        spark, t, _mk(spark, [("b", 20)]), ["k"], n_buckets=1, mode="cow"
    )
    snap = _live(t)
    assert not snap["deletes"]
    assert _content(spark, t) == {("a", 10), ("b", 20), ("c", 3)}


def test_mor_rebucket_folds_pending_deletes(spark, tmp_warehouse):
    """rebucket_table on a table with pending equality deletes must fold
    them in (reads resolve through _snapshot_scan) and commit a clean,
    delete-free state in the new layout."""
    t = os.path.join(tmp_warehouse, "mor_rebucket")
    materialize.merge_upsert(
        spark, t, _mk(spark, [(f"k{i}", i) for i in range(40)]), ["k"], 4)
    # MOR update of 10 keys + MOR pure delete of 5 others
    materialize.merge_upsert(
        spark, t, _mk(spark, [(f"k{i}", 1000 + i) for i in range(10)]),
        ["k"], 4, mode="mor")
    materialize.merge_upsert(
        spark, t, spark.createDataFrame([], "k string, v long"),
        ["k"], 4,
        deletes=spark.createDataFrame([(f"k{i}",) for i in range(10, 15)], "k string"),
        mode="mor")
    assert _live(t).get("deletes"), "precondition: pending delete files"
    want = _content(spark, t)
    assert ("k0", 1000) in want and ("k12", 12) not in want

    materialize.rebucket_table(spark, t, ["k"], 16)
    st = _live(t)
    assert not st.get("deletes"), "rebucket must clear MOR delete state"
    assert st["n_buckets"] == 16
    assert _content(spark, t) == want
    # point lookup through the new layout still correct
    got = materialize.lookup_by_key(spark, t, ["k"], ("k3",)).collect()
    assert [(r["k"], r["v"]) for r in got] == [("k3", 1003)]


def test_mor_concurrent_writers_no_lost_deletes(spark, tmp_warehouse):
    """Two writers MOR-updating DISJOINT key ranges of the same table
    concurrently: CAS + retry must preserve BOTH writers' equality-delete
    and data dirs — a lost delete file would resurrect the pre-update row
    next to its replacement (duplicate keys)."""
    from concurrent.futures import ThreadPoolExecutor

    t = os.path.join(tmp_warehouse, "mor_conc")
    materialize.merge_upsert(
        spark, t, _mk(spark, [(f"k{i}", 0) for i in range(40)]), ["k"], 4)

    def w(lo, hi, val):
        rows = [(f"k{i}", val) for i in range(lo, hi)]
        materialize.merge_upsert(spark, t, _mk(spark, rows), ["k"], 4, mode="mor")

    for rnd in range(1, 4):
        with ThreadPoolExecutor(max_workers=2) as tp:
            fa = tp.submit(w, 0, 20, rnd * 100)
            fb = tp.submit(w, 20, 40, rnd * 1000)
            fa.result()
            fb.result()
        rows = materialize.read_graph_table(spark, t).collect()
        assert len(rows) == 40, f"round {rnd}: dup/lost rows ({len(rows)})"
        got = {r["k"]: r["v"] for r in rows}
        want = {f"k{i}": rnd * 100 for i in range(20)}
        want.update({f"k{i}": rnd * 1000 for i in range(20, 40)})
        assert got == want, f"round {rnd}"
