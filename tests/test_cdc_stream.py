"""Streaming CDC source (Spark 4 Python Data Source API): tailing a graph
table's snapshot log must emit exactly read_table_changes() between the
checkpointed offsets — across COW rewrites, MOR equality deletes, schema
evolution, and restarts."""

import os

import pytest

from financial_knowledge_graphs_spark.operators import materialize as m
from financial_knowledge_graphs_spark.streaming.cdc_source import (
    GraphTableChangesDataSource,
)


def _mk(spark, rows, schema="k string, v long"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def cdc(spark, tmp_warehouse):
    spark.dataSource.register(GraphTableChangesDataSource)
    t = os.path.join(tmp_warehouse, "tbl")
    out = os.path.join(tmp_warehouse, "out")
    ckpt = os.path.join(tmp_warehouse, "ckpt")

    def run(from_snapshot=None):
        r = spark.readStream.format("graph_table_changes").option("path", t)
        if from_snapshot is not None:
            r = r.option("from_snapshot", from_snapshot)
        q = (r.load().writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    return t, run


def test_cdc_stream_equals_batch_changes_across_restarts(spark, cdc):
    t, run = cdc
    m.merge_upsert(spark, t, _mk(spark, [(f"k{i}", i) for i in range(20)]),
                   ["k"], 4)
    got = run()
    want = sorted(tuple(r) for r in m.read_table_changes(spark, t, 0).collect())
    assert got == want  # initial load: whole table as inserts
    assert len(got) == 20 and all(c == "insert" for *_, c in got)

    # restart after a COW update + append: update = delete(old)+insert(new)
    sid1 = m.snapshots(t)[-1]["snapshot_id"]
    m.merge_upsert(spark, t, _mk(spark, [("k0", 999), ("new1", 1)]), ["k"], 4)
    got2 = run()
    want2 = sorted(want + [tuple(r) for r in
                           m.read_table_changes(spark, t, sid1).collect()])
    assert got2 == want2
    assert ("k0", 0, "delete") in set(got2)
    assert ("k0", 999, "insert") in set(got2)
    assert ("new1", 1, "insert") in set(got2)

    # restart after a merge-on-read commit: only the delta arrives
    sid2 = m.snapshots(t)[-1]["snapshot_id"]
    m.merge_upsert(spark, t, _mk(spark, [("k1", 111), ("k5", 555)]), ["k"], 4,
                   mode="mor")
    got3 = run()
    want3 = sorted(want2 + [tuple(r) for r in
                            m.read_table_changes(spark, t, sid2).collect()])
    assert got3 == want3
    assert ("k1", 1, "delete") in set(got3)
    assert ("k1", 111, "insert") in set(got3)

    # no new snapshot: restart emits nothing
    assert run() == got3


def test_cdc_stream_schema_evolution_and_from_snapshot(spark, cdc):
    t, run = cdc
    m.merge_upsert(spark, t, _mk(spark, [("a", 1), ("b", 2)]), ["k"], 2)
    sid1 = m.snapshots(t)[-1]["snapshot_id"]
    # add-column evolution: stream schema is the LIVE one; old rows read
    # the new column as NULL in any rewrite images
    m.merge_upsert(
        spark, t,
        _mk(spark, [("a", 10, "x")], "k string, v long, tag string"),
        ["k"], 2)

    got = run(from_snapshot=sid1)
    want = sorted(tuple(r)
                  for r in m.read_table_changes(spark, t, sid1).collect())
    assert got == want
    assert ("a", 1, None, "delete") in set(got)
    assert ("a", 10, "x", "insert") in set(got)
    # from_snapshot skipped the initial full-table load
    assert ("b", 2, None, "insert") not in set(got)


def test_stream_apply_changes_replicates_table(spark, tmp_warehouse):
    """CDC apply: a replica fed only by the change stream converges to the
    source after appends, updates, deletes, and a MOR commit — across
    stream restarts — and replay is a no-op."""
    from financial_knowledge_graphs_spark.streaming.cdc_source import (
        stream_apply_changes,
    )

    src = os.path.join(tmp_warehouse, "src")
    dst = os.path.join(tmp_warehouse, "dst")
    ckpt = os.path.join(tmp_warehouse, "ckpt")

    def rows_of(t):
        return sorted(tuple(r)
                      for r in m.read_graph_table(spark, t).collect())

    def drain():
        q = stream_apply_changes(spark, src, dst, ["k"], n_buckets=2,
                                 checkpoint=ckpt)
        q.awaitTermination(120)

    m.merge_upsert(spark, src, _mk(spark, [(f"k{i}", i) for i in range(15)]),
                   ["k"], 4)
    drain()
    assert rows_of(dst) == rows_of(src)

    # update + append + hard delete, then catch up (stay within the
    # snapshot retention window — like Iceberg, an incremental consumer
    # must not fall more than SNAPSHOT_RETENTION commits behind)
    m.merge_upsert(spark, src, _mk(spark, [("k0", 100), ("x", 1)]), ["k"], 4)
    m.merge_upsert(spark, src, _mk(spark, [("k1", 1)]), ["k"], 4,
                   deletes=spark.createDataFrame([("k2",)], "k string"))
    drain()
    assert rows_of(dst) == rows_of(src)
    assert ("k2", 2) not in set(rows_of(dst))

    # merge-on-read source commit replicates too
    m.merge_upsert(spark, src, _mk(spark, [("k3", 333)]), ["k"], 4, mode="mor")
    drain()
    assert rows_of(dst) == rows_of(src)

    # no new snapshot: replay converges trivially (no churn)
    before = m.snapshots(dst)[-1]["snapshot_id"]
    drain()
    assert rows_of(dst) == rows_of(src)
    assert m.snapshots(dst)[-1]["snapshot_id"] == before


def test_pin_protects_replay_base_across_retention(spark, tmp_warehouse):
    """A crash after a batch is PLANNED but before it completes replays the
    same (start, end) batch from the WAL on restart. The start snapshot must
    therefore stay pinned (under `{pin}.base`) until the NEXT batch plans —
    releasing it at planning time would let retention GC expire the replay's
    diff base during arbitrarily long consumer downtime."""
    from pyspark.sql.types import StructType

    from financial_knowledge_graphs_spark.streaming.cdc_source import (
        _CHANGE_COL, _ChangesStreamReader,
    )

    t = os.path.join(tmp_warehouse, "pinned")
    m.merge_upsert(spark, t, _mk(spark, [(f"k{i}", i) for i in range(8)]),
                   ["k"], 2)
    m.merge_upsert(spark, t, _mk(spark, [("k0", 100), ("n1", 1)]), ["k"], 2)
    s1, s2 = (s["snapshot_id"] for s in m.snapshots(t)[-2:])

    schema = StructType.fromJson(
        m.read_graph_table(spark, t).schema.jsonValue()
    ).add(_CHANGE_COL, "string", False)
    reader = _ChangesStreamReader(t, schema, start_sid=0, pin="c1")

    # plan the (s1 -> s2) batch; both ends must now be tagged
    reader.partitions({"sid": s1}, {"sid": s2})
    assert m.table_tags(t) == {"c1.base": s1, "c1": s2}

    # consumer goes down; the table churns far past SNAPSHOT_RETENTION
    for i in range(m.SNAPSHOT_RETENTION + 3):
        m.merge_upsert(spark, t, _mk(spark, [(f"churn{i}", i)]), ["k"], 2)

    # replay of the SAME planned batch still resolves both snapshots and
    # yields the same delta rows it would have yielded before the churn
    parts = reader.partitions({"sid": s1}, {"sid": s2})
    rows = sorted(r for p in parts for r in reader.read(p))
    want = sorted(tuple(r) for r in
                  m.read_table_changes(spark, t, s1, s2).collect())
    assert rows == want and ("k0", 100, "insert") in set(rows)

    # the next batch's planning advances both tags, releasing s1
    live = m._live_sid(t)
    reader.partitions({"sid": s2}, {"sid": live})
    assert m.table_tags(t) == {"c1.base": s2, "c1": live}
