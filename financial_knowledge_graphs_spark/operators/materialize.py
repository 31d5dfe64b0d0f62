"""Graph materialization: canonical mapping, vertices/triples, merge upsert.

Replaces the reference Neo4j sink (per-entity MERGE + per-attribute SET loops
over bolt — reference src/db/neo4j_handler.py:218-290) with set-oriented
DataFrame builds plus a PARTITION-SCOPED idempotent upsert into hash-bucketed
parquet tables: per-bucket version dirs + atomic CURRENT pointer swaps,
WHEN MATCHED DELETE tombstones, a snapshot log with time travel + retention
GC, and bucket-pruned point lookups — the full Iceberg ``MERGE INTO``
semantics emulated on plain parquet (no table-format jars exist in this
container; the write path is isolated in ``merge_upsert`` so a real Iceberg
catalog swap is a one-function change).

Semantics preserved from the reference:
- entity ids namespaced per doc before linking ({file}_{id},
  reference src/db/neo4j_handler.py:317) → here (doc_id, local_id);
- relationship endpoints remapped through the entity mapping; rows with an
  unmapped endpoint are dropped (reference :346-350) — reproduced by inner
  joins, but the drop COUNT is surfaced to the lineage table, never silent;
- edge label upper-cased at storage (reference :264) → ``pred_label``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .components import connected_components
from .linking import embedding_similarity_edges, name_keys, similarity_edges


def canonical_mapping(mentions: DataFrame, max_block: int = 1000,
                      embedding_link: bool = False,
                      embedding_threshold: float = 0.75) -> DataFrame:
    """(type, name) → canonical component + canonical entity_id.

    entity_id is content-addressed (sha2 of the component's min key), so
    re-runs over overlapping corpora assign stable ids — required for
    idempotent MERGE semantics.

    ``embedding_link=True`` adds char-n-gram cosine edges (north-star axis:
    alias-dictionary + embedding-similarity linking) on top of the
    reference's containment+Jaccard predicate — catches typos/run-together
    variants the token-set test misses. Off by default: the reference-parity
    P/R gate is defined on the reference predicate alone.
    """
    # keys feed three consumers (edge build ×2 sides, final map join) —
    # persist + materialize once instead of re-running the mention
    # aggregation (NOT localCheckpoint: the RDD conversion bypasses any
    # upstream DataFrame cache and would re-run the extraction UDF)
    keys = name_keys(mentions).persist()
    edges = similarity_edges(keys, max_block=max_block).select("key_a", "key_b")
    if embedding_link:
        edges = edges.unionByName(
            embedding_similarity_edges(
                keys, threshold=embedding_threshold, max_block=max_block
            ).select("key_a", "key_b")
        )
    comp = connected_components(keys, edges, id_col="key")
    mapped = keys.join(comp, "key", "left").withColumn(
        "comp", F.coalesce("comp", "key")  # singletons
    )
    # entity_id is content-addressed on the component's MIN NORMALIZED name
    # (not the min raw key): every legal-suffix/casing variant of a company
    # shares one norm, so the id is stable when later batches add new raw
    # surfaces to the component — required for incremental MERGE to update
    # rather than duplicate. Components whose min-norm is empty (all-suffix
    # names) fall back to the min raw key. Two same-type components sharing
    # a norm collapse to one id — exactly the reference's normalized-equality
    # merge (reference src/db/neo4j_handler.py:84-99).
    comp_rep = mapped.groupBy("comp").agg(
        F.min(F.when(F.col("norm") != "", F.col("norm"))).alias("comp_norm"),
        F.min("key").alias("comp_key"),
    )
    mapped = mapped.join(comp_rep, "comp")
    return mapped.withColumn(
        "entity_id",
        F.concat(
            F.lit("ent_"),
            F.sha2(
                F.concat_ws("|", F.col("type"), F.coalesce("comp_norm", "comp_key")),
                256,
            ).substr(1, 16),
        ),
    ).drop("comp_norm", "comp_key")


def build_vertices(mentions: DataFrame, mapping: DataFrame) -> DataFrame:
    """One row per canonical entity; representative surface = most-mentioned
    name (count desc, name desc tiebreak — deterministic), attributes =
    most-frequent non-null per column (batch form of the reference's
    last-writer-wins attribute refresh, reference src/db/neo4j_handler.py:188-216).

    ``mentions`` is whatever universe the caller canonicalized — the
    resumable pipeline passes its full surface_mentions ledger, so counts
    here are cumulative AND replay-safe by construction (the ledger is a
    keyed idempotent merge; review findings r2-3/r2-7).
    """
    m = mentions.join(
        mapping.select("type", "name", "comp", "entity_id", "norm"),
        ["type", "name"],
    )
    # two-level agg: per-surface counts first (partial agg map-side), then
    # max_by(count, surface) per entity — deterministic via name tiebreak.
    per_surface = m.groupBy("entity_id", "type", "name").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("norm").alias("norm"),
        F.first("companyName", ignorenulls=True).alias("companyName"),
        F.first("ticker", ignorenulls=True).alias("ticker"),
        F.first("industry", ignorenulls=True).alias("industry"),
        F.first("country", ignorenulls=True).alias("country"),
    )
    rep = F.max(
        F.struct(
            F.col("n"), F.col("name"), F.col("norm"),
            F.col("companyName"), F.col("ticker"),
            F.col("industry"), F.col("country"),
        )
    ).alias("rep")
    agg = per_surface.groupBy("entity_id", "type").agg(
        rep, F.sum("n").alias("n_mentions")
    )
    return agg.select(
        "entity_id", "type",
        F.col("rep.name").alias("name"),
        F.col("rep.norm").alias("norm_name"),
        F.col("rep.companyName").alias("companyName"),
        F.col("rep.ticker").alias("ticker"),
        F.col("rep.industry").alias("industry"),
        F.col("rep.country").alias("country"),
        "n_mentions",
    )


def build_triples(raw_triples: DataFrame, mentions: DataFrame,
                  mapping: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Remap relationship endpoints to canonical ids.

    Returns (triples, dropped, joined) — dropped rows have an unmapped
    endpoint (reference drops them silently at src/db/neo4j_handler.py:346-350;
    we return them so the pipeline can count them into lineage). ``joined``
    is the PERSISTED endpoint-join intermediate both outputs derive from —
    caller counts/filters against it without re-running the join chain, and
    owns its ``unpersist``.
    """
    ment_map = mentions.join(
        mapping.select("type", "name", "entity_id"), ["type", "name"]
    ).select("doc_id", "local_id", "entity_id", F.col("companyName").alias("canon_name"))

    src = ment_map.select(
        "doc_id",
        F.col("local_id").alias("src_local"),
        F.col("entity_id").alias("subj"),
        F.col("canon_name").alias("subj_name"),
    )
    tgt = ment_map.select(
        "doc_id",
        F.col("local_id").alias("tgt_local"),
        F.col("entity_id").alias("obj"),
        F.col("canon_name").alias("obj_name"),
    )
    joined = raw_triples.join(src, ["doc_id", "src_local"], "left").join(
        tgt, ["doc_id", "tgt_local"], "left"
    ).persist()
    ok = joined.filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    dropped = joined.filter(F.col("subj").isNull() | F.col("obj").isNull())

    # symmetric predicates canonicalized by sorted endpoints (SURVEY §1.3)
    sym = F.lower("pred").isin("mergedwith", "partnerswith")
    swap = sym & (F.col("subj_name") > F.col("obj_name"))
    triples = ok.select(
        "doc_id",
        F.when(swap, F.col("obj")).otherwise(F.col("subj")).alias("subj"),
        F.col("pred"),
        F.when(swap, F.col("subj")).otherwise(F.col("obj")).alias("obj"),
        F.when(swap, F.col("obj_name")).otherwise(F.col("subj_name")).alias("subj_name"),
        F.when(swap, F.col("subj_name")).otherwise(F.col("obj_name")).alias("obj_name"),
        F.upper("pred").alias("pred_label"),   # reference :264 storage casing
        "valueAmount", "percentage", "transactionDate",
    ).dropDuplicates(["doc_id", "subj", "pred", "obj", "valueAmount",
                      "percentage", "transactionDate"])
    return triples, dropped, joined


# ---------------------------------------------------------------------------
# Partition-scoped idempotent upsert (parquet emulation of Iceberg MERGE INTO)
#
# Layout: table_path/bucket=<id>/v_<n>/<parquet files> + a CURRENT pointer
# file per bucket naming the live version dir. A merge rewrites ONLY the
# buckets its update keys hash into — an incremental batch touching 0.1% of
# keys rewrites ~0.1% of a 100 TB table, not all of it. The swap is a
# single atomic os.replace of the pointer file (POSIX rename atomicity), so
# a crash at any instant leaves every bucket readable at either the old or
# the new version — never a missing table (the round-1 rmtree+rename window).
#
# On Iceberg this whole section becomes one ``MERGE INTO`` statement over a
# ``bucket(N, key)``-partitioned table; the layout here mirrors exactly the
# metadata Iceberg keeps (manifest per partition + snapshot pointer).
# ---------------------------------------------------------------------------

DEFAULT_MERGE_BUCKETS = 32  # one-box default; a real deployment sizes this
                            # so a bucket ~ a few GB (e.g. 4096 at 100 TB)


def _bucket_expr(keys: list[str], n_buckets: int):
    # deterministic over nullable keys: xxhash64 folds NULL as a no-op but
    # stays a pure function of the key tuple
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def _bucket_dirs(table_path: str) -> list[str]:
    import os

    if not os.path.isdir(table_path):
        return []
    return sorted(
        d for d in os.listdir(table_path)
        if d.startswith("bucket=") and os.path.isdir(os.path.join(table_path, d))
    )


def _current_version(bucket_dir: str) -> str | None:
    import os

    ptr = os.path.join(bucket_dir, "CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        v = f.read().strip()
    return v or None


def _next_version(bucket_dir: str) -> str:
    """Next free version name: max over EXISTING v_* dirs and the CURRENT
    pointer, +1. Scanning the dirs (not just CURRENT+1) makes replay after
    a crash between the version-dir rename and the pointer swap safe — the
    orphaned dir is skipped instead of colliding with the rename."""
    import os

    nums = [0]
    cur = _current_version(bucket_dir)
    if cur:
        nums.append(int(cur[2:]))
    if os.path.isdir(bucket_dir):
        for d in os.listdir(bucket_dir):
            if d.startswith("v_"):
                try:
                    nums.append(int(d[2:]))
                except ValueError:
                    pass
    return f"v_{max(nums) + 1:07d}"


def _set_current(bucket_dir: str, version: str) -> None:
    """Atomic pointer swap: write a temp file, os.replace onto CURRENT."""
    import os

    tmp = os.path.join(bucket_dir, ".CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(bucket_dir, "CURRENT"))


SNAPSHOT_RETENTION = 3  # version dirs kept per bucket (time-travel window)


def _write_schema(table_path: str, schema) -> None:
    """Persist the table schema (Iceberg keeps it in metadata; we need it to
    read legitimately-empty tables and to type point-lookup literals)."""
    import json
    import os

    tmp = os.path.join(table_path, "._SCHEMA.tmp")
    with open(tmp, "w") as f:
        json.dump(schema.jsonValue(), f)
    os.replace(tmp, os.path.join(table_path, "_SCHEMA"))


def _read_schema(table_path: str):
    import json
    import os

    from pyspark.sql.types import StructType

    p = os.path.join(table_path, "_SCHEMA")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return StructType.fromJson(json.load(f))


def _append_snapshot(table_path: str) -> int:
    """Record the table's full bucket→version map as a new snapshot (one
    JSON line in _snapshots.jsonl — the emulation of Iceberg's snapshot
    metadata). Called after every merge commit; returns the snapshot id."""
    import json
    import os
    import time as _time

    state = {}
    for b in _bucket_dirs(table_path):
        bdir = os.path.join(table_path, b)
        v = _current_version(bdir)
        # record only versions whose dir EXISTS at commit time: a
        # delete-emptied bucket's pointer names a dir that was never created
        # (empty-bucket tombstone) — recording it would make time travel of
        # this very snapshot report 'expired' (review finding r2-4). An
        # omitted bucket reads as empty, which is exactly its state.
        if v and os.path.isdir(os.path.join(bdir, v)):
            state[b] = v
    log = os.path.join(table_path, "_snapshots.jsonl")
    sid = 1
    if os.path.exists(log):
        with open(log) as f:
            lines = [ln for ln in f if ln.strip()]
        if lines:
            sid = json.loads(lines[-1])["snapshot_id"] + 1
    with open(log, "a") as f:
        f.write(json.dumps({"snapshot_id": sid, "ts": _time.time(),
                            "buckets": state}) + "\n")
    return sid


def snapshots(table_path: str) -> list[dict]:
    """All recorded snapshots, oldest first (Iceberg ``.snapshots`` analog)."""
    import json
    import os

    log = os.path.join(table_path, "_snapshots.jsonl")
    if not os.path.exists(log):
        return []
    with open(log) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _gc_versions(table_path: str) -> None:
    """Drop version dirs not referenced by the last SNAPSHOT_RETENTION
    snapshots nor by a CURRENT pointer (bounded time-travel window — the
    Iceberg ``expire_snapshots`` analog)."""
    import os
    import shutil

    snaps = snapshots(table_path)[-SNAPSHOT_RETENTION:]
    live: dict[str, set[str]] = {}
    for s in snaps:
        for b, v in s["buckets"].items():
            live.setdefault(b, set()).add(v)
    for b in _bucket_dirs(table_path):
        bdir = os.path.join(table_path, b)
        keep = live.get(b, set()) | {_current_version(bdir) or ""}
        for d in os.listdir(bdir):
            if d.startswith("v_") and d not in keep:
                shutil.rmtree(os.path.join(bdir, d), ignore_errors=True)


def table_exists(table_path: str) -> bool:
    import os

    return os.path.isdir(table_path) and (
        bool(_bucket_dirs(table_path))
        or os.path.exists(os.path.join(table_path, "_SCHEMA"))
        or any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(table_path)
        )
    )


def read_graph_table(spark: SparkSession, table_path: str,
                     snapshot: int | None = None) -> DataFrame:
    """Read a bucketed graph table by resolving each bucket's CURRENT
    pointer (snapshot-consistent view), or — with ``snapshot`` — the bucket
    versions recorded at that snapshot id (time travel, Iceberg
    ``VERSION AS OF``; the last SNAPSHOT_RETENTION snapshots stay
    readable). Falls back to a plain parquet read for legacy flat dirs."""
    import os

    buckets = _bucket_dirs(table_path)
    if not buckets:
        if os.path.isdir(table_path) and not any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(table_path)
        ):
            schema = _read_schema(table_path)
            if schema is not None:  # committed zero-row table
                return spark.createDataFrame([], schema)
        return spark.read.parquet(table_path)
    if snapshot is not None:
        snap = next(
            (s for s in snapshots(table_path) if s["snapshot_id"] == snapshot), None
        )
        if snap is None:
            raise ValueError(f"no snapshot {snapshot} recorded for {table_path}")
        paths = []
        for b, v in snap["buckets"].items():
            p = os.path.join(table_path, b, v)
            if not os.path.isdir(p):
                raise ValueError(
                    f"snapshot {snapshot} expired (bucket {b} version {v} "
                    f"GC'd; retention={SNAPSHOT_RETENTION})"
                )
            paths.append(p)
        return spark.read.parquet(*paths)
    paths = []
    for b in buckets:
        bdir = os.path.join(table_path, b)
        v = _current_version(bdir)
        if v is not None and os.path.isdir(os.path.join(bdir, v)):
            paths.append(os.path.join(bdir, v))
    if not paths:
        # every bucket delete-emptied (pointers name tombstone versions) —
        # a legitimate empty table, readable via the persisted schema
        schema = _read_schema(table_path)
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise ValueError(
            f"{table_path}: bucket layout present but no readable versions"
        )
    return spark.read.parquet(*paths)


def lookup_by_key(spark: SparkSession, table_path: str, keys: list[str],
                  values: tuple, n_buckets: int = DEFAULT_MERGE_BUCKETS) -> DataFrame:
    """Point lookup with BUCKET PRUNING: hash the key values to their
    bucket and read only that bucket's live version — a 1/n_buckets scan
    instead of the whole table (Iceberg partition-pruned point read).
    Falls back to a filtered full read on legacy flat dirs."""
    import os

    from functools import reduce

    assert len(keys) == len(values)
    # xxhash64 is TYPE-sensitive (int32 and int64 hash differently), so a
    # Python literal must be cast to the table column's declared type before
    # bucketing — otherwise the lookup scans the wrong bucket and silently
    # returns nothing (review finding r2-6). The type comes from the _SCHEMA
    # marker every merge persists.
    schema = _read_schema(table_path)
    types = {f.name: f.dataType for f in schema.fields} if schema else {}

    def lit_of(k, v):
        c = F.lit(v)
        return c.cast(types[k]) if k in types else c

    cond_df = spark.range(1).select(
        *[lit_of(k, v).alias(k) for k, v in zip(keys, values)]
    )
    b = cond_df.select(_bucket_expr(keys, n_buckets).alias("b")).first()["b"]
    pred = reduce(
        lambda a, c: a & c,
        [F.col(k).eqNullSafe(lit_of(k, v)) for k, v in zip(keys, values)],
    )
    bdir = os.path.join(table_path, f"bucket={b}")
    if _bucket_dirs(table_path):
        v = _current_version(bdir) if os.path.isdir(bdir) else None
        if v is None or not os.path.isdir(os.path.join(bdir, v)):
            return read_graph_table(spark, table_path).filter(pred).limit(0)
        return spark.read.parquet(os.path.join(bdir, v)).filter(pred)
    return spark.read.parquet(table_path).filter(pred)


def truncate_table(table_path: str) -> None:
    """Drop all rows (SURVEY §2.6 row 44) — the reference's detach-delete
    teardown (reference src/db/neo4j_handler.py:356-360). Removing the
    directory is the parquet emulation of Iceberg ``TRUNCATE TABLE``."""
    import shutil

    shutil.rmtree(table_path, ignore_errors=True)


def merge_upsert(spark: SparkSession, table_path: str, updates: DataFrame,
                 keys: list[str], n_buckets: int = DEFAULT_MERGE_BUCKETS,
                 deletes: DataFrame | None = None) -> None:
    """Idempotent keyed upsert: new rows win on key collision (MERGE INTO ...
    WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT), rewriting only the
    hash-buckets the update keys land in. ``deletes`` (key columns only) is
    the WHEN MATCHED DELETE clause — matching existing rows are dropped
    (tombstones for re-canonicalized entities). See the section comment
    above for the crash-atomicity story.
    """
    import os
    import shutil

    from functools import reduce

    dedup = updates.dropDuplicates(keys).withColumn("__bucket", _bucket_expr(keys, n_buckets))
    if deletes is not None:
        deletes = deletes.select(*keys).dropDuplicates(keys)
        if deletes.limit(1).count() == 0:
            deletes = None
    exists = table_exists(table_path)
    if exists and deletes is None and dedup.limit(1).count() == 0:
        return  # nothing to merge; don't churn the table (snapshot no-op)

    staging = table_path + "__staging"
    shutil.rmtree(staging, ignore_errors=True)

    if exists:
        touched_df = dedup.select("__bucket")
        if deletes is not None:
            touched_df = touched_df.unionByName(
                deletes.withColumn("__bucket", _bucket_expr(keys, n_buckets)).select("__bucket")
            )
        touched = sorted(r["__bucket"] for r in touched_df.distinct().collect())
        # read ONLY the touched buckets' live versions (legacy flat dirs
        # degrade to a full read + full re-bucket, a one-time migration)
        bucket_dirs = _bucket_dirs(table_path)
        if bucket_dirs:
            paths = []
            for b in touched:
                bdir = os.path.join(table_path, f"bucket={b}")
                v = _current_version(bdir)
                if v is not None and os.path.isdir(os.path.join(bdir, v)):
                    paths.append(os.path.join(bdir, v))
            existing = (
                spark.read.parquet(*paths).withColumn("__bucket", _bucket_expr(keys, n_buckets))
                if paths else None
            )
        elif any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(table_path)
        ):
            touched = list(range(n_buckets))  # migrate: rewrite everything once
            existing = spark.read.parquet(table_path).withColumn(
                "__bucket", _bucket_expr(keys, n_buckets)
            )
        else:
            # committed zero-row table (schema marker only): behaves like a
            # first write — install every staged bucket
            touched = None
            existing = None
        if existing is not None:
            # NULL-SAFE key equality: merge keys include nullable columns
            # (percentage / transactionDate on triples); a plain anti-join's
            # NULL != NULL would let an identical re-merged row survive and
            # duplicate — exactly the crash-replay case MERGE must absorb.
            gone = dedup.select(*keys)
            if deletes is not None:
                gone = gone.unionByName(deletes)
            cond = reduce(
                lambda a, b: a & b,
                [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
            )
            merged = existing.alias("t").join(
                gone.distinct().alias("s"), cond, "left_anti"
            ).unionByName(dedup)
        else:
            merged = dedup
    else:
        touched = None  # first write: install every bucket present in updates
        merged = dedup

    # co-locate each bucket in one task before the partitioned write: without
    # this, partitionBy emits one file per (shuffle-task × bucket) pair —
    # N_tasks×N_buckets small files per merge. Hash-repartitioning on
    # __bucket gives exactly one file per bucket (at real scale, pair with
    # spark.sql.files.maxRecordsPerFile to re-split oversized buckets).
    merged.repartition(n_buckets, F.col("__bucket")).write.partitionBy(
        "__bucket"
    ).mode("overwrite").parquet(staging)

    migrated_flat = exists and not _bucket_dirs(table_path)
    # install: move each staged bucket dir to a fresh version, swap pointer
    staged = [
        d for d in os.listdir(staging)
        if d.startswith("__bucket=") and os.path.isdir(os.path.join(staging, d))
    ]
    installed = set()
    for d in staged:
        b = int(d.split("=", 1)[1])
        if touched is not None and b not in touched:
            continue  # defensive; staged buckets always ⊆ touched ∪ first-write
        bdir = os.path.join(table_path, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        nxt = _next_version(bdir)
        os.rename(os.path.join(staging, d), os.path.join(bdir, nxt))
        _set_current(bdir, nxt)
        installed.add(b)
    # touched buckets with NO staged rows were fully emptied by deletes:
    # bump the pointer to a fresh (nonexistent) version — readers skip
    # missing version dirs, so the bucket reads as empty. Same atomicity:
    # the pointer swap is the commit point.
    for b in (touched or []):
        bdir = os.path.join(table_path, f"bucket={b}")
        if b in installed or not os.path.isdir(bdir):
            continue
        _set_current(bdir, _next_version(bdir))
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(table_path, exist_ok=True)  # zero-row first write still commits
    _write_schema(table_path, merged.drop("__bucket").schema)
    # commit metadata: record the new snapshot, then expire versions beyond
    # the retention window (prior versions stay readable via time travel)
    _append_snapshot(table_path)
    _gc_versions(table_path)
    if migrated_flat:
        # one-time cleanup: drop the legacy flat files now fully re-bucketed
        # (NOT the metadata just written)
        for f in os.listdir(table_path):
            fp = os.path.join(table_path, f)
            if os.path.isfile(fp) and f not in ("_snapshots.jsonl", "_SCHEMA"):
                os.remove(fp)
