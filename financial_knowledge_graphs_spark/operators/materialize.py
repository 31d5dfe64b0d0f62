"""Graph materialization: canonical mapping, vertices/triples, merge upsert.

Replaces the reference Neo4j sink (per-entity MERGE + per-attribute SET loops
over bolt — reference src/db/neo4j_handler.py:218-290) with set-oriented
DataFrame builds plus a PARTITION-SCOPED idempotent upsert into hash-bucketed
parquet tables: immutable per-bucket version dirs, a TABLE-ATOMIC snapshot
commit (metadata.json + version-hint swap, Iceberg's own commit model),
WHEN MATCHED DELETE tombstones, time travel + retention GC, bucket-pruned
point lookups, and online re-bucketing — the full Iceberg ``MERGE INTO``
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
                      embedding_threshold: float = 0.75,
                      cleanup: list | None = None) -> DataFrame:
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
    out = _assign_entity_ids(mapped)
    # ownership of the keys cache passes to the caller via `cleanup`: once
    # the returned mapping is materialized, unpersist it (the pipeline
    # passes its batch-scoped _cleanup list). Leaving it cached for the
    # session lifetime leaks the full distinct-surface ledger into executor
    # storage on every full relink. Callers that pass no list (short-lived
    # tests/tools) accept the session-scoped cache.
    if cleanup is not None:
        cleanup.append(keys)
    return out


def _assign_entity_ids(mapped: DataFrame) -> DataFrame:
    """entity_id is content-addressed on the component's MIN NORMALIZED name
    (not the min raw key): every legal-suffix/casing variant of a company
    shares one norm, so the id is stable when later batches add new raw
    surfaces to the component — required for incremental MERGE to update
    rather than duplicate. Components whose min-norm is empty (all-suffix
    names) fall back to the min raw key. Two same-type components sharing
    a norm collapse to one id — exactly the reference's normalized-equality
    merge (reference src/db/neo4j_handler.py:84-99)."""
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


_MAPPING_SCHEMA = "key string, type string, name string, norm string, comp string, entity_id string"


def _incremental_mapping_driver(prior_map: DataFrame, cand_pdf,
                                max_block: int,
                                driver_threshold: int = 0) -> DataFrame | None:
    """Driver twin of the distributed incremental path (token edges only).

    Returns ``None`` when the touched-component member pull would exceed
    ``driver_threshold`` rows (ADVICE r3: the candidate cap alone does not
    bound the member fetch — one degenerate mega-component could OOM the
    driver even on a tiny batch); the caller falls back to the distributed
    path, which streams members through Spark.

    Every step mirrors the Catalyst expressions bit-for-bit: block sizes
    count token OCCURRENCES (explode semantics), pairs are anchored on a
    new side and ordered key_a < key_b, the predicate is the reference's
    containment gate (len>3 substring either way) AND token-set Jaccard
    > 0.5 (array_intersect/array_union are set ops), comp = min member key
    (CC semantics), entity_id = sha2(type|min-nonempty-norm, 256)[:16]
    with min-key fallback (_assign_entity_ids), and only rows whose
    (comp, entity_id) moved are returned. ASCII/UTF-8 string comparison
    agrees between Python and UTF8String for the BMP, so min/ordering
    match."""
    import hashlib
    from collections import defaultdict

    spark = prior_map.sparkSession
    n = len(cand_pdf)
    keys = cand_pdf["key"].tolist()
    types = cand_pdf["type"].tolist()
    names = cand_pdf["name"].tolist()
    norms = [x or "" for x in cand_pdf["norm"].tolist()]
    toks = [list(t) for t in cand_pdf["tokens"].tolist()]
    is_new = cand_pdf["is_new"].tolist()
    prior_comp = cand_pdf["comp"].tolist()

    blocks: dict[tuple[str, str], list[int]] = defaultdict(list)
    for i in range(n):
        for t in toks[i]:
            blocks[(types[i], t)].append(i)

    tok_sets = [set(t) for t in toks]
    edges: set[tuple[str, str]] = set()
    for idxs in blocks.values():
        if len(idxs) > max_block:
            continue  # oversized-block purge, occurrence-counted
        uniq = set(idxs)
        new_in_block = [i for i in uniq if is_new[i]]
        for i in new_in_block:
            for j in uniq:
                if i == j:
                    continue
                a, b = (i, j) if keys[i] < keys[j] else (j, i)
                if is_new[a] and is_new[b] and a != i:
                    continue  # new↔new pair: visit once (from the lower side)
                pair = (keys[a], keys[b])
                if pair in edges:
                    continue
                na, nb = norms[a], norms[b]
                if not ((len(na) > 3 and na in nb) or (len(nb) > 3 and nb in na)):
                    continue
                union = len(tok_sets[a] | tok_sets[b])
                if union == 0 or len(tok_sets[a] & tok_sets[b]) / union <= 0.5:
                    continue
                edges.add(pair)

    # touched components: prior endpoints of an actual verified edge
    by_key = {keys[i]: i for i in range(n)}
    touched = {
        prior_comp[by_key[k]]
        for e in edges for k in e
        if not is_new[by_key[k]]
    }

    # every member of a touched component (pushed isin filter: components
    # are a point-lookup-sized set, the scan prunes on the comp column)
    rows: dict[str, tuple] = {}   # key -> (type, name, norm, pcomp, pid)
    for i in range(n):
        if is_new[i]:
            rows[keys[i]] = (types[i], names[i], norms[i], None, None)
    if touched:
        if len(touched) <= 1000:
            flt = prior_map.filter(F.col("comp").isin(sorted(touched)))
        else:
            # a literal isin of 10^4+ values bloats the plan; broadcast a
            # one-column frame instead (same pushdown-free semantics)
            spark_touched = spark.createDataFrame(
                [(c,) for c in sorted(touched)], "comp string"
            )
            flt = prior_map.join(F.broadcast(spark_touched), "comp")
        mem_sel = flt.select("key", "type", "name", "norm", "comp", "entity_id")
        if driver_threshold:
            # bound the member fetch like the candidate fetch: limit+1 and
            # bail to the distributed path on overflow (arbitrary subset is
            # fine — it is discarded)
            mem_pdf = mem_sel.limit(driver_threshold + 1).toPandas()
            if len(mem_pdf) > driver_threshold:
                return None
        else:
            mem_pdf = mem_sel.toPandas()
        for r in mem_pdf.itertuples(index=False):
            rows[r.key] = (r.type, r.name, r.norm or "", r.comp, r.entity_id)

    # union-find over verified edges + virtual edges (member → prior comp)
    parent: dict[str, str] = {k: k for k in rows}
    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    for k, (_, _, _, pcomp, _) in rows.items():
        if pcomp is not None and pcomp != k:
            union(k, pcomp)

    groups: dict[str, list[str]] = defaultdict(list)
    for k in rows:
        groups[find(k)].append(k)
    out = []
    for members in groups.values():
        comp = min(members)
        nonempty = [rows[k][2] for k in members if rows[k][2] != ""]
        rep = min(nonempty) if nonempty else comp
        ktype = rows[members[0]][0]
        eid = "ent_" + hashlib.sha256(
            f"{ktype}|{rep}".encode("utf-8")
        ).hexdigest()[:16]
        for k in members:
            t, nm, no, pcomp, pid = rows[k]
            if pcomp == comp and pid == eid:
                continue  # unchanged member: no merge, no tombstone
            out.append((k, t, nm, no, comp, eid))
    return spark.createDataFrame(out, _MAPPING_SCHEMA)


def canonical_mapping_incremental(
    prior_map: DataFrame, batch_keys: DataFrame, max_block: int = 1000,
    embedding_link: bool = False, embedding_threshold: float = 0.75,
    driver_threshold: int = 50_000,
) -> DataFrame:
    """TOUCHED-COMPONENTS-ONLY re-canonicalization (VERDICT r2 watch-item:
    the full-ledger CC per batch is O(history) at 10^9 distinct surfaces).

    Edges are a pure pairwise function of surface strings, so a new batch
    can only change components REACHABLE FROM ITS NEW SURFACES: a
    new-surface edge requires a shared blocking token, and old↔old edges
    were already in the prior graph. The incremental step therefore:

      1. anti-joins the batch's distinct surfaces against the persisted
         mapping table → genuinely-new surfaces (empty → nothing to do);
      2. finds prior surfaces sharing a blocking token (and, when
         embedding linking is on, a raw char-n-gram) with a new surface;
      3. pulls EVERY member of their components (components are closed, so
         transitive merges via chains of new surfaces stay correct);
      4. re-runs the similarity join + CC on that sub-universe only, with
         VIRTUAL edges (member.key ↔ member.comp) preserving prior
         connectivity without re-verifying old↔old pairs;
      5. re-assigns content-addressed entity ids on the new components.

    Returns mapping rows (key, type, name, norm, comp, entity_id) for the
    CHANGED surfaces only — genuinely-new surfaces plus prior surfaces whose
    (comp, entity_id) moved; unchanged rows (including every row of an
    untouched component) are absent, so the downstream mapping MERGE and
    tombstone derivation are O(changed), not O(sub-universe). Cost is
    O(batch + edge-touched members), independent of history size.

    Edge build is ANCHORED on the new surfaces: old↔old connectivity is
    already encoded in the prior comp labels (virtual edges below), so only
    new↔old and new↔new pairs are verified. Components are pulled only when
    an actual verified edge reaches them — a shared blocking token alone no
    longer drags a component into the re-link (the round-3 diagnosis: under
    a Zipf tail, token-bridge fan-out pulled ~35 components per genuinely
    new surface and re-verified + re-emitted all of them per batch).

    Block-cap parity: every block containing a new surface carries ALL its
    global members (the bridge pulls every prior surface sharing the
    token), so oversized-block purging sees exact global sizes — identical
    to a from-scratch run at this point in history. The only remaining
    divergence is inherent to incrementality: merges are monotone, so an
    edge formed when its block was under the cap persists even after the
    block later outgrows it (a from-scratch run would purge it).
    """
    from .linking import raw_char_ngrams_expr
    from .normalize import norm_tokens_expr

    key_cols = ["key", "type", "name", "norm", "tokens"]
    new_keys = batch_keys.join(
        prior_map.select("key"), "key", "left_anti"
    ).select(*key_cols)
    prior_keys = prior_map.select(
        "key", "type", "name", "norm", "comp",
        norm_tokens_expr("name").alias("tokens"),
    )

    # --- bridge: prior surfaces sharing a blocking token (plus a raw char
    # n-gram when embedding linking is on) with a genuinely-new surface
    if embedding_link:
        def _tok_of(df):
            return df.select(
                "key", "type",
                F.explode(
                    F.array_union("tokens", raw_char_ngrams_expr("norm"))
                ).alias("tok"),
            )
    else:
        def _tok_of(df):
            return df.select("key", "type", F.explode("tokens").alias("tok"))

    new_toks = _tok_of(new_keys).select("type", "tok").distinct()
    bridged = (
        _tok_of(prior_keys)
        .join(F.broadcast(new_toks), ["type", "tok"])
        .select("key").distinct()
        .join(prior_keys, "key")
    )

    # --- adaptive driver fast path (the same runtime decision CC makes
    # with its ≤2M-edge union-find): the steady-state sub-universe is a few
    # hundred to a few thousand rows, but the distributed verify → CC →
    # assign chain is ~20 shuffle stages whose pure scheduling latency
    # (~15s observed on local[8] for 114 output rows) dwarfs the compute.
    # Below the threshold, ONE Arrow collect + pure-Python twin of the
    # exact same predicate/UF/assignment + one pushed-filter member fetch
    # replaces the whole chain; the distributed path remains for large
    # batches (cold starts, fresh domains) and for embedding_link, whose
    # hashed-cosine math stays Catalyst-only. Equality of the two paths is
    # pinned by test_incremental_mapping.py::test_driver_path_equals_distributed.
    if not embedding_link and driver_threshold:
        cand_pdf = (
            new_keys.withColumn("is_new", F.lit(True))
            .withColumn("comp", F.lit(None).cast("string"))
            .unionByName(
                bridged.select(*key_cols, "comp")
                .withColumn("is_new", F.lit(False))
            )
            .limit(driver_threshold + 1)
            .toPandas()
        )
        if len(cand_pdf) <= driver_threshold:
            res = _incremental_mapping_driver(
                prior_map, cand_pdf, max_block, driver_threshold
            )
            if res is not None:
                return res
        # over threshold (candidates OR touched-component members): fall
        # through to the distributed plan (recomputes the bridge —
        # acceptable for the rare huge-batch / mega-component case)

    # --- edges: verify ONLY pairs with a new side, over new ∪ bridged
    cand_universe = new_keys.withColumn("is_new", F.lit(True)).unionByName(
        bridged.select(*key_cols).withColumn("is_new", F.lit(False))
    )
    edges = similarity_edges(
        cand_universe, max_block=max_block, anchor="is_new"
    ).select("key_a", "key_b")
    if embedding_link:
        edges = edges.unionByName(
            embedding_similarity_edges(
                cand_universe, threshold=embedding_threshold,
                max_block=max_block, anchor="is_new",
            ).select("key_a", "key_b")
        )
    # edges feed three consumers (touched-comp derivation, virtual-edge
    # union, CC) AND sit UPSTREAM of the node set here (unlike the full
    # path, where the node set feeds the edges). Without truncation the
    # edge subtree is replicated through members → sub_keys → CC → the
    # _assign_entity_ids self-join, and the logical plan grows
    # multiplicatively (observed: explainString OOMs the driver). Eager
    # localCheckpoint computes the verify join exactly once and replaces
    # the subtree with an RDD scan leaf — the same lineage-truncation CC
    # itself uses per round.
    edges = edges.localCheckpoint(eager=True)

    # --- touched components: prior endpoints of an actual verified edge
    endpoints = (
        edges.select(F.col("key_a").alias("key"))
        .unionByName(edges.select(F.col("key_b").alias("key")))
        .distinct()
    )
    cand = prior_keys.join(endpoints, "key").select("comp").distinct()
    # every member of a touched component (components are closed, so
    # transitive merges via chains of new surfaces stay correct)
    members = prior_keys.join(cand, "comp").select(
        "key", "type", "name", "norm", F.col("comp").alias("prior_comp")
    )
    sub_keys = new_keys.select("key", "type", "name", "norm").unionByName(
        members.drop("prior_comp")
    )
    # virtual edges pin prior components together (comp label is itself a
    # member key, so it is a valid node id)
    virtual = members.filter(F.col("key") != F.col("prior_comp")).select(
        F.col("key").alias("key_a"), F.col("prior_comp").alias("key_b")
    )
    comp = connected_components(sub_keys, edges.unionByName(virtual), id_col="key")
    mapped = sub_keys.join(comp, "key", "left").withColumn(
        "comp", F.coalesce("comp", "key")
    )
    out = _assign_entity_ids(mapped).select(
        "key", "type", "name", "norm", "comp", "entity_id"
    )
    # --- changed rows only: a member that kept its comp AND entity_id needs
    # no mapping merge, no tombstone, no vertex-id churn (its n_mentions
    # refresh rides on touched_eids in the pipeline, derived from updates)
    return out.join(
        prior_map.select("key", "comp", "entity_id"),
        ["key", "comp", "entity_id"], "left_anti",
    ).select("key", "type", "name", "norm", "comp", "entity_id")


def build_vertices(mentions: DataFrame, mapping: DataFrame) -> DataFrame:
    """One row per canonical entity; representative surface = most-mentioned
    name (count desc, name desc tiebreak — deterministic), attributes =
    greatest non-null per column within the surface (batch form of the
    reference's last-writer-wins attribute refresh, reference
    src/db/neo4j_handler.py:188-216). `max` rather than `first` because
    `first` is partition-order dependent: a crash replay could pick a
    different value, turn the vertices merge into a spurious rewrite, and
    emit phantom CDC deltas for unchanged entities.

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
        F.first("norm").alias("norm"),  # norm is a function of the group key
        F.max("companyName").alias("companyName"),
        F.max("ticker").alias("ticker"),
        F.max("industry").alias("industry"),
        F.max("country").alias("country"),
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

    # symmetric predicates canonicalized by sorted endpoints (SURVEY §1.3).
    # Name order must be TOTAL or both orientations of one fact survive:
    # NULL names coalesce to '' (NULL > x is NULL -> never swapped) and
    # name ties (distinct entities sharing a canon_name) tie-break on the
    # non-null unique entity id.
    sym = F.lower("pred").isin("mergedwith", "partnerswith")
    sn = F.coalesce(F.col("subj_name"), F.lit(""))
    on = F.coalesce(F.col("obj_name"), F.lit(""))
    swap = sym & ((sn > on) | ((sn == on) & (F.col("subj") > F.col("obj"))))
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
# Layout: table_path/bucket=<id>/v_<n>/<parquet files> (immutable data
# version dirs) + table_path/_metadata/v<sid>.metadata.json (full
# bucket→version map, bucket count, schema — one file per snapshot) +
# table_path/_metadata/version-hint.text naming the live snapshot id.
#
# A merge rewrites ONLY the buckets its update keys hash into — an
# incremental batch touching 0.1% of keys rewrites ~0.1% of a 100 TB
# table, not all of it. The COMMIT POINT is a single atomic os.replace of
# version-hint.text (POSIX rename atomicity): data dirs and the metadata
# file are staged first, so a crash at any instant leaves the WHOLE TABLE
# readable at either the previous or the new snapshot — never a torn
# cross-bucket state (ADVICE r2: per-bucket pointer swaps left a
# half-applied merge visible to concurrent readers).
#
# This is exactly Iceberg's commit model (metadata.json + version-hint),
# and the metadata carries the table's bucket count, so re-bucketing to
# more buckets (``rebucket_table``) is just another snapshot — readers and
# subsequent merges resolve the layout from metadata, never from a
# hardcoded constant.
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


def _fsync_dir(path: str) -> None:
    """fsync a directory's entries (rename durability); best-effort on
    filesystems that refuse O_DIRECTORY opens."""
    import os

    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _install_version(src_dir: str, bucket_dir: str) -> str:
    """Move a staged bucket dir to the next free immutable version name.
    Collision-tolerant: a concurrent writer may install the same v_N first
    (its rename wins, ours gets ENOTEMPTY/EEXIST) — rescan and take the
    next slot; version names only need uniqueness, the snapshot's bucket
    map is what readers resolve. Only collision errnos retry: anything
    else (ENOSPC, EACCES, a vanished src) propagates immediately instead
    of spinning 1000 rescans and masking the real failure."""
    import errno
    import os

    for _ in range(1000):
        nxt = _next_version(bucket_dir)
        try:
            os.rename(src_dir, os.path.join(bucket_dir, nxt))
            # make the rename itself durable BEFORE the snapshot commit
            # references it: the commit's metadata dir is fsync'd, so an
            # unfsync'd data-dir rename could be the only thing a power
            # loss drops — a durable snapshot pointing at a vanished dir.
            _fsync_dir(bucket_dir)
            return nxt
        except OSError as e:
            if e.errno not in (errno.EEXIST, errno.ENOTEMPTY):
                raise
            continue
    raise RuntimeError(f"could not claim a version slot in {bucket_dir}")


SNAPSHOT_RETENTION = 3  # snapshots kept readable (time-travel window)
AUTO_COMPACT_FILES = 8  # max data files per bucket before a merge folds the
                        # bucket into its rewrite (inline compaction)


def _as_dirs(v) -> list:
    """Bucket map value → list of version dirs (pre-append-path metadata
    recorded a single dir as a plain string)."""
    return v if isinstance(v, list) else [v]


def _meta_dir(table_path: str) -> str:
    import os

    return os.path.join(table_path, "_metadata")


def _meta_path(table_path: str, sid: int) -> str:
    import os

    return os.path.join(_meta_dir(table_path), f"v{sid:07d}.metadata.json")


def _hint_sid(table_path: str) -> int | None:
    import os

    p = os.path.join(_meta_dir(table_path), "version-hint.text")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        txt = f.read().strip()
    return int(txt) if txt else None


def _load_meta(table_path: str, sid: int) -> dict | None:
    import json
    import os

    p = _meta_path(table_path, sid)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _max_meta_sid(table_path: str) -> int:
    """Highest metadata file id on disk — NOT the hint: a crash between the
    metadata write and the hint swap leaves an orphan metadata file whose id
    must not be reused by the replayed commit."""
    return max(_meta_sids_on_disk(table_path), default=0)


def _legacy_jsonl_snapshots(table_path: str) -> list[dict]:
    import json
    import os

    log = os.path.join(table_path, "_snapshots.jsonl")
    if not os.path.exists(log):
        return []
    with open(log) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _bucket_file_stats(version_dir: str) -> dict:
    """Manifest-level file stats from the parquet footers (rows + bytes) —
    the metadata Iceberg keeps per data file; zero extra Spark jobs."""
    import os

    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow is baked in
        return {}
    rows = 0
    nbytes = 0
    files = 0
    for f in os.listdir(version_dir):
        fp = os.path.join(version_dir, f)
        if not (f.endswith(".parquet") and os.path.isfile(fp)):
            continue
        rows += pq.ParquetFile(fp).metadata.num_rows
        nbytes += os.path.getsize(fp)
        files += 1
    return {"rows": rows, "bytes": nbytes, "files": files}


def _dir_col_stats(version_dir: str) -> dict:
    """Per-column [min, max] over a version dir's parquet files, from the
    footer row-group statistics (the manifest column bounds Iceberg keeps
    per data file) — zero extra Spark jobs. Only JSON-safe atomic types
    (int/float/str/bool) are recorded; a column any of whose chunks lacks
    stats is omitted (absent bounds == never prune, always safe)."""
    import os

    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow is baked in
        return {}
    ok_types = (int, float, str, bool)
    bounds: dict[str, list] = {}
    dead: set[str] = set()
    for f in os.listdir(version_dir):
        fp = os.path.join(version_dir, f)
        if not (f.endswith(".parquet") and os.path.isfile(fp)):
            continue
        md = pq.ParquetFile(fp).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if "." in name or name in dead:
                    continue  # nested fields: skip (top-level atomics only)
                st = col.statistics
                if (
                    st is None or not st.has_min_max
                    or not isinstance(st.min, ok_types)
                    or not isinstance(st.max, ok_types)
                    or isinstance(st.min, bool) != isinstance(st.max, bool)
                ):
                    dead.add(name)
                    bounds.pop(name, None)
                    continue
                cur = bounds.get(name)
                if cur is None:
                    bounds[name] = [st.min, st.max]
                else:
                    cur[0] = min(cur[0], st.min)
                    cur[1] = max(cur[1], st.max)
    return bounds


def read_graph_table_pruned(spark: SparkSession, table_path: str,
                            ranges: dict) -> DataFrame:
    """Range scan with FILE SKIPPING on the snapshot's per-dir column
    bounds (the Iceberg manifest-pruning analog, orthogonal to bucket
    pruning — buckets prune point lookups by key hash, bounds prune RANGE
    predicates on any recorded column): a version dir whose recorded
    [min, max] cannot intersect the requested range is never opened.

    ``ranges`` maps column → (lo, hi); either bound may be None (open).
    The exact predicate is always applied on top, so dirs without recorded
    bounds (legacy snapshots, non-atomic columns) degrade to read+filter,
    never to wrong results."""
    import os

    from functools import reduce

    def _pred(df):
        cs = []
        for c, (lo, hi) in ranges.items():
            if lo is not None:
                cs.append(F.col(c) >= F.lit(lo))
            if hi is not None:
                cs.append(F.col(c) <= F.lit(hi))
        return df.filter(reduce(lambda a, b: a & b, cs)) if cs else df

    state = _table_state(table_path)
    if not state or not state.get("dir_stats"):
        return _pred(read_graph_table(spark, table_path))
    dstats = state["dir_stats"]

    def _keep(b: str, v: str) -> bool:
        st = dstats.get(f"{b}/{v}")
        if not st:
            return True  # absent bounds: never prune, always safe
        for c, (lo, hi) in ranges.items():
            if c not in st:
                continue
            cmin, cmax = st[c]
            if (lo is not None and cmax < lo) or (hi is not None and cmin > hi):
                return False
        return True

    # only DATA dirs are skipped; a bucket's equality-delete dirs always
    # load (_snapshot_scan) — skipping a delete would resurrect rows in
    # the dirs that do get read
    out = _snapshot_scan(spark, table_path, state, data_dir_filter=_keep,
                         strict=False)
    if out is None:
        empty = _empty_df(spark, table_path, state)
        if empty is not None:
            return _pred(empty)
        # no schema recorded and everything pruned: exact filter over the
        # full read (still correct, just unpruned — legacy-only corner)
        return _pred(read_graph_table(spark, table_path))
    return _pred(out)


def table_stats(table_path: str) -> dict | None:
    """Live-snapshot stats: total/per-bucket rows, bytes and file counts
    (from commit-time footers — no scan). The ops answer to 'is this table
    skewed / due a rebucket_table?': a bucket many times the median size
    means the hash key has heavy hitters or the layout is outgrown. None
    for pre-metadata tables (no recorded stats)."""
    state = _table_state(table_path)
    if not state or "stats" not in state:
        return None
    per = state["stats"]
    return {
        "n_buckets": state.get("n_buckets"),
        "rows": sum(s.get("rows", 0) for s in per.values()),
        "bytes": sum(s.get("bytes", 0) for s in per.values()),
        "files": sum(s.get("files", 0) for s in per.values()),
        "buckets": per,
    }


class CommitConflictError(RuntimeError):
    """Another writer committed a snapshot after this operation read its
    base state, so the staged bucket map would clobber the winner's buckets.
    ``merge_upsert`` absorbs this by recomputing from the fresh snapshot and
    retrying; offline maintenance ops (rebucket/compact/truncate) surface it
    to the operator."""


def _live_sid(table_path: str) -> int:
    """Snapshot id readers currently resolve — hint file, else the legacy
    jsonl log's last entry, else 0 (no committed snapshot)."""
    sid = _hint_sid(table_path)
    if sid is not None:
        return sid
    legacy = _legacy_jsonl_snapshots(table_path)
    return legacy[-1]["snapshot_id"] if legacy else 0


def _commit_lock(table_path: str, timeout: float = 60.0):
    """Serialize check-and-swap across same-box writers via a kernel-managed
    ``flock`` on a persistent lock file. On a real deployment this role
    belongs to the Iceberg CATALOG's atomic compare-and-swap (Hive lock /
    Nessie / REST catalog); one box has POSIX advisory locks. flock (not a
    stat-mtime staleness heuristic, which is a check-then-remove TOCTOU:
    two waiters could both judge a lock stale and the second remove would
    delete the first claimer's FRESH lock, admitting two writers) is owned
    by the kernel — a crashed holder's lock is released with its process,
    so there is no takeover race and no stale window to tune."""
    import contextlib
    import fcntl
    import os
    import time as _time

    @contextlib.contextmanager
    def _lock():
        md = _meta_dir(table_path)
        os.makedirs(md, exist_ok=True)
        lp = os.path.join(md, ".commit.lock")
        fd = os.open(lp, os.O_CREAT | os.O_WRONLY)
        t0 = _time.monotonic()
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    if _time.monotonic() - t0 > timeout:
                        raise TimeoutError(
                            f"commit lock busy > {timeout}s: {lp}"
                        )
                    _time.sleep(0.05)
            yield
        finally:
            try:
                fcntl.flock(fd, fcntl.LOCK_UN)
            except OSError:
                pass
            os.close(fd)

    return _lock()


def _commit_snapshot(table_path: str, buckets_map: dict[str, str],
                     n_buckets: int, schema,
                     stats: dict | None = None,
                     base_sid: int | None = None,
                     dir_stats: dict | None = None,
                     deletes: dict | None = None,
                     dir_seq: dict | None = None,
                     delete_keys: list[str] | None = None) -> int:
    """THE commit: write the snapshot's metadata file (staged via tmp +
    os.replace), then atomically swap version-hint.text onto it. A crash
    before the hint swap leaves the previous snapshot live and the new
    metadata file an ignored orphan; a crash after it leaves the new
    snapshot fully live — there is no intermediate state.

    ``base_sid`` makes the swap a COMPARE-and-swap (Iceberg's optimistic
    concurrency): if the live snapshot moved past the base this writer
    staged against, raise :class:`CommitConflictError` instead of
    installing a bucket map that silently drops the winner's buckets.
    The check-and-swap pair is serialized by the per-table commit lock.

    Merge-on-read state (Iceberg format-v2 row-level deletes): ``deletes``
    maps bucket → [[delete_dir, seq], ...] (equality-delete files) and
    ``dir_seq`` maps "bucket/dir" → data sequence number. Entries whose
    seq is None were staged THIS commit — the snapshot id is assigned
    under the lock, so they are stamped with it here (Iceberg gives a
    commit's data and delete files the same sequence number; deletes
    apply strictly to LOWER sequences)."""
    import json
    import os
    import time as _time

    md = _meta_dir(table_path)
    os.makedirs(md, exist_ok=True)
    with _commit_lock(table_path):
        if base_sid is not None and _live_sid(table_path) != base_sid:
            raise CommitConflictError(
                f"{table_path}: live snapshot {_live_sid(table_path)} != "
                f"staged base {base_sid}"
            )
        legacy = _legacy_jsonl_snapshots(table_path)
        base = max([_max_meta_sid(table_path)] + [s["snapshot_id"] for s in legacy])
        sid = base + 1
        stamped_deletes = {
            b: [[d, sid if s is None else int(s)] for d, s in items]
            for b, items in (deletes or {}).items() if items
        }
        stamped_seq = {
            k: (sid if s is None else int(s))
            for k, s in (dir_seq or {}).items()
        }
        meta = {
            "snapshot_id": sid,
            "ts": _time.time(),
            "n_buckets": n_buckets,
            "buckets": buckets_map,
            "stats": stats if stats is not None else {},
            "dir_stats": dir_stats if dir_stats is not None else {},
            "schema": schema.jsonValue() if schema is not None else None,
            "deletes": stamped_deletes,
            "dir_seq": stamped_seq,
            "delete_keys": delete_keys or None,
        }
        tmp = os.path.join(md, f".v{sid:07d}.metadata.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _meta_path(table_path, sid))
        tmp = os.path.join(md, ".version-hint.tmp")
        with open(tmp, "w") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(md, "version-hint.text"))
        # fsync the directory so the renames themselves survive power loss
        # — POSIX allows a crash to drop a rename whose directory entry was
        # never flushed, which would silently un-commit an acknowledged
        # snapshot (a CDC consumer may already hold its sid as an offset).
        _fsync_dir(md)
    return sid


def _table_state(table_path: str) -> dict | None:
    """Live table state: the hinted metadata snapshot, or — for tables
    written before the atomic-metadata layout — a state synthesized from
    the per-bucket CURRENT pointers (read-only legacy path; the next merge
    migrates the table to metadata commits)."""
    import os

    sid = _hint_sid(table_path)
    if sid is not None:
        meta = _load_meta(table_path, sid)
        if meta is not None:
            return meta
    buckets = _bucket_dirs(table_path)
    if not buckets:
        return None
    state: dict[str, str] = {}
    for b in buckets:
        bdir = os.path.join(table_path, b)
        v = _current_version(bdir)
        if v and os.path.isdir(os.path.join(bdir, v)):
            state[b] = v
    legacy = _legacy_jsonl_snapshots(table_path)
    return {
        "snapshot_id": legacy[-1]["snapshot_id"] if legacy else 0,
        "n_buckets": None,  # unrecorded pre-metadata; callers keep their arg
        "buckets": state,
        "schema": None,
        "legacy": True,
    }


def _write_schema(table_path: str, schema) -> None:
    """Persist the table schema (Iceberg keeps it in metadata; we need it to
    read legitimately-empty tables and to type point-lookup literals)."""
    import json
    import os

    import uuid

    # UNIQUE tmp per writer: a fixed name races under concurrent merges —
    # writer B's os.replace consumes A's tmp (or A's replace consumes B's),
    # and the loser hits FileNotFoundError despite both schemas being valid
    tmp = os.path.join(table_path, f"._SCHEMA.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        json.dump(schema.jsonValue(), f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(table_path, "_SCHEMA"))
    _fsync_dir(table_path)


def _read_schema(table_path: str):
    import json
    import os

    from pyspark.sql.types import StructType

    p = os.path.join(table_path, "_SCHEMA")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return StructType.fromJson(json.load(f))


def _meta_sids_on_disk(table_path: str) -> list[int]:
    """Sorted snapshot ids with a metadata file present. A directory listing,
    not range(1, hint): with metadata expiry the listing stays O(retention)
    while the hint grows without bound — scanning up to the hint would make
    every GC pay O(total-commits) driver file I/O."""
    import os
    import re

    d = _meta_dir(table_path)
    if not os.path.isdir(d):
        return []
    sids = []
    for f in os.listdir(d):
        m = re.fullmatch(r"v(\d+)\.metadata\.json", f)
        if m:
            sids.append(int(m.group(1)))
    return sorted(sids)


def snapshots(table_path: str) -> list[dict]:
    """All COMMITTED snapshots still on disk, oldest first (Iceberg
    ``.snapshots`` analog — expired snapshots' metadata is GC'd, so the
    list covers the retention window). Metadata files newer than the hint
    are uncommitted orphans from a crashed commit and are excluded. Legacy
    _snapshots.jsonl entries (pre-metadata tables) are listed when no
    metadata commits exist."""
    hint = _hint_sid(table_path)
    if hint is None:
        return _legacy_jsonl_snapshots(table_path)
    out = _legacy_jsonl_snapshots(table_path)
    for sid in _meta_sids_on_disk(table_path):
        if sid > hint:
            continue
        meta = _load_meta(table_path, sid)
        if meta is not None:
            out.append(meta)
    return out


def _tags_path(table_path: str) -> str:
    import os

    return os.path.join(_meta_dir(table_path), "tags.json")


def table_tags(table_path: str) -> dict[str, int]:
    """Named snapshot refs (Iceberg TAG analog): tag name → snapshot id.

    FAIL-CLOSED: a missing tags.json means "no tags", but an unreadable or
    corrupt one RAISES — GC consumes this to decide what may expire, and
    silently treating corruption as "no tags" would let it delete pinned
    snapshots (review r3-1)."""
    import json
    import os

    p = _tags_path(table_path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {k: int(v) for k, v in json.load(f).items()}


def _write_tags(table_path: str, tags: dict[str, int]) -> None:
    """Durable atomic tags.json swap: flush+fsync BEFORE the rename (same
    discipline as _commit_snapshot) — rename-atomicity alone can still lose
    a just-acknowledged tag to a crash if the tmp content never hit disk
    (review r3-4)."""
    import json
    import os

    tmp = _tags_path(table_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(tags, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _tags_path(table_path))
    _fsync_dir(os.path.dirname(_tags_path(table_path)))


def tag_snapshot(table_path: str, name: str, snapshot_id: int | None = None) -> int:
    """Pin a snapshot under a name (Iceberg ``create_tag``): a tagged
    snapshot is EXEMPT from retention expiry — its metadata and version
    dirs survive ``expire_snapshots`` until the tag is dropped. Default:
    the live snapshot. The audit/publish primitive: tag a validated
    snapshot ('published-2026-08-18') and readers pin to it while later
    merges keep landing."""
    import json
    import os

    with _commit_lock(table_path):
        sid = int(snapshot_id) if snapshot_id is not None else _live_sid(table_path)
        known = {s["snapshot_id"] for s in snapshots(table_path)}
        if sid not in known:
            raise ValueError(
                f"cannot tag snapshot {sid} of {table_path}: not a committed "
                f"retained snapshot ({sorted(known)})")
        t = table_tags(table_path)
        t[name] = sid
        _write_tags(table_path, t)
    return sid


def drop_tag(table_path: str, name: str) -> None:
    """Drop a named ref; the snapshot re-enters normal retention and the
    next GC may expire it."""
    import json
    import os

    with _commit_lock(table_path):
        t = table_tags(table_path)
        if name not in t:
            return
        del t[name]
        _write_tags(table_path, t)


ORPHAN_STAGING_TTL_S = 3600.0  # age before a crashed attempt's staging dir
                               # is presumed dead (an ACTIVE concurrent
                               # writer's staging is minutes old at most)


def _gc_orphan_staging(table_path: str) -> None:
    """Remove ``<table>__staging_<uuid>`` dirs left by crashed merge
    attempts (the Iceberg ``remove_orphan_files`` analog). Age-gated:
    a LIVE concurrent writer's staging dir must survive its own merge
    window, so only dirs past ORPHAN_STAGING_TTL_S are dropped."""
    import os
    import shutil
    import time as _time

    parent = os.path.dirname(table_path) or "."
    prefix = os.path.basename(table_path) + "__staging"
    if not os.path.isdir(parent):
        return
    def newest_mtime(p: str) -> float:
        # liveness = the NEWEST mtime anywhere in the tree: the top-level
        # dir's mtime freezes when the write job STARTS, so a live writer
        # whose Spark write outlives the TTL would look orphaned by it —
        # but its task files keep getting written, keeping the tree fresh.
        newest = 0.0
        for root, _dirs, files in os.walk(p):
            try:
                newest = max(newest, os.path.getmtime(root))
            except OSError:
                pass
            for fn in files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(root, fn)))
                except OSError:
                    pass
        return newest

    for d in os.listdir(parent):
        if not d.startswith(prefix):
            continue
        p = os.path.join(parent, d)
        try:
            if newest_mtime(p) < _time.time() - ORPHAN_STAGING_TTL_S:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass  # raced with its own cleanup


def _gc_versions(table_path: str) -> None:
    """Expire snapshots beyond the last SNAPSHOT_RETENTION (the Iceberg
    ``expire_snapshots`` analog): drop version dirs referenced ONLY by
    expired snapshots, then the expired snapshots' metadata files (so the
    _metadata dir stays O(retention), not O(total-commits)).

    A version dir referenced by NO on-disk snapshot is ambiguous — it may
    be a crash orphan (commit never swapped the hint), but it may equally
    be a CONCURRENT writer's freshly-installed dir whose commit hasn't
    landed yet; deleting it would make that writer's CAS succeed against a
    snapshot whose data files are gone (silent data loss). Those dirs are
    age-gated like orphan staging: only dropped past ORPHAN_STAGING_TTL_S,
    which an active writer's install→commit window never approaches.

    Runs under the commit lock: the tag set, the expiry decision, and the
    deletions must be one critical section — otherwise a tag created after
    GC reads tags.json but before it deletes can acknowledge a pin whose
    snapshot GC is about to expire (review r3-2). Callers invoke this
    AFTER their own commit's lock is released (no nesting)."""
    with _commit_lock(table_path):
        _gc_versions_locked(table_path)


def _gc_versions_locked(table_path: str) -> None:
    import os
    import shutil
    import time as _time

    _gc_orphan_staging(table_path)
    all_snaps = snapshots(table_path)
    # tagged snapshots (Iceberg refs) are exempt from expiry
    tag_sids = set(table_tags(table_path).values())
    tail = all_snaps[-SNAPSHOT_RETENTION:] if SNAPSHOT_RETENTION else []
    retained = [s for s in all_snaps
                if s in tail or s["snapshot_id"] in tag_sids]
    expired = [s for s in all_snaps if s not in retained]
    live: dict[str, set[str]] = {}
    for s in retained:
        for b, vs in s["buckets"].items():
            live.setdefault(b, set()).update(_as_dirs(vs))
        for b, items in (s.get("deletes") or {}).items():
            live.setdefault(b, set()).update(d for d, _ in items)
    expired_ref: dict[str, set[str]] = {}
    for s in expired:
        for b, vs in s["buckets"].items():
            expired_ref.setdefault(b, set()).update(_as_dirs(vs))
        for b, items in (s.get("deletes") or {}).items():
            expired_ref.setdefault(b, set()).update(d for d, _ in items)
    cutoff = _time.time() - ORPHAN_STAGING_TTL_S
    for b in _bucket_dirs(table_path):
        bdir = os.path.join(table_path, b)
        keep = live.get(b, set()) | {_current_version(bdir) or ""}
        was_expired = expired_ref.get(b, set())
        for d in os.listdir(bdir):
            if not d.startswith("v_") or d in keep:
                continue
            p = os.path.join(bdir, d)
            try:
                if d in was_expired or os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass  # raced with another GC
    # expired snapshots' metadata files go last: their dirs were reclaimed
    # above, and keeping the files would grow the _metadata listing (and
    # every snapshots() call) linearly with commit history. Uncommitted
    # orphan metadata (sid > hint, crashed commit) is age-gated too.
    hint = _hint_sid(table_path)
    retained_sids = {s["snapshot_id"] for s in retained}
    for sid in _meta_sids_on_disk(table_path):
        if sid in retained_sids:
            continue
        mp = _meta_path(table_path, sid)
        try:
            if (hint is not None and sid <= hint) or os.path.getmtime(mp) < cutoff:
                os.remove(mp)
        except OSError:
            pass


def table_exists(table_path: str) -> bool:
    import os

    return os.path.isdir(table_path) and (
        bool(_bucket_dirs(table_path))
        or os.path.exists(os.path.join(table_path, "_SCHEMA"))
        or any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(table_path)
        )
    )


def _evolve_schema(old_schema_json: dict | None, new_schema):
    """Iceberg-style ADD-COLUMN schema evolution: the snapshot's recorded
    schema is the old schema plus any columns the updates introduce
    (appended, nullable — old data files simply lack them and read as
    NULL). A same-name column with a DIFFERENT type raises — type changes
    are not silently coerced (Iceberg allows only safe widenings; we take
    the stricter contract)."""
    from pyspark.sql.types import StructField, StructType

    fields: list = []
    seen: dict = {}
    if old_schema_json:
        for f in StructType.fromJson(old_schema_json).fields:
            fields.append(StructField(f.name, f.dataType, True))
            seen[f.name] = f.dataType
    for f in new_schema.fields:
        if f.name in seen:
            # simpleString comparison: nested-field NULLABILITY flags vary
            # with how a plan was built and are not a semantic type change
            if f.dataType.simpleString() != seen[f.name].simpleString():
                raise ValueError(
                    f"schema evolution: column '{f.name}' type change "
                    f"{seen[f.name].simpleString()} -> "
                    f"{f.dataType.simpleString()} is not supported"
                )
        else:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


def _read_with_schema(spark: SparkSession, paths: list[str],
                      meta: dict | None) -> DataFrame:
    """Read data files THROUGH the snapshot's recorded schema (Iceberg
    resolves reads via table metadata, never file footers): files written
    before an ADD COLUMN lack the new column and surface it as NULL;
    without a recorded schema, fall back to footer inference (legacy
    tables, which are single-schema by construction)."""
    from pyspark.sql.types import StructField, StructType

    if meta and meta.get("schema"):
        st = StructType.fromJson(meta["schema"])
        st = StructType([StructField(f.name, f.dataType, True) for f in st.fields])
        return spark.read.schema(st).parquet(*paths)
    return spark.read.parquet(*paths)


def _snapshot_scan(spark: SparkSession, table_path: str, snap: dict,
                   buckets: list[str] | None = None,
                   data_dir_filter=None, strict: bool = True,
                   schema_from: dict | None = None) -> DataFrame | None:
    """Resolve a snapshot to its visible rows — THE single read path every
    reader (live scan, time travel, CDC diff, point lookup, compaction,
    rebucket, merge survivor read) funnels through, so merge-on-read
    delete application can never be skipped by one of them.

    Merge-on-read (Iceberg format-v2): a bucket may carry equality-delete
    dirs (key-tuple parquet) alongside its data dirs, each with a commit
    sequence number. A delete at sequence S hides matching rows in data
    dirs with sequence < S only — the same commit's (or a later commit's)
    re-insert of the key stays visible. COW-only tables (no delete
    entries) take the original single multi-path scan; buckets without
    deletes are bulk-read even when sibling buckets have them.

    ``buckets`` restricts to a subset (point lookups, CDC per-bucket
    diffs); ``data_dir_filter(bucket, dir)`` skips data dirs (manifest
    bounds pruning — delete dirs are never skipped: hiding fewer rows
    than committed would resurrect deleted data); ``strict`` raises on a
    GC'd dir (time travel) instead of skipping it (live reads tolerate a
    concurrent GC). ``schema_from`` reads rows through ANOTHER snapshot's
    schema (CDC reads both sides through the TO snapshot). Returns None
    when no data dirs are referenced (caller supplies the empty frame)."""
    import os

    from functools import reduce

    bmap = snap.get("buckets", {})
    dmap = snap.get("deletes") or {}
    sel = list(bmap) if buckets is None else [b for b in buckets if b in bmap]
    read_meta = schema_from if schema_from is not None else snap

    def _dir(b: str, v: str) -> str | None:
        p = os.path.join(table_path, b, v)
        if not os.path.isdir(p):
            if strict:
                raise ValueError(
                    f"snapshot {snap.get('snapshot_id')} expired (bucket {b} "
                    f"version {v} GC'd; retention={SNAPSHOT_RETENTION})"
                )
            return None
        return p

    entries = []  # (bucket, seq, path) for data dirs
    dseq = snap.get("dir_seq") or {}
    for b in sel:
        for v in _as_dirs(bmap[b]):
            if data_dir_filter is not None and not data_dir_filter(b, v):
                continue
            p = _dir(b, v)
            if p is not None:
                entries.append((b, int(dseq.get(f"{b}/{v}", 0)), p))
    del_entries = []  # (bucket, seq, path) for equality-delete dirs
    for b in sel:
        for item in dmap.get(b, []):
            p = _dir(b, item[0])
            if p is not None:
                del_entries.append((b, int(item[1]), p))
    if not entries:
        return None
    if not del_entries:
        return _read_with_schema(spark, [p for _, _, p in entries], read_meta)

    mor_buckets = {b for b, _, _ in del_entries}
    parts = []
    plain = [p for b, _, p in entries if b not in mor_buckets]
    if plain:
        parts.append(_read_with_schema(spark, plain, read_meta))
    by_seq: dict[int, list[str]] = {}
    for b, s, p in entries:
        if b in mor_buckets:
            by_seq.setdefault(s, []).append(p)
    if by_seq:
        tagged = None
        for s in sorted(by_seq):
            t = _read_with_schema(spark, by_seq[s], read_meta).withColumn(
                "__seq", F.lit(int(s))
            )
            tagged = t if tagged is None else tagged.unionByName(t)
        dby: dict[int, list[str]] = {}
        for _, s, p in del_entries:
            dby.setdefault(s, []).append(p)
        dels = None
        for s in sorted(dby):
            d = spark.read.parquet(*dby[s]).withColumn("__dseq", F.lit(int(s)))
            dels = d if dels is None else dels.unionByName(d)
        key_cols = [c for c in dels.columns if c != "__dseq"]
        # NULL-SAFE key equality (triples merge keys include nullable
        # columns) as the equi part; the sequence inequality is the
        # residual condition on the same anti-join
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols],
        ) & (F.col("s.__dseq") > F.col("t.__seq"))
        parts.append(
            tagged.alias("t").join(dels.alias("s"), cond, "left_anti")
            .drop("__seq")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _empty_df(spark: SparkSession, table_path: str, meta: dict | None):
    from pyspark.sql.types import StructType

    if meta and meta.get("schema"):
        return spark.createDataFrame([], StructType.fromJson(meta["schema"]))
    schema = _read_schema(table_path)
    if schema is not None:
        return spark.createDataFrame([], schema)
    return None


def read_graph_table(spark: SparkSession, table_path: str,
                     snapshot: int | None = None,
                     tag: str | None = None) -> DataFrame:
    """Read a bucketed graph table at its live snapshot — resolved through
    the single version-hint → metadata chain, so a reader NEVER sees a
    half-applied merge (the commit is one os.replace) — or, with
    ``snapshot``, at that snapshot id (time travel, Iceberg ``VERSION AS
    OF``; the last SNAPSHOT_RETENTION snapshots stay readable), or with
    ``tag``, at a named ref (``tag_snapshot``; tagged snapshots never
    expire). Falls back to per-bucket CURRENT pointers for pre-metadata
    tables and to a plain parquet read for legacy flat dirs."""
    import os

    if tag is not None:
        if snapshot is not None:
            raise ValueError("pass snapshot= or tag=, not both")
        refs = table_tags(table_path)
        if tag not in refs:
            raise ValueError(f"no tag {tag!r} on {table_path} "
                             f"(tags: {sorted(refs)})")
        snapshot = refs[tag]
    if snapshot is not None:
        snap = _load_meta(table_path, snapshot)
        if snap is None:
            snap = next(
                (s for s in _legacy_jsonl_snapshots(table_path)
                 if s["snapshot_id"] == snapshot), None
            )
        if snap is None:
            raise ValueError(f"no snapshot {snapshot} recorded for {table_path}")
        out = _snapshot_scan(spark, table_path, snap, strict=True)
        if out is None:
            empty = _empty_df(spark, table_path, snap)
            if empty is not None:
                return empty
            raise ValueError(f"snapshot {snapshot} is empty and carries no schema")
        return out

    state = _table_state(table_path)
    if state is None:
        if os.path.isdir(table_path) and not any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(table_path)
        ):
            empty = _empty_df(spark, table_path, None)
            if empty is not None:  # committed zero-row table
                return empty
        return spark.read.parquet(table_path)
    out = _snapshot_scan(spark, table_path, state, strict=False)
    if out is None:
        empty = _empty_df(spark, table_path, state)
        if empty is not None:
            return empty
        raise ValueError(
            f"{table_path}: bucket layout present but no readable versions"
        )
    return out


def read_table_changes(spark: SparkSession, table_path: str,
                       from_snapshot: int,
                       to_snapshot: int | None = None) -> DataFrame:
    """Incremental consumption (the Iceberg incremental-scan / CDC analog):
    the row-level delta between two committed snapshots, as the table's
    columns plus ``_change_type`` ('insert' | 'delete'). A downstream
    training-data pipeline tails the graph/documents tables with this
    instead of re-reading 100 TB per batch.

    Scale shape: a bucket whose version-dir set only GREW between the two
    snapshots (the append fast path's signature) contributes its NEW dirs
    as inserts at FILE granularity — no diffing, no read of the old data.
    Only buckets that were rewritten (merge-updated, deleted from, or
    compacted) pay a row-level multiset diff (exceptAll both ways), and
    only over that bucket's files. An updated row surfaces as
    delete(old image) + insert(new image).

    ``from_snapshot=0`` means "before the first commit" (everything is an
    insert). Both snapshots must still be within the retention window —
    expired metadata or GC'd dirs raise ValueError, same as time travel.
    Rows are read through the TO snapshot's schema, so a column added
    between the two snapshots reads as NULL on the old images."""
    import os

    def _snap(sid: int) -> dict:
        if sid == 0:
            return {"snapshot_id": 0, "buckets": {}, "schema": None}
        meta = _load_meta(table_path, sid)
        if meta is None:
            meta = next(
                (s for s in _legacy_jsonl_snapshots(table_path)
                 if s["snapshot_id"] == sid), None
            )
        if meta is None:
            raise ValueError(
                f"no snapshot {sid} recorded for {table_path} "
                f"(expired past retention={SNAPSHOT_RETENTION}, or never "
                f"committed)"
            )
        return meta

    if to_snapshot is None:
        to_snapshot = _live_sid(table_path)
    if from_snapshot > to_snapshot:
        # a reversed range would run the diff with a/b swapped and emit
        # every change with its type INVERTED — silent corruption for a
        # replica applying it; fail loudly instead (corrupt offset, manual
        # misuse).
        raise ValueError(
            f"read_table_changes: from_snapshot={from_snapshot} > "
            f"to_snapshot={to_snapshot} for {table_path}"
        )
    a = _snap(from_snapshot)
    b = _snap(to_snapshot)

    def _paths(sid: int, bucket: str, dirs) -> list[str]:
        out = []
        for v in sorted(dirs):
            p = os.path.join(table_path, bucket, v)
            if not os.path.isdir(p):
                raise ValueError(
                    f"snapshot {sid} expired (bucket {bucket} version {v} "
                    f"GC'd; retention={SNAPSHOT_RETENTION})"
                )
            out.append(p)
        return out

    append_paths: list[str] = []
    diff_buckets: list[str] = []
    dels_a = a.get("deletes") or {}
    dels_b = b.get("deletes") or {}
    for bk in set(a["buckets"]) | set(b["buckets"]):
        da = set(_as_dirs(a["buckets"].get(bk, [])))
        db = set(_as_dirs(b["buckets"].get(bk, [])))
        same_dels = dels_a.get(bk, []) == dels_b.get(bk, [])
        if da == db and same_dels:
            continue  # untouched bucket: zero I/O
        if da <= db and same_dels:
            # pure growth with unchanged deletes: the new dirs' sequence
            # numbers exceed every pending delete's, so none of their rows
            # are hidden — ship them at file granularity, zero old-data I/O
            append_paths += _paths(to_snapshot, bk, db - da)
        else:
            # rewritten, or merge-on-read commit (new equality deletes):
            # row-level multiset diff over the bucket's RESOLVED rows
            diff_buckets.append(bk)

    def _empty():
        e = _empty_df(spark, table_path, b if b.get("schema") else None)
        return e

    parts = []
    if append_paths:
        parts.append(
            _read_with_schema(spark, append_paths, b)
            .withColumn("_change_type", F.lit("insert"))
        )
    if diff_buckets:
        # both sides resolved through _snapshot_scan (equality deletes
        # applied), both read through the TO snapshot's schema
        rows_a = _snapshot_scan(spark, table_path, a, buckets=diff_buckets,
                                strict=True, schema_from=b)
        rows_b = _snapshot_scan(spark, table_path, b, buckets=diff_buckets,
                                strict=True)
        if rows_a is None:
            rows_a = spark.createDataFrame([], rows_b.schema)
        if rows_b is None:
            rows_b = spark.createDataFrame([], rows_a.schema)
        parts.append(
            rows_b.exceptAll(rows_a).withColumn("_change_type", F.lit("insert"))
        )
        parts.append(
            rows_a.exceptAll(rows_b).withColumn("_change_type", F.lit("delete"))
        )
    if not parts:
        e = _empty()
        if e is None:
            raise ValueError(
                f"{table_path}: no changes between snapshots and no recorded "
                f"schema to type an empty result"
            )
        return e.withColumn("_change_type", F.lit("insert")).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lookup_by_key(spark: SparkSession, table_path: str, keys: list[str],
                  values: tuple, n_buckets: int = DEFAULT_MERGE_BUCKETS) -> DataFrame:
    """Point lookup with BUCKET PRUNING: hash the key values to their
    bucket and read only that bucket's live version — a 1/n_buckets scan
    instead of the whole table (Iceberg partition-pruned point read). The
    table's REAL bucket count comes from its metadata (a re-bucketed table
    ignores the caller's n_buckets). Falls back to a filtered full read on
    legacy flat dirs."""
    import os

    from functools import reduce

    from pyspark.sql.types import StructType

    assert len(keys) == len(values)
    state = _table_state(table_path)
    if state and state.get("n_buckets"):
        n_buckets = state["n_buckets"]
    # xxhash64 is TYPE-sensitive (int32 and int64 hash differently), so a
    # Python literal must be cast to the table column's declared type before
    # bucketing — otherwise the lookup scans the wrong bucket and silently
    # returns nothing (review finding r2-6). The type comes from the table
    # metadata (or the legacy _SCHEMA marker).
    schema = None
    if state and state.get("schema"):
        schema = StructType.fromJson(state["schema"])
    if schema is None:
        schema = _read_schema(table_path)
    types = {f.name: f.dataType for f in schema.fields} if schema else {}

    def lit_of(k, v):
        c = F.lit(v)
        return c.cast(types[k]) if k in types else c

    pred = reduce(
        lambda a, c: a & c,
        [F.col(k).eqNullSafe(lit_of(k, v)) for k, v in zip(keys, values)],
    )
    if not _bucket_dirs(table_path) and state is None:
        return spark.read.parquet(table_path).filter(pred)
    if any(k not in types for k in keys):
        # No recorded type for a key column (pre-metadata table with a
        # deleted _SCHEMA marker): an uncast literal could hash to the
        # WRONG bucket and silently return nothing — fall back to a
        # filtered full-table read instead of trusting the bucket (ADVICE
        # r2 low #3).
        return read_graph_table(spark, table_path).filter(pred)
    cond_df = spark.range(1).select(
        *[lit_of(k, v).alias(k) for k, v in zip(keys, values)]
    )
    b = cond_df.select(_bucket_expr(keys, n_buckets).alias("b")).first()["b"]
    bname = f"bucket={b}"
    out = _snapshot_scan(spark, table_path, state or {}, buckets=[bname],
                         strict=False)
    if out is None:
        # bucket empty at this snapshot → key absent (typed hash is exact)
        empty = _empty_df(spark, table_path, state)
        if empty is not None:
            return empty.filter(pred)
        return read_graph_table(spark, table_path).filter(pred).limit(0)
    return out.filter(pred)


def rollback_table(table_path: str, snapshot_id: int) -> int:
    """Roll the live table back to a retained snapshot (Iceberg
    ``rollback_to_snapshot``): commits a NEW snapshot whose bucket map,
    schema and stats copy the target's — history keeps moving forward
    (snapshot ids never reuse), the bad commits stay readable for
    forensics until retention expires them, and readers flip atomically
    via the same version-hint swap as any commit. Returns the new
    snapshot id.

    The target must still be within the retention window (its metadata
    file and version dirs intact) — rolling back to an expired snapshot
    raises ValueError, same as time travel. Concurrent writers are
    handled by the usual compare-and-swap: a merge landing after the
    rollback read its state raises CommitConflictError here (offline
    maintenance op — rerun after inspecting the winner)."""
    import os

    from pyspark.sql.types import StructType

    meta = _load_meta(table_path, snapshot_id)
    if meta is None:
        raise ValueError(
            f"no snapshot {snapshot_id} recorded for {table_path} "
            f"(expired past retention={SNAPSHOT_RETENTION}, or never "
            f"committed)"
        )
    targets = [
        (b, v) for b, vs in meta["buckets"].items() for v in _as_dirs(vs)
    ] + [
        (b, d) for b, items in (meta.get("deletes") or {}).items()
        for d, _ in items
    ]
    for b, v in targets:
        if not os.path.isdir(os.path.join(table_path, b, v)):
            raise ValueError(
                f"snapshot {snapshot_id} expired (bucket {b} version "
                f"{v} GC'd; retention={SNAPSHOT_RETENTION})"
            )
    schema = StructType.fromJson(meta["schema"]) if meta.get("schema") else None
    sid = _commit_snapshot(
        table_path, meta["buckets"], meta.get("n_buckets"), schema,
        meta.get("stats") or {}, base_sid=_live_sid(table_path),
        dir_stats=meta.get("dir_stats") or {},
        deletes=meta.get("deletes") or {},
        dir_seq=meta.get("dir_seq") or {},
        delete_keys=meta.get("delete_keys"),
    )
    # _SCHEMA marker only after the CAS commit lands (ADVICE r3): a
    # conflicting concurrent commit must not see the marker run ahead of
    # the committed snapshot.
    if schema is not None:
        _write_schema(table_path, schema)
    return sid


def truncate_table(table_path: str) -> None:
    """Drop all rows (SURVEY §2.6 row 44) — the reference's detach-delete
    teardown (reference src/db/neo4j_handler.py:356-360), with Iceberg
    ``TRUNCATE`` semantics: a COMMITTED EMPTY SNAPSHOT (buckets={}) through
    the ordinary CAS'd commit path, never metadata deletion. That keeps
    snapshot ids monotone, which is what makes truncate safe against
    everything around it:

    - a concurrent merge's CAS genuinely fails (its base sid is no longer
      live) instead of committing a bucket map that points at deleted dirs
      — including the base_sid=0 first write, which a delete-the-metadata
      truncate could never fence;
    - a CDC consumer's checkpointed offset stays meaningful — the diff
      across the truncate is 'delete everything', not an aliased replay of
      reused snapshot ids;
    - pre-truncate snapshots stay time-travelable within retention, and
      retention GC (run here) reclaims the data dirs on the normal path.

    A directory that never committed a snapshot (legacy flat parquet or
    arbitrary files) has no commit machinery to fence — plain removal."""
    import shutil

    from pyspark.sql.types import StructType

    state = _table_state(table_path)
    if state is None or not state.get("snapshot_id"):
        shutil.rmtree(table_path, ignore_errors=True)
        return
    for _ in range(MERGE_COMMIT_RETRIES):
        schema_json = state.get("schema")
        schema = (StructType.fromJson(schema_json) if schema_json
                  else _read_schema(table_path))
        try:
            _commit_snapshot(
                table_path, {}, state.get("n_buckets") or DEFAULT_MERGE_BUCKETS,
                schema, stats={}, base_sid=state["snapshot_id"],
            )
            _gc_versions(table_path)
            return
        except CommitConflictError:
            state = _table_state(table_path)  # a merge won the race; retry
            if state is None:
                return
    raise CommitConflictError(f"truncate_table: commit contention on {table_path}")


MERGE_COMMIT_RETRIES = 3


def merge_upsert(spark: SparkSession, table_path: str, updates: DataFrame,
                 keys: list[str], n_buckets: int = DEFAULT_MERGE_BUCKETS,
                 deletes: DataFrame | None = None,
                 mode: str = "cow") -> None:
    """Idempotent keyed upsert: new rows win on key collision (MERGE INTO ...
    WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT), rewriting only the
    hash-buckets the update keys land in. ``deletes`` (key columns only) is
    the WHEN MATCHED DELETE clause — matching existing rows are dropped
    (tombstones for re-canonicalized entities). See the section comment
    above for the crash-atomicity story.

    ``mode`` picks the row-level-delete strategy, exactly Iceberg's
    ``write.merge.mode``:

    - ``"cow"`` (copy-on-write, default): buckets holding matched rows are
      rewritten without them. Reads stay single-scan; best for read-heavy
      tables and large batches.
    - ``"mor"`` (merge-on-read, Iceberg format-v2): matched buckets are NOT
      rewritten — the merge appends an equality-delete file (the batch's
      key tuples) plus the new data file, both stamped with the commit's
      sequence number; readers anti-join deletes onto older-sequence data
      files (``_snapshot_scan``). Writes are O(batch) even when every
      bucket holds matches — the update-heavy streaming-upsert path at
      100 TB. A bucket whose data or delete file count would pass
      AUTO_COMPACT_FILES folds into a copy-on-write rewrite (applying and
      clearing its deletes), so read amplification stays bounded;
      ``compact_table`` reconciles the rest.

    CONCURRENT writers are safe (Iceberg's optimistic model): each attempt
    stages against the snapshot it read, and the commit is a compare-and-
    swap on the live snapshot id — a loser never installs a bucket map that
    would drop the winner's buckets; it recomputes from the winner's
    snapshot and retries (its orphaned staged dirs fall to version GC).
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"merge mode must be 'cow' or 'mor', got {mode!r}")
    # dedup once and PERSIST: the attempt evaluates this frame 3-5 times
    # (bucket-discovery collect, matched semi-join, survivors anti-join,
    # data write, MOR delete write) — unpersisted, each evaluation re-runs
    # the caller's full upstream plan, multiplied again per conflict retry.
    # Key-dedup is table-state independent, so it caches across retries;
    # only the __bucket column (depends on the live bucket count) is
    # recomputed inside the attempt.
    dedup = updates.dropDuplicates(keys).persist()
    if deletes is not None:
        deletes = deletes.select(*keys).dropDuplicates(keys).persist()
    try:
        for attempt in range(MERGE_COMMIT_RETRIES):
            try:
                return _merge_upsert_attempt(
                    spark, table_path, dedup, keys, n_buckets, deletes, mode
                )
            except CommitConflictError:
                if attempt == MERGE_COMMIT_RETRIES - 1:
                    raise
    finally:
        dedup.unpersist()
        if deletes is not None:
            deletes.unpersist()


def _merge_upsert_attempt(spark: SparkSession, table_path: str,
                          updates: DataFrame, keys: list[str],
                          n_buckets: int = DEFAULT_MERGE_BUCKETS,
                          deletes: DataFrame | None = None,
                          mode: str = "cow") -> None:
    import os
    import shutil

    from functools import reduce

    state = _table_state(table_path)
    base_sid = state["snapshot_id"] if state else 0
    if state and state.get("n_buckets"):
        # the table's recorded layout wins over the caller's default —
        # after rebucket_table, merges keep hashing into the NEW layout
        n_buckets = state["n_buckets"]
    prev_map: dict[str, list[str]] = (
        {b: _as_dirs(v) for b, v in state["buckets"].items()} if state else {}
    )

    # recorded schema = old schema + any columns this merge introduces (the
    # append fast path can land a new column without touching old files, so
    # the union must come from METADATA, not from the written frame).
    # Validated against the raw UPDATES schema, before any union: a union
    # would silently coerce a type conflict into a runtime CAST error.
    schema = _evolve_schema((state or {}).get("schema"), updates.schema)

    # `updates` and `deletes` arrive key-deduped AND persisted from
    # merge_upsert (see there); only the layout-dependent bucket column is
    # added per attempt.
    dedup = updates.withColumn("__bucket", _bucket_expr(keys, n_buckets))
    exists = state is not None or table_exists(table_path)
    # ONE driver-blocking job answers all three head questions (any update
    # rows? any delete rows? which buckets touched?) — these were three
    # separate jobs, and at ~0.5s scheduling latency each across the 4-5
    # merges a pipeline batch runs, the pure-latency tail added seconds.
    src = dedup.select("__bucket", F.lit(0).alias("__src"))
    if deletes is not None:
        src = src.unionByName(
            deletes.withColumn("__bucket", _bucket_expr(keys, n_buckets))
            .select("__bucket", F.lit(1).alias("__src"))
        )
    per_src = {
        r["__src"]: set(r["bs"])
        for r in src.groupBy("__src").agg(
            F.collect_set("__bucket").alias("bs")
        ).collect()
    }
    upd_buckets = per_src.get(0, set())
    del_buckets = per_src.get(1, set())
    if not del_buckets:
        deletes = None
    if exists and deletes is None and not upd_buckets:
        return  # nothing to merge; don't churn the table (snapshot no-op)
    pre_touched = sorted(upd_buckets | del_buckets)

    # per-attempt staging dir: concurrent writers (and conflict retries)
    # must not clobber each other's staged files before commit
    import uuid

    staging = f"{table_path}__staging_{uuid.uuid4().hex[:12]}"
    shutil.rmtree(staging, ignore_errors=True)

    dirty: set[int] = set()
    mor: set[int] = set()  # matched buckets taking the merge-on-read path
    mor_gone = None        # their equality-delete key frame
    if exists:
        touched = pre_touched
        # read ONLY the touched buckets' live data files (legacy flat dirs
        # degrade to a full read + full re-bucket, a one-time migration)
        if prev_map:
            # resolved through _snapshot_scan: schema-evolution-safe (reads
            # through the snapshot's recorded schema, not footer inference)
            # AND merge-on-read-safe (pending equality deletes applied — a
            # MOR-hidden row must not count as a match nor survive a
            # rewrite, or deleted rows would resurrect)
            scan = _snapshot_scan(
                spark, table_path, state,
                buckets=[f"bucket={b}" for b in touched], strict=False,
            )
            existing = (
                scan.withColumn("__bucket", _bucket_expr(keys, n_buckets))
                if scan is not None else None
            )
        elif state is None and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(table_path)
        ):
            touched = list(range(n_buckets))  # migrate: rewrite everything once
            existing = spark.read.parquet(table_path).withColumn(
                "__bucket", _bucket_expr(keys, n_buckets)
            )
            dirty = set(touched)
        else:
            # committed zero-row table (schema marker / empty snapshot):
            # behaves like a first write — install every staged bucket
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
            gone = gone.distinct()
            cond = reduce(
                lambda a, b: a & b,
                [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
            )
            # APPEND FAST PATH (the steady-state-ingest scale property): a
            # bucket none of whose existing rows matches an update/delete
            # key is CLEAN — its files stay referenced as-is and only the
            # new rows are written. Without this, every batch of
            # uniformly-hashed new keys (new doc ids!) touches every bucket
            # and copy-on-write rewrites the WHOLE table: O(history) writes
            # per batch. With it, clean buckets cost O(batch) writes; a
            # bucket accumulating > AUTO_COMPACT_FILES data files is folded
            # into the rewrite (inline compaction — amortized O(history /
            # AUTO_COMPACT_FILES), the Iceberg rewrite_data_files analog).
            matched = {
                r["__bucket"]
                for r in existing.alias("t")
                .join(gone.alias("s"), cond, "left_semi")
                .select("__bucket").distinct().collect()
            }
            if mode == "mor" and matched:
                prior_dk = (state or {}).get("delete_keys")
                if prior_dk and list(prior_dk) != list(keys):
                    raise ValueError(
                        f"{table_path}: merge-on-read requires a stable key "
                        f"set per table (recorded {prior_dk}, got {keys}) — "
                        f"equality-delete files join on their own columns"
                    )
                prior_dels = (state or {}).get("deletes") or {}
                # a matched bucket stays merge-on-read only while BOTH its
                # file counts stay under the cap; past it, fold into a
                # copy-on-write rewrite (applies + clears its deletes) —
                # bounded read amplification, Iceberg's compaction contract
                mor = {
                    b for b in matched
                    if len(prev_map.get(f"bucket={b}", [])) + 1 <= AUTO_COMPACT_FILES
                    and len(prior_dels.get(f"bucket={b}", [])) + 1 <= AUTO_COMPACT_FILES
                }
            dirty |= matched - mor
            dirty |= {
                b for b in (touched or [])
                if b not in mor
                and len(prev_map.get(f"bucket={b}", [])) + 1 > AUTO_COMPACT_FILES
            }
            if mor:
                # the batch's key tuples, restricted to MOR buckets — the
                # equality-delete file content (Iceberg streaming-upsert
                # writers emit a delete for every upsert key; applying a
                # delete for an unmatched key is a no-op by construction)
                mor_gone = gone.withColumn(
                    "__bucket", _bucket_expr(keys, n_buckets)
                ).filter(F.col("__bucket").isin(*[int(x) for x in mor]))
            if dirty:
                survivors = existing.alias("t").join(
                    gone.alias("s"), cond, "left_anti"
                ).filter(F.col("__bucket").isin(*[int(b) for b in dirty]))
                # allowMissingColumns = ADD-COLUMN schema evolution: updates
                # may introduce columns (survivors read NULL) or omit old
                # ones (replaced rows get NULL — MERGE UPDATE SET * from a
                # narrower source); the evolved schema is recorded below
                merged = survivors.unionByName(dedup, allowMissingColumns=True)
            else:
                merged = dedup
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
    # Only dirty buckets' survivors + the new rows cross this shuffle.
    merged.repartition(n_buckets, F.col("__bucket")).write.partitionBy(
        "__bucket"
    ).mode("overwrite").parquet(staging)
    del_staging = None
    if mor_gone is not None:
        # equality-delete files staged exactly like data files: one dir per
        # MOR bucket, installed as ordinary immutable version dirs and only
        # made visible by the snapshot's `deletes` map at the hint swap
        del_staging = f"{table_path}__staging_{uuid.uuid4().hex[:12]}"
        mor_gone.repartition(max(len(mor), 1), F.col("__bucket")).write.partitionBy(
            "__bucket"
        ).mode("overwrite").parquet(del_staging)

    migrated_flat = exists and state is None and not _bucket_dirs(table_path)
    # STAGE: move each staged bucket dir to a fresh immutable version dir.
    # No pointers move here — until the hint swap below, readers still
    # resolve the previous snapshot, so there is never a torn cross-bucket
    # state (ADVICE r2 medium: per-bucket commits tore mid-crash).
    staged = [
        d for d in os.listdir(staging)
        if d.startswith("__bucket=") and os.path.isdir(os.path.join(staging, d))
    ]
    new_map = dict(prev_map)
    # untouched/clean buckets inherit their commit-time file stats; dirty
    # ones get fresh footer stats, appended ones accumulate (manifest-level
    # stats, Iceberg-style)
    new_stats = {
        k: v for k, v in ((state or {}).get("stats") or {}).items() if k in new_map
    }
    new_dir_stats = dict((state or {}).get("dir_stats") or {})
    # merge-on-read bookkeeping: pending equality deletes + data sequence
    # numbers carry forward; COW-rewritten (and first-write) buckets clear
    # their deletes — the resolved survivor read already applied them
    new_deletes = {
        b: list(items)
        for b, items in (((state or {}).get("deletes") or {}).items())
    } if touched is not None else {}
    new_dir_seq = dict((state or {}).get("dir_seq") or {})
    installed = set()
    for d in staged:
        b = int(d.split("=", 1)[1])
        if touched is not None and b not in touched:
            continue  # defensive; staged buckets always ⊆ touched ∪ first-write
        bname = f"bucket={b}"
        bdir = os.path.join(table_path, bname)
        os.makedirs(bdir, exist_ok=True)
        nxt = _install_version(os.path.join(staging, d), bdir)
        fresh = _bucket_file_stats(os.path.join(bdir, nxt))
        new_dir_stats[f"{bname}/{nxt}"] = _dir_col_stats(os.path.join(bdir, nxt))
        new_dir_seq[f"{bname}/{nxt}"] = None  # stamped with the commit's sid
        if b in dirty or touched is None or not new_map.get(bname):
            # full rewrite (or first write): the new dir IS the bucket
            new_map[bname] = [nxt]
            new_stats[bname] = fresh
        else:
            # clean append: prior files stay live, stats accumulate
            new_map[bname] = new_map[bname] + [nxt]
            old = new_stats.get(bname) or {}
            new_stats[bname] = {
                k: old.get(k, 0) + fresh.get(k, 0)
                for k in ("rows", "bytes", "files")
            }
        installed.add(b)
    # DIRTY buckets with NO staged rows were fully emptied by deletes: drop
    # them from the snapshot map — an unmapped bucket reads as empty. Clean
    # touched buckets without staged rows (a delete that matched nothing)
    # keep their files.
    for b in dirty:
        new_deletes.pop(f"bucket={b}", None)  # rewrite applied them
        if b not in installed:
            new_map.pop(f"bucket={b}", None)
            new_stats.pop(f"bucket={b}", None)
    if del_staging is not None:
        for d in os.listdir(del_staging):
            if not (d.startswith("__bucket=")
                    and os.path.isdir(os.path.join(del_staging, d))):
                continue
            b = int(d.split("=", 1)[1])
            bname = f"bucket={b}"
            bdir = os.path.join(table_path, bname)
            os.makedirs(bdir, exist_ok=True)
            nxt = _install_version(os.path.join(del_staging, d), bdir)
            new_deletes.setdefault(bname, []).append([nxt, None])
        shutil.rmtree(del_staging, ignore_errors=True)
    # per-dir column bounds follow the bucket map: entries for dirs no
    # longer referenced are dropped with them
    live_dirs = {f"{b}/{v}" for b, vs in new_map.items() for v in _as_dirs(vs)}
    new_dir_stats = {k: v for k, v in new_dir_stats.items() if k in live_dirs}
    new_dir_seq = {k: v for k, v in new_dir_seq.items() if k in live_dirs}
    new_deletes = {b: v for b, v in new_deletes.items() if b in new_map and v}
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(table_path, exist_ok=True)  # zero-row first write still commits
    # COMMIT: one atomic compare-and-swap installs the whole snapshot (a
    # conflict raises to the retry wrapper); then expire versions beyond
    # the retention window (prior snapshots stay readable via time travel)
    # keys recorded for the surviving delete files: the set that WROTE them
    # (the MOR guard enforces stability, so prior and current agree when
    # both contribute)
    delete_keys = (
        ((state or {}).get("delete_keys") or list(keys)) if new_deletes else None
    )
    _commit_snapshot(table_path, new_map, n_buckets, schema, new_stats,
                     base_sid=base_sid, dir_stats=new_dir_stats,
                     deletes=new_deletes, dir_seq=new_dir_seq,
                     delete_keys=delete_keys)
    # _SCHEMA marker AFTER the CAS commit (ADVICE r3): it is only the
    # legacy/zero-row fallback — metadata carries the authoritative schema.
    # Writing it pre-commit let a CommitConflictError leave the marker
    # ahead of the committed snapshot, so legacy readers (and
    # lookup_by_key's fallback) could see columns no committed snapshot has.
    _write_schema(table_path, schema)
    for b in _bucket_dirs(table_path):
        # drop stale per-bucket CURRENT pointers (pre-metadata layout) so
        # they can't pin GC'd versions or confuse legacy readers
        cur = os.path.join(table_path, b, "CURRENT")
        if os.path.exists(cur):
            os.remove(cur)
    _gc_versions(table_path)
    if migrated_flat:
        # one-time cleanup: drop the legacy flat files now fully re-bucketed
        # (NOT the metadata just written)
        for f in os.listdir(table_path):
            fp = os.path.join(table_path, f)
            if os.path.isfile(fp) and f not in ("_snapshots.jsonl", "_SCHEMA"):
                os.remove(fp)


def rebucket_table(spark: SparkSession, table_path: str, keys: list[str],
                   new_buckets: int) -> None:
    """Re-bucket an existing table to a different bucket count — the
    operational story for growing a table past its layout (e.g. 32 buckets
    on one box → 4096 at 100 TB, keeping each bucket a few GB).

    Sizing note for streaming CDC consumers (ADVICE r3): the streaming
    `graph_table_changes` source diffs a REWRITTEN bucket by materializing
    both snapshots' resolved rows in one executor task (~2× bucket bytes of
    task memory) — rebucket a table whose buckets outgrow a few hundred MB
    BEFORE streaming CDC off it; the batch read_table_changes path has no
    such per-task bound.

    One full rewrite committed as ONE snapshot: every row re-hashed into
    the new layout, staged as fresh version dirs, then the version-hint
    swap installs the new bucket map + bucket count atomically. Readers
    mid-rebucket see the old snapshot; merges after it resolve the new
    n_buckets from table metadata (the caller's old constant is ignored);
    time travel across the boundary still reads the old layout's dirs
    until retention expires them. On Iceberg this is
    ``ALTER TABLE ... SET PARTITION SPEC (bucket(N, key))`` + a rewrite.

    Offline maintenance op: a merge committing underneath it raises
    CommitConflictError here (no auto-retry — rerun against the new
    snapshot); the CAS guarantees the rewrite never erases that merge.
    """
    import os
    import shutil
    import uuid

    state = _table_state(table_path)
    base_sid = state["snapshot_id"] if state else 0
    rows = read_graph_table(spark, table_path)
    schema = rows.schema
    dedup = rows.withColumn("__bucket", _bucket_expr(keys, new_buckets))
    staging = f"{table_path}__staging_{uuid.uuid4().hex[:12]}"
    shutil.rmtree(staging, ignore_errors=True)
    dedup.repartition(new_buckets, F.col("__bucket")).write.partitionBy(
        "__bucket"
    ).mode("overwrite").parquet(staging)

    new_map: dict[str, str] = {}
    new_stats: dict[str, dict] = {}
    new_dir_stats: dict[str, dict] = {}
    new_dir_seq: dict[str, int | None] = {}
    for d in os.listdir(staging):
        if not (d.startswith("__bucket=") and os.path.isdir(os.path.join(staging, d))):
            continue
        b = int(d.split("=", 1)[1])
        bdir = os.path.join(table_path, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        nxt = _install_version(os.path.join(staging, d), bdir)
        new_map[f"bucket={b}"] = [nxt]
        new_stats[f"bucket={b}"] = _bucket_file_stats(os.path.join(bdir, nxt))
        new_dir_stats[f"bucket={b}/{nxt}"] = _dir_col_stats(os.path.join(bdir, nxt))
        new_dir_seq[f"bucket={b}/{nxt}"] = None
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(table_path, exist_ok=True)
    # the resolved full read applied any pending equality deletes, so the
    # re-bucketed table starts with a clean (delete-free) MOR state
    _commit_snapshot(table_path, new_map, new_buckets, schema, new_stats,
                     base_sid=base_sid, dir_stats=new_dir_stats,
                     dir_seq=new_dir_seq)
    _write_schema(table_path, schema)  # marker trails the commit (ADVICE r3)
    for b in _bucket_dirs(table_path):
        cur = os.path.join(table_path, b, "CURRENT")
        if os.path.exists(cur):
            os.remove(cur)
    _gc_versions(table_path)


def compact_table(spark: SparkSession, table_path: str,
                  max_files: int = 1) -> None:
    """Rewrite every bucket holding more than ``max_files`` data files into
    a single file, committed as ONE atomic snapshot (the explicit Iceberg
    ``rewrite_data_files`` analog; merges also auto-compact a bucket when
    its file count would pass AUTO_COMPACT_FILES). Row content unchanged —
    only the file layout; time travel still reads the pre-compaction
    snapshots until retention expires them.

    Offline maintenance op: a merge committing underneath raises
    CommitConflictError (no auto-retry; rerun — content is unchanged by
    compaction, so nothing is lost by deferring)."""
    import os
    import shutil
    import uuid

    state = _table_state(table_path)
    if not state:
        return
    base_sid = state["snapshot_id"]
    pending_dels = state.get("deletes") or {}
    # a bucket compacts when its data files pass the threshold OR it holds
    # merge-on-read equality-delete files — compaction is what reconciles
    # MOR state back to a single clean file (Iceberg rewrite_data_files
    # with delete-file compaction)
    todo = {
        b: _as_dirs(vs)
        for b, vs in state["buckets"].items()
        if len(_as_dirs(vs)) > max_files or pending_dels.get(b)
    }
    if not todo:
        return
    staging = f"{table_path}__staging_{uuid.uuid4().hex[:12]}"
    shutil.rmtree(staging, ignore_errors=True)
    # a legacy (pre-metadata) table has NO recorded bucket count — keep it
    # unrecorded (None) rather than stamping DEFAULT_MERGE_BUCKETS: a wrong
    # recorded count would override callers' n_buckets on later merges and
    # hash keys into the wrong bucket space (missed matches → duplicates)
    n_buckets = state.get("n_buckets")
    # each over-full bucket is read and rewritten independently (bounded:
    # only buckets past the threshold; rows already belong to their bucket)
    new_map = dict({b: _as_dirs(vs) for b, vs in state["buckets"].items()})
    new_stats = dict(state.get("stats") or {})
    new_dir_stats = dict(state.get("dir_stats") or {})
    new_deletes = {b: list(v) for b, v in pending_dels.items()}
    new_dir_seq = dict(state.get("dir_seq") or {})
    for b, vs in todo.items():
        # resolved read: applies the bucket's pending equality deletes
        # (which this rewrite then CLEARS) and resolves mixed-schema files
        # through the snapshot's recorded schema — footer inference could
        # drop an evolved column for the whole compacted bucket
        rows = _snapshot_scan(spark, table_path, state, buckets=[b],
                              strict=False)
        if rows is None:
            continue
        out = os.path.join(staging, b)
        rows.coalesce(1).write.mode("overwrite").parquet(out)
        bdir = os.path.join(table_path, b)
        nxt = _install_version(out, bdir)
        new_map[b] = [nxt]
        new_stats[b] = _bucket_file_stats(os.path.join(bdir, nxt))
        new_dir_stats[f"{b}/{nxt}"] = _dir_col_stats(os.path.join(bdir, nxt))
        new_dir_seq[f"{b}/{nxt}"] = None  # stamped with the commit's sid
        new_deletes.pop(b, None)  # applied by the rewrite
    shutil.rmtree(staging, ignore_errors=True)
    live_dirs = {f"{b}/{v}" for b, vs in new_map.items() for v in _as_dirs(vs)}
    new_dir_stats = {k: v for k, v in new_dir_stats.items() if k in live_dirs}
    new_dir_seq = {k: v for k, v in new_dir_seq.items() if k in live_dirs}
    new_deletes = {b: v for b, v in new_deletes.items() if b in new_map and v}
    from pyspark.sql.types import StructType

    schema = (
        StructType.fromJson(state["schema"]) if state.get("schema")
        else _read_schema(table_path)
    )
    _commit_snapshot(table_path, new_map, n_buckets, schema, new_stats,
                     base_sid=base_sid, dir_stats=new_dir_stats,
                     deletes=new_deletes, dir_seq=new_dir_seq,
                     delete_keys=state.get("delete_keys") if new_deletes else None)
    _gc_versions(table_path)


def _with_zorder_key(df: DataFrame, cols: list[str],
                     bits: int = 4) -> DataFrame:
    """Add an interleaved-bit ``__zkey`` column over ``cols`` (Z-order /
    Morton curve — the Iceberg ``rewrite_data_files`` Z-order strategy and
    Delta ``OPTIMIZE ZORDER BY`` analog).

    Per column: quantile split points (``2**bits`` ranks, approxQuantile
    with 1% relative error — rank-based, so skewed distributions still
    spread across ranks) map each value to a ``bits``-wide integer id;
    the ids' bits are then interleaved (bit b of column i lands at
    position ``b*ncols + i``), so rows close in EVERY dimension get close
    keys. Range-splitting on ``__zkey`` therefore makes each output
    chunk cover a tight hyper-rectangle: footer [min,max] bounds are
    tight on ALL clustered columns at once, and
    ``read_graph_table_pruned`` can skip dirs for a predicate on ANY of
    them — what a lexicographic sort order only gives the leading column.

    Supported column types: numeric, decimal, date, timestamp,
    timestamp_ntz (quantiles need a numeric proxy). NULLs sort into rank
    0 (absent footer bounds degrade to read-and-filter, never wrong
    results). All expression work is built-in Catalyst (aggregate over a
    broadcast literal array + shift/mask) — no UDF, shuffle-free."""
    from functools import reduce

    if bits * len(cols) > 63:
        # interleaved key must fit a signed 64-bit long: position
        # bits*ncols-1 may not reach the sign bit (Java shift wraps mod 64)
        raise ValueError(
            f"zorder_bits={bits} over {len(cols)} columns needs "
            f"{bits * len(cols)} key bits; the interleaved key is a BIGINT "
            f"so bits*ncols must be <= 63 — lower zorder_bits"
        )
    if "__zkey" in df.columns:
        raise ValueError(
            "table already has a column named '__zkey' — the z-order "
            "rewrite would overwrite and then drop it; rename the column"
        )
    n = 1 << bits
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    proxies = []
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if dt in ("date", "timestamp", "timestamp_ntz"):
            proxy = F.col(c).cast("timestamp").cast("double")
        elif dt in numeric or dt.startswith("decimal"):
            proxy = F.col(c).cast("double")
        else:
            raise ValueError(
                f"z-order needs numeric/date/timestamp columns; {c!r} is "
                f"{dt} — use lexicographic cluster_table for strings"
            )
        proxies.append(proxy)
    probs = [j / n for j in range(1, n)]
    pdf = df.select(*[p.alias(f"__z{i}") for i, p in enumerate(proxies)])
    all_splits = pdf.stat.approxQuantile(
        [f"__z{i}" for i in range(len(cols))], probs, 0.01
    )
    ids = []
    for proxy, splits in zip(proxies, all_splits):
        splits = sorted(set(splits))  # dedup ties: id stays < 2**bits
        if splits:
            idx = F.aggregate(
                F.array(*[F.lit(s) for s in splits]), F.lit(0),
                lambda acc, s: acc + F.when(proxy > s, 1).otherwise(0),
            )
        else:
            idx = F.lit(0)  # empty/all-null column: every row rank 0
        # bigint BEFORE shifting: with int ranks, Java shiftleft is mod 32
        # and positions >= 31 would wrap / hit the sign bit (ADVICE r4)
        ids.append(idx.cast("bigint"))
    ncols = len(cols)
    zbits = [
        F.shiftleft(F.shiftright(idx, b).bitwiseAND(F.lit(1)), b * ncols + i)
        for i, idx in enumerate(ids) for b in range(bits)
    ]
    return df.withColumn("__zkey", reduce(lambda a, b: a + b, zbits))


def cluster_table(spark: SparkSession, table_path: str,
                  sort_by: str | list[str],
                  files_per_bucket: int = 4,
                  zorder: bool = False,
                  zorder_bits: int = 4) -> None:
    """Sort-order clustering: rewrite every bucket's rows range-split on
    ``sort_by`` (a column, or a list for a composite lexicographic sort
    order) into up to ``files_per_bucket`` single-file version dirs, each
    sorted within itself — the Iceberg ``rewrite_data_files`` with a
    sort order. Buckets still hash on the MERGE keys (point lookups keep
    pruning); what changes is that each new dir covers a NARROW ``sort_by``
    range, so its recorded footer [min, max] bounds are tight and
    ``read_graph_table_pruned`` range scans skip whole dirs instead of
    reading everything (with a composite order, bounds on the LEADING
    column stay tight; trailing columns prune within leading-column ties —
    the same leading-column caveat as any lexicographic sort order). Row
    content is unchanged; pending merge-on-read deletes are folded away by
    the rewrite (same resolved read as compaction); time travel keeps the
    pre-cluster snapshots until retention expires them.

    ``zorder=True`` switches the range-split key to an interleaved-bit
    Morton key over ``sort_by`` (see ``_with_zorder_key``): chunks become
    tight hyper-rectangles instead of tight leading-column stripes, so
    range scans prune on ANY clustered column — multi-dimensional file
    skipping, the Iceberg Z-order rewrite strategy. Quantile ranks are
    computed per bucket (tighter than table-global, and each bucket is
    already rewritten independently). Numeric/date/timestamp columns only.

    Offline maintenance op, CAS-committed like ``compact_table``: a merge
    landing underneath raises CommitConflictError — rerun (content is
    unchanged by clustering, nothing is lost by deferring)."""
    import os
    import shutil
    import uuid

    state = _table_state(table_path)
    if not state:
        return
    sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
    if not sort_cols:
        raise ValueError("cluster_table needs at least one sort column")
    schema_cols = {
        f["name"] for f in (state.get("schema") or {}).get("fields", [])
    }
    for c in sort_cols:
        if schema_cols and c not in schema_cols:
            raise ValueError(f"cluster column {c!r} not in table schema")
    base_sid = state["snapshot_id"]
    n_buckets = state.get("n_buckets")
    k = max(1, files_per_bucket)
    staging = f"{table_path}__staging_{uuid.uuid4().hex[:12]}"
    shutil.rmtree(staging, ignore_errors=True)
    new_map: dict[str, list] = {}
    new_stats: dict[str, dict] = {}
    new_dir_stats: dict[str, dict] = {}
    new_dir_seq: dict[str, int | None] = {}
    for b in state["buckets"]:
        # resolved read: folds the bucket's pending equality deletes and
        # reads mixed-schema files through the snapshot schema
        rows = _snapshot_scan(spark, table_path, state, buckets=[b],
                              strict=False)
        if rows is None:
            continue
        out = os.path.join(staging, b)
        cached = None
        if zorder:
            # the z-order path reads the bucket twice (approxQuantile in
            # _with_zorder_key, then the rewrite) — persist around the
            # pair so the resolved scan runs once (ADVICE r4)
            cached = rows.persist()
            ranged = (
                _with_zorder_key(cached, sort_cols, zorder_bits)
                .repartitionByRange(k, F.col("__zkey"))
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
        else:
            ranged = rows.repartitionByRange(
                k, *[F.col(c) for c in sort_cols]
            ).sortWithinPartitions(*sort_cols)
        ranged.write.mode("overwrite").parquet(out)
        if cached is not None:
            cached.unpersist()
        parts = sorted(
            f for f in os.listdir(out)
            if f.endswith(".parquet") and
            os.path.getsize(os.path.join(out, f)) > 0 and
            not f.startswith(("_", "."))
        )
        bdir = os.path.join(table_path, b)
        os.makedirs(bdir, exist_ok=True)
        dirs: list[str] = []
        brows, bbytes, bfiles = 0, 0, 0
        for i, p in enumerate(parts):
            sub = os.path.join(staging, f"{b}__chunk{i}")
            os.makedirs(sub)
            os.rename(os.path.join(out, p), os.path.join(sub, p))
            nxt = _install_version(sub, bdir)
            vdir = os.path.join(bdir, nxt)
            fs = _bucket_file_stats(vdir)
            if fs.get("rows", 0) == 0:
                # empty range chunk (fewer distinct values than k): drop it
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            dirs.append(nxt)
            brows += fs.get("rows", 0)
            bbytes += fs.get("bytes", 0)
            bfiles += fs.get("files", 0)
            new_dir_stats[f"{b}/{nxt}"] = _dir_col_stats(vdir)
            new_dir_seq[f"{b}/{nxt}"] = None  # stamped with the commit sid
        if dirs:
            new_map[b] = dirs
            new_stats[b] = {"rows": brows, "bytes": bbytes, "files": bfiles}
    shutil.rmtree(staging, ignore_errors=True)
    from pyspark.sql.types import StructType

    schema = (
        StructType.fromJson(state["schema"]) if state.get("schema")
        else _read_schema(table_path)
    )
    _commit_snapshot(table_path, new_map, n_buckets, schema, new_stats,
                     base_sid=base_sid, dir_stats=new_dir_stats,
                     deletes={}, dir_seq=new_dir_seq, delete_keys=None)
    _gc_versions(table_path)
