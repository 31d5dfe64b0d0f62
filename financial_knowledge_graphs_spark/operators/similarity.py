"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query set
  against the corpus, window top-k. The baseline and the verifier for the
  approximate path.
- ``lsh_topk``: random-hyperplane LSH — deterministic md5-derived planes,
  sign-bucket join, cosine only within matching buckets (multi-probe via
  band structs). The 100 TB path: candidate generation is an equi-join on
  bucket keys instead of a cross product.

Vectors are cast to double arrays; cosine is built-in higher-order
functions (JVM-side), no Python in the scoring loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_with_norms_expr, norm_expr


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query (excluding self): broadcast-join the
    query set, score all pairs, keep rank ≤ k. One shuffle (the window).
    Norms precomputed once per vector (bit-identical, see
    cosine_with_norms_expr) — per-pair work is one dot product."""
    corpus = embeddings.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).cast("array<double>").alias("v_i")
    ).withColumn("n_i", norm_expr(F.col("v_i")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("v_q")
    ).withColumn("n_q", norm_expr(F.col("v_q")))
    scored = corpus.join(F.broadcast(q), F.col("item_id") != F.col("query_id")).select(
        "query_id", "item_id",
        F.round(cosine_with_norms_expr(F.col("v_q"), F.col("v_i"),
                                       F.col("n_q"), F.col("n_i")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def _plane(seed: str, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible
    everywhere, no RNG state to ship."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        for j in range(0, 32, 8):
            if len(vals) >= dim:
                break
            vals.append(int(h[j:j + 8], 16) / float(0xFFFFFFFF) - 0.5)
        i += 1
    return vals


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign bucket: one bit per hyperplane (dot ≥ 0)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(x) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_planes: int = 6, n_tables: int = 4,
             max_block: int = 2000) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent sign-LSH tables of
    ``n_planes`` bits; candidates = items sharing a bucket with the query in
    ANY table; exact cosine re-rank of candidates only.

    Two scale guards (same discipline as the dedup family): item buckets
    larger than ``max_block`` are purged — a degenerate corpus (many
    near-identical or zero vectors) would otherwise regress to the full
    items×queries cross product this path exists to avoid (recall for
    vectors in purged buckets degrades to their OTHER tables' buckets);
    and candidate (query_id, item_id) pairs are deduped ID-ONLY before the
    vectors are joined back, so each dim-sized array crosses the shuffle
    once per side instead of riding every candidate row."""
    tables = [
        [_plane(f"t{t}p{p}", dim) for p in range(n_planes)] for t in range(n_tables)
    ]

    def with_buckets(df: DataFrame, idc: str, vc: str) -> DataFrame:
        v = F.col(vc).cast("array<double>")
        bucket_structs = F.array(
            *[
                F.struct(F.lit(t).alias("table"), lsh_bucket_expr(v, tables[t]).alias("bucket"))
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(idc), v.alias("v"), F.explode(bucket_structs).alias("bk")
        ).select(idc, "v", F.col("bk.table").alias("table"), F.col("bk.bucket").alias("bucket"))

    items = with_buckets(embeddings, id_col, vec_col).withColumnRenamed(id_col, "item_id").withColumnRenamed("v", "v_i")
    qs = with_buckets(queries, id_col, vec_col).withColumnRenamed(id_col, "query_id").withColumnRenamed("v", "v_q")

    item_keys = items.select("table", "bucket", "item_id")
    big = (
        item_keys.groupBy("table", "bucket")
        .agg(F.count(F.lit(1)).alias("bs"))
        .filter(F.col("bs") > max_block)
    )
    item_keys = item_keys.join(F.broadcast(big), ["table", "bucket"], "left_anti")
    cand_ids = (
        item_keys.join(
            F.broadcast(qs.select("table", "bucket", "query_id")),
            ["table", "bucket"],
        )
        .filter(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    item_vecs = embeddings.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("v_i"),
    ).withColumn("n_i", norm_expr(F.col("v_i")))
    query_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v_q"),
    ).withColumn("n_q", norm_expr(F.col("v_q")))
    scored = (
        cand_ids.join(item_vecs, "item_id")
        .join(F.broadcast(query_vecs), "query_id")
        .select(
            "query_id", "item_id",
            F.round(cosine_with_norms_expr(F.col("v_q"), F.col("v_i"),
                                           F.col("n_q"), F.col("n_i")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = 16, nprobe: int = 2) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer
    alternative to sign-LSH (``lsh_topk``).

    Coarse centroids are the ``n_cells`` corpus vectors with the smallest
    md5(ivf:id) — a deterministic random sample, i.e. IVF with a
    random-subset quantizer (the honest baseline; Lloyd refinement changes
    the centroids, not the plan shape). Every item is assigned to its
    nearest centroid (one broadcast join + per-item argmin — no shuffle);
    a query probes its ``nprobe`` nearest cells; exact cosine re-ranks only
    the items in probed cells. At 100 TB the cell id becomes the table's
    partition key so a probe prunes partitions instead of filtering rows.
    """
    e = embeddings.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("n", norm_expr(F.col("v")))
    cents = (
        e.withColumn("r", F.md5(F.concat(F.lit("ivf:"), F.col("item_id").cast("string"))))
        .orderBy("r", "item_id")
        .limit(n_cells)
        .select(F.col("item_id").alias("cell_id"), F.col("v").alias("cv"),
                F.col("n").alias("ncv"))
    )
    bc = F.broadcast(cents)

    def cells_of(df: DataFrame, idc: str, n_keep: int) -> DataFrame:
        scored = df.join(bc, how="cross").select(
            idc, "v", "n", "cell_id",
            cosine_with_norms_expr(F.col("v"), F.col("cv"),
                                   F.col("n"), F.col("ncv")).alias("cd"),
        )
        w = Window.partitionBy(idc).orderBy(F.desc("cd"), F.asc("cell_id"))
        return (
            scored.withColumn("cr", F.row_number().over(w))
            .filter(F.col("cr") <= n_keep)
            .select(idc, "v", "n", "cell_id")
        )

    items = cells_of(e, "item_id", 1)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("n", norm_expr(F.col("v")))
    probes = (cells_of(q, "query_id", nprobe)
              .withColumnRenamed("v", "v_q").withColumnRenamed("n", "n_q"))
    cands = (
        items.join(F.broadcast(probes), "cell_id")
        .filter(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id", "v_q", "n_q",
                F.col("v").alias("v_i"), F.col("n").alias("n_i"))
        .dropDuplicates(["query_id", "item_id"])
    )
    scored = cands.select(
        "query_id", "item_id",
        F.round(cosine_with_norms_expr(F.col("v_q"), F.col("v_i"),
                                       F.col("n_q"), F.col("n_i")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int = 5) -> float:
    """Fraction of exact top-k pairs recovered by the approximate search."""
    e = exact.filter(F.col("rank") <= k).select("query_id", "item_id")
    a = approx.filter(F.col("rank") <= k).select("query_id", "item_id")
    hit = e.join(a, ["query_id", "item_id"]).count()
    total = e.count()
    return hit / total if total else 1.0
