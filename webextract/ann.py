"""Approximate nearest neighbors over an ``array<float>`` embedding column.

Two paths, mirroring a production vector pipeline:

- ``cosine_topk`` — exact brute force, restricted to an explicit query-id
  list: the small-scale baseline / recall oracle. All-pairs by design;
  never the scale path.
- ``lsh_buckets`` + ``bucketed_topk`` — the scale path: assign each
  vector to a hyperplane-sign bucket (deterministic pseudo-planes,
  w(i, j) = ((i·(7j+3)) mod 11) − 5 over 0-based dim i), co-partition by
  bucket, rank EXACT cosine within the bucket only. Candidates shrink
  from O(N) to O(N/2^planes); the shuffle key is the bucket, so a search
  is one partition-local sort — no global top-k.

Hot buckets (a dense embedding cluster collapsing into one bucket) are
the quadratic hazard at 100 TB: ``bucketed_topk(bucket_cap=…)``
rank-limits the CANDIDATE side of each bucket deterministically (by id)
so one degenerate bucket cannot go O(b²); query vectors are never
dropped, they just rank against the capped candidate set.

Semantics pinned by the driver's DuckDB oracles (__spark_entry__:
ann_lsh_buckets / ann_lsh_topk / cosine_topk_bruteforce /
embedding_near_dup_pairs). Ranking uses the ROUNDED cosine with an id
tiebreak so engines agree on neighbor sets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel

DEFAULT_PLANES = 8
DEFAULT_BUCKET_CAP = 64


def flatten(emb: DataFrame, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """(id, i, e): 0-based position-exploded components."""
    return emb.select(id_col, F.posexplode(vec_col).alias("i", "e"))


def norms(flat: DataFrame, id_col: str = "vec_id") -> DataFrame:
    return flat.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("e").cast("double") * F.col("e").cast("double")))
        .alias("n"))


def lsh_buckets(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding",
                n_planes: int = DEFAULT_PLANES,
                persist: bool = True) -> DataFrame:
    """(id, bucket): hyperplane-sign LSH — one groupBy over the flattened
    vectors computes every projection (map-side combined), no per-plane
    pass. Persisted by default: every downstream join fans out over it."""
    flat = flatten(emb, id_col, vec_col)
    projs = [
        F.sum(F.col("e").cast("double")
              * ((F.col("i") * (7 * j + 3)) % 11 - 5).cast("double")).alias(f"p{j}")
        for j in range(n_planes)
    ]
    proj = flat.groupBy(id_col).agg(*projs)
    bucket = None
    for j in range(n_planes):
        term = F.when(F.col(f"p{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    out = proj.select(id_col, bucket.cast("bigint").alias("bucket"))
    return out.persist(StorageLevel.MEMORY_AND_DISK) if persist else out


def bucketed_topk(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding", k: int = 1,
                  n_planes: int = DEFAULT_PLANES,
                  bucket_cap: int | None = DEFAULT_BUCKET_CAP,
                  nd: int = 4) -> DataFrame:
    """(q_id, neighbor_id, cosine): each vector's top-k neighbors WITHIN
    its LSH bucket — exact cosine, partition-local ranking."""
    bkt = lsh_buckets(emb, id_col, vec_col, n_planes)
    return _topk_within(emb, bkt, id_col, vec_col, k, bucket_cap, nd)


def ivf_centroids(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  n_cells: int = 16) -> DataFrame:
    """(cell_id, cvec): deterministic sampled centroids — the ``n_cells``
    corpus vectors with the smallest md5(id). Sampling (instead of
    k-means iterations) keeps the structure reproducible and
    oracle-replayable; at production scale you swap in trained k-means
    centroids without changing any downstream plan shape."""
    return (
        emb.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec"))
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, bucket): nearest-centroid cell per vector. Distances fold
    LEFT-TO-RIGHT over the array (F.aggregate) in pure double — the same
    deterministic op sequence the DuckDB oracle replays, so assignments
    are engine-exact (no groupBy-order float drift). The centroid side is
    tiny and broadcast; the cross join is N×C rows of (id, cell, dist),
    never materialized vectors."""
    sq = F.zip_with(
        F.col(vec_col), F.col("cvec"),
        lambda a, b: (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double")),
    )
    dist = F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
    assign = emb.crossJoin(F.broadcast(centroids)).select(
        id_col, "cell_id", dist.alias("dist"))
    # argmin via min(struct(dist, cell_id)) — lexicographic struct min IS
    # argmin-with-id-tiebreak, and a hash aggregate (map-side combined)
    # beats a row_number window (full sort of N×C rows) at scale
    return (
        assign.groupBy(id_col)
        .agg(F.min(F.struct("dist", "cell_id")).alias("_best"))
        .select(id_col, F.col("_best.cell_id").alias("bucket"))
    )


def ivf_topk(emb: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", k: int = 1, n_cells: int = 16,
             bucket_cap: int | None = DEFAULT_BUCKET_CAP,
             nd: int = 4) -> DataFrame:
    """IVF search: assign → co-partition by cell → exact cosine rank
    within the cell (probe=1). Same scale shape as bucketed_topk with
    data-adaptive cells instead of fixed hyperplanes."""
    cells = ivf_assign(emb, ivf_centroids(emb, id_col, vec_col, n_cells),
                       id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    return _topk_within(emb, cells, id_col, vec_col, k, bucket_cap, nd)


def _topk_within(emb: DataFrame, bkt: DataFrame, id_col: str, vec_col: str,
                 k: int, bucket_cap: int | None, nd: int) -> DataFrame:
    """Shared within-bucket exact-cosine ranking (LSH and IVF paths):
    candidate side capped deterministically; queries never dropped."""
    flat = flatten(emb, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    nrm = norms(flat, id_col)
    cand = bkt
    if bucket_cap is not None:
        w = Window.partitionBy("bucket").orderBy(id_col)
        cand = (bkt.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= bucket_cap).drop("_rk"))
    a, b = bkt.alias("a"), cand.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
    ).select(F.col(f"a.{id_col}").alias("q_id"),
             F.col(f"b.{id_col}").alias("c_id"))
    q, c = flat.alias("q"), flat.alias("c")
    dots = (
        pairs.join(q, F.col(f"q.{id_col}") == F.col("q_id"))
        .join(c, (F.col(f"c.{id_col}") == F.col("c_id"))
              & (F.col("q.i") == F.col("c.i")))
        .groupBy("q_id", "c_id")
        .agg(F.sum(F.col("q.e").cast("double") * F.col("c.e").cast("double"))
             .alias("dot"))
    )
    nq, nc = nrm.alias("nq"), nrm.alias("nc")
    sims = (
        dots.join(nq, F.col(f"nq.{id_col}") == F.col("q_id"))
        .join(nc, F.col(f"nc.{id_col}") == F.col("c_id"))
        .select("q_id", "c_id",
                F.round(F.col("dot") / (F.col("nq.n") * F.col("nc.n")), nd)
                .alias("cosine"))
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        sims.withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") <= k)
        .select("q_id", F.col("c_id").alias("neighbor_id"), "cosine")
    )


def cosine_topk(emb: DataFrame, query_ids: list, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                nd: int = 4) -> DataFrame:
    """Exact brute-force top-k for an explicit (small) query set — the
    baseline the bucketed path approximates. (q_id, rank, neighbor_id,
    cosine)."""
    flat = flatten(emb, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    nrm = norms(flat, id_col)
    q = flat.filter(F.col(id_col).isin(query_ids)).alias("q")
    c = flat.alias("c")
    dots = (
        q.join(c, (F.col("q.i") == F.col("c.i"))
               & (F.col(f"q.{id_col}") != F.col(f"c.{id_col}")))
        .groupBy(F.col(f"q.{id_col}").alias("q_id"),
                 F.col(f"c.{id_col}").alias("c_id"))
        .agg(F.sum(F.col("q.e").cast("double") * F.col("c.e").cast("double"))
             .alias("dot"))
    )
    nq, nc = nrm.alias("nq"), nrm.alias("nc")
    sims = (
        dots.join(nq, F.col(f"nq.{id_col}") == F.col("q_id"))
        .join(nc, F.col(f"nc.{id_col}") == F.col("c_id"))
        .select("q_id", "c_id",
                F.round(F.col("dot") / (F.col("nq.n") * F.col("nc.n")), nd)
                .alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("c_id").alias("neighbor_id"), "cosine")
    )


def bucketed_near_dups(emb: DataFrame, threshold: float,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_planes: int = DEFAULT_PLANES,
                       bucket_cap: int | None = DEFAULT_BUCKET_CAP,
                       nd: int = 4) -> DataFrame:
    """Near-duplicate pairs ABOVE a cosine threshold, searched only
    within LSH buckets — the scale path near_dup_pairs approximates
    exactly at O(N²): here candidates are bucket-local (high-cosine
    pairs land in the same sign-bucket with high probability; more
    planes / multi-probe trade recall for cost)."""
    bkt = lsh_buckets(emb, id_col, vec_col, n_planes)
    cand = bkt
    if bucket_cap is not None:
        w = Window.partitionBy("bucket").orderBy(id_col)
        cand = (bkt.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= bucket_cap).drop("_rk"))
    a, b = cand.alias("a"), cand.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(F.col(f"a.{id_col}").alias("vec_a"),
             F.col(f"b.{id_col}").alias("vec_b"))
    flat = flatten(emb, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    nrm = norms(flat, id_col)
    q, c = flat.alias("q"), flat.alias("c")
    dots = (
        pairs.join(q, F.col(f"q.{id_col}") == F.col("vec_a"))
        .join(c, (F.col(f"c.{id_col}") == F.col("vec_b"))
              & (F.col("q.i") == F.col("c.i")))
        .groupBy("vec_a", "vec_b")
        .agg(F.sum(F.col("q.e").cast("double") * F.col("c.e").cast("double"))
             .alias("dot"))
    )
    na, nb = nrm.alias("na"), nrm.alias("nb")
    return (
        dots.join(na, F.col(f"na.{id_col}") == F.col("vec_a"))
        .join(nb, F.col(f"nb.{id_col}") == F.col("vec_b"))
        .filter(F.col("dot") / (F.col("na.n") * F.col("nb.n")) >= threshold)
        .select("vec_a", "vec_b",
                F.round(F.col("dot") / (F.col("na.n") * F.col("nb.n")), nd)
                .alias("cosine"))
    )


def near_dup_pairs(emb: DataFrame, threshold: float,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   nd: int = 4) -> DataFrame:
    """All pairs above a cosine threshold — EXACT baseline (O(N²) dot
    products); the scale path is bucketed_topk or an IVF variant."""
    flat = flatten(emb, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    nrm = norms(flat, id_col)
    a, b = flat.alias("a"), flat.alias("b")
    dots = (
        a.join(b, (F.col("a.i") == F.col("b.i"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("vec_a"),
                 F.col(f"b.{id_col}").alias("vec_b"))
        .agg(F.sum(F.col("a.e").cast("double") * F.col("b.e").cast("double"))
             .alias("dot"))
    )
    na, nb = nrm.alias("na"), nrm.alias("nb")
    return (
        dots.join(na, F.col(f"na.{id_col}") == F.col("vec_a"))
        .join(nb, F.col(f"nb.{id_col}") == F.col("vec_b"))
        .filter(F.col("dot") / (F.col("na.n") * F.col("nb.n")) >= threshold)
        .select("vec_a", "vec_b",
                F.round(F.col("dot") / (F.col("na.n") * F.col("nb.n")), nd)
                .alias("cosine"))
    )
