"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path alongside the LSH variant (similarity.py).

Index = k centroids (deterministic seeded init + a few Lloyd iterations,
all DataFrame ops) + a cluster assignment per vector. Search scores only
the vectors in the ``nprobe`` clusters nearest to the query: a 10^9-row
corpus at k=4096 / nprobe=8 scores ~0.2% of vectors per query instead of
a full scan, and the cluster column doubles as the partition key so each
probe touches a bounded set of files.

Everything is JVM-side expression code: distance chains fold to
whole-stage-codegen arithmetic; centroid refresh is one groupBy over
per-dimension averages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataval_spark.operators.similarity import rank_topk


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    d = None
    for i, c in enumerate(centroid):
        t = vec[i].cast("double") - F.lit(float(c))
        sq = t * t
        d = sq if d is None else d + sq
    return d


def _dist_structs(vec: Column, centroids: list[list[float]]) -> Column:
    """Sorted array of (distance, centroid-idx) structs — struct ordering
    sorts by distance first, index as deterministic tie-break."""
    return F.array_sort(
        F.array(*[
            F.struct(_sq_dist(vec, c).alias("d"), F.lit(j).alias("j"))
            for j, c in enumerate(centroids)
        ])
    )


def _assign(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin over squared distances. Uses array_sort over (d, j) structs
    — O(k·dim) expression nodes. A when-chain argmin embeds the running
    best twice per step, doubling the expression tree each centroid
    (O(2^k) plan nodes): Catalyst hangs at k=16 before reading any data."""
    return F.element_at(_dist_structs(vec, centroids), 1).getField("j")


def train_centroids(
    df: DataFrame, dim: int, k: int = 16,
    vec_col: str = "embedding", id_col: str = "vec_id", iters: int = 2,
) -> list[list[float]]:
    """Deterministic k-means-lite: init = the k rows with the smallest
    xxhash64(id) (a seedless deterministic sample), then ``iters`` Lloyd
    steps where each step is one distributed assignment + one groupBy of
    per-dimension means."""
    init = (
        df.orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init]
    for _ in range(iters):
        assigned = df.withColumn("_c", _assign(F.col(vec_col), centroids))
        means = (
            assigned.groupBy("_c")
            .agg(*[F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        new = list(centroids)
        for r in means:
            new[r["_c"]] = [float(r[f"m{i}"]) for i in range(dim)]
        centroids = new
    return centroids


def build_index(
    df: DataFrame, centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the cluster id. In production this DataFrame is written
    partitioned by ``_cluster`` so probes prune files."""
    return df.withColumn("_cluster", _assign(F.col(vec_col), centroids))


def ivf_topk(
    index: DataFrame, centroids: list[list[float]], queries: DataFrame,
    k: int = 5, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe the nprobe nearest clusters per query, score only those
    vectors, return the cosine top-k with deterministic tie-break."""
    q = queries.withColumn(
        "_probes",
        F.slice(_dist_structs(F.col(query_vec_col), centroids), 1, nprobe).getField("j"),
    )
    q = q.withColumn("_cluster", F.explode("_probes")).drop("_probes")
    joined = index.join(F.broadcast(q), "_cluster")
    return rank_topk(joined, k, id_col, vec_col, query_id_col, query_vec_col)
