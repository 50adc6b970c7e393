"""Semantic dedup (SemDeDup composition) vs a numpy brute-force mirror.

Clustering quality is NOT assumed: identical vectors share an argmin
whatever the trained centroids, and the mirror recomputes pairs from the
engine's OWN cluster assignments, so the checks hold for any k-means
outcome."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from dataval_spark.operators.ivf import build_index, train_centroids
from dataval_spark.operators.semdedup import semantic_dedup, within_cluster_pairs

DIM = 8
THRESH = 0.97


def _mk_docs():
    rng = np.random.RandomState(2187)
    centers = np.zeros((3, DIM))
    centers[0, 0] = centers[1, 1] = centers[2, 2] = 10.0
    docs = []

    def add(name, vec):
        docs.append((name, [float(x) for x in vec]))

    # group A: one exact duplicate pair + one near duplicate
    base_a = centers[0] + rng.normal(0, 0.05, DIM)
    add("a1", base_a)
    add("a2", base_a)  # exact dup
    add("a3", base_a * 1.01 + rng.normal(0, 0.01, DIM))  # near dup
    # group B: exact triplet
    base_b = centers[1] + rng.normal(0, 0.05, DIM)
    for i in (1, 2, 3):
        add(f"b{i}", base_b)
    # singletons: same cluster as A/B but NOT similar enough
    far_a = centers[0] + np.concatenate(([0.0], rng.normal(0, 4.0, DIM - 1)))
    add("s1", far_a)
    add("s2", centers[2] + rng.normal(0, 0.05, DIM))
    # dirty vectors: NULL, ragged, NULL element
    docs.append(("x_null", None))
    docs.append(("x_ragged", [1.0, 2.0]))
    docs.append(("x_hole", [1.0] * (DIM - 1) + [None]))
    return docs


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        _mk_docs(), "doc_id string, embedding array<double>"
    ).repartition(4)


def _valid(v):
    return (
        v is not None
        and len(v) == DIM
        and all(x is not None for x in v)
        and float(np.linalg.norm(v)) > 0
    )


def _mirror_pairs(docs, assign):
    """Brute-force same-cluster cosine pairs from the engine's own
    assignment map."""
    out = set()
    for (ida, va), (idb, vb) in itertools.combinations(sorted(docs), 2):
        if not (_valid(va) and _valid(vb)):
            continue
        if assign[ida] != assign[idb] or assign[ida] < 0:
            continue
        sim = round(
            float(np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb))), 4
        )
        if sim >= THRESH:
            out.add((ida, idb))
    return out


def test_pairs_match_numpy_mirror(spark, docs_df):
    docs = _mk_docs()
    centroids = train_centroids(docs_df, DIM, k=3, id_col="doc_id")
    indexed = build_index(docs_df, centroids)
    assign = {r["doc_id"]: r["_cluster"] for r in indexed.collect()}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in within_cluster_pairs(indexed, DIM, THRESH).collect()
    }
    assert got == _mirror_pairs(docs, assign)
    # the planted duplicate groups must be in there for the test to mean
    # anything (identical vectors always share an argmin)
    assert ("a1", "a2") in got and ("b1", "b2") in got


def test_min_id_keeps_one_per_group_and_all_singletons(docs_df):
    res = semantic_dedup(docs_df, DIM, k=3, threshold=THRESH, id_col="doc_id")
    kept = {r["doc_id"] for r in res.kept.collect()}
    # exactly one survivor per planted group, the min id
    assert {"a1", "b1"} <= kept
    assert not kept & {"a2", "a3", "b2", "b3"}
    # singletons and dirty vectors all survive
    assert {"s1", "s2", "x_null", "x_ragged", "x_hole"} <= kept
    # labels cover exactly the pair endpoints
    labeled = {r["doc"] for r in res.labels.collect()}
    assert labeled == {"a1", "a2", "a3", "b1", "b2", "b3"}


def test_centroid_far_keeps_least_typical(docs_df):
    res = semantic_dedup(
        docs_df, DIM, k=3, threshold=THRESH, id_col="doc_id", keep="centroid_far"
    )
    kept = {r["doc_id"] for r in res.kept.collect()}
    docs = dict(_mk_docs())
    # group A survivor = member with LOWEST cosine to its centroid
    comp = {"a1", "a2", "a3"}
    cluster_of = None
    for r in res.labels.collect():
        if r["doc"] in comp:
            cluster_of = r["cluster"]
    assert cluster_of is not None
    # recompute the policy with numpy over the returned centroids
    cent = None
    for r_doc in ("a1",):
        v = np.array(docs[r_doc])
        sims = [
            float(np.dot(v, c) / (np.linalg.norm(v) * np.linalg.norm(c)))
            for c in res.centroids
        ]
        cent = int(np.argmax(sims))
    csims = {
        d: float(
            np.dot(docs[d], res.centroids[cent])
            / (np.linalg.norm(docs[d]) * np.linalg.norm(res.centroids[cent]))
        )
        for d in comp
    }
    want = min(comp, key=lambda d: (round(csims[d], 12), d))
    assert want in kept and len(kept & comp) == 1
    # one survivor per group under this policy too
    assert len(kept & {"b1", "b2", "b3"}) == 1


def test_sub_planes_never_lose_exact_duplicates(docs_df):
    res = semantic_dedup(
        docs_df, DIM, k=3, threshold=THRESH, id_col="doc_id", sub_planes=4
    )
    got = {(r["doc_a"], r["doc_b"]) for r in res.pairs.collect()}
    # identical vectors share every sign-plane bucket
    assert ("a1", "a2") in got
    assert ("b1", "b2") in got and ("b2", "b3") in got and ("b1", "b3") in got


def test_bad_keep_policy_raises(docs_df):
    with pytest.raises(ValueError, match="keep policy"):
        semantic_dedup(docs_df, DIM, keep="best_vibes")


def test_no_valid_vectors_keeps_everything(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", [1.0, 2.0]), ("c", [1.0] * (DIM - 1) + [None])],
        "doc_id string, embedding array<double>",
    )
    res = semantic_dedup(df, DIM, k=4, id_col="doc_id")
    assert res.kept.count() == 3
    assert res.labels.count() == 0 and res.pairs.count() == 0
    assert res.centroids == []


def test_fewer_valid_vectors_than_k_degrades(spark):
    rows = [("a", [1.0] + [0.0] * (DIM - 1)),
            ("b", [1.0] + [0.0] * (DIM - 1)),
            ("c", None), ("d", None), ("e", None)]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    res = semantic_dedup(df, DIM, k=16, threshold=0.99, id_col="doc_id")
    # identical pair still found and collapsed; k silently degraded to 2
    kept = {r["doc_id"] for r in res.kept.collect()}
    assert kept == {"a", "c", "d", "e"}
    assert len(res.centroids) <= 2
