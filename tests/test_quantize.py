"""Int8 quantization: reconstruction bounds, cosine invariance, and
drop-in top-k recall through the existing ANN operators."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from dataval_spark.operators.quantize import (
    dequantize_vec,
    quantize_embeddings,
)
from dataval_spark.operators.similarity import brute_force_topk, cosine

DIM = 16


def _vectors():
    rng = np.random.RandomState(42)
    rows = []
    for i in range(200):
        v = rng.normal(0, 1 + (i % 5), DIM)
        rows.append((f"v{i:03d}", [float(x) for x in v]))
    rows.append(("zero", [0.0] * DIM))
    rows.append(("null", None))
    return rows


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(_vectors(), "vec_id string, embedding array<double>")


def test_roundtrip_error_bounded_by_half_scale(vecs):
    q = quantize_embeddings(vecs)
    rows = q.where(F.col("embedding").isNotNull()).select(
        "vec_id", "embedding", dequantize_vec(F.col("qvec"), F.col("qscale")).alias("deq"),
        "qscale",
    ).collect()
    assert len(rows) == 201
    for r in rows:
        s = r["qscale"]
        for orig, rec in zip(r["embedding"], r["deq"]):
            assert abs(orig - rec) <= (s / 2 if s else 0.0) + 1e-12, r["vec_id"]


def test_quantized_values_in_int8_range(vecs):
    q = quantize_embeddings(vecs)
    mx = q.where(F.col("qvec").isNotNull()).select(
        F.array_max(F.transform(F.col("qvec").cast("array<int>"), F.abs)).alias("m")
    ).agg(F.max("m")).first()[0]
    assert mx <= 127


def test_cosine_scale_invariance(spark, vecs):
    """cos(q_a, q_b) tracks cos(a, b) without touching the scales."""
    q = quantize_embeddings(vecs).where(
        F.col("embedding").isNotNull() & (F.col("qscale") > 0)
    )
    a, b = q.alias("a"), q.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cf"),
            cosine(F.col("a.qvec"), F.col("b.qvec")).alias("cq"),
        )
        .limit(2000)
        .collect()
    )
    assert pairs
    worst = max(abs(r["cf"] - r["cq"]) for r in pairs)
    assert worst < 0.02, f"worst cosine drift {worst}"


def test_topk_recall_through_existing_operator(spark, vecs):
    """The quantized column drops into brute_force_topk unchanged; the
    float and int8 top-10 neighbor sets overlap heavily."""
    base = vecs.where(F.col("embedding").isNotNull())
    q = quantize_embeddings(base)
    queries = base.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qqueries = quantize_embeddings(
        base.limit(5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        ),
        vec_col="query_vec", out_col="query_q", scale_col="qs",
    ).select("query_id", F.col("query_q").alias("query_vec"))

    top_f = brute_force_topk(base, queries, k=10)
    top_q = brute_force_topk(
        q.select("vec_id", F.col("qvec").alias("embedding")), qqueries, k=10
    )
    by_q_f, by_q_q = {}, {}
    for r in top_f.collect():
        by_q_f.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in top_q.collect():
        by_q_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid, want in by_q_f.items():
        got = by_q_q[qid]
        assert len(want & got) >= 8, f"{qid}: {len(want & got)}/10 recall"


def test_zero_and_null_vectors_degrade(vecs):
    q = quantize_embeddings(vecs)
    z = q.where(F.col("vec_id") == "zero").first()
    assert z["qscale"] == 0.0 and all(x == 0 for x in z["qvec"])
    n = q.where(F.col("vec_id") == "null").first()
    assert n["qvec"] is None and n["qscale"] is None


def test_no_shuffle(vecs):
    plan = quantize_embeddings(vecs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
