"""Int8 embedding quantization for the similarity/ANN family.

At 100 TB an embedding store is usually the largest single column:
10^9 docs x 1024-dim float32 is ~4 TB; int8 cuts storage, shuffle
volume, and scan IO 4x. This module implements the standard symmetric
per-vector scheme (absmax scaling, the same recipe as FAISS's SQ8 /
LLM.int8 activation quantization):

    scale = max(|x|) / 127        q_i = round(x_i / scale)  in [-127, 127]

COSINE IS SCALE-INVARIANT: cos(q_a, q_b) = cos(a/s_a, b/s_b) up to
rounding noise, because each vector's scale factor cancels in the
normalized dot product. So the quantized column drops straight into the
existing operators — `similarity.cosine`, `brute_force_topk`,
`lsh_topk`, `cosine_near_dup_pairs`, and `semdedup.semantic_dedup` all
cast their input to array<double> internally and never look at the
scale. The scale column is only needed to reconstruct magnitudes
(`dequantize`) for L2 / dot-product consumers.

Everything is a JVM-side higher-order function over the vector array —
no shuffle, no Python, fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quantize_vec",
    "quantize_scale",
    "dequantize_vec",
    "quantize_embeddings",
]


def _absmax(vec: Column) -> Column:
    return F.array_max(F.transform(vec.cast("array<double>"), F.abs))


def quantize_scale(vec: Column) -> Column:
    """Per-vector scale (absmax / 127). NULL for NULL vectors; 0.0 for
    all-zero vectors (whose quantized form is all zeros)."""
    return _absmax(vec) / F.lit(127.0)


def quantize_vec(vec: Column) -> Column:
    """array<tinyint> symmetric quantization. Zero vectors map to all
    zeros (try_divide keeps the 0/0 lane NULL-free via coalesce).
    NULL *elements* inside a vector also quantize to 0 — callers that
    must treat such vectors as invalid should filter with
    `similarity.vector_ok` first (the ANN operators already do)."""
    v = vec.cast("array<double>")
    s = quantize_scale(vec)
    return F.transform(
        v,
        lambda x: F.coalesce(F.round(F.try_divide(x, s)), F.lit(0.0)).cast(
            "tinyint"
        ),
    )


def dequantize_vec(qvec: Column, scale: Column) -> Column:
    """Reconstruct approximate float values: q_i * scale."""
    return F.transform(qvec.cast("array<double>"), lambda q: q * scale)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "qscale",
    drop_source: bool = False,
) -> DataFrame:
    """Attach the quantized column + its scale; optionally drop the
    float source (the production move — the 4x is only realized if the
    float column stops being stored/shuffled)."""
    out = df.withColumn(out_col, quantize_vec(F.col(vec_col))).withColumn(
        scale_col, quantize_scale(F.col(vec_col))
    )
    return out.drop(vec_col) if drop_source else out
