"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (no image/audio libraries in this container —
see the NotImplementedError / deterministic-fake seam below); everything
Spark-side is real and tested: schema, batch iteration shape, partition
sizing, and the mapInPandas signature a production decoder would plug
into. Reference analog: the FITS sidecar-file readers
(/root/reference/dataval/special/check_sumimage.py:41-66) — binary blobs
validated per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, checksum string, feat array<float>"


def decode_image(payload: bytes) -> object:
    """Plug-in point for a real decoder (PIL/libvips). Not available in
    this environment."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; production deployments inject a decoder here"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode+embed: byte histogram moments.
    Keeps the pipeline testable end-to-end without media libraries."""
    if not payload:
        return [0.0] * dim
    return [payload[i % len(payload)] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow streams batches of (media_id, kind, payload) into Python; each
    batch yields one output frame — the exact shape a real decode /
    resize / frame-sample stage uses. Partition sizing note: binary
    payloads make rows wide, so upstream should
    ``spark.sql.files.maxPartitionBytes`` down (or repartition) to keep a
    batch within executor memory.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "checksum": payloads.map(
                        lambda b: hashlib.sha1(b or b"").hexdigest()
                    ),
                    "feat": payloads.map(lambda b: _fake_feature(b or b"")),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(op, FEATURE_SCHEMA)


def media_integrity_flags(df: DataFrame) -> DataFrame:
    """JVM-side structural checks on media rows (no decode needed):
    payload present, kind in domain, dims consistent with kind."""
    bad_payload = F.col("payload").isNull() | (F.length("payload") == 0)
    bad_kind = ~F.col("kind").isin("image", "audio", "video")
    bad_dims = (
        (F.col("kind") == "image") & (F.col("width").isNull() | F.col("height").isNull())
    ) | (
        (F.col("kind") != "image") & F.col("duration_ms").isNull()
    )
    dataval = (
        F.when(bad_payload, 1).otherwise(0)
        .bitwiseOR(F.when(bad_kind, 2).otherwise(0))
        .bitwiseOR(F.when(bad_dims, 4).otherwise(0))
    )
    return df.withColumn("dataval", dataval).withColumn("approved", dataval == 0)
