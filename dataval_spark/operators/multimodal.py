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


RESIZED_SCHEMA = "media_id long, kind string, width int, height int, payload binary"
FRAME_SCHEMA = "media_id long, frame_idx int, t_ms int, frame binary"


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode->resize->encode: cycles the
    source bytes to exactly width*height*3 (RGB) bytes, so tests can
    assert the output geometry without an image library."""
    n = width * height * 3
    if not payload:
        return bytes(n)
    reps = n // len(payload) + 1
    return (payload * reps)[:n]


def resize_images(
    df: DataFrame, width: int, height: int, decoder=None
) -> DataFrame:
    """Resize stage over image rows: Arrow batches in, one resized row
    out per input row. ``decoder`` is the production plug-in
    (decode->resize->encode, e.g. PIL/libvips); None uses the
    deterministic fake so the Spark-side plumbing (schema, batch shape,
    binary Arrow transfer both directions) is real and tested even
    without media libraries."""
    fn = decoder or (lambda b: _fake_resize(b or b"", width, height))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(fn),
                }
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(op, RESIZED_SCHEMA)
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, decoder=None) -> DataFrame:
    """Frame sampling over video rows: one input row EXPLODES into
    ``duration_ms // every_ms`` frame rows — the 1:N mapInPandas shape a
    real ffmpeg-backed sampler has. Frame count comes from metadata (no
    decode needed); frame bytes come from ``decoder`` (production
    plug-in) or a deterministic payload slice (the fake)."""

    def fake(payload: bytes, t_ms: int) -> bytes:
        b = payload or b"\x00"
        start = t_ms % len(b)
        return (b[start:] + b[:start])[:64]

    fn = decoder or fake

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # Arrow hands a nullable int column to pandas as float:
                # a missing duration arrives as NaN, and int(NaN) raises.
                # Missing/invalid duration -> zero frames, never a crash
                # (dirty metadata is exactly what this engine validates).
                if dur is None or dur != dur:
                    continue
                n = int(dur) // every_ms
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    ts.append(i * every_ms)
                    frames.append(fn(payload, i * every_ms))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "t_ms": ts, "frame": frames}
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(op, FRAME_SCHEMA)
    )


def media_integrity_flags(df: DataFrame) -> DataFrame:
    """JVM-side structural checks on media rows (no decode needed):
    payload present, kind in domain, dims consistent with kind."""
    bad_payload = F.col("payload").isNull() | (F.length("payload") == 0)
    # NULL-safe: a NULL kind must flag, not sail through — bare ~isin is
    # SQL NULL for NULL input and F.when(NULL, flag) takes otherwise(0)
    bad_kind = F.col("kind").isNull() | ~F.col("kind").isin(
        "image", "audio", "video"
    )
    bad_dims = F.coalesce(
        (
            (F.col("kind") == "image")
            & (F.col("width").isNull() | F.col("height").isNull())
        )
        | ((F.col("kind") != "image") & F.col("duration_ms").isNull()),
        F.lit(True),  # NULL kind: dims unjudgeable -> structurally bad
    )
    dataval = (
        F.when(bad_payload, 1).otherwise(0)
        .bitwiseOR(F.when(bad_kind, 2).otherwise(0))
        .bitwiseOR(F.when(bad_dims, 4).otherwise(0))
    )
    return df.withColumn("dataval", dataval).withColumn("approved", dataval == 0)
