"""Structured-Streaming form of the validation suite.

The reference is strictly batch (SURVEY.md §2.8); its only incremental
behaviors are the resume anti-join and commit-batching. This module is
the engine's forward-looking streaming surface: the same row-flag
projection runs on a stream (stateless → identical semantics), and the
partition roll-up becomes a watermarked windowed aggregation.

Sequence constraints (gap / monotonic ts) are inherently stateful per
conversation; on a stream they run through ``transformWithStateInPandas``
/ ``applyInPandasWithState`` in production. Here we expose the stateless
subset (null / domain / envelope / cross-field / format checks) which
covers every per-row constraint that does not need neighbor turns —
late-arriving turns are handled by the watermark on ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataval_spark.quality import DEFAULT_BITMASK
from dataval_spark.suite import Suite


def stateless_flags(suite: Suite, stream: DataFrame) -> DataFrame:
    """Apply every non-sequence constraint's flag to a streaming frame."""
    stateless = [c for c in suite.constraints if not c.needs_sequence]
    sub = Suite(
        stateless,
        default_mask=suite.default_mask,
        part_col=suite.part_col,
        reject_ratio_fail=suite.reject_ratio_fail,
    )
    return sub.flag_rows(stream)


def windowed_partition_verdicts(
    flagged: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    part_col: str = "part",
    mask: int = DEFAULT_BITMASK,
) -> DataFrame:
    """Per-(window, partition) running verdict counts with late-data
    tolerance — the streaming analog of the per-partition summary grid."""
    return (
        flagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col(part_col))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("approved").cast("long")).alias("n_approved"),
            F.sum((~F.col("approved")).cast("long")).alias("n_rejected"),
        )
    )
