"""Context-window packing: assign documents to training-context bins by
cumulative token count — the sequence-packing step of an LLM data
pipeline, as one window expression.

``bin = floor(preceding_cumulative_tokens / budget)``: a document opens
the bin its running offset lands in, so a bin can overflow by at most
one document's tokens (offset packing). Exact first-fit is inherently
sequential per group; this closed form is the standard scalable
approximation — one window shuffle on the group key, no state, and the
assignment is deterministic under the given ordering, so it is
reproducible run to run (prerequisite for training-data lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    token_col: str,
    budget: int,
    group_col: str,
    order_col: str,
    out_col: str = "bin",
) -> DataFrame:
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(prev / F.lit(budget)).cast("int"))


def packing_stats(packed: DataFrame, token_col: str, group_col: str, out_bin: str = "bin") -> DataFrame:
    """Per-group packing summary: bins used, fill distribution."""
    per_bin = packed.groupBy(group_col, out_bin).agg(
        F.sum(token_col).alias("bin_tokens"), F.count(F.lit(1)).alias("n_docs")
    )
    return per_bin.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.max("bin_tokens").alias("max_bin_tokens"),
        F.round(F.avg("bin_tokens"), 4).alias("avg_bin_tokens"),
    )
