"""Per-conversation rollups with salted two-phase aggregation.

The verdict partition agg (suite.py) is safe from skew because its group
key (``part``) is low-cardinality and every aggregate combines map-side.
Per-CONVERSATION aggregates are the skew-exposed shape the north rule
calls out: a groupBy(conv_id) where a handful of mega-conversations
(10^4-10^5 turns) hash to single reducers. The standard fix implemented
here: salt the key, aggregate per (conv_id, salt) — shrinking each hot
group by the salt factor with full map-side combine — then merge the
salted partials in a second, now-balanced aggregation.

Every aggregate used is algebraic (count/sum/min/max merge losslessly
across salts), so the result is EXACTLY equal to the unsalted groupBy —
verified against a plain-SQL DuckDB oracle (q43) and a direct Spark
groupBy in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_rollup(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    n_salts: int = 16,
) -> DataFrame:
    """Per-conversation summary: turn counts, index span, ts span,
    distinct-role count is intentionally omitted (not algebraic).

    Output: conv_id, n_turns, min_idx, max_idx, first_ts, last_ts,
    gap_free (min_idx=0 and max_idx=n_turns-1).
    """
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts))
    partial = (
        df.groupBy(F.col(conv_col), salt.alias("_salt"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(order_col).alias("mn"),
            F.max(order_col).alias("mx"),
            F.min(ts_col).alias("t0"),
            F.max(ts_col).alias("t1"),
        )
    )
    merged = partial.groupBy(conv_col).agg(
        F.sum("n").alias("n_turns"),
        F.min("mn").alias("min_idx"),
        F.max("mx").alias("max_idx"),
        F.min("t0").alias("first_ts"),
        F.max("t1").alias("last_ts"),
    )
    return merged.withColumn(
        "gap_free",
        (F.col("min_idx") == 0) & (F.col("max_idx") == F.col("n_turns") - 1),
    )
