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
    distinct-index count, gap_free.

    Output: conv_id, n_turns, min_idx, max_idx, first_ts, last_ts,
    n_distinct_idx, gap_free.

    gap_free is EXACT: min_idx = 0 and n_distinct_idx = max_idx + 1
    (distinct indexes covering [0, max] leave no gap). The naive
    min=0 & max=count-1 formula misreports a duplicated index that
    exactly offsets a missing one. Distinct counting stays algebraic
    across salts because the salt is a function of the order key:
    equal indexes land in the same salt group, so per-salt distinct
    sets are disjoint and their counts sum exactly.
    """
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts))
    partial = (
        df.groupBy(F.col(conv_col), salt.alias("_salt"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(order_col).alias("nd"),
            F.min(order_col).alias("mn"),
            F.max(order_col).alias("mx"),
            F.min(ts_col).alias("t0"),
            F.max(ts_col).alias("t1"),
        )
    )
    merged = partial.groupBy(conv_col).agg(
        F.sum("n").alias("n_turns"),
        F.sum("nd").alias("n_distinct_idx"),
        F.min("mn").alias("min_idx"),
        F.max("mx").alias("max_idx"),
        F.min("t0").alias("first_ts"),
        F.max("t1").alias("last_ts"),
    )
    return merged.withColumn(
        "gap_free",
        (F.col("min_idx") == 0) & (F.col("n_distinct_idx") == F.col("max_idx") + 1),
    )
