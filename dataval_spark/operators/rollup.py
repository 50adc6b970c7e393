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

from pyspark.sql import DataFrame, Window
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


def topk_per_group(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    k: int,
    n_salts: int = 32,
    rn_col: str | None = None,
) -> DataFrame:
    """EXACT top-k rows per group, safe for low-cardinality groups.

    ``row_number().over(partitionBy(group))`` funnels every row of a
    group into ONE task's sort buffer — with a handful of groups (market
    segments, language strata, constraint names) that is 1/groups of the
    whole table per task at 100 TB. Two bounded phases instead:

      1. local: rank within (group, salt) where salt =
         xxhash64(all columns) % n_salts — each hot group shrinks by the
         salt factor; keep k per salted bucket.
      2. global: rank the <= k * n_salts survivors per group.

    EXACTNESS: every global top-k row is, within its own salt bucket,
    beaten only by rows that also beat it globally — so at most k-1 of
    them — and therefore survives phase 1. Phase 2 then applies the
    identical total order to a superset of the true top-k, reproducing
    the single-window result row-for-row and rank-for-rank. Requires
    ``order_cols`` to be a TOTAL order (include a unique tie-break);
    with ties the single-window form is itself nondeterministic.

    ``rn_col``: name for the emitted rank column; None drops it.
    """
    rn = rn_col or "_rn"
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    w_local = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lrn", F.row_number().over(w_local))
        .where(F.col("_lrn") <= k)
        .drop("_salt", "_lrn")
    )
    w_global = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = (
        survivors.withColumn(rn, F.row_number().over(w_global))
        .where(F.col(rn) <= k)
    )
    return out if rn_col else out.drop(rn)
