"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant recurring cost of validating transcripts against
satellite tables (conversation metadata, prior verdicts, manifests) is
re-shuffling the fact table on conv_id for every join. Bucketing both
sides on the join key at write time makes every subsequent equi-join a
zero-shuffle zip of co-located buckets — the Spark analog of the
reference's hand-built SQLite indices
(/root/reference/dataval/dataval.py:181-188): pay once at write, win on
every read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table.
    Sorting by the key additionally upgrades later joins from hash to
    merge without a sort step."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — Catalyst elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
