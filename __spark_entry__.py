"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship path: the transcript validation engine
(dataval_spark.suite) over sf0.001 lineitem re-shaped into the transcript
schema, returning the per-partition verdict table. ``queries()`` /
``oracle_sql()`` expose every SQL-expressible operator from SURVEY.md §2
for the DuckDB side-by-side correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataval_spark.queries import ORACLE, QUERIES, TABLES  # noqa: F401

# queries with no oracle_sql entry (driver records a rows-only check)
NO_ORACLE: set[str] = set()


def _lineitem_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt lineitem to the transcript schema so the validation engine
    runs on driver testdata: conv=order, turn=linenumber, ts=shipdate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.format_string("conv-%012d", F.col("l_orderkey")).alias("conv_id"),
        (F.col("l_linenumber") - 1).cast("int").alias("turn_idx"),
        F.when(F.col("l_linenumber") == 1, "system")
        .when(F.col("l_returnflag") == "R", "tool")
        .when(F.col("l_linenumber") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.concat_ws(" ", F.lit("item"), F.col("l_partkey").cast("string")).alias("text"),
        F.when(F.col("l_returnflag") == "R", F.lit("search")).otherwise(F.lit(None)).alias("tool"),
        F.col("l_shipdate").alias("ts"),
        F.pmod(F.xxhash64("l_orderkey"), F.lit(8)).cast("int").alias("part"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full constraint suite -> per-partition verdict table."""
    from dataval_spark.constraints import (
        Domain,
        NotNull,
        SequenceIntegrity,
        Stats,
        Unique,
    )
    from dataval_spark.constraints.drift import Drift
    from dataval_spark.quality import QualityFlag
    from dataval_spark.suite import Suite

    df = _lineitem_as_transcripts(spark, "/root/testdata/sf0.001")
    suite = Suite(
        [
            NotNull("text", flag=QualityFlag.InvalidText, max_rate=0.05),
            Unique(keys=("conv_id", "turn_idx")),
            SequenceIntegrity(),
            Domain(col="role", values=["system", "user", "assistant", "tool"],
                   flag=QualityFlag.InvalidRole),
            Stats(col="text"),
            Drift(expr=lambda: F.length(F.col("text")).cast("double"),
                  bins=[0.0, 4.0, 6.0, 8.0, 10.0, 12.0, 100.0], name="drift_text_len"),
        ]
    )
    result = suite.run(df)
    return result.partition_verdicts.select(
        "part", "n_rows", "n_approved", "n_rejected", "passed"
    ).orderBy("part")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLE)
