"""JSONL transcript ingestion with corrupt-line capture.

Real transcript pipelines land as JSON-lines; at 10^12 turns a single
malformed line must not fail the job NOR vanish silently. PERMISSIVE
mode parks unparseable lines in ``_corrupt_record``; ``split_corrupt``
separates them so the good side feeds the suite and the bad side feeds
the violations sink — the ingest-time face of the reference's
missing/orphan file reports (/root/reference/dataval/dataval.py:626-699).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema_ddl: str) -> DataFrame:
    """Schema-enforced JSONL read. An explicit schema is mandatory at
    scale (schema inference is a full extra pass over the data); the
    corrupt-record column is appended automatically."""
    schema = T.StructType.fromDDL(schema_ddl).add(CORRUPT_COL, T.StringType())
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good rows with the corrupt column dropped; bad rows
    as (raw_line). Spark refuses to filter on the corrupt column of a
    lazily-parsed json relation (internal-column restriction), so the
    split MUST go through one cache — priced once, both sides reuse it.

    Cache ownership: cache() marks the caller's own ``df`` handle, so
    long-lived callers (foreachBatch loops, multi-file drivers) release
    the entry with ``df.unpersist()`` once both sides are consumed; a
    one-shot driver just exits."""
    cached = df.cache()
    good = cached.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
