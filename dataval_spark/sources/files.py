"""Filesystem scans for sidecar binary artifacts.

Analog of the reference's recursive lightcurve-file walks
(`find_lightcurve_files` /root/reference/dataval/utilities.py:242-255 and
the regex+header-filtered `find_tpf_files` :71-144) — re-expressed as
Spark `binaryFile` scans so listing, filtering and content access are all
distributed instead of a driver-side os.walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_files(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    with_content: bool = False,
) -> DataFrame:
    """Recursive binary-file scan: path, modificationTime, length
    (+ content when requested — leave off for listing-only checks so the
    scan prunes the content column and reads only metadata)."""
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
    )
    df = reader.load(root)
    cols = ["path", "modificationTime", "length"] + (["content"] if with_content else [])
    return df.select(*cols)


def parse_path(df: DataFrame, pattern: str, groups: dict[str, int]) -> DataFrame:
    """Regex field extraction from file paths — the reference's filename
    parse into (starid, sector, camera, ccd, ...) with cross-checks
    (/root/reference/dataval/release.py:177-221)."""
    out = df
    for name, idx in groups.items():
        out = out.withColumn(name, F.regexp_extract(F.col("path"), pattern, idx))
    return out


def orphans(files: DataFrame, table: DataFrame, file_key: str, table_key: str) -> DataFrame:
    """Files on disk with no referencing row — the FS-vs-DB anti-join
    (/root/reference/dataval/dataval.py:668-693) as one distributed
    left_anti instead of a per-file point-lookup loop."""
    return files.join(
        table.select(F.col(table_key).alias(file_key)).distinct(),
        on=file_key,
        how="left_anti",
    )


def missing(table: DataFrame, files: DataFrame, table_key: str, file_key: str) -> DataFrame:
    """Rows whose referenced file is absent — the missing-file check
    (/root/reference/dataval/dataval.py:625-666)."""
    return table.join(
        files.select(F.col(file_key).alias(table_key)).distinct(),
        on=table_key,
        how="left_anti",
    )
