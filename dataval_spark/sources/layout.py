"""Write-layout control for corpus-scale parquet sinks.

At 100 TB the OUTPUT layout decides every downstream reader's cost:
parquet footers carry per-column min/max, so a table written
range-partitioned and sorted on its read key gives readers free data
skipping (a point/range predicate touches O(1) files instead of all of
them), while unsorted output makes every file a candidate. The second
failure mode at scale is file sizing — one-file-per-task output after a
skewed shuffle yields a mix of multi-GB stragglers and kilobyte shards
that crush the namenode / object-store listing and the next job's split
planning.

``write_sorted`` addresses both with plain Spark machinery:
* ``repartitionByRange(sort_cols)`` — a sampled range exchange, so each
  output task owns a contiguous, DISJOINT key range (files never
  overlap on the sort key, the property data skipping needs);
* ``sortWithinPartitions`` — in-task sort, no extra shuffle, giving
  each file internally sorted row groups with tight min/max;
* ``option("maxRecordsPerFile")`` — the writer rolls files at a bounded
  row count, capping the straggler file a skewed range would produce.

The reference's release sink writes per-object files keyed by the
filesystem layout (/root/reference/dataval/run_package_release.py:
180-224); this is the table-native analog: key locality comes from the
sort order inside one table, not from a directory tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_sorted"]


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_ranges: int | None = None,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "error",
) -> None:
    """Write ``df`` range-partitioned + sorted on ``sort_cols``.

    ``n_ranges``: number of range partitions (default: the session's
    shuffle parallelism). Size it so a range is a few hundred MB at the
    target scale; ``max_records_per_file`` then bounds any file a
    residually-skewed range would emit. ``partition_by`` adds hive-style
    directory partitioning ON TOP of the in-file sort — use it for the
    coarse axis readers filter on (e.g. source, date), and the sort for
    the fine axis (e.g. doc_id)."""
    if not sort_cols:
        raise ValueError("sort_cols must name at least one column")
    if n_ranges is not None and n_ranges < 1:
        raise ValueError(f"n_ranges must be >= 1, got {n_ranges}")
    out = (
        df.repartitionByRange(n_ranges, *sort_cols)
        if n_ranges is not None
        else df.repartitionByRange(*sort_cols)
    ).sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
