"""write_sorted: range-partitioned, sorted, size-bounded parquet output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.layout import write_sorted


@pytest.fixture(scope="module")
def table(spark):
    # shuffled ids so the writer actually has to impose the order
    return spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 5000).alias("k"),
        F.col("id").alias("payload"),
        (F.col("id") % 3).cast("string").alias("src"),
    )


def _file_ranges(spark, path):
    """per-file (min_k, max_k, n) via input_file_name — the reader-side
    view of what parquet footers will expose for data skipping."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )


def test_files_disjoint_and_rows_sorted(spark, table, tmp_path):
    path = str(tmp_path / "sorted")
    write_sorted(table, path, ["k"], n_ranges=8)
    rows = _file_ranges(spark, path)
    assert sum(r.n for r in rows) == 5000
    spans = sorted((r.lo, r.hi) for r in rows)
    for (_, hi_prev), (lo, _) in zip(spans, spans[1:]):
        assert lo > hi_prev, spans  # key ranges never overlap across files
    # within-file order: monotone k in row order for one file
    one = sorted(r.f for r in rows)[0]
    ks = [
        r.k
        for r in spark.read.parquet(path)
        .where(F.input_file_name() == one)
        .collect()
    ]
    assert ks == sorted(ks)


def test_max_records_per_file_bounds_files(spark, table, tmp_path):
    path = str(tmp_path / "bounded")
    write_sorted(table, path, ["k"], n_ranges=4, max_records_per_file=500)
    rows = _file_ranges(spark, path)
    assert max(r.n for r in rows) <= 500
    assert len(rows) >= 10  # 5000 rows / 500 cap
    spans = sorted((r.lo, r.hi) for r in rows)
    for (_, hi_prev), (lo, _) in zip(spans, spans[1:]):
        assert lo >= hi_prev  # rolled files may share only the boundary key


def test_partition_by_plus_sort(spark, table, tmp_path):
    path = str(tmp_path / "parted")
    write_sorted(table, path, ["k"], n_ranges=4, partition_by=["src"])
    back = spark.read.parquet(path)
    assert back.count() == 5000
    # hive partition columns come back type-inferred (int here) — compare
    # on the string form
    assert sorted(str(r.src) for r in back.select("src").distinct().collect()) == [
        "0", "1", "2",
    ]
    # directory pruning works: one partition's scan lists only its files
    files = {
        r.f
        for r in back.where(F.col("src") == "1")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert files and all("src=1" in f for f in files)


def test_validates_args(table):
    with pytest.raises(ValueError, match="sort_cols"):
        write_sorted(table, "/tmp/x", [])
    with pytest.raises(ValueError, match="n_ranges"):
        write_sorted(table, "/tmp/x", ["k"], n_ranges=0)
