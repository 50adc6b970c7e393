"""Filesystem-scan source tests (binaryFile + glob + regex parse +
FS-vs-table anti-joins) — reference S5/S6/J8 analogs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources import files as FS


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("artifacts")
    (root / "sector01").mkdir()
    (root / "sector02").mkdir()
    names = [
        "sector01/lc-000001-s01.bin",
        "sector01/lc-000002-s01.bin",
        "sector02/lc-000003-s02.bin",
        "sector02/notes.txt",
    ]
    for n in names:
        (root / n).write_bytes(b"payload-" + n.encode())
    return str(root)


def test_scan_glob_and_listing_only(spark, tree):
    df = FS.scan_files(spark, tree, glob="*.bin")
    rows = df.orderBy("path").collect()
    assert len(rows) == 3
    assert all(r.path.endswith(".bin") for r in rows)
    assert "content" not in df.columns  # metadata-only scan prunes payload
    assert all(r.length > 0 for r in rows)


def test_scan_with_content(spark, tree):
    df = FS.scan_files(spark, tree, glob="*.bin", with_content=True)
    r = df.orderBy("path").first()
    assert bytes(r.content).startswith(b"payload-")


def test_parse_path(spark, tree):
    df = FS.scan_files(spark, tree, glob="*.bin")
    parsed = FS.parse_path(
        df, r"lc-(\d+)-s(\d+)\.bin$", {"target_id": 1, "sector": 2}
    ).withColumn("target_id", F.col("target_id").cast("int"))
    got = {r.target_id: r.sector for r in parsed.collect()}
    assert got == {1: "01", 2: "01", 3: "02"}


def test_orphans_and_missing(spark, tree):
    files = FS.parse_path(
        FS.scan_files(spark, tree, glob="*.bin"),
        r"lc-(\d+)-s\d+\.bin$", {"tid": 1},
    ).withColumn("tid", F.col("tid").cast("long"))
    table = spark.createDataFrame([(1,), (2,), (99,)], "target long")

    orphan_rows = FS.orphans(files, table, "tid", "target").collect()
    assert [r.tid for r in orphan_rows] == [3]       # file with no row

    missing_rows = FS.missing(table, files, "target", "tid").collect()
    assert [r.target for r in missing_rows] == [99]  # row with no file
