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


def test_jsonl_ingest_with_corrupt_lines(spark, tmp_path):
    """Malformed JSONL lines must be captured, not crash or vanish; the
    good side must be suite-ready."""
    from dataval_spark.sources.jsonl import read_jsonl, split_corrupt

    p = tmp_path / "t.jsonl"
    p.write_text(
        '{"conv_id": "conv-000000000001", "turn_idx": 0, "role": "system", '
        '"text": "hello", "tool": null, "ts": "2024-01-01T00:00:00Z", "part": 0}\n'
        '{"conv_id": "conv-000000000001", "turn_idx": 1, "role": "user", '
        '"text": "hi", "tool": null, "ts": "2024-01-01T00:01:00Z", "part": 0}\n'
        "{this is not json at all\n"
        '{"conv_id": "conv-000000000002", "turn_idx": "NOT_AN_INT", "role": "user", '
        '"text": "x", "tool": null, "ts": "2024-01-01T00:00:00Z", "part": 1}\n'
    )
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, part int")
    good, bad = split_corrupt(read_jsonl(spark, str(p), ddl))
    assert good.count() == 2
    assert bad.count() == 2  # syntax error + type violation
    raws = [r.raw_line for r in bad.collect()]
    assert any("not json" in r for r in raws)
    assert any("NOT_AN_INT" in r for r in raws)
    # good side is directly suite-consumable
    assert dict(good.dtypes)["ts"] == "timestamp"
    assert good.where("turn_idx = 1").count() == 1
