"""Metadata inspection tables on SnapshotTable (Iceberg's snapshots/
files/partitions tables): file, byte and row censuses answered from
manifests only — zero data-file reads — plus the CLI --partitions face."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataval_spark.cli import main as cli_main
from dataval_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("part")
    )


def test_snapshots_df_census(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 9), partition_by=["part"])
    t.append(_df(spark, 9, 12))
    t.delete_where({"id": (0, 2)})
    rows = {r.version: r for r in t.snapshots_df().collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].operation == "append" and rows[0].parent is None
    assert rows[1].parent == 0
    assert rows[2].operation == "delete"
    # row totals come from recorded manifest counts, not a scan
    assert rows[0].total_rows == 9
    assert rows[1].total_rows == 12
    assert rows[2].total_rows == 9
    assert rows[0].partition_spec == ["part"]
    # expiry drops rows from the census
    t.expire_snapshots(keep_last=1)
    assert [r.version for r in t.snapshots_df().collect()] == [2]


def test_files_df_partition_values_and_bounds(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 9), partition_by=["part"])
    files = t.files_df().collect()
    assert len(files) == len(t.files(t.snapshot()))
    assert {r.partition["part"] for r in files} == {"0", "1", "2"}
    assert all(r.bytes > 0 for r in files)
    assert sum(r.rows for r in files) == 9
    # manifest bounds surface as JSON
    some = [json.loads(r.bounds) for r in files if r.bounds]
    assert some and all("id" in b for b in some)


def test_partitions_df_is_metadata_only_census(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 30), partition_by=["part"])
    t.append(_df(spark, 30, 33))  # ids 30,31,32 -> parts 0,1,2
    cen = {r.partition["part"]: r for r in t.partitions_df().collect()}
    assert set(cen) == {"0", "1", "2"}
    assert sum(r.total_rows for r in cen.values()) == 33
    assert all(r.n_files >= 1 and r.total_bytes > 0 for r in cen.values())
    # hidden-partition tables census by the DERIVED directory value
    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.append(
        spark.range(8).select(
            F.col("id"),
            F.to_timestamp(
                F.concat(
                    F.lit("2026-08-1"),
                    (F.col("id") % 2 + 1).cast("string"),
                    F.lit(" 08:00:00"),
                )
            ).alias("ts"),
        ),
        partition_by=["days(ts)"],
    )
    cen2 = {r.partition["ts_day"]: r for r in t2.partitions_df().collect()}
    assert set(cen2) == {"2026-08-11", "2026-08-12"}
    assert all(r.total_rows == 4 for r in cen2.values())
    # unpartitioned tables report one empty-map row
    t3 = SnapshotTable(spark, str(tmp_path / "t3"))
    t3.append(spark.range(5).select("id"))
    rows3 = t3.partitions_df().collect()
    assert len(rows3) == 1 and dict(rows3[0].partition) == {}
    assert rows3[0].total_rows == 5


def test_cli_partitions_face(spark, tmp_path, capsys):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 12), partition_by=["part"])
    rc = cli_main(["--input", "unused", "--partitions", str(tmp_path / "t")])
    assert rc == 0
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert {ln["partition"]["part"] for ln in lines} == {"0", "1", "2"}
    assert sum(ln["total_rows"] for ln in lines) == 12
    # sorted by bytes descending
    sizes = [ln["total_bytes"] for ln in lines]
    assert sizes == sorted(sizes, reverse=True)
