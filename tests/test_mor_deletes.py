"""Merge-on-read deletes: metadata-only delete commits whose filters
are applied at read time to exactly the files they scoped, equivalent
to copy-on-write on every read path, exempting later appends, and
materialized (then cleared) by compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi, null_every=0):
    df = spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    )
    if null_every:
        df = df.withColumn(
            "id",
            F.when(F.col("id") % null_every == 0, F.lit(None)).otherwise(
                F.col("id")
            ),
        )
    return df


def test_mor_equals_cow_and_writes_nothing(spark, tmp_path):
    mor = SnapshotTable(spark, str(tmp_path / "mor"))
    cow = SnapshotTable(spark, str(tmp_path / "cow"))
    for t in (mor, cow):
        t.append(_df(spark, 0, 40, null_every=7))
    files_before = sorted(rel for rel, _ in mor.files(mor.snapshot()))
    mor.delete_where({"id": (10, 19)}, mode="merge-on-read")
    cow.delete_where({"id": (10, 19)})
    # identical rows on every read path (NULL ids survive both)
    key = lambda p: (p[0] is None, p[0] or 0, p[1])  # noqa: E731
    a = sorted(((r.id, r.v) for r in mor.read().collect()), key=key)
    b = sorted(((r.id, r.v) for r in cow.read().collect()), key=key)
    assert a == b
    # ... and the MOR commit wrote ZERO data files
    assert sorted(rel for rel, _ in mor.files(mor.snapshot())) == files_before
    assert mor.snapshot()["operation"] == "delete"
    assert len(mor.snapshot()["deletes"]) == 1
    # scan + row_count agree with the post-delete truth
    assert mor.row_count() == cow.row_count()
    assert sorted(r.id for r in mor.scan({"id": (5, 25)}).collect()) == sorted(
        r.id for r in cow.scan({"id": (5, 25)}).collect()
    )


def test_later_appends_are_exempt(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 20))
    t.delete_where({"id": (0, 9)}, mode="merge-on-read")
    # rows in the deleted range appended AFTER the delete must survive
    t.append(_df(spark, 0, 5))
    got = sorted(r.id for r in t.read().collect())
    assert got == [0, 1, 2, 3, 4] + list(range(10, 20))
    # stacked second delete applies to everything present now
    t.delete_where({"id": (3, 11)}, mode="merge-on-read")
    got = sorted(r.id for r in t.read().collect())
    assert got == [0, 1, 2] + list(range(12, 20))


def test_compact_materializes_and_clears(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 30))
    t.delete_where({"id": (0, 14)}, mode="merge-on-read")
    # pending deletes force a rewrite even at the file-count no-op floor
    v = t.compact(target_file_bytes=512 * 1024 * 1024)
    assert v is not None
    assert not t.snapshot().get("deletes")
    assert sorted(r.id for r in t.read().collect()) == list(range(15, 30))
    # metadata-only count works again after materialization
    assert t.row_count() == 15
    # time travel: the pre-compact MOR snapshot still reads correctly
    assert t.read(1).count() == 15


def test_cow_ops_never_resurrect_mor_deleted_rows(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 40))
    t.delete_where({"id": (30, 39)}, mode="merge-on-read")
    # a COW update on a DIFFERENT range rewrites some files and carries
    # the others — the carried files must keep their delete scope
    t.update_where({"id": (0, 0)}, {"v": 999})
    got = sorted(r.id for r in t.read().collect())
    assert got == list(range(30))
    assert t.read().where(F.col("id") == 0).collect()[0].v == 999
    # merge after a MOR delete: upserted keys land, deleted range stays gone
    t.merge(
        spark.range(28, 32).select(
            F.col("id"), F.lit(-1).cast("long").alias("v")
        ),
        key_cols=["id"],
    )
    rows = {r.id: r.v for r in t.read().collect()}
    assert rows[28] == -1 and rows[29] == -1
    assert rows[30] == -1 and rows[31] == -1  # merge INSERTS new rows
    assert 32 not in rows and 39 not in rows  # delete still in force


def test_mor_guards(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))
    # provably-no-match interval is a no-op in both modes
    assert t.delete_where({"id": (100, 200)}, mode="merge-on-read") is None
    with pytest.raises(ValueError, match="unknown delete mode"):
        t.delete_where({"id": (0, 1)}, mode="sideways")
    # non-JSON filter values are rejected (datetime on a timestamp
    # column — temporal footer stats are dropped, so the file passes
    # the overlap test and reaches the serialization guard)
    from datetime import datetime

    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.append(
        spark.range(4).select(
            F.col("id"), F.to_timestamp(F.lit("2026-08-12 08:00:00")).alias("ts")
        )
    )
    with pytest.raises(TypeError, match="JSON-serializable"):
        t2.delete_where(
            {"ts": (datetime(2026, 8, 12), datetime(2026, 8, 13))},
            mode="merge-on-read",
        )
    # the ISO-string spelling of the same delete works
    t2.delete_where(
        {"ts": ("2026-08-12 00:00:00", "2026-08-13 00:00:00")},
        mode="merge-on-read",
    )
    assert t2.read().count() == 0
    # a MOR delete poisons incremental ranges like any delete
    from dataval_spark.sources.snapshots import IncrementalReadError

    t.delete_where({"id": (0, 1)}, mode="merge-on-read")
    t.append(_df(spark, 10, 12))
    with pytest.raises(IncrementalReadError):
        t.incremental_read(0)


def test_delete_keys_mor_and_cow(spark, tmp_path):
    mor = SnapshotTable(spark, str(tmp_path / "mor"))
    cow = SnapshotTable(spark, str(tmp_path / "cow"))
    df = spark.range(30).select(
        F.concat(F.lit("conv-"), F.format_string("%03d", F.col("id"))).alias(
            "conv_id"
        ),
        F.col("id"),
    )
    for t in (mor, cow):
        t.append(df)
    doomed = ["conv-003", "conv-017", "conv-025"]
    files0 = sorted(r for r, _ in mor.files(mor.snapshot()))
    mor.delete_keys("conv_id", doomed)  # merge-on-read default
    cow.delete_keys("conv_id", doomed, mode="copy-on-write")
    assert sorted(r for r, _ in mor.files(mor.snapshot())) == files0
    a = sorted(r.conv_id for r in mor.read().collect())
    b = sorted(r.conv_id for r in cow.read().collect())
    assert a == b and len(a) == 27 and "conv-017" not in a
    # a later append of one of the keys survives (scope exemption)
    mor.append(df.where(F.col("conv_id") == "conv-017"))
    assert mor.read().where(F.col("conv_id") == "conv-017").count() == 1
    # compaction materializes the key delete too
    mor.compact(target_file_bytes=512 * 1024 * 1024)
    assert not mor.snapshot().get("deletes")
    assert mor.read().count() == 28
    assert mor.row_count() == 28


def test_delete_keys_guards(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(10).select(F.col("id")))
    assert t.delete_keys("id", []) is None
    assert t.delete_keys("id", [500, 600]) is None  # provably no match
    with pytest.raises(ValueError, match="NULL keys"):
        t.delete_keys("id", [1, None])
    with pytest.raises(ValueError, match="max_keys"):
        t.delete_keys("id", list(range(11)), max_keys=10)
    with pytest.raises(TypeError, match="JSON-serializable"):
        t.delete_keys("id", [object()])
    with pytest.raises(ValueError, match="unknown delete mode"):
        t.delete_keys("id", [1], mode="sideways")
