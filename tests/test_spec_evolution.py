"""Partition spec evolution: an explicitly sanctioned layout switch
(Iceberg semantics — old files are never rewritten to change a spec),
mixed-layout reads, per-file pruning fallback, maintenance ops over the
mix, and compaction as the consolidation step. Accidental switches keep
failing closed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 2).cast("int").alias("part"),
        F.to_timestamp(
            F.concat(
                F.lit("2026-08-1"),
                (F.col("id") % 3 + 1).cast("string"),
                F.lit(" 08:00:00"),
            )
        ).alias("ts"),
    )


def test_evolve_layout_mixes_then_consolidates(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 20), partition_by=["part"])
    # unsanctioned switch still fails closed
    with pytest.raises(ValueError, match="mixed partition layout"):
        t.append(_df(spark, 20, 30), partition_by=["days(ts)"])
    # sanctioned evolution: new files under days(ts), old ones untouched
    t.append(_df(spark, 20, 30), partition_by=["days(ts)"],
             evolve_layout=True)
    assert t.snapshot()["partition_spec"] == ["days(ts)"]
    layouts = {
        tuple(seg.split("=")[0] for seg in rel.split("/")[:-1] if "=" in seg)
        for rel, _ in t.files(t.snapshot())
    }
    assert layouts == {("part",), ("ts_day",)}
    # mixed read returns every row exactly once, pinned schema
    assert sorted(r.id for r in t.read().collect()) == list(range(30))
    assert t.read().columns == ["id", "part", "ts"]
    # later appends inherit the NEW spec without the flag
    t.append(_df(spark, 30, 34))
    assert sorted(r.id for r in t.read().collect()) == list(range(34))
    # scan on the new spec's source column: exact rows; old-layout files
    # fall back to footer stats (never wrongly pruned)
    lo, hi = "2026-08-12 00:00:00", "2026-08-12 23:59:59"
    expect = sorted(
        r.id
        for r in t.read().where(F.col("ts").between(lo, hi)).collect()
    )
    assert sorted(r.id for r in t.scan({"ts": (lo, hi)}).collect()) == expect
    # COW ops work over the sanctioned mix
    t.delete_where({"id": (0, 4)})
    assert sorted(r.id for r in t.read().collect()) == list(range(5, 34))
    # compaction consolidates the whole table into the current spec
    t.compact(target_file_bytes=512 * 1024 * 1024)
    layouts = {
        tuple(seg.split("=")[0] for seg in rel.split("/")[:-1] if "=" in seg)
        for rel, _ in t.files(t.snapshot())
    }
    assert layouts == {("ts_day",)}
    assert sorted(r.id for r in t.read().collect()) == list(range(5, 34))


def test_incremental_read_spans_evolution(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 10), partition_by=["part"])
    v0 = t.current_version()
    t.append(_df(spark, 10, 16), partition_by=["days(ts)"],
             evolve_layout=True)
    t.append(_df(spark, 16, 20))
    delta = t.incremental_read(v0)
    assert sorted(r.id for r in delta.collect()) == list(range(10, 20))
