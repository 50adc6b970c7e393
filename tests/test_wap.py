"""Write-audit-publish on SnapshotTable: staged rows are invisible
until published, audit failures abort without a commit, and the CLI
--ingest-audited face gates publication on the validation suite —
the reference's gate-then-release semantics
(/root/reference/run_package_release.py:283-317) as an atomic table op."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataval_spark.cli import main as cli_main
from dataval_spark.fixtures import transcripts
from dataval_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("part")
    )


def test_staged_rows_invisible_until_publish(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5), partition_by=["part"])
    h = t.stage_append(_df(spark, 5, 20))
    # audit window: readers still see only the committed snapshot
    assert t.read().count() == 5
    assert t.current_version() == 0
    # the audit reads EXACTLY what publish would make visible
    assert sorted(r.id for r in t.read_staged(h).collect()) == list(range(5, 20))
    # handles survive JSON (a CLI can persist them between phases)
    h = json.loads(json.dumps(h))
    v = t.publish(h)
    assert v == 1
    assert sorted(r.id for r in t.read().collect()) == list(range(20))
    # published files carry manifest stats like any append
    assert any(
        "id" in b for b in t.file_stats(t.snapshot()).values()
    )


def test_abort_discards_staged_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5), partition_by=["part"])
    h = t.stage_append(_df(spark, 5, 9))
    assert t.abort_staged(h) >= 2  # data file(s) + manifest
    assert t.read().count() == 5
    assert t.orphan_files() == []  # nothing left for vacuum
    with pytest.raises(Exception):
        t.read_staged(h).count()  # the files are gone


def test_publish_retries_past_concurrent_append(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5), partition_by=["part"])
    h = t.stage_append(_df(spark, 5, 9))
    # another writer lands while the audit runs: append semantics, both
    # the interleaved rows and the staged rows survive
    t.append(_df(spark, 100, 103))
    v = t.publish(h)
    assert v == 2
    assert sorted(r.id for r in t.read().collect()) == (
        list(range(9)) + [100, 101, 102]
    )


def test_publish_guards_schema_like_append(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5), partition_by=["part"])
    h = t.stage_append(
        _df(spark, 5, 9).withColumn("extra", F.lit("x"))
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        t.publish(h)
    t.abort_staged(h)


def test_stage_inherits_hidden_partition_spec(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(8).select(
        F.col("id"),
        F.to_timestamp(F.lit("2026-08-12 08:00:00")).alias("ts"),
    )
    t.append(df, partition_by=["days(ts)"])
    h = t.stage_append(df.withColumn("id", F.col("id") + 100))
    v = t.publish(h)
    assert v == 1
    assert t.snapshot()["partition_spec"] == ["days(ts)"]
    assert all("ts_day=" in rel for rel, _ in t.files(t.snapshot()))
    assert t.read().columns == ["id", "ts"]


def test_cli_ingest_audited_publishes_clean_and_rejects_dirty(
    spark, tmp_path, capsys
):
    clean = str(tmp_path / "clean")
    dirty = str(tmp_path / "dirty")
    table = str(tmp_path / "table")
    transcripts(spark, n_convs=120, seed=2187, n_parts=4,
                with_defects=False).write.parquet(clean)
    transcripts(spark, n_convs=120, seed=2187, n_parts=4).write.parquet(dirty)

    rc = cli_main(["--input", clean, "--ingest-audited", table,
                   "--partition-by", "part"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["published"] is True and out["version"] == 0

    t = SnapshotTable(spark, table)
    n_clean = t.read().count()
    assert n_clean == out["n_rows"]

    # dirty batch: staged, audited, ABORTED — table bit-identical
    rc = cli_main(["--input", dirty, "--ingest-audited", table])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3 and out["published"] is False and out["version"] == 0
    assert t.current_version() == 0
    assert t.read().count() == n_clean
    assert t.orphan_files() == []  # the abort reclaimed the staged files

    # a second CLEAN batch appends on the recorded layout
    rc = cli_main(["--input", clean, "--ingest-audited", table])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["version"] == 1
    assert t.read().count() == 2 * n_clean
