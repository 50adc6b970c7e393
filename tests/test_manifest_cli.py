"""Manifest/resume semantics + CLI contract tests (exit codes, dry-run,
method dispatch) — the reference's resume / exit-code behaviors
(/root/reference/run_package_release.py:196-198,323-329)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.cli import main as cli_main
from dataval_spark.fixtures import transcripts
from dataval_spark.manifest import run_resumable, suite_hash
from dataval_spark.sources.tableio import TableIO, iceberg_available
from dataval_spark.suite import transcript_suite


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_input"))
    transcripts(spark, n_convs=200, seed=2187, n_parts=4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_resume_skips_done_partitions(spark, input_dir, tmp_path):
    df = spark.read.parquet(input_dir)
    suite = transcript_suite()
    mp = str(tmp_path / "manifest")

    # first run: only partitions 0 and 1
    r1 = run_resumable(spark, df.where(F.col("part") < 2), suite, mp, "run1")
    assert {m["part"] for m in r1.partition_metrics} == {0, 1}

    # second run over the full table resumes: only 2 and 3 processed
    r2 = run_resumable(spark, df, suite, mp, "run1")
    assert {m["part"] for m in r2.partition_metrics} == {2, 3}

    # third run: nothing to process
    assert run_resumable(spark, df, suite, mp, "run1") is None


def test_suite_hash_stability():
    assert suite_hash(transcript_suite()) == suite_hash(transcript_suite())


def test_tableio_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    assert not io.exists("t1")
    df = spark.range(10).withColumn("part", (F.col("id") % 2).cast("int"))
    io.replace(df, "t1", partition_by=["part"])
    assert io.exists("t1")
    assert io.read("t1").count() == 10
    io.append(df, "t1", partition_by=["part"])
    assert io.read("t1").count() == 20
    # sandbox has no Iceberg jar — the seam must report that honestly
    assert iceberg_available(spark) is False


def test_cli_validate_dry_run(input_dir, capsys):
    rc = cli_main(["--input", input_dir, "--validate", "--cpus", "8"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert '"n_rows"' in out
    assert rc in (0, 3, 4)


def test_cli_single_method(input_dir, capsys):
    rc = cli_main(["--input", input_dir, "--method", "uniqueness", "--validate", "--cpus", "8"])
    assert rc in (0, 3)  # duplicates exist -> 3; partitions should not fail


def test_cli_writes_output(input_dir, tmp_path, spark, capsys):
    out = str(tmp_path / "out")
    rc = cli_main(["--input", input_dir, "--output", out, "--cpus", "8"])
    assert rc in (0, 3, 4)
    verdicts = spark.read.parquet(f"{out}/verdicts")
    assert verdicts.count() == spark.read.parquet(input_dir).count()
