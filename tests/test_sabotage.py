"""Sabotage tests: corrupt the input in specific ways and assert the
exact constraint fires (reference parametrized-corruption strategy,
/root/reference/tests/test_run_package_release.py:207-245)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.fixtures import transcripts
from dataval_spark.quality import QualityFlag
from dataval_spark.suite import transcript_suite


@pytest.fixture(scope="module")
def clean(spark):
    return transcripts(spark, n_convs=120, seed=7, n_parts=4, with_defects=False).cache()


def _flags(df, conv="conv-000000000003"):
    res = transcript_suite().run(df)
    rows = res.row_verdicts.where(F.col("conv_id") == conv).collect()
    out = 0
    for r in rows:
        out |= int(r.dataval)
    return out, res


def test_clean_input_fully_approved(clean):
    res = transcript_suite().run(clean)
    assert all(m["n_rejected"] == 0 for m in res.partition_metrics)
    assert all(m["passed"] or m["drifted"] for m in res.partition_metrics)


def test_sabotage_duplicate_row(clean):
    victim = clean.where(
        (F.col("conv_id") == "conv-000000000003") & (F.col("turn_idx") == 1)
    )
    flags, _ = _flags(clean.unionByName(victim))
    assert flags & int(QualityFlag.DuplicateTurn)


def test_sabotage_dropped_turn(clean):
    broken = clean.where(
        ~((F.col("conv_id") == "conv-000000000003") & (F.col("turn_idx") == 1))
    )
    flags, _ = _flags(broken)
    assert flags & int(QualityFlag.SequenceGap)


def test_sabotage_time_travel(clean):
    broken = clean.withColumn(
        "ts",
        F.when(
            (F.col("conv_id") == "conv-000000000003") & (F.col("turn_idx") == 2),
            F.col("ts") - F.expr("INTERVAL 1 DAY"),
        ).otherwise(F.col("ts")),
    )
    flags, _ = _flags(broken)
    assert flags & int(QualityFlag.NonMonotonicTs)


def test_sabotage_alien_role(clean):
    broken = clean.withColumn(
        "role",
        F.when(
            (F.col("conv_id") == "conv-000000000003") & (F.col("turn_idx") == 2),
            F.lit("narrator"),
        ).otherwise(F.col("role")),
    )
    flags, _ = _flags(broken)
    assert flags & int(QualityFlag.InvalidRole)


def test_sabotage_malformed_conv_id(clean):
    broken = clean.withColumn(
        "conv_id",
        F.when(F.col("conv_id") == "conv-000000000003", F.lit("conv-3")).otherwise(
            F.col("conv_id")
        ),
    )
    flags, _ = _flags(broken, conv="conv-3")
    assert flags & int(QualityFlag.InvalidConvId)


def test_sabotage_bad_status_forces_rejection(clean):
    broken = clean.withColumn(
        "status",
        F.when(F.col("conv_id") == "conv-000000000003", F.lit(4)).otherwise(
            F.col("status")
        ),
    )
    res = transcript_suite().run(broken)
    rows = res.row_verdicts.where(F.col("conv_id") == "conv-000000000003").collect()
    assert rows and all(not r.approved for r in rows)
    # forced rejection, not bitmask rejection: BadStatus is outside the
    # DEFAULT_BITMASK (reference UPDATE-override order,
    # /root/reference/dataval/dataval.py:404-413)
    assert all(int(r.dataval) & int(QualityFlag.BadStatus) for r in rows)


def test_report_renders(clean):
    res = transcript_suite().run(clean)
    text = res.report()
    assert "TOTAL" in text and "PASS" in text
    assert str(sum(m["n_rows"] for m in res.partition_metrics)) in text


def test_corrupt_manifest_refuses_not_resumes_blind(spark, tmp_path):
    """A corrupted manifest must ERROR, never be treated as absent — a
    swallowed read failure would silently restart validation from
    scratch AND disable the settings guard (manifest.read_manifest
    docstring contract)."""
    import pytest as _pytest

    from dataval_spark.fixtures import transcripts
    from dataval_spark.manifest import completed_parts, run_resumable, suite_hash
    from dataval_spark.suite import transcript_suite

    mp = str(tmp_path / "manifest")
    suite = transcript_suite()
    df = transcripts(spark, n_convs=60, seed=2187, n_parts=2)
    run_resumable(spark, df, suite, mp, "r1")
    assert completed_parts(spark, mp, "r1", suite_hash(suite)) == {0, 1}

    # sabotage: clobber a manifest data file with garbage bytes
    import glob
    victim = sorted(glob.glob(f"{mp}/*.parquet"))[0]
    with open(victim, "wb") as f:
        f.write(b"NOT A PARQUET FILE")

    with _pytest.raises(Exception):
        completed_parts(spark, mp, "r1", suite_hash(suite))
