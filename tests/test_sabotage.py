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
