"""Schema conformance / migration (SURVEY §1.3): conform() is the
immutable analog of the reference's ALTER TABLE + backfill UPDATE
(/root/reference/dataval/dataval.py:126-140)."""

from __future__ import annotations

import pytest

from dataval_spark.schema import conform, schema_diff

TARGET = "conv_id string, turn_idx int, cadence int, ts timestamp"


@pytest.fixture()
def legacy(spark):
    # legacy table: no cadence column, turn_idx stored as long, an extra col
    return spark.createDataFrame(
        [("c1", 0, "ffi", 20, "2024-01-01 00:00:00"),
         ("c1", 1, "tpf", 60, "2024-01-01 00:05:00")],
        "conv_id string, turn_idx long, datasource string, sector int, ts string",
    ).selectExpr("conv_id", "turn_idx", "datasource", "sector", "cast(ts as timestamp) ts")


def test_conform_backfill_cast_drop(spark, legacy):
    out = conform(
        legacy,
        TARGET,
        defaults={  # the reference's cadence backfill rule as SQL
            "cadence": "CASE WHEN datasource = 'ffi' THEN "
                       "CASE WHEN sector < 56 THEN 1800 ELSE 600 END "
                       "ELSE 120 END"
        },
    )
    assert [f.simpleString() for f in out.schema.fields] == [
        "conv_id:string", "turn_idx:int", "cadence:int", "ts:timestamp"
    ]
    rows = {r.turn_idx: r for r in out.collect()}
    assert rows[0].cadence == 1800  # ffi, sector 20
    assert rows[1].cadence == 120   # tpf


def test_conform_missing_without_default_is_null(spark, legacy):
    out = conform(legacy, TARGET)
    assert all(r.cadence is None for r in out.collect())


def test_conform_strict_rejects_extras(spark, legacy):
    with pytest.raises(ValueError, match="extra columns"):
        conform(legacy, TARGET, strict=True)


def test_schema_diff(spark, legacy):
    d = schema_diff(legacy, TARGET)
    assert d == {
        "missing": ["cadence"],
        "extra": ["datasource", "sector"],
        "retyped": ["turn_idx"],
    }
