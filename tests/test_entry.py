"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
compare column sets, row counts, and an order-insensitive value multiset.

Floats must already be rounded inside the queries — the comparison here is
EXACT string equality after canonicalization, which is stricter than (and
therefore predictive of) the driver's value-hash check.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"


def _canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return repr(round(val, 9))
    return str(val)


def _rowset(columns, rows):
    cols = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in cols) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")
    return con


QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_every_query_has_oracle_or_is_declared():
    oracles = entry_mod.oracle_sql()
    missing = [n for n in QUERY_NAMES if n not in oracles and n not in entry_mod.NO_ORACLE]
    assert not missing, f"queries without oracle_sql or NO_ORACLE declaration: {missing}"


def _dtype_kinds(pdf):
    """Normalized numpy dtype kind per column, sorted by column name.
    The driver's value-hash is dtype-aware (it compares the pandas/Arrow
    representation), so an int64-vs-float64 mismatch — e.g. DuckDB
    sum(int)->HUGEINT surfacing as float64 — must fail locally too."""
    return {c: pdf[c].dtype.kind.replace("u", "i") for c in sorted(pdf.columns)}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_pdf = sdf.toPandas()
    spark_pdf.columns = [c.lower() for c in spark_pdf.columns]

    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (non-SQL-expressible)")
    res = duck.execute(oracles[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    duck_pdf = duck.execute(oracles[name]).df()
    duck_pdf.columns = [c.lower() for c in duck_pdf.columns]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert _dtype_kinds(spark_pdf) == _dtype_kinds(duck_pdf), (
        f"{name}: dtype-kind mismatch (driver hash would fail): "
        f"spark={_dtype_kinds(spark_pdf)} duck={_dtype_kinds(duck_pdf)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sset = _rowset(spark_cols, spark_rows)
    dset = _rowset(duck_cols, duck_rows)
    if sset != dset:
        diff = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_query_survives_session_without_timezone_conf(spark, sf_dir):
    """Regression (round-3 verdict): on PySpark 4.x,
    ``conf.get("spark.sql.session.timeZone", "")`` VALIDATES the ""
    default and raises INVALID_CONF_VALUE.TIME_ZONE when the key is
    unset — so the old probe in queries.t() crashed the first query of
    any consumer session that never set a timezone. t() must pin UTC
    without probing."""
    from dataval_spark.queries import QUERIES

    spark.conf.unset("spark.sql.session.timeZone")
    try:
        df = QUERIES["q07_status_histogram"](spark, str(sf_dir))
        assert df.count() > 0
        # t() must have re-pinned the session to UTC for oracle parity
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
