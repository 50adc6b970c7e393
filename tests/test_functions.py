"""Unit tests for the scalar function library (reference-parity kernels,
/root/reference/dataval tests analog: tests/test_utilities.py,
tests/test_quality.py, tests/test_noisemodel.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataval_spark.functions import scalar as S


def _one(spark, col, **cols):
    row = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} double" for k in cols)
    ).select(col.alias("v")).collect()[0]
    return row.v


def test_power_law(spark):
    # mag == zeropoint -> flux 1.0; fainter by 2.5 mag -> flux /10
    assert _one(spark, S.power_law(F.col("m")), m=20.451) == pytest.approx(1.0)
    assert _one(spark, S.power_law(F.col("m")), m=22.951) == pytest.approx(0.1)


def test_piecewise_linear_interp_and_extrapolation(spark):
    kx, ky = [0.0, 10.0, 20.0], [100.0, 50.0, 0.0]
    f = lambda v: _one(spark, S.piecewise_linear(F.col("x"), kx, ky), x=v)  # noqa: E731
    assert f(0.0) == pytest.approx(100.0)
    assert f(5.0) == pytest.approx(75.0)
    assert f(15.0) == pytest.approx(25.0)
    assert f(-5.0) == pytest.approx(100.0)   # constant extrapolation (ext=3)
    assert f(99.0) == pytest.approx(0.0)


def test_log_piecewise_bound(spark):
    kx, ky = [0.0, 10.0], [100.0, 1.0]
    v = _one(spark, S.log_piecewise_bound(F.col("x"), kx, ky), x=5.0)
    assert v == pytest.approx(10.0)  # log-space midpoint of 100 and 1


def test_monotonic_guard():
    S.assert_monotonic_decreasing([5.0, 3.0, 1.0])
    with pytest.raises(ValueError):
        S.assert_monotonic_decreasing([5.0, 6.0, 1.0])


def test_sphere_distance(spark):
    d = _one(
        spark,
        S.sphere_distance(F.col("a"), F.col("b"), F.col("c"), F.col("d")),
        a=0.0, b=0.0, c=90.0, d=0.0,
    )
    assert d == pytest.approx(90.0)
    d2 = _one(
        spark,
        S.sphere_distance(F.col("a"), F.col("b"), F.col("c"), F.col("d")),
        a=45.0, b=30.0, c=45.0, d=30.0,
    )
    assert d2 == pytest.approx(0.0, abs=1e-9)


def test_bitmask_pass_and_binary_repr(spark):
    df = spark.createDataFrame([(0,), (2,), (5,), (8,)], "f int")
    got = [r.ok for r in df.select(S.bitmask_pass(F.col("f"), 2 | 4).alias("ok")).collect()]
    assert got == [True, False, False, True]
    b = df.select(S.binary_repr(F.col("f"), 8).alias("b")).collect()
    assert b[2].b == "00000101"


def test_rolling_hash_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], "t string")
    hs = [r.h for r in df.select(S.rolling_hash(F.col("t")).alias("h")).collect()]
    assert hs[0] == hs[1] != hs[2]
    expected = 0
    for ch in "abc":
        expected = (expected * 31 + ord(ch)) % 1_000_003
    assert hs[0] == expected


def test_cadence_backfill(spark):
    df = spark.createDataFrame(
        [("ffi", 10), ("ffi", 60), ("tpf:123", 10), ("other", 1)],
        "datasource string, sector int",
    )
    got = [r.c for r in df.select(
        S.cadence_backfill(F.col("datasource"), F.col("sector")).alias("c")).collect()]
    assert got == [1800, 600, 120, None]


def test_combine_verdicts_and_decompose(spark):
    from dataval_spark.quality import QualityFlag, decompose
    from dataval_spark.verdict import combine_verdicts

    df = spark.createDataFrame(
        [(0, 1), (int(QualityFlag.DuplicateTurn), 1),
         (int(QualityFlag.BadStatus), 1), (0, 4)],
        "dataval int, status int",
    )
    out = combine_verdicts(df).collect()
    assert [r.approved for r in out] == [True, False, True, False]
    # BadStatus bit alone does not reject (outside mask); status=4 forces

    names = df.select(decompose(F.col("dataval")).alias("n")).collect()
    assert list(names[1].n) == ["DuplicateTurn"]
    assert list(names[0].n) == []

    # without a status column the BadStatus BIT stands in for the
    # override: the suite set it exactly when it force-rejected, so
    # recombination keeps that row rejected (row 3); row 4's status=4
    # information is genuinely gone (no bit, no column)
    out2 = combine_verdicts(df.drop("status")).collect()
    assert [r.approved for r in out2] == [True, False, False, True]


def test_noise_model_components(spark):
    """Expression-level port of the reference noise model — property test
    mirroring /root/reference/tests/test_noisemodel.py:15-35 plus an
    independent numpy re-computation of every component."""
    import math

    import numpy as np

    from dataval_spark.functions.noise import (
        MASKSIZE_LONG_CADENCE,
        noise_components,
        phot_noise_total,
        pixels_in_aperture,
    )

    tmags = [float(x) for x in np.linspace(0, 20, 101)]
    df = spark.createDataFrame([(m,) for m in tmags], "tmag double")
    comps = noise_components(F.col("tmag"))
    out = df.select(
        "tmag",
        pixels_in_aperture(F.col("tmag")).alias("pixels"),
        comps["shot"].alias("shot"),
        comps["zodiacal"].alias("zodiacal"),
        comps["read"].alias("read"),
        comps["systematic"].alias("systematic"),
        phot_noise_total(F.col("tmag")).alias("total"),
    ).orderBy("tmag").collect()

    # every component bounded by the total (reference test_noisemodel:32-35)
    for r in out:
        for c in ("shot", "zodiacal", "read", "systematic"):
            assert r[c] <= r.total + 1e-9
        assert r.pixels >= 4                       # aperture floor
        assert abs(r.systematic - 60.0) < 1e-12    # ppm/sqrt(hr) at 1 hr
    # shot noise monotonically increases, pixels decrease with magnitude
    shots = [r.shot for r in out]
    assert shots == sorted(shots)
    pix = [r.pixels for r in out]
    assert pix == sorted(pix, reverse=True)

    # independent numpy recomputation inside the knot range
    kx = [p[0] for p in MASKSIZE_LONG_CADENCE]
    ky = [math.log10(p[1]) for p in MASKSIZE_LONG_CADENCE]
    for r in out:
        if not (kx[0] <= r.tmag <= kx[-1]):
            continue
        # reference semantics: round to 13 decimals, clip at 4, int-truncate
        pixels = max(4, math.floor(round(10 ** np.interp(r.tmag, kx, ky), 13)))
        mean_level = max(0.0, 10 ** (-0.4 * (r.tmag - 20.451))) * 3600.0
        ff = math.sqrt(1800.0 * pixels)
        shot = 1e6 / math.sqrt(mean_level)
        zodi = 16.0 * ff * 1e6 / mean_level  # lat 0: (16-10)*1+10 = 16
        read = 10.0 * ff * 1e6 / mean_level
        assert r.pixels == pixels
        assert abs(r.shot - shot) < 1e-6 * shot
        assert abs(r.zodiacal - zodi) < 1e-6 * zodi
        assert abs(r.read - read) < 1e-6 * read
        total = math.sqrt(shot**2 + zodi**2 + read**2 + 60.0**2)
        assert abs(r.total - total) < 1e-6 * total


def test_noise_model_invalid_cadence():
    import pytest as _pytest

    from dataval_spark.functions.noise import pixels_in_aperture

    with _pytest.raises(NotImplementedError):
        pixels_in_aperture(F.lit(10.0), cadence=42)


def test_combine_verdicts_null_status_rejects(spark):
    """NULL status must force approved=False (not NULL): consistent with
    StatusGate and the pandas oracle. A NULL approved would count the row
    as neither approved nor rejected."""
    from dataval_spark.verdict import combine_verdicts

    df = spark.createDataFrame([(0, None), (0, 1)], "dataval int, status int")
    out = combine_verdicts(df).collect()
    assert [r.approved for r in out] == [False, True]
    assert all(r.approved is not None for r in out)


def test_binary_repr_negative_keeps_low_bits(spark):
    """A negative/long bitmask must render its LOW bits, not collapse to
    sign bits (lpad truncates from the right on over-long input)."""
    from dataval_spark.quality import binary_repr

    df = spark.createDataFrame([(5,), (-1,), (3,)], "v long")
    out = [r.b for r in df.select(binary_repr(F.col("v")).alias("b")).collect()]
    assert out[0] == "0" * 29 + "101"
    assert out[1] == "1" * 32  # low 32 bits of -1, not 64-bit overflow
    assert out[2].endswith("11") and len(out[2]) == 32


def test_pixels_in_aperture_null_stays_null(spark):
    from dataval_spark.functions.noise import pixels_in_aperture

    df = spark.createDataFrame([(None,), (10.0,)], "tmag double")
    out = [r.p for r in df.select(pixels_in_aperture(F.col("tmag")).alias("p")).collect()]
    assert out[0] is None and out[1] >= 4


def test_combine_verdicts_badstatus_bit_without_status_col(spark):
    """Recombining persisted row_verdicts (no status column): a set
    BadStatus bit must keep the row rejected — the suite set that bit
    exactly when it force-rejected."""
    from dataval_spark.quality import QualityFlag
    from dataval_spark.verdict import combine_verdicts

    df = spark.createDataFrame(
        [(0,), (int(QualityFlag.BadStatus),), (int(QualityFlag.DuplicateTurn),)],
        "dataval int",
    )
    out = [r.approved for r in combine_verdicts(df).collect()]
    assert out == [True, False, False]
