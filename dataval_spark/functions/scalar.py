"""Scalar function library — Spark-native ports of the reference's
vectorized kernels (SURVEY.md §2.7), as pure Column expressions (no UDFs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def power_law(mag: Column, zeropoint: float = 20.451) -> Column:
    """clip(10^(-0.4*(mag - zp)), 0, inf) — the reference's mag2flux
    transform (/root/reference/dataval/utilities.py:224-239)."""
    return F.greatest(F.lit(0.0), F.pow(F.lit(10.0), F.lit(-0.4) * (mag - F.lit(zeropoint))))


def piecewise_linear(x: Column, knots_x: Sequence[float], knots_y: Sequence[float]) -> Column:
    """Piecewise-linear interpolation over constant knot tables with
    constant extrapolation — the reference's spline bound curves with
    ext=3 (/root/reference/dataval/pixinaperture.py:139-165,
    /root/reference/dataval/contam.py:26-28). Knots fold to constants at
    plan time; the expression is a when-chain, fully codegen'd."""
    if len(knots_x) != len(knots_y) or len(knots_x) < 2:
        raise ValueError("need >= 2 matching knots")
    pairs = sorted(zip(knots_x, knots_y))
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    expr = F.lit(float(ys[0]))
    for (x0, y0), (x1, y1) in zip(pairs, pairs[1:]):
        slope = (y1 - y0) / (x1 - x0) if x1 != x0 else 0.0
        expr = F.when(
            (x >= x0) & (x < x1), F.lit(float(y0)) + (x - F.lit(float(x0))) * F.lit(slope)
        ).otherwise(expr)
    expr = F.when(x >= xs[-1], F.lit(float(ys[-1]))).otherwise(expr)
    return F.when(x.isNull(), F.lit(None)).otherwise(expr)


def log_piecewise_bound(x: Column, knots_x: Sequence[float], knots_y: Sequence[float]) -> Column:
    """Bound curve interpolated in log10-y space — reference pattern
    ``10**interp(x, kx, log10(ky))`` (/root/reference/dataval/mag2flux.py:40-43)."""
    import math

    log_y = [math.log10(y) for y in knots_y]
    return F.pow(F.lit(10.0), piecewise_linear(x, knots_x, log_y))


def assert_monotonic_decreasing(knots_y: Sequence[float], name: str = "bound") -> None:
    """Driver-side guard mirroring the reference's monotonicity assert on
    bound tables (/root/reference/dataval/pixinaperture.py:161-165)."""
    if any(a < b for a, b in zip(knots_y, knots_y[1:])):
        raise ValueError(f"{name} knot table must be monotonically decreasing")


def sphere_distance(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Great-circle distance in degrees (Vincenty formula) — trig-only
    port of /root/reference/dataval/utilities.py:147-174."""
    r1, d1 = F.radians(ra1), F.radians(dec1)
    r2, d2 = F.radians(ra2), F.radians(dec2)
    dr = r2 - r1
    num = F.sqrt(
        F.pow(F.cos(d2) * F.sin(dr), 2)
        + F.pow(F.cos(d1) * F.sin(d2) - F.sin(d1) * F.cos(d2) * F.cos(dr), 2)
    )
    den = F.sin(d1) * F.sin(d2) + F.cos(d1) * F.cos(d2) * F.cos(dr)
    return F.degrees(F.atan2(num, den))


def bitmask_pass(flags: Column, mask: int) -> Column:
    """(flags & mask) == 0 — reference CheckQuality filter
    (/root/reference/dataval/quality.py:16-29). Single implementation
    lives in quality.filter_flags; re-exported here for the scalar
    function namespace."""
    from dataval_spark.quality import filter_flags

    return filter_flags(flags, mask)


def binary_repr(flags: Column, width: int = 32) -> Column:
    """Pretty-printed bitmask — delegates to quality.binary_repr (one
    copy of the negative-value truncation fix)."""
    from dataval_spark.quality import binary_repr as _br

    return _br(flags, width)


def rolling_hash(text: Column, base: int = 31, mod: int = 1_000_003) -> Column:
    """Deterministic polynomial rolling hash of a string — document
    fingerprinting primitive. Computed via aggregate over the char array;
    used where md5 is heavier than needed."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def quadrature_total(*components: Column) -> Column:
    """sqrt(sum of squares) — the reference noise model's combination of
    shot/zodiacal/read/systematic components into a total
    (/root/reference/dataval/noise_model.py:84-164). Each component is a
    plain Column expression; the model becomes one codegen'd projection."""
    total = None
    for c in components:
        sq = c * c
        total = sq if total is None else total + sq
    return F.sqrt(total)


def zodiacal_rms(
    gal_lat: Column,
    a: float = 16.0,
    b: float = -6.0 * 2.0 / 90.0,
    c: float = 6.0 / 8100.0,
) -> Column:
    """Quadratic background-RMS curve in |galactic latitude|. The default
    coefficients are the exact expansion of the reference's ZLnoise
    (6*(lat/90 - 1)^2 + 10 = 16 - (12/90)*lat + (6/8100)*lat^2,
    /root/reference/dataval/noise_model.py:16-23); functions/noise.py's
    zl_noise is the factored form, this is the generic quadratic."""
    x = F.abs(gal_lat)
    return F.lit(a) + F.lit(b) * x + F.lit(c) * x * x


def relpath(path: Column, root: str) -> Column:
    """Relative path under a root — os.path.relpath analog
    (/root/reference/dataval/dataval.py:672,687)."""
    prefix = root if root.endswith("/") else root + "/"
    return F.when(
        path.startswith(prefix), path.substr(F.lit(len(prefix) + 1), F.length(path))
    ).otherwise(path)


def cadence_backfill(datasource: Column, sector: Column) -> Column:
    """CASE-rule backfill of a derived column from two source columns —
    shape of the reference's cadence migration
    (/root/reference/dataval/dataval.py:126-140): ffi -> sector-dependent
    (1800 before sector 56, 600 after), tpf -> 120."""
    return (
        F.when(datasource == "ffi", F.when(sector < 56, 1800).otherwise(600))
        .when(datasource.startswith("tpf"), 120)
        .otherwise(F.lit(None))
    )
