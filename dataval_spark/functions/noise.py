"""Photometric noise-model components as pure Column expressions — the
full expression-level port of the reference's component model
(/root/reference/dataval/noise_model.py:16-164): shot, zodiacal, read and
systematic noise in ppm per timescale, combined in quadrature.

Everything folds to constants + arithmetic at plan time: one codegen'd
projection per row, no UDFs. The astropy coordinate transform (RA/DEC ->
galactic latitude) is astronomy-framework territory, out of engine scope:
callers pass the galactic latitude column directly; ``fold_gal_lat``
reproduces the reference's |latitude| folding
(noise_model.py:130).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dataval_spark.functions.scalar import power_law

# Pixels-in-aperture knot tables (Tmag -> mask size), interpolated
# linearly in log10(pixels) — /root/reference/dataval/noise_model.py:36-68
# (values derived from the public Sullivan et al. 2015 aperture plot).
MASKSIZE_LONG_CADENCE: list[tuple[float, float]] = [
    (2.05920002, 1484.5), (2.95159999, 715.0), (3.84399996, 447.0),
    (4.73639993, 282.5), (5.62879990, 185.0), (6.52119987, 126.0),
    (7.41359984, 98.0), (8.30599982, 76.0), (9.19839979, 61.0),
    (10.09079976, 49.0), (10.98319973, 38.0), (11.8755997, 28.0),
    (12.76799967, 20.0), (13.66039964, 14.0), (14.55279961, 8.0),
]
MASKSIZE_SHORT_CADENCE: list[tuple[float, float]] = [
    (2.48170001, 473.0), (3.56310005, 210.0), (4.0, 174.0),
    (5.72590014, 85.0), (6.80730019, 69.0), (7.88870023, 61.0),
    (8.97010028, 50.0), (10.05150032, 38.0), (11.13290037, 26.0),
    (12.5, 13.0), (15.0, 4.0),
]


def piecewise_linear_extrap(x: Column, knots_x, knots_y) -> Column:
    """Piecewise-linear interpolation with LINEAR end-segment
    extrapolation — the reference's InterpolatedUnivariateSpline(k=1,
    ext=0) (noise_model.py:74). scalar.piecewise_linear is the ext=3
    (constant) variant."""
    pairs = sorted(zip(knots_x, knots_y))
    if len(pairs) < 2:
        raise ValueError("need >= 2 knots")

    def seg(x0, y0, x1, y1):
        slope = (y1 - y0) / (x1 - x0)
        return F.lit(float(y0)) + (x - F.lit(float(x0))) * F.lit(slope)

    # below the first knot: extend the first segment
    expr = seg(*pairs[0], *pairs[1])
    for (x0, y0), (x1, y1) in zip(pairs, pairs[1:]):
        expr = F.when((x >= x0) & (x < x1), seg(x0, y0, x1, y1)).otherwise(expr)
    # at/above the last knot: extend the last segment
    expr = F.when(x >= pairs[-1][0], seg(*pairs[-2], *pairs[-1])).otherwise(expr)
    return F.when(x.isNull(), F.lit(None)).otherwise(expr)


def zl_noise(gal_lat: Column) -> Column:
    """RMS noise from the zodiacal background, e-/pix per 2 s integration:
    (16-10)*(lat/90 - 1)^2 + 10 (noise_model.py:16-23)."""
    t = gal_lat / F.lit(90.0) - F.lit(1.0)
    return F.lit(6.0) * t * t + F.lit(10.0)


def fold_gal_lat(gal_lat_deg: Column) -> Column:
    """asin(|sin(lat)|) in degrees — folds latitude into [0, 90]
    (noise_model.py:130)."""
    return F.degrees(F.asin(F.abs(F.sin(F.radians(gal_lat_deg)))))


def pixels_in_aperture(tmag: Column, cadence: int = 1800) -> Column:
    """Number of aperture pixels for a magnitude: log10-space linear
    interpolation over the cadence's knot table, clipped at 4, then
    TRUNCATED to int (noise_model.py:26-81: np.clip(pix, 4, None)
    followed by astype('int32') — round-to-nearest here was a round-2
    deviation of +1 pixel for ~half of all magnitudes, shifting
    zodiacal/read noise 1-2%)."""
    if cadence in (1800, 600, 200):
        table = MASKSIZE_LONG_CADENCE
    elif cadence in (120, 20):
        table = MASKSIZE_SHORT_CADENCE
    else:
        raise NotImplementedError(f"no aperture table for cadence {cadence}")
    import math

    kx = [p[0] for p in table]
    ky = [math.log10(p[1]) for p in table]
    pix = F.round(F.pow(F.lit(10.0), piecewise_linear_extrap(tmag, kx, ky)), 13)
    # NULL magnitude must stay NULL: greatest() SKIPS nulls, so without
    # the guard a missing tmag fabricated a confident 4-pixel aperture
    return F.when(
        tmag.isNull(), F.lit(None).cast("int")
    ).otherwise(F.greatest(F.floor(pix).cast("int"), F.lit(4)))


def noise_components(
    tmag: Column,
    gal_lat: Column | None = None,
    timescale: float = 3600.0,
    sysnoise: float = 60.0,
    cadence: int = 1800,
) -> dict[str, Column]:
    """The four noise components in ppm/timescale, each clipped at 0
    (noise_model.py:132-158). ``gal_lat`` is the folded galactic latitude
    in degrees (see fold_gal_lat); None means latitude 0 (the most
    conservative zodiacal level)."""
    lat = gal_lat if gal_lat is not None else F.lit(0.0)
    integrations = timescale / 2.0  # number of 2 s integrations
    pixels = pixels_in_aperture(tmag, cadence)
    flux_factor = F.sqrt(F.lit(integrations) * pixels)
    mean_level = power_law(tmag) * F.lit(timescale)  # electrons per timescale

    clip0 = lambda c: F.greatest(F.lit(0.0), c)  # noqa: E731
    return {
        "shot": clip0(F.lit(1e6) / F.sqrt(mean_level)),
        "zodiacal": clip0(zl_noise(lat) * flux_factor * F.lit(1e6) / mean_level),
        "read": clip0(F.lit(10.0) * flux_factor * F.lit(1e6) / mean_level),
        "systematic": clip0(F.lit(sysnoise / (timescale / 3600.0) ** 0.5)),
    }


def phot_noise_total(
    tmag: Column,
    gal_lat: Column | None = None,
    timescale: float = 3600.0,
    sysnoise: float = 60.0,
    cadence: int = 1800,
) -> Column:
    """Total noise: quadrature sum of the four components
    (noise_model.py:160-162)."""
    from dataval_spark.functions.scalar import quadrature_total

    comps = noise_components(tmag, gal_lat, timescale, sysnoise, cadence)
    return quadrature_total(*comps.values())
