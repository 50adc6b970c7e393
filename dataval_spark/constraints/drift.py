"""Distribution-drift constraint: per-partition KS + PSI from sketch
histograms.

Analog of the reference's per-group KDE distribution comparison
(/root/reference/dataval/mag_dist.py:41-47), made scale-safe: instead of
collecting raw values, each partition contributes fixed-width histogram
bin counts to the single wide aggregation pass (O(P × nbins) numbers reach
the driver — constant in data size, so this works unchanged at 10^12
rows). KS is computed on the binned ECDFs, PSI on the normalized bin
masses, each partition vs the pooled rest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from dataval_spark.constraints.core import Constraint
from dataval_spark.quality import QualityFlag

# Shared by the batch evaluate() and the streaming windowed_drift so the
# two verdicts cannot drift apart: smoothing epsilon and the sample-size
# noise-floor coefficients (under the null, E[PSI] ~ (B-1)(1/n_h+1/n_r)
# by the chi-square approximation; KS scales ~ c*sqrt(1/n_h+1/n_r)).
EPS = 1e-6
PSI_FLOOR_COEF = 5.0
KS_FLOOR_COEF = 3.0


def bin_index_expr(value: Column, bins: list[float]) -> Column:
    """Histogram bin index for ``value`` over fixed ``bins`` edges,
    clamped into [0, nbins-1], NULL for NULL values — the ONE binning
    expression (batch helper column and streaming monitor both use it)."""
    idx = F.lit(0)
    for i, edge in enumerate(bins[1:-1], start=1):
        idx = F.when(value >= edge, F.lit(i)).otherwise(idx)
    return F.when(value.isNull(), F.lit(None)).otherwise(idx)


@dataclass
class Drift(Constraint):
    """Histogram-sketch drift check on a numeric expression.

    ``bins`` are fixed edges (len = nbins+1); values outside fall into the
    first/last bin. Fails a partition when PSI > psi_threshold or
    KS > ks_threshold vs the pooled distribution of all *other*
    partitions.
    """

    expr: Callable[[], Column] = None  # type: ignore[assignment]
    bins: list[float] = field(default_factory=lambda: [float(x) for x in range(0, 2050, 128)])
    psi_threshold: float = 0.25
    ks_threshold: float = 0.30
    flag: QualityFlag | None = QualityFlag.DriftedPartition
    name: str = "drift"
    # Optional reference histogram (bin counts from a trusted baseline
    # period/run — e.g. a previous manifest's metrics). When set, each
    # partition is compared against IT instead of the pooled rest of the
    # current run: the production drift semantics, and it detects
    # whole-dataset drift that pooled-rest comparison is blind to.
    baseline: list[float] | None = None

    def __post_init__(self):
        if self.baseline is not None and len(self.baseline) != self.nbins:
            # zip() in the comparison would silently TRUNCATE, hiding
            # drift concentrated in the dropped tail bins
            raise ValueError(
                f"baseline has {len(self.baseline)} bins, constraint has "
                f"{self.nbins} — refusing a silently-truncating comparison"
            )

    @property
    def nbins(self) -> int:
        return len(self.bins) - 1

    def _bin_index(self) -> Column:
        return bin_index_expr(self.expr(), self.bins)

    @property
    def _helper(self) -> str:
        return f"_bin_{self.name}"

    def helper_columns(self) -> dict[str, Column]:
        return {self._helper: self._bin_index()}

    def agg_metrics(self) -> dict[str, Column]:
        idx = F.col(self._helper)
        return {
            f"hist_{self.name}_{i}": F.sum((idx == i).cast("long"))
            for i in range(self.nbins)
        }

    def quantiles_from_hist(self, row: dict, probs=(0.25, 0.5, 0.75, 0.95)) -> list[float]:
        """Driver-side quantile estimates by linear interpolation within
        the sketch histogram — replaces percentile_approx in the wide
        pass (same O(P x nbins) information, zero executor cost)."""
        counts = [float(row.get(f"hist_{self.name}_{i}") or 0) for i in range(self.nbins)]
        total = sum(counts)
        if total <= 0:
            return [float("nan")] * len(probs)
        out = []
        for p in probs:
            target = p * total
            cum = 0.0
            q = float(self.bins[-1])
            for i, c in enumerate(counts):
                if cum + c >= target and c > 0:
                    frac = (target - cum) / c
                    lo, hi_ = self.bins[i], self.bins[i + 1]
                    q = lo + frac * (hi_ - lo)
                    break
                cum += c
            out.append(round(q, 3))
        return out

    # -- driver-side evaluation over the collected (tiny) metrics table --
    def evaluate(self, partition_rows: list[dict]) -> dict[int | str, dict]:
        """partition_rows: list of dicts with 'part' and hist_* keys.

        Returns {part: {'psi': x, 'ks': y, 'drifted': bool}}.
        """
        cols = [f"hist_{self.name}_{i}" for i in range(self.nbins)]
        counts = {r["part"]: [float(r[c] or 0) for c in cols] for r in partition_rows}
        total = [sum(v[i] for v in counts.values()) for i in range(self.nbins)]
        out: dict = {}
        degenerate = self.baseline is None and len(counts) < 2
        for part, h in counts.items():
            if self.baseline is not None:
                rest = [float(x) for x in self.baseline]
            elif degenerate:
                # pooled-rest needs >=2 partitions; a resumed run that
                # validates a single new partition has no reference —
                # report the degeneracy instead of a vacuous pass
                # (callers should supply `baseline` for resumed runs)
                out[part] = {"psi": 0.0, "ks": 0.0, "drifted": False,
                             "no_reference": True}
                continue
            else:
                rest = [total[i] - h[i] for i in range(self.nbins)]
            # sample-size-aware noise floors: under the null hypothesis
            # E[PSI] ≈ (B-1)·(1/n_h + 1/n_r) (chi-square approximation) and
            # the KS statistic scales ~ c·sqrt(1/n_h + 1/n_r); small
            # partitions would otherwise false-positive on pure noise.
            nh, nr = max(sum(h), 1.0), max(sum(rest), 1.0)
            inv = 1.0 / nh + 1.0 / nr
            psi_t = self.psi_threshold + PSI_FLOOR_COEF * (self.nbins - 1) * inv
            ks_t = max(self.ks_threshold, KS_FLOOR_COEF * inv**0.5)
            out[part] = _compare_hists(h, rest, psi_t, ks_t)
        return out


def _compare_hists(h: list[float], ref: list[float], psi_t: float, ks_t: float) -> dict:
    eps = EPS
    nh, nr = sum(h) or 1.0, sum(ref) or 1.0
    p = [max(x / nh, eps) for x in h]
    q = [max(x / nr, eps) for x in ref]
    import math

    psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    # KS on binned ECDFs
    cp = cq = 0.0
    ks = 0.0
    for pi, qi in zip(p, q):
        cp += pi
        cq += qi
        ks = max(ks, abs(cp - cq))
    return {"psi": psi, "ks": ks, "drifted": bool(psi > psi_t or ks > ks_t)}
