"""Cross-version distribution drift on snapshot tables: per-partition
KS + PSI between two committed versions (or tags) — "did release-N+1
shift the corpus vs release-N?".

Reference analog: the reference compares each data release's magnitude
/noise distributions against the previous release's accepted baseline
(/root/reference/dataval/mag_dist.py:41-47 per-group comparison;
release gating in run_package_release.py). Here the comparison is
between SNAPSHOT VERSIONS of one table, which gives the scale design
three legs a 100-TB corpus needs:

* histograms, not raw values: each version contributes O(parts x nbins)
  counts through one wide aggregation (the same sketch the in-run
  Drift constraint uses, so the two verdicts share thresholds, noise
  floors, and binning).
* append-only fast path: when the version range is an append-only
  changelog (`added_entries`), only the DELTA files are scanned and
  added onto the reference histograms — comparing release N+1 to N
  costs O(delta), never a rescan of the base.
* zero-base-rescan loop: the returned dict round-trips as `ref_hists`
  for the NEXT comparison, so a standing release gate scans each row
  of the corpus exactly once over its lifetime (bins are recorded and
  verified on reuse — a silently different binning would fabricate or
  mask drift).

Bins come from manifest column bounds when available (metadata-only,
zero data reads), else one column-pruned min/max scan of the reference
version (recorded as ``bins_source: "scan"`` so the cost is visible).
``length(col)`` specs histogram a string column's length with the
Drift constraint's default 0..2048/128 edges.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataval_spark.constraints.drift import (
    EPS,  # noqa: F401  (re-exported for parity tests)
    KS_FLOOR_COEF,
    PSI_FLOOR_COEF,
    _compare_hists,
    bin_index_expr,
)

__all__ = ["drift_between_versions"]

_DEFAULT_LEN_BINS = [float(x) for x in range(0, 2050, 128)]
_LEN_RE = re.compile(r"^length\((\w+)\)$")


def _resolve_spec(table, snap_ref, spec: str, nbins: int):
    """-> (metric_name, Column expr builder, bins, bins_source)."""
    m = _LEN_RE.match(spec)
    if m:
        col = m.group(1)
        return (
            f"len_{col}",
            lambda c=col: F.length(F.col(c)),
            list(_DEFAULT_LEN_BINS),
            "default",
        )
    bounds = table.column_bounds(spec, version=snap_ref["version"])
    source = "metadata"
    if bounds is None:
        # one column-pruned min/max scan of the REFERENCE version —
        # visible in the record, never silent
        row = (
            table._read_entries(snap_ref, table.files(snap_ref))
            .agg(F.min(spec).alias("lo"), F.max(spec).alias("hi"))
            .collect()[0]
        )
        bounds, source = (row.lo, row.hi), "scan"
    lo, hi = bounds
    if lo is None or hi is None:
        raise ValueError(f"column {spec!r} has no non-NULL values to bin")
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        hi = lo + 1.0
    step = (hi - lo) / nbins
    bins = [lo + i * step for i in range(nbins)] + [hi]
    return spec, (lambda c=spec: F.col(c)), bins, source


def _histograms(
    df: DataFrame, specs: list[tuple], part_col: str
) -> dict[str, dict]:
    """{metric: {part: [bin counts], "": n_rows}} from ONE wide
    aggregation (one shuffle, O(parts x nbins) rows to the driver)."""
    helpers = []
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, expr, bins, _ in specs:
        h = f"_b_{name}"
        helpers.append((h, bin_index_expr(expr(), bins)))
        for i in range(len(bins) - 1):
            aggs.append(
                F.sum((F.col(h) == i).cast("long")).alias(f"{name}__{i}")
            )
    for h, c in helpers:
        df = df.withColumn(h, c)
    rows = df.groupBy(part_col).agg(*aggs).collect()
    out: dict[str, dict] = {name: {} for name, *_ in specs}
    for r in rows:
        # string keys: the returned dict must JSON round-trip (the CLI
        # persists it as the next run's ref_hists), and json object
        # keys are always strings
        part = str(r[part_col])
        for name, _, bins, _src in specs:
            out[name][part] = [
                int(r[f"{name}__{i}"] or 0) for i in range(len(bins) - 1)
            ]
    return out


def _add_hists(a: dict, b: dict) -> dict:
    out = {k: dict(v) for k, v in a.items()}
    for metric, parts in b.items():
        tgt = out.setdefault(metric, {})
        for part, counts in parts.items():
            if part in tgt:
                tgt[part] = [x + y for x, y in zip(tgt[part], counts)]
            else:
                tgt[part] = list(counts)
    return out


def drift_between_versions(
    table,
    ref: int | str,
    cur: int | str | None = None,
    columns: list[str] | None = None,
    part_col: str = "dataval_part",
    nbins: int = 16,
    psi_threshold: float = 0.25,
    ks_threshold: float = 0.30,
    ref_hists: dict | None = None,
) -> dict:
    """Compare the per-partition distributions of snapshot ``cur``
    (default current) against snapshot ``ref`` on the given column
    specs. Partitions are compared against the SAME partition in the
    reference; a partition new in ``cur`` is compared against the
    pooled reference and flagged ``new_partition``; one missing from
    ``cur`` is reported with ``missing_in_current``. A pooled ``*``
    row summarizes whole-table drift. Thresholds ride the same
    sample-size noise floors as the in-run Drift constraint."""
    from dataval_spark.sources.snapshots import IncrementalReadError

    snap_ref = table.snapshot(ref)
    snap_cur = table.snapshot(cur)
    rv, cv = snap_ref["version"], snap_cur["version"]
    if cv < rv:
        raise ValueError(f"cur v{cv} precedes ref v{rv}")
    ref_names = {f["name"] for f in json.loads(snap_ref["schema"])["fields"]}
    if columns is None:
        columns = [c for c in ("turn_idx",) if c in ref_names] + [
            f"length({c})" for c in ("text",) if c in ref_names
        ]
        if not columns:
            raise ValueError(
                "no default drift columns in this schema; pass columns="
            )
    # ---- reference histograms: reuse a prior result, or scan ref ----
    if ref_hists is not None:
        if ref_hists.get("cur_version") != rv:
            raise ValueError(
                f"ref_hists are for v{ref_hists.get('cur_version')}, "
                f"ref is v{rv} — refusing a mismatched baseline"
            )
        # bins come FROM the prior result (identical binning is what
        # makes the histograms comparable, and re-deriving could cost
        # the scan fallback this reuse path exists to avoid)
        specs = []
        for s in columns:
            m = _LEN_RE.match(s)
            name = f"len_{m.group(1)}" if m else s
            if name not in ref_hists["bins"]:
                raise ValueError(
                    f"ref_hists carry no bins for {name!r}; pass the "
                    "same columns as the run that produced them"
                )
            expr = (
                (lambda c=m.group(1): F.length(F.col(c)))
                if m
                else (lambda c=s: F.col(c))
            )
            specs.append((name, expr, ref_hists["bins"][name], "ref_hists"))
        h_ref = ref_hists["hists"]
    else:
        specs = [_resolve_spec(table, snap_ref, s, nbins) for s in columns]
    if ref_hists is None:
        h_ref = _histograms(
            table._read_entries(snap_ref, table.files(snap_ref)),
            specs,
            part_col,
        )

    # ---- current histograms: delta-only when the range allows -------
    mode = "full"
    if cv == rv:
        h_cur = {k: {p: list(c) for p, c in v.items()} for k, v in h_ref.items()}
    else:
        try:
            entries = table.added_entries(rv, cv)
            delta = table._read_entries(snap_cur, entries)
            h_cur = _add_hists(h_ref, _histograms(delta, specs, part_col))
            mode = "incremental"
        except IncrementalReadError:
            h_cur = _histograms(
                table._read_entries(snap_cur, table.files(snap_cur)),
                specs,
                part_col,
            )

    # ---- driver-side comparison (tiny) -------------------------------
    records = []
    for name, _, bins, src in specs:
        nb = len(bins) - 1
        rparts, cparts = h_ref.get(name, {}), h_cur.get(name, {})
        pooled_ref = [
            sum(v[i] for v in rparts.values()) for i in range(nb)
        ] or [0] * nb
        pooled_cur = [
            sum(v[i] for v in cparts.values()) for i in range(nb)
        ] or [0] * nb
        for part in sorted(set(rparts) | set(cparts), key=str) + ["*"]:
            if part == "*":
                h, r, new_p = pooled_cur, pooled_ref, False
            elif part not in cparts:
                records.append(
                    {
                        "part": part,
                        "metric": name,
                        "missing_in_current": True,
                        "drifted": None,
                        "n_ref": sum(rparts[part]),
                        "n_cur": 0,
                    }
                )
                continue
            else:
                h = cparts[part]
                new_p = part not in rparts
                r = pooled_ref if new_p else rparts[part]
            nh, nr = max(sum(h), 1.0), max(sum(r), 1.0)
            inv = 1.0 / nh + 1.0 / nr
            psi_t = psi_threshold + PSI_FLOOR_COEF * (nb - 1) * inv
            ks_t = max(ks_threshold, KS_FLOOR_COEF * inv**0.5)
            rec = _compare_hists(h, r, psi_t, ks_t)
            rec.update(
                {
                    "part": part,
                    "metric": name,
                    "n_ref": int(sum(r)),
                    "n_cur": int(sum(h)),
                    "bins_source": src,
                }
            )
            if new_p:
                rec["new_partition"] = True
            records.append(rec)
    return {
        "mode": mode,
        "ref_version": rv,
        "cur_version": cv,
        "records": records,
        "hists": h_cur,
        "bins": {name: bins for name, _, bins, _src in specs},
        "any_drifted": any(r.get("drifted") for r in records),
    }
