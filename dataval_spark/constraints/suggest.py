"""Constraint suggestion: profile a transcript-shaped table, then emit a
ready-to-run suite spec (spec.suite_from_spec JSON) plus a per-suggestion
rationale — the "where do my checks come from" bootstrap.

Published shape: Deequ's constraint suggestion (Schelter et al., VLDB
2018 — profile column completeness/distinctness/ranges, suggest the
constraints the data currently satisfies, with headroom so organic
variation doesn't page anyone). The reference hand-derives its check
thresholds from the data the same way — e.g. the magnitude-conditional
noise bounds are fitted curves over the observed population
(/root/reference/dataval/mag2flux.py:118-153); suggestion automates that
derivation for the transcript schema.

Scale design — profiling is THREE bounded jobs, none wider than the
suite itself:

1. **stats pass**: ONE global aggregation over a narrow projection
   (null/empty counts, HLL distinctness per column and for the
   (conv, order) pair, min/max of numerics/timestamps, length quantiles
   via approx_percentile sketches). Single Exchange of one row per
   partial — the same all-reduce shape as Suite.run's metrics agg.
2. **domain pass**: collect_set ONLY for columns whose pass-1 HLL
   estimate is below the domain-size cutoff — the collected state is
   bounded by ``max_domain`` values/column BEFORE it ships (slice on the
   sorted set guards the estimator's error band).
3. **sequence pass** (optional): the per-conversation lag window —
   identical partitioning to Suite.run's sequence enrichment — counting
   duplicate keys, order gaps, and ts regressions, so Unique /
   SequenceIntegrity / MonotonicTs are suggested from measured evidence,
   not column names alone.

All thresholds are explicit knobs; every emitted constraint carries a
rationale string naming the evidence (observed rate + cutoff), so a
reviewer can audit why each check exists. Columns whose evidence is
ambiguous get NO constraint (never a guessed one) — suggestion must be
conservative because its output gates production rows.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile_table", "suggest_spec", "suggest_suite"]

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}

# canonical transcript-schema flag mapping (input_hint columns); columns
# outside it get metrics-only or unflagged constraints
_NULL_FLAGS = {"text": "InvalidText", "ts": "InvalidTimestamp", "role": "InvalidRole"}
_DOMAIN_FLAGS = {"role": "InvalidRole", "tool": "InvalidTool"}


def profile_table(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    max_domain: int = 24,
    sequence_evidence: bool = True,
) -> dict[str, Any]:
    """Profile ``df`` for suggestion. Returns a plain dict (JSON-safe):
    ``n_rows``, per-column stats under ``columns``, pair-uniqueness and
    sequence evidence under ``sequence``."""
    dtypes = dict(df.dtypes)
    cols = list(df.columns)

    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        base = dtypes[c].split("(")[0]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nul__{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"dist__{c}"))
        if base == "string":
            aggs.append(
                F.sum((F.length(F.col(c)) == 0).cast("long")).alias(f"emp__{c}")
            )
            aggs.append(
                F.approx_percentile(
                    F.length(F.col(c)).cast("double"),
                    F.array(*[F.lit(q) for q in (0.01, 0.25, 0.5, 0.75, 0.99)]),
                ).alias(f"lenq__{c}")
            )
            # structured-payload evidence: how often does the column
            # parse as a JSON OBJECT (JsonShape's check, one JVM-side
            # from_json — profiling pays it once, never the hot path)
            aggs.append(
                F.sum(
                    F.from_json(F.col(c), "map<string,string>")
                    .isNotNull()
                    .cast("long")
                ).alias(f"jsob__{c}")
            )
        elif base in _NUMERIC or base.startswith("timestamp") or base == "date":
            aggs.append(F.min(c).alias(f"min__{c}"))
            aggs.append(F.max(c).alias(f"max__{c}"))
    if conv_col in dtypes and order_col in dtypes:
        aggs.append(
            F.approx_count_distinct(F.struct(conv_col, order_col)).alias("pair_dist")
        )
    row = df.agg(*aggs).collect()[0].asDict()

    n = row["n_rows"]
    columns: dict[str, Any] = {}
    for c in cols:
        base = dtypes[c].split("(")[0]
        st: dict[str, Any] = {
            "dtype": dtypes[c],
            "null_rate": (row[f"nul__{c}"] / n) if n else 0.0,
            "approx_distinct": row[f"dist__{c}"],
        }
        if base == "string":
            st["empty_rate"] = (row[f"emp__{c}"] / n) if n else 0.0
            q = row[f"lenq__{c}"]
            st["len_quantiles"] = [float(x) for x in q] if q else None
            non_null = n - row[f"nul__{c}"]
            st["json_object_rate"] = (
                (row[f"jsob__{c}"] / non_null) if non_null else 0.0
            )
        elif f"min__{c}" in row:
            mn, mx = row[f"min__{c}"], row[f"max__{c}"]
            st["min"] = str(mn) if base.startswith("timestamp") else mn
            st["max"] = str(mx) if base.startswith("timestamp") else mx
        columns[c] = st

    # domain pass: only where the HLL estimate clears the cutoff with
    # its error band (std err ~2.3% at default rsd plus slack); slice the
    # sorted set so a misestimate still bounds what the driver collects
    domain_cols = [
        c
        for c in cols
        if dtypes[c].split("(")[0] in ({"string"} | _NUMERIC)
        and 0 < columns[c]["approx_distinct"] <= max_domain * 1.2
        and c not in (conv_col,)
    ]
    if domain_cols:
        drow = df.agg(
            *[
                F.slice(F.array_sort(F.collect_set(c)), 1, max_domain + 1).alias(c)
                for c in domain_cols
            ]
        ).collect()[0]
        for c in domain_cols:
            vals = list(drow[c])
            if len(vals) <= max_domain:
                columns[c]["domain"] = vals

    out: dict[str, Any] = {
        "n_rows": n,
        "conv_col": conv_col,
        "order_col": order_col,
        "ts_col": ts_col,
        "columns": columns,
    }
    if "pair_dist" in row:
        out["sequence"] = {"pair_distinct": row["pair_dist"]}

    if sequence_evidence and n and conv_col in dtypes and order_col in dtypes:
        w = Window.partitionBy(conv_col).orderBy(order_col)
        # role-protocol evidence rides the same window pass, but ONLY
        # when the role domain is small (the transition vocabulary is
        # bounded by domain^2; an unbounded role column would make the
        # collected sets a driver hazard)
        role_ok = (
            "role" in dtypes
            and dtypes["role"].split("(")[0] == "string"
            and 0 < columns["role"]["approx_distinct"] <= max_domain * 1.2
        )
        enr = df.select(
            conv_col,
            order_col,
            *( [ts_col] if ts_col in dtypes else [] ),
            *( ["role"] if role_ok else [] ),
        ).select(
            F.col(order_col).alias("t"),
            F.lag(order_col).over(w).alias("p"),
            *(
                [F.col(ts_col).alias("ts"), F.lag(ts_col).over(w).alias("pts")]
                if ts_col in dtypes
                else []
            ),
            *(
                [
                    F.col("role").alias("r"),
                    F.lag("role").over(w).alias("pr"),
                    # row-existence marker for "last turn" — lead of the
                    # ORDER key, not of role (a NULL role on the next row
                    # must not make this row look final)
                    F.lead(order_col).over(w).alias("nt"),
                ]
                if role_ok
                else []
            ),
        )
        seq_aggs = [
            F.sum((F.col("p").isNotNull() & (F.col("t") == F.col("p"))).cast("long")).alias("dup"),
            F.sum(
                (
                    (F.col("p").isNull() & (F.col("t") > 0))
                    | (F.col("p").isNotNull() & (F.col("t") - F.col("p") > 1))
                ).cast("long")
            ).alias("gap"),
        ]
        if ts_col in dtypes:
            seq_aggs.append(
                F.sum(
                    (F.col("pts").isNotNull() & (F.col("ts") < F.col("pts"))).cast("long")
                ).alias("ts_regress")
            )
            # inter-turn latency evidence for ResponseLatency bounds:
            # exact min/max of the observed gap (seconds) — conservative
            # envelope, same window pass
            base_ts = dtypes[ts_col].split("(")[0]

            def _ep(col: str):
                c = F.col(col)
                if base_ts == "timestamp_ntz":
                    c = c.cast("timestamp")
                return c.cast("double")

            gap = _ep("ts") - _ep("pts")
            seq_aggs += [
                F.min(gap).alias("gap_min"),
                F.max(gap).alias("gap_max"),
            ]
        if role_ok:
            cap = max_domain * max_domain + 1
            pair = F.concat(F.col("pr"), F.lit(">"), F.col("r"))
            seq_aggs += [
                F.slice(
                    F.array_sort(
                        F.collect_set(F.when(F.col("pr").isNotNull(), pair))
                    ), 1, cap,
                ).alias("transitions"),
                F.array_sort(
                    F.collect_set(F.when(F.col("p").isNull(), F.col("r")))
                ).alias("first_roles"),
                F.array_sort(
                    F.collect_set(F.when(F.col("nt").isNull(), F.col("r")))
                ).alias("last_roles"),
            ]
        srow = enr.agg(*seq_aggs).collect()[0].asDict()
        out.setdefault("sequence", {})
        out["sequence"]["dup_rate"] = srow["dup"] / n
        out["sequence"]["gap_rate"] = srow["gap"] / n
        if "ts_regress" in srow:
            out["sequence"]["ts_regress_rate"] = srow["ts_regress"] / n
        if "gap_min" in srow:
            out["sequence"]["gap_seconds_min"] = (
                float(srow["gap_min"]) if srow["gap_min"] is not None else None
            )
            out["sequence"]["gap_seconds_max"] = (
                float(srow["gap_max"]) if srow["gap_max"] is not None else None
            )
        if role_ok:
            cap = max_domain * max_domain
            if len(srow["transitions"]) <= cap:
                out["sequence"]["transitions"] = list(srow["transitions"])
            out["sequence"]["first_roles"] = list(srow["first_roles"])
            out["sequence"]["last_roles"] = list(srow["last_roles"])
    return out


def _headroom(rate: float, floor: float = 0.01) -> float:
    """Observed dirt rate -> partition-gate threshold with slack: 2.5x
    the observed rate, never below ``floor`` — organic variation under
    the gate, a regime change over it (Deequ's completeness headroom)."""
    return round(max(floor, min(0.5, rate * 2.5 + 0.005)), 4)


def suggest_spec(
    profile: dict[str, Any],
    part_col: str = "part",
    reject_ratio_fail: float = 0.10,
    null_suggest_max: float = 0.05,
    seq_suggest_max: float = 0.02,
) -> tuple[dict[str, Any], list[str]]:
    """Turn a profile into (spec, rationale). Pure python, deterministic.

    A constraint is emitted only when the profiled violation rate is
    under its ``*_suggest_max`` cutoff — data that routinely violates a
    rule doesn't get that rule imposed on it (it would fail every
    partition on day one); it gets surfaced in the rationale instead.
    """
    cols: dict[str, Any] = profile["columns"]
    conv_col, order_col, ts_col = (
        profile["conv_col"],
        profile["order_col"],
        profile["ts_col"],
    )
    n = profile["n_rows"]
    constraints: list[dict] = []
    rationale: list[str] = []

    for c, st in cols.items():
        if c == part_col:
            continue
        dirt = st["null_rate"] + st.get("empty_rate", 0.0)
        if dirt <= null_suggest_max and c != "status":
            entry: dict[str, Any] = {"type": "not_null", "col": c}
            if c in _NULL_FLAGS:
                entry["flag"] = _NULL_FLAGS[c]
            if "empty_rate" not in st:
                entry["empty_is_null"] = False
            entry["max_rate"] = _headroom(dirt)
            constraints.append(entry)
            rationale.append(
                f"not_null({c}): observed null+empty rate {dirt:.4f} <= "
                f"{null_suggest_max} -> gate at {entry['max_rate']}"
            )
        elif dirt > null_suggest_max:
            rationale.append(
                f"not_null({c}): SKIPPED — observed rate {dirt:.4f} exceeds "
                f"cutoff {null_suggest_max}"
            )

    # conv_id format: suggested only when a single printf-ish shape covers
    # the data is NOT derivable from the stats profile — leave format
    # rules to the user; uniqueness/sequence below are the real guards.

    seq = profile.get("sequence", {})
    if seq:
        dup_rate = seq.get("dup_rate")
        if dup_rate is None and n:
            dup_rate = max(0.0, 1.0 - seq.get("pair_distinct", n) / n)
        if dup_rate is not None and dup_rate <= seq_suggest_max:
            constraints.append({"type": "unique", "keys": [conv_col, order_col]})
            rationale.append(
                f"unique({conv_col},{order_col}): duplicate rate "
                f"{dup_rate:.4f} <= {seq_suggest_max}"
            )
        gap_rate = seq.get("gap_rate")
        if gap_rate is not None and gap_rate <= seq_suggest_max:
            constraints.append({"type": "sequence", "order_col": order_col})
            rationale.append(
                f"sequence({order_col}): gap rate {gap_rate:.4f} <= {seq_suggest_max}"
            )
        tsr = seq.get("ts_regress_rate")
        if tsr is not None and tsr <= seq_suggest_max:
            constraints.append({"type": "monotonic_ts", "ts_col": ts_col})
            rationale.append(
                f"monotonic_ts({ts_col}): regression rate {tsr:.4f} <= "
                f"{seq_suggest_max}"
            )
        gmin, gmax = seq.get("gap_seconds_min"), seq.get("gap_seconds_max")
        if gmax is not None and gmax > 0 and gmin is not None and gmin >= 0:
            # conservative envelope: 4x headroom each way off the exact
            # observed extremes, so the data the bounds were learned from
            # never flags; min bound only when every observed gap is
            # strictly positive (a legitimate 0-gap stream gets no floor)
            entry: dict[str, Any] = {
                "type": "latency",
                "max_seconds": float(math.ceil(gmax * 4)),
            }
            if gmin > 0:
                entry["min_seconds"] = round(gmin / 4, 6)
            constraints.append(entry)
            rationale.append(
                f"latency: observed inter-turn gap in [{gmin:.3f}s, "
                f"{gmax:.3f}s] -> bounds "
                f"[{entry.get('min_seconds', 'none')}, "
                f"{entry['max_seconds']}] (4x headroom each way — "
                "tighten by hand to the intended SLO; suggestion cannot "
                "know which slow gaps are session boundaries)"
            )

    for c, st in cols.items():
        # structured payloads: a string column that is (almost) always a
        # JSON object gets the shape gate; required keys are left to the
        # user (key-set intersection is a second pass and the wrong
        # guess rejects good data)
        if (
            c not in (part_col, conv_col, "status")
            and st.get("json_object_rate", 0.0) >= 0.99
            and st["null_rate"] + st.get("empty_rate", 0.0) < 1.0
        ):
            constraints.append(
                {
                    "type": "json_shape",
                    "col": c,
                    "null_is_violation": st["null_rate"] == 0.0,
                }
            )
            rationale.append(
                f"json_shape({c}): {st['json_object_rate']:.4f} of non-null "
                f"values parse as JSON objects"
                + (
                    " (nulls allowed: observed null rate > 0)"
                    if st["null_rate"] > 0
                    else ""
                )
            )

    for c, st in cols.items():
        if "domain" not in st or c in (part_col, "status", order_col):
            continue
        entry = {
            "type": "domain",
            "col": c,
            "values": [v for v in st["domain"] if v is not None],
        }
        if c in _DOMAIN_FLAGS:
            entry["flag"] = _DOMAIN_FLAGS[c]
        if st["null_rate"] > 0:
            entry["allow_null"] = True
        constraints.append(entry)
        rationale.append(
            f"domain({c}): {st['approx_distinct']} distinct values "
            f"(cutoff-bounded set collected exactly)"
        )

    trans = seq.get("transitions")
    if trans:
        constraints.append({"type": "transition", "allowed": sorted(trans)})
        rationale.append(
            f"transition(role): observed complete pair set "
            f"({len(trans)} transitions) becomes the allowed set — prune "
            "by hand to the intended protocol (suggestion cannot know "
            "which observed transitions are accidents)"
        )
    firsts, lasts = seq.get("first_roles"), seq.get("last_roles")
    if firsts or lasts:
        entry = {"type": "conv_shape"}
        if firsts:
            entry["first_roles"] = sorted(firsts)
        if lasts:
            entry["last_roles"] = sorted(lasts)
        constraints.append(entry)
        rationale.append(
            f"conv_shape: observed opening roles {sorted(firsts or [])} / "
            f"closing roles {sorted(lasts or [])}"
        )

    st = cols.get("status")
    if st is not None and "domain" in st:
        # values pass through natively (int OR string status columns) —
        # spec._build_constraint's isin works with either; int() here
        # would crash on a string-typed status domain
        ok = [v for v in st["domain"] if v is not None]
        constraints.append({"type": "status_gate", "col": "status", "ok_values": ok})
        rationale.append(
            f"status_gate: observed value set {ok} becomes the OK set — "
            "tighten by hand to the truly-good subset (suggestion cannot "
            "know which statuses are failures)"
        )

    # text-length drift: bins from the observed quantile sketch so each
    # baseline bin is populated; headroom via the standard PSI/KS gates
    tst = cols.get("text")
    if tst and tst.get("len_quantiles"):
        edges = sorted({math.floor(q) for q in tst["len_quantiles"]})
        if len(edges) >= 3:
            constraints.append(
                {
                    "type": "drift",
                    "expr": "CAST(length(text) AS DOUBLE)",
                    "bins": [float(e) for e in edges],
                    "name": "drift_text_len",
                }
            )
            rationale.append(
                f"drift(length(text)): bins at observed length quantiles {edges}"
            )
        constraints.append({"type": "stats", "col": "text"})
        rationale.append("stats(text): metrics-only null-rate/stat contributor")

    spec = {
        "part_col": part_col,
        "reject_ratio_fail": reject_ratio_fail,
        "conv_col": conv_col,
        "order_col": order_col,
        "ts_col": ts_col,
        "constraints": constraints,
    }
    return spec, rationale


def suggest_suite(
    df: DataFrame,
    part_col: str = "part",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    **knobs,
):
    """Profile ``df`` and return (Suite, spec, rationale) — the one-call
    bootstrap. The spec round-trips through ``spec.suite_from_spec``, so
    writing it to JSON and loading it later (CLI --suite) reproduces the
    suite bit-for-bit (same suite_hash)."""
    from dataval_spark.spec import suite_from_spec

    prof = profile_table(
        df, conv_col=conv_col, order_col=order_col, ts_col=ts_col,
        **{k: v for k, v in knobs.items() if k in ("max_domain", "sequence_evidence")},
    )
    spec, rationale = suggest_spec(
        prof,
        part_col=part_col,
        **{
            k: v
            for k, v in knobs.items()
            if k in ("reject_ratio_fail", "null_suggest_max", "seq_suggest_max")
        },
    )
    return suite_from_spec(spec), spec, rationale
