"""Declarative suite specification: build a validation Suite from a
plain JSON/dict document — the "declarative schema + constraint suite"
face of the north rule, and the CLI's custom-suite input (--suite).

Every expression in a spec is an ANSI SQL string (compiled with
``F.expr``), so a suite is fully serializable: no Python callables, and
the manifest settings guard (manifest.suite_hash) sees the SQL text
itself — two specs differing only in an expression hash differently.

Example spec::

    {
      "part_col": "part",
      "reject_ratio_fail": 0.1,
      "constraints": [
        {"type": "not_null", "col": "text", "flag": "InvalidText",
         "max_rate": 0.05},
        {"type": "unique", "keys": ["conv_id", "turn_idx"]},
        {"type": "sequence"},
        {"type": "monotonic_ts"},
        {"type": "domain", "col": "role",
         "values": ["system", "user", "assistant", "tool"],
         "flag": "InvalidRole"},
        {"type": "cross_field", "name": "tool_consistency",
         "when": "role = 'tool' AND tool IS NULL", "flag": "InvalidTool"},
        {"type": "envelope", "expr": "CAST(length(text) AS DOUBLE)",
         "group_col": "role", "bounds": {"user": [2, 4000]},
         "name": "text_len"},
        {"type": "status_gate", "ok_values": [1, 3]},
        {"type": "stats", "col": "text"},
        {"type": "drift", "expr": "CAST(length(text) AS DOUBLE)",
         "bins": [0, 60, 120, 300, 900], "name": "drift_text_len"}
      ]
    }
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataval_spark.constraints.core import (
    Constraint,
    ConversationShape,
    CrossField,
    Domain,
    Envelope,
    JsonShape,
    MonotonicTs,
    NotNull,
    ResponseLatency,
    RoleTransition,
    SequenceIntegrity,
    Stats,
    StatusGate,
    Unique,
)
from dataval_spark.constraints.drift import Drift
from dataval_spark.quality import QualityFlag
from dataval_spark.suite import Suite


class SqlExpr:
    """A SQL-string expression usable wherever constraints take a
    callable. The SQL text is embedded in __qualname__ so
    Constraint.identity() — and therefore manifest.suite_hash — keys on
    the actual expression, not an anonymous lambda."""

    def __init__(self, sql: str):
        self.sql = sql
        self.__qualname__ = f"sql:{sql}"

    def __call__(self, *_args):
        return F.expr(self.sql)


def _flag(value) -> QualityFlag | None:
    if value is None:
        return None
    if isinstance(value, QualityFlag):
        return value
    return QualityFlag[value]


def _build_constraint(c: dict) -> Constraint:
    kind = c["type"]
    if kind == "not_null":
        return NotNull(
            c["col"],
            flag=_flag(c.get("flag")),
            empty_is_null=c.get("empty_is_null", True),
            max_rate=c.get("max_rate"),
        )
    if kind == "unique":
        return Unique(keys=tuple(c.get("keys", ("conv_id", "turn_idx"))))
    if kind == "sequence":
        return SequenceIntegrity(order_col=c.get("order_col", "turn_idx"))
    if kind == "monotonic_ts":
        return MonotonicTs(ts_col=c.get("ts_col", "ts"))
    if kind == "domain":
        return Domain(
            col=c["col"],
            values=tuple(c["values"]),
            flag=_flag(c.get("flag")),
            allow_null=c.get("allow_null", False),
        )
    if kind == "cross_field":
        return CrossField(
            name=c.get("name", "cross_field"),
            condition=SqlExpr(c["when"]),
            flag=_flag(c.get("flag")),
        )
    if kind == "envelope":
        return Envelope(
            expr=SqlExpr(c["expr"]),
            group_col=c.get("group_col", "role"),
            bounds={k: (float(a), float(b)) for k, (a, b) in c["bounds"].items()},
            low_flag=_flag(c.get("low_flag", "TextTooShort")),
            high_flag=_flag(c.get("high_flag", "TextTooLong")),
            name=c.get("name", "envelope"),
        )
    if kind == "status_gate":
        return StatusGate(
            col=c.get("col", "status"), ok_values=tuple(c.get("ok_values", (1, 3)))
        )
    if kind == "transition":
        return RoleTransition(
            col=c.get("col", "role"),
            allowed=tuple(c["allowed"]),
            flag=_flag(c.get("flag", "InvalidTransition")),
        )
    if kind == "conv_shape":
        return ConversationShape(
            col=c.get("col", "role"),
            first_roles=tuple(c["first_roles"]) if c.get("first_roles") else None,
            last_roles=tuple(c["last_roles"]) if c.get("last_roles") else None,
            min_turns=c.get("min_turns"),
            max_turns=c.get("max_turns"),
            flag=_flag(c.get("flag", "InvalidConvShape")),
        )
    if kind == "latency":
        return ResponseLatency(
            min_seconds=c.get("min_seconds"),
            max_seconds=c.get("max_seconds"),
            ts_col=c.get("ts_col", "ts"),
            role_col=c.get("role_col", "role"),
            roles=tuple(c["roles"]) if c.get("roles") else None,
            flag=_flag(c.get("flag", "InvalidLatency")),
        )
    if kind == "json_shape":
        return JsonShape(
            col=c.get("col", "props"),
            required_keys=tuple(c.get("required_keys", ())),
            when=SqlExpr(c["when"]) if c.get("when") else None,
            null_is_violation=c.get("null_is_violation", True),
            flag=_flag(c.get("flag", "MalformedPayload")),
        )
    if kind == "stats":
        return Stats(col=c["col"], approx_distinct=c.get("approx_distinct", False))
    if kind == "drift":
        return Drift(
            expr=SqlExpr(c["expr"]),
            bins=[float(x) for x in c["bins"]],
            psi_threshold=c.get("psi_threshold", 0.25),
            ks_threshold=c.get("ks_threshold", 0.30),
            name=c.get("name", "drift"),
            baseline=c.get("baseline"),
        )
    raise ValueError(f"unknown constraint type {kind!r}")


def suite_from_spec(spec: dict | str) -> Suite:
    """Build a Suite from a spec dict, a JSON string, or a JSON file
    path."""
    if isinstance(spec, str):
        if spec.lstrip().startswith("{"):
            spec = json.loads(spec)
        else:
            with open(spec) as f:
                spec = json.load(f)
    mask = spec.get("default_mask")
    if isinstance(mask, list):  # flag names -> bitmask
        if not mask:
            raise ValueError(
                "default_mask: empty list would approve EVERY row "
                "(mask 0) — a vacuous suite; omit the key for the default"
            )
        names, mask = mask, 0
        for name in names:
            mask |= int(QualityFlag[name])
    elif mask is not None and not isinstance(mask, int):
        raise ValueError(
            f"default_mask must be an int bitmask or a list of flag "
            f"names, got {type(mask).__name__}"
        )
    if mask == 0:
        raise ValueError(
            "default_mask 0 would approve EVERY row — a vacuous suite; "
            "omit the key for the default mask"
        )
    kwargs = {} if mask is None else {"default_mask": mask}
    return Suite(
        [_build_constraint(c) for c in spec["constraints"]],
        part_col=spec.get("part_col", "part"),
        reject_ratio_fail=spec.get("reject_ratio_fail", 0.10),
        conv_col=spec.get("conv_col", "conv_id"),
        order_col=spec.get("order_col", "turn_idx"),
        ts_col=spec.get("ts_col", "ts"),
        **kwargs,
    )
