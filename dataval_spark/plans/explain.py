"""Plan introspection helpers — the engine's own checks that Catalyst
produced the physical plan we designed for (SURVEY.md §4).

Used in tests and by `bench.py --explain`-style debugging: assert filters
reached the parquet scan, projections were pruned, the wide agg stayed in
whole-stage-codegen HashAggregate (not interpreted ObjectHashAggregate),
and broadcast joins actually broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(df: DataFrame) -> bool:
    """True when the parquet scan carries PushedFilters (predicate reached
    the data source)."""
    p = physical_plan(df)
    return "PushedFilters: [" in p and "PushedFilters: []" not in p


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    import re

    p = physical_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    if not m:
        return []
    return [f.split(":")[0] for f in m.group(1).split(",") if f]

def uses_codegen_hash_aggregate(df: DataFrame) -> bool:
    """True when aggregation runs as HashAggregate (whole-stage codegen
    capable). ObjectHashAggregate = an imperative agg leaked in and the
    whole pass runs interpreted — the regression this guards against."""
    p = physical_plan(df)
    return "ObjectHashAggregate" not in p


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan — the scale-cost headline. The
    fused suite must show exactly 2 (window by conv_id + agg by part).
    With AQE, the executed-plan string repeats the tree under
    '== Initial Plan ==' — only the final section is counted."""
    p = physical_plan(df).split("== Initial Plan ==")[0]
    return p.count("Exchange hashpartitioning") + p.count("Exchange rangepartitioning")
