"""Schema conformance / migration — the engine analog of the
reference's in-place column migrations (SURVEY §1.3: e.g. adding the
``cadence`` column and backfilling it, /root/reference/dataval/dataval.py:126-140).

Spark tables are immutable, so "migration" is a conforming projection:
``conform(df, target)`` returns the frame with exactly the target
columns — missing ones added (NULL or a per-column default SQL
expression, the backfill), types cast, extras dropped (or rejected in
strict mode). One narrow projection: no shuffle, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def conform(
    df: DataFrame,
    target_ddl: str,
    defaults: dict[str, str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Project ``df`` onto the target schema (a DDL string like
    ``"conv_id string, turn_idx int"``).

    * missing column  -> ``defaults[col]`` (a SQL expression over the
      existing columns — the backfill rule) or typed NULL
    * type mismatch   -> cast
    * extra column    -> dropped; ValueError in strict mode
    """
    target = T.StructType.fromDDL(target_ddl)
    have = dict(df.dtypes)
    extras = [c for c in df.columns if c not in {f.name for f in target.fields}]
    if strict and extras:
        raise ValueError(f"extra columns not in target schema: {extras}")

    cols = []
    for f in target.fields:
        if f.name in have:
            c = F.col(f.name)
            if have[f.name] != f.dataType.simpleString():
                c = c.cast(f.dataType)
        elif defaults and f.name in defaults:
            c = F.expr(defaults[f.name]).cast(f.dataType)
        else:
            c = F.lit(None).cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def schema_diff(df: DataFrame, target_ddl: str) -> dict[str, list]:
    """What conform would change: {missing, extra, retyped}."""
    target = T.StructType.fromDDL(target_ddl)
    have = dict(df.dtypes)
    want = {f.name: f.dataType.simpleString() for f in target.fields}
    return {
        "missing": sorted(set(want) - set(have)),
        "extra": sorted(set(have) - set(want)),
        "retyped": sorted(
            c for c in set(want) & set(have) if want[c] != have[c]
        ),
    }
