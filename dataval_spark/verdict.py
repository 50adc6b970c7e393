"""Standalone verdict combination — the bitmask→approved algebra.

Exact parity with the reference's ordered UPDATE chain
(/root/reference/dataval/dataval.py:399-414):

  1. ``approved = (dataval == 0)``                          (line 401)
  2. ``approved = (dataval & DEFAULT_BITMASK) == 0`` for dataval > 0
                                                            (line 402)
  3. force ``approved = False`` where status ∉ (OK, WARNING) (404-413)

Steps 1+2 collapse to one expression (``dataval & mask == 0`` is also true
when dataval==0); step 3 is a later UPDATE, so it wins — expressed here as
a trailing AND, preserving override order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataval_spark.quality import DEFAULT_BITMASK


def approved_expr(
    dataval: Column,
    mask: int = DEFAULT_BITMASK,
    status: Column | None = None,
    ok_status: Sequence[int] = (1, 3),
) -> Column:
    ok = dataval.bitwiseAND(F.lit(mask)) == 0
    if status is not None:
        # NULL status must force approved=False, not approved=NULL —
        # consistent with StatusGate (constraints/core.py) and the pandas
        # oracle, which both reject NULL status. Without the coalesce the
        # row would count as neither approved nor rejected.
        ok = ok & F.coalesce(status.isin(*ok_status), F.lit(False))
    return ok


def combine_verdicts(
    df: DataFrame,
    mask: int = DEFAULT_BITMASK,
    status_col: str | None = "status",
    ok_status: Sequence[int] = (1, 3),
) -> DataFrame:
    """Add/overwrite ``approved`` on a DataFrame that carries ``dataval``.

    Without a status column (e.g. recombining persisted row_verdicts,
    which carry only the bitmask), a set BadStatus BIT stands in for the
    status override: the suite set that bit exactly when it force-
    rejected the row, so recombination must not silently re-approve it
    (BadStatus is deliberately outside DEFAULT_BITMASK)."""
    from dataval_spark.quality import QualityFlag

    status = F.col(status_col) if status_col and status_col in df.columns else None
    ok = approved_expr(F.col("dataval"), mask, status, ok_status)
    if status is None:
        ok = ok & (
            F.col("dataval").bitwiseAND(F.lit(int(QualityFlag.BadStatus))) == 0
        )
    return df.withColumn("approved", ok)
