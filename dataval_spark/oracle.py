"""Independent pandas oracle for the transcript suite.

Recomputes expected per-row flags / approved and per-partition summaries
from the raw data using pandas only — no Spark expressions shared with the
engine — so pytest can assert verdict parity the way the reference's
end-to-end tests assert row-count conservation and known-target flags
(/root/reference/tests/test_dataval.py:15-50).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from dataval_spark.quality import DEFAULT_BITMASK, QualityFlag
from dataval_spark.suite import CHAR_BOUNDS, ROLE_DOMAIN, TOOL_DOMAIN

CONV_RE = re.compile(r"^conv-[0-9]{12}$")


def oracle_row_verdicts(pdf: pd.DataFrame, mask: int = DEFAULT_BITMASK) -> pd.DataFrame:
    """Compute (conv_id, turn_idx, part, dataval, approved) in pandas."""
    df = pdf.copy()
    df["_ord"] = np.arange(len(df))
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")

    g = df.groupby("conv_id", sort=False)
    prev_idx = g["turn_idx"].shift(1)
    next_idx = g["turn_idx"].shift(-1)
    prev_ts = g["ts"].shift(1)

    text = df["text"]
    role = df["role"]
    tool = df["tool"]

    flags = np.zeros(len(df), dtype=np.int64)

    def setf(cond: pd.Series, flag: QualityFlag):
        nonlocal flags
        flags = np.where(cond.fillna(False).to_numpy(dtype=bool), flags | int(flag), flags)

    setf(text.isna() | (text.fillna("").str.len() == 0), QualityFlag.InvalidText)
    setf((df["turn_idx"] == prev_idx) | (df["turn_idx"] == next_idx), QualityFlag.DuplicateTurn)
    setf(
        (prev_idx.isna() & (df["turn_idx"] > 0))
        | (prev_idx.notna() & (df["turn_idx"] - prev_idx > 1)),
        QualityFlag.SequenceGap,
    )
    setf(prev_ts.notna() & (df["ts"] < prev_ts), QualityFlag.NonMonotonicTs)
    setf(role.isna() | ~role.isin(ROLE_DOMAIN), QualityFlag.InvalidRole)
    setf(
        ((role == "tool") & tool.isna())
        | ((role != "tool") & role.notna() & tool.notna())
        | (tool.notna() & ~tool.isin(TOOL_DOMAIN)),
        QualityFlag.InvalidTool,
    )
    tl = text.str.len().astype("float64")
    lo = role.map({k: v[0] for k, v in CHAR_BOUNDS.items()})
    hi = role.map({k: v[1] for k, v in CHAR_BOUNDS.items()})
    setf(role.isin(list(CHAR_BOUNDS)) & tl.notna() & (tl < lo), QualityFlag.TextTooShort)
    setf(role.isin(list(CHAR_BOUNDS)) & tl.notna() & (tl > hi), QualityFlag.TextTooLong)
    setf(df["ts"].isna(), QualityFlag.InvalidTimestamp)
    setf(
        df["conv_id"].isna() | ~df["conv_id"].fillna("").map(lambda s: bool(CONV_RE.match(s))),
        QualityFlag.InvalidConvId,
    )
    bad_status = ~df["status"].isin([1, 3]) if "status" in df.columns else pd.Series(False, index=df.index)
    setf(bad_status, QualityFlag.BadStatus)

    df["dataval"] = flags
    df["approved"] = ((flags & mask) == 0) & ~bad_status.to_numpy(dtype=bool)
    # NULL part -> quarantine partition -1 (engine parity: Suite.part_expr)
    df["part"] = df["part"].fillna(-1).astype("int64")
    return df.sort_values("_ord")[["conv_id", "turn_idx", "part", "dataval", "approved"]].reset_index(drop=True)


def oracle_partition_summary(verdicts: pd.DataFrame) -> pd.DataFrame:
    g = verdicts.groupby("part")
    out = g.agg(
        n_rows=("dataval", "size"),
        n_approved=("approved", "sum"),
    ).reset_index()
    out["n_rejected"] = out["n_rows"] - out["n_approved"]
    return out
