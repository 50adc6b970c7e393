"""Quality-flag bitmask algebra.

Semantics mirrored from the reference's ``enum.IntFlag`` quality bits and
DEFAULT_BITMASK combination (/root/reference/dataval/quality.py:36-56) and
the approved-derivation UPDATE chain
(/root/reference/dataval/dataval.py:399-414), re-expressed for transcript
constraints.  The ``dataval`` column is an int32 bitmask; ``approved`` is
``(dataval & DEFAULT_BITMASK) == 0`` with a forced rejection on bad
conversation status.
"""

from __future__ import annotations

import enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class QualityFlag(enum.IntFlag):
    """Per-turn validation flag bits.

    Bit layout is this engine's own; each bit maps 1:1 to a constraint
    (SURVEY.md §7.0).  Mirrors the *shape* of the reference's 14-bit
    DatavalQualityFlags (/root/reference/dataval/quality.py:36-55), not
    its astronomy-specific meanings.
    """

    InvalidText = 1            # text NULL or empty
    DuplicateTurn = 2          # (conv_id, turn_idx) not unique
    SequenceGap = 4            # predecessor turn_idx missing in conversation
    NonMonotonicTs = 8         # ts REGRESSED (< previous turn's ts); equal ts allowed
    InvalidRole = 16           # role NULL or outside domain
    InvalidTool = 32           # tool presence inconsistent with role, or bad value
    TextTooShort = 64          # length(text) below role-conditional envelope
    TextTooLong = 128          # length(text) above role-conditional envelope
    InvalidTimestamp = 256     # ts NULL
    BadStatus = 512            # conversation status not in (OK, WARNING)
    DriftedPartition = 1024    # partition failed KS/PSI drift check
    InvalidConvId = 2048       # conv_id NULL/empty or malformed
    InvalidTransition = 4096   # (prev_role -> role) outside the allowed set
    InvalidConvShape = 8192    # conversation opening/closing/turn-count shape
    InvalidLatency = 16384     # inter-turn ts gap outside [min,max] bounds
    MalformedPayload = 32768   # payload column not a JSON object / missing keys

    @classmethod
    def flag_names(cls) -> list[str]:
        return [f.name for f in cls]


# Bits that reject a row when set — analog of the reference's
# DEFAULT_BITMASK = InvalidFlux|InvalidContamination|SmallMask|LargeMask|
# InvalidNoise (/root/reference/dataval/quality.py:56): structural errors
# reject, soft envelope/drift warnings do not.
DEFAULT_BITMASK: int = int(
    QualityFlag.InvalidText
    | QualityFlag.DuplicateTurn
    | QualityFlag.SequenceGap
    | QualityFlag.NonMonotonicTs
    | QualityFlag.InvalidRole
    | QualityFlag.InvalidTool
    | QualityFlag.TextTooShort
    | QualityFlag.TextTooLong
    | QualityFlag.InvalidTimestamp
    | QualityFlag.InvalidConvId
    # dialogue-protocol violations are structural like the above; the
    # bits are only ever set when the opt-in constraints run
    | QualityFlag.InvalidTransition
    | QualityFlag.InvalidConvShape
    # a malformed tool payload is structural; latency is opt-in and a
    # sub-min_seconds reply is machine-generated spam, so both reject
    | QualityFlag.InvalidLatency
    | QualityFlag.MalformedPayload
)


def filter_flags(dataval: Column, mask: int = DEFAULT_BITMASK) -> Column:
    """True where no masked bit is set.

    Reference semantics: ``(quality & flags) == 0``
    (/root/reference/dataval/quality.py:16-29, applied in SQL as
    ``dataval & %d = 0`` at /root/reference/dataval/dataval.py:402).
    """
    return dataval.bitwiseAND(F.lit(mask)) == 0


def binary_repr(dataval: Column, width: int = 32) -> Column:
    """Zero-padded binary string of the bitmask — analog of
    ``np.binary_repr(flag, 32)`` (/root/reference/dataval/quality.py:31-33).
    The low ``width`` bits are kept explicitly: F.lpad TRUNCATES from the
    right when the input is longer, so a negative long's 64-char
    two's-complement form would otherwise collapse to its top (sign)
    bits and lose every flag."""
    return F.lpad(F.substring(F.bin(dataval.cast("long")), -width, width), width, "0")


def flag_set(dataval: Column, flag: QualityFlag) -> Column:
    return dataval.bitwiseAND(F.lit(int(flag))) != 0


def decompose(dataval: Column) -> Column:
    """Array of flag names set in ``dataval`` (for violation detail rows)."""
    pairs = [
        F.when(flag_set(dataval, f), F.lit(f.name)).otherwise(F.lit(None))
        for f in QualityFlag
    ]
    return F.filter(F.array(*pairs), lambda x: x.isNotNull())
