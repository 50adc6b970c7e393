from dataval_spark.constraints.core import (
    Constraint,
    CrossField,
    Domain,
    Envelope,
    MonotonicTs,
    NotNull,
    SequenceIntegrity,
    StatusGate,
    Stats,
    Unique,
)
from dataval_spark.constraints.drift import Drift

__all__ = [
    "Constraint",
    "CrossField",
    "Domain",
    "Envelope",
    "MonotonicTs",
    "NotNull",
    "SequenceIntegrity",
    "StatusGate",
    "Stats",
    "Unique",
    "Drift",
]
