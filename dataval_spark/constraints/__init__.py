from dataval_spark.constraints.core import (
    Constraint,
    ConversationShape,
    RoleTransition,
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
from dataval_spark.constraints.suggest import profile_table, suggest_spec, suggest_suite

__all__ = [
    "Constraint",
    "ConversationShape",
    "RoleTransition",
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
    "profile_table",
    "suggest_spec",
    "suggest_suite",
]
