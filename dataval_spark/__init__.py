"""dataval_spark — a PySpark-native schema + constraint validation engine.

A from-scratch reimagining of the query semantics of ``tasoc/dataval``
(reference at /root/reference, see SURVEY.md) as a declarative constraint
suite over tables of multi-turn conversation transcripts:

* per-column stats (null-rate, distinctness, min/max, quantile sketches)
* uniqueness on (conv_id, turn_idx)
* referential integrity of turn_idx sequences within conversations
* role/tool domain + cross-field checks
* KS/PSI distribution-drift checks per partition
* bitmask verdict algebra (dataval flags -> approved), per-partition
  pass/fail summaries and violation-row tables
* resumable manifest/checkpoint semantics

Everything is computed with DataFrame aggregates in as few passes as
possible (one window pass for sequence checks + one wide projection for
row flags + one wide groupBy for partition metrics), with vectorized
Arrow/pandas UDFs only where built-ins cannot express the semantics.
"""

from dataval_spark.quality import QualityFlag, DEFAULT_BITMASK
from dataval_spark.suite import Suite, ValidationResult
from dataval_spark.verdict import combine_verdicts

__version__ = "0.1.0"

__all__ = [
    "QualityFlag",
    "DEFAULT_BITMASK",
    "Suite",
    "ValidationResult",
    "combine_verdicts",
    "__version__",
]
