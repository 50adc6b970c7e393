"""Stateful streaming sequence validation — the per-conversation checks
(duplicate turn, sequence gap, non-monotonic ts) on an unbounded stream.

Batch mode does these with one window pass (suite.py). On a stream the
conversation's history must be carried as state: this operator keeps a
CONTIGUOUS-PREFIX counter plus a bounded pending-index set per conv_id
via ``applyInPandasWithState`` and emits one verdict row per incoming
turn.

Semantics on a stream are arrival-order based, with healing:

* duplicate  — the turn index was genuinely seen before (prefix or
  pending set), so a late arrival that FILLS a gap is recognized as a
  gap-filler, never misflagged as a replay;
* gap        — the immediate predecessor index has not arrived yet;
* healed gap — when the missing predecessor arrives, the turn that was
  flagged gapped is RE-emitted with the SequenceGap bit cleared (update
  output mode: last write per key wins downstream);
* out-of-order ts — arrival ts below the conversation's running max.

State size: 4 scalars + a pending set bounded at MAX_PENDING indexes per
live conversation (the pending set only holds indexes above the
contiguous prefix, so for a healthy stream it is empty). Overflow uses
WATERMARK eviction: the lowest pending index is evicted and the prefix
advances past it, so state stays a sliding window over the most recent
indexes — replays below the window degrade to DuplicateTurn flags (the
conservative direction) rather than spurious gaps. O(live convs) state
total, with ProcessingTimeTimeout eviction for idle conversations.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from dataval_spark.quality import QualityFlag

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, dataval int, max_idx_seen int, n_seen long"
)
STATE_SCHEMA = (
    "contig int, max_idx int, n_seen long, last_ts double, "
    "pend_idx array<int>, pend_flags array<int>"
)

_DUP = int(QualityFlag.DuplicateTurn)
_GAP = int(QualityFlag.SequenceGap)
_OOO = int(QualityFlag.NonMonotonicTs)

MAX_PENDING = 1024


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
    if state.exists:
        contig, max_idx, n_seen, last_ts, pend_idx, pend_flags = state.get
        pending = dict(zip(pend_idx, pend_flags))
    else:
        contig, max_idx, n_seen, last_ts, pending = -1, -1, 0, float("-inf"), {}

    out_rows = []
    out_frames = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")

        # Vectorized fast path for the healthy-stream common case: no
        # pending holes, clean values, and the batch is exactly the next
        # contiguous run of indexes. Then no turn can be a duplicate or a
        # gap, so only the out-of-order-ts flag needs computing — one
        # numpy cummax instead of the Python row loop (measured 5x on a
        # 10k-turn in-order batch: 27 ms -> 5 ms per batch).
        if not pending and len(pdf) and pdf["turn_idx"].notna().all():
            idxs = pdf["turn_idx"].to_numpy(dtype="int64", na_value=-1)
            ts_col = pdf["ts"]
            if (
                idxs[0] == contig + 1
                and (np.diff(idxs) == 1).all()
                and pd.api.types.is_datetime64_any_dtype(ts_col)
                and ts_col.notna().all()
            ):
                n = len(idxs)
                # normalize the unit first: Arrow hands pandas
                # datetime64[us], where astype(int64) would be micros
                ts_s = ts_col.to_numpy(dtype="datetime64[ns]").astype("int64") / 1e9
                prev_max = np.maximum.accumulate(
                    np.concatenate(([last_ts], ts_s))
                )[:-1]
                flags = np.where(ts_s < prev_max, _OOO, 0).astype("int64")
                out_frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": conv_id,
                            "turn_idx": idxs,
                            "dataval": flags,
                            "max_idx_seen": np.maximum(idxs, max_idx),
                            "n_seen": n_seen + np.arange(1, n + 1),
                        }
                    )
                )
                contig = int(idxs[-1])
                max_idx = max(max_idx, contig)
                n_seen += n
                last_ts = max(last_ts, float(ts_s.max()))
                continue

        for turn_idx, ts in zip(pdf["turn_idx"], pdf["ts"]):
            # dirty rows must not kill the query: a NULL turn_idx arrives
            # as NaN (Arrow nullable int -> pandas float) and cannot be
            # sequenced — skip it (NotNull in the batch suite owns it);
            # a NULL/NaT ts keeps index sequencing but neither flags OOO
            # nor advances the ts watermark.
            if turn_idx is None or turn_idx != turn_idx:
                continue
            idx = int(turn_idx)
            if ts is None or ts != ts:
                ts_s = last_ts
            else:
                ts_s = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
            flags = 0
            if ts_s < last_ts:
                flags |= _OOO
            if idx <= contig or idx in pending:
                flags |= _DUP  # genuinely seen before: replay
            else:
                if idx > contig + 1 and (idx - 1) not in pending:
                    flags |= _GAP  # immediate predecessor missing so far
                # heal: this arrival is the missing predecessor of a
                # previously gap-flagged turn -> re-emit it, bit cleared
                nxt = pending.get(idx + 1)
                if nxt is not None and nxt & _GAP:
                    pending[idx + 1] = nxt & ~_GAP
                    out_rows.append(
                        (conv_id, idx + 1, nxt & ~_GAP, max(max_idx, idx), n_seen + 1)
                    )
                pending[idx] = flags
                # advance the contiguous prefix; pruned entries need no
                # further healing so they leave the state
                while (contig + 1) in pending:
                    contig += 1
                    pending.pop(contig)
                if len(pending) > MAX_PENDING:
                    # WATERMARK eviction: evict the lowest pending index
                    # and advance the prefix past it — "everything at or
                    # below the watermark is assumed seen". Evicting the
                    # highest would evict the just-inserted index on an
                    # in-order stream (every new turn misflagged); plain
                    # evict-lowest would strand a hole the prefix can
                    # never cross. With the watermark, a mid-conversation
                    # attach drains pending after the first eviction, and
                    # replays below the window flag as duplicates (the
                    # conservative degradation) instead of gaps.
                    evicted = min(pending)
                    pending.pop(evicted)
                    contig = max(contig, evicted)
                    while (contig + 1) in pending:
                        contig += 1
                        pending.pop(contig)
            max_idx = max(max_idx, idx)
            last_ts = max(last_ts, ts_s)
            n_seen += 1
            out_rows.append((conv_id, idx, flags, max_idx, n_seen))

    state.update(
        (
            contig,
            max_idx,
            n_seen,
            last_ts,
            sorted(pending),
            [pending[i] for i in sorted(pending)],
        )
    )
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict idle conversations
    if out_rows:
        out_frames.append(pd.DataFrame(out_rows, columns=cols))
    if out_frames:
        yield pd.concat(out_frames, ignore_index=True) if len(out_frames) > 1 else out_frames[0]
    else:
        yield pd.DataFrame(columns=cols)


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
            # verdict once per arrival (plus healed-gap re-emissions),
            # which is the desired semantics.
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
