"""Differential pin: the optimized streaming kernel must be
byte-identical — emissions AND carried state — to the frozen round-6
reference copy (tests/_stateful_reference.py) on adversarial streams:
cross-batch disorder, duplicates, NULL idx/ts/role, datetime and float
timestamps, and forced watermark eviction via a tiny MAX_PENDING.

This is what licenses every later fast-path/bulk-path optimization: the
reference is the plain row loop semantics, the live module may take any
shortcut that produces the same bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import dataval_spark.streaming.stateful as live
import tests._stateful_reference as ref


class _FakeState:
    def __init__(self):
        self.hasTimedOut = False
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self.exists = False


ROLES = ["user", "assistant", "tool", None]
ALLOWED = {"user>assistant", "assistant>user", "assistant>tool", "tool>assistant"}


def _gen_stream(rng: np.random.Generator, n: int, datetime_ts: bool):
    """A list of batches of (turn_idx, ts, role) rows: ~15% of indexes
    deferred one batch (cross-batch gaps+heals), ~5% replayed
    (duplicates), ~5% NULL idx, ~10% NULL ts, roles drawn with NULLs,
    timestamps mostly increasing with occasional regressions."""
    batches = []
    carry: list[tuple] = []
    base_ts = 1_700_000_000.0
    batch_size = int(rng.integers(3, 12))
    rows_iter = []
    for i in range(n):
        ts = base_ts + i * 10.0 + float(rng.normal(0, 3))
        if rng.random() < 0.08:
            ts -= 50.0  # planted OOO
        if rng.random() < 0.10:
            ts = None
        idx = None if rng.random() < 0.05 else i
        role = ROLES[int(rng.integers(0, len(ROLES)))]
        rows_iter.append((idx, ts, role))
        if rng.random() < 0.05 and i > 0:
            rows_iter.append(rows_iter[int(rng.integers(0, len(rows_iter)))])
    pos = 0
    while pos < len(rows_iter) or carry:
        take = rows_iter[pos : pos + batch_size]
        pos += batch_size
        now, defer = list(carry), []
        for r in take:
            (defer if rng.random() < 0.15 else now).append(r)
        carry = defer
        if not now and pos >= len(rows_iter):
            now, carry = carry, []
        if now:
            idxs, tss, rs = zip(*now)
            ts_series = pd.Series(
                [t if t is not None else np.nan for t in tss], dtype="float64"
            )
            if datetime_ts:
                ts_series = pd.to_datetime(ts_series, unit="s")
            batches.append(
                pd.DataFrame(
                    {
                        "turn_idx": pd.array(
                            [i for i in idxs], dtype="Int64"
                        ).astype("float64"),
                        "ts": ts_series,
                        "role": list(rs),
                    }
                )
            )
    return batches


def _drive(module, batches, allowed, bounds):
    v = module.make_validator(allowed, latency_bounds=bounds)
    st = _FakeState()
    frames = []
    for b in batches:
        frames.extend(v(("c",), iter([b.copy()]), st))
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    return out, st._v


@pytest.mark.parametrize("datetime_ts", [True, False])
@pytest.mark.parametrize(
    "allowed,bounds",
    [
        (None, None),
        (ALLOWED, None),
        (None, (1.0, 60.0)),
        (ALLOWED, (1.0, 60.0)),
    ],
)
def test_kernel_matches_frozen_reference(monkeypatch, datetime_ts, allowed, bounds):
    for seed in (11, 23, 47):
        rng = np.random.default_rng(seed)
        batches = _gen_stream(rng, n=160, datetime_ts=datetime_ts)
        got, got_state = _drive(live, batches, allowed, bounds)
        want, want_state = _drive(ref, batches, allowed, bounds)
        assert got.values.tolist() == want.values.tolist(), f"seed={seed}"
        assert got_state == want_state, f"seed={seed}"


@pytest.mark.parametrize("allowed,bounds", [(None, None), (ALLOWED, (1.0, 60.0))])
def test_kernel_matches_reference_under_eviction(monkeypatch, allowed, bounds):
    """Tiny MAX_PENDING forces the watermark-eviction dance constantly;
    the optimized kernel must still match byte-for-byte."""
    monkeypatch.setattr(live, "MAX_PENDING", 6)
    monkeypatch.setattr(ref, "MAX_PENDING", 6)
    for seed in (5, 19):
        rng = np.random.default_rng(seed)
        batches = _gen_stream(rng, n=200, datetime_ts=True)
        got, got_state = _drive(live, batches, allowed, bounds)
        want, want_state = _drive(ref, batches, allowed, bounds)
        assert got.values.tolist() == want.values.tolist(), f"seed={seed}"
        assert got_state == want_state, f"seed={seed}"


def test_long_pending_run_matches_reference():
    """The bulk pending-insert shape: one giant ascending run far above
    the prefix (all pending, no eviction), then the missing head arrives
    and the whole run drains through _advance."""
    n = 600
    head = pd.DataFrame(
        {
            "turn_idx": [0.0],
            "ts": pd.to_datetime(pd.Series([1e9]), unit="s"),
            "role": ["user"],
        }
    )
    run = pd.DataFrame(
        {
            "turn_idx": np.arange(2, n + 2, dtype="float64"),
            "ts": pd.to_datetime(
                pd.Series(1e9 + np.arange(2, n + 2) * 5.0), unit="s"
            ),
            "role": ["user" if i % 2 == 0 else "assistant" for i in range(2, n + 2)],
        }
    )
    heal = pd.DataFrame(
        {
            "turn_idx": [1.0],
            "ts": pd.to_datetime(pd.Series([1e9 + 5.0]), unit="s"),
            "role": ["assistant"],
        }
    )
    for allowed, bounds in ((None, None), (ALLOWED, (1.0, 60.0))):
        got, got_state = _drive(live, [head, run, heal], allowed, bounds)
        want, want_state = _drive(ref, [head, run, heal], allowed, bounds)
        assert got.values.tolist() == want.values.tolist()
        assert got_state == want_state
