"""Structured-Streaming validation: drive a real streaming query from
parquet files through the stateless flag projection + watermarked
windowed verdicts into a memory sink."""

from __future__ import annotations

import pytest

from dataval_spark.fixtures import transcripts
from dataval_spark.streaming.validate_stream import (
    stateless_flags,
    windowed_partition_verdicts,
)
from dataval_spark.suite import transcript_suite


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_input"))
    transcripts(spark, n_convs=200, seed=2187, n_parts=4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_streaming_flags_match_batch(spark, stream_dir):
    batch = spark.read.parquet(stream_dir)
    schema = batch.schema
    suite = transcript_suite()

    stream = spark.readStream.schema(schema).parquet(stream_dir)
    flagged = stateless_flags(suite, stream)
    agg = windowed_partition_verdicts(flagged, window="1 hour", watermark="2 hours")

    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("verdicts_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n_rows) AS n, sum(n_approved) AS a FROM verdicts_stream"
        ).collect()[0]
    finally:
        q.stop()

    expected_flagged = stateless_flags(suite, batch)
    exp_n = expected_flagged.count()
    exp_a = expected_flagged.where("approved").count()
    assert got.n == exp_n
    assert got.a == exp_a


def test_stateful_sequence_validation(spark, tmp_path):
    """Drive applyInPandasWithState across TWO micro-batches: state must
    carry max_idx/last_ts between batches so cross-batch duplicates and
    gaps are caught."""
    import os
    import pandas as pd

    from dataval_spark.quality import QualityFlag
    from dataval_spark.streaming.stateful import streaming_sequence_verdicts

    d = str(tmp_path / "in")
    os.makedirs(d)
    schema = "conv_id string, turn_idx int, ts string"

    def mk(rows):
        return spark.createDataFrame(rows, schema).selectExpr(
            "conv_id", "turn_idx", "cast(ts as timestamp) AS ts"
        )

    batch1 = mk(
        [("c1", 0, "2024-01-01 00:00:00"),
         ("c1", 1, "2024-01-01 00:01:00"),
         ("c2", 0, "2024-01-01 00:00:00")]
    )
    batch1.coalesce(1).write.mode("append").parquet(d)

    import time

    def poll(n_expected, deadline=120):
        t0 = time.time()
        while time.time() - t0 < deadline:
            if q.exception():
                raise AssertionError(q.exception())
            rows = spark.sql("SELECT * FROM seq_verdicts").collect()
            if len(rows) >= n_expected:
                return rows
            time.sleep(2)
        raise AssertionError(f"timed out waiting for {n_expected} rows")

    stream = spark.readStream.schema(batch1.schema).parquet(d)
    q = (
        streaming_sequence_verdicts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("seq_verdicts")
        .start()
    )
    try:
        poll(3)
        # micro-batch 2: a replayed turn (dup), a gap, an out-of-order ts
        batch2 = mk(
            [("c1", 1, "2024-01-01 00:02:00"),   # dup of existing idx
             ("c1", 4, "2024-01-01 00:03:00"),   # gap (2,3 missing)
             ("c2", 1, "2023-12-31 23:59:00")]   # ts regression
        )
        batch2.coalesce(1).write.mode("append").parquet(d)
        rows = poll(6)
        # micro-batch 3: late arrivals FILL the gap — they must be
        # recognized as gap-fillers (not replays), and the turn that was
        # flagged gapped must be re-emitted healed (SequenceGap cleared)
        batch3 = mk(
            [("c1", 2, "2024-01-01 00:04:00"),
             ("c1", 3, "2024-01-01 00:05:00")]
        )
        batch3.coalesce(1).write.mode("append").parquet(d)
        rows = poll(9)  # 2 arrivals + 1 healed re-emission of ("c1", 4)
    finally:
        q.stop()

    by_key = {}
    for r in rows:
        by_key.setdefault((r.conv_id, r.turn_idx), []).append(r.dataval)
    assert by_key[("c1", 0)] == [0]
    assert by_key[("c1", 1)][0] == 0                               # first arrival clean
    assert int(QualityFlag.DuplicateTurn) in by_key[("c1", 1)]     # replay flagged
    assert by_key[("c1", 4)][0] == int(QualityFlag.SequenceGap)    # gapped at arrival
    assert by_key[("c1", 4)][-1] == 0                              # healed re-emission
    assert by_key[("c2", 1)] == [int(QualityFlag.NonMonotonicTs)]
    # gap-fillers are NOT misflagged as duplicates
    assert by_key[("c1", 2)] == [0]
    assert by_key[("c1", 3)] == [0]


def test_stream_to_manifest_exactly_once(spark, tmp_path):
    """Checkpointed streaming validation: across restarts every input
    file is validated exactly once (the streaming face of the resumable
    manifest), and the manifest accumulates per-(batch, partition) rows."""
    from dataval_spark.manifest import read_manifest
    from dataval_spark.streaming.validate_stream import stream_to_manifest

    d = str(tmp_path / "in")
    mp = str(tmp_path / "manifest")
    ck = str(tmp_path / "ckpt")
    batch = transcripts(spark, n_convs=80, seed=2187, n_parts=4)
    n1 = batch.count()
    batch.coalesce(2).write.mode("append").parquet(d)
    schema = batch.schema
    suite = transcript_suite()

    def run_once():
        stream = spark.readStream.schema(schema).parquet(d)
        q = stream_to_manifest(stream, suite, mp, "s1", ck)
        q.awaitTermination(300)
        q.stop()

    run_once()
    m1 = read_manifest(spark, mp)
    assert m1.groupBy().sum("n_rows").collect()[0][0] == n1

    # restart with NO new data: checkpoint skips everything
    run_once()
    assert read_manifest(spark, mp).groupBy().sum("n_rows").collect()[0][0] == n1

    # new files arrive; restart processes ONLY them
    batch2 = transcripts(spark, n_convs=40, seed=42, n_parts=4)
    n2 = batch2.count()
    batch2.coalesce(1).write.mode("append").parquet(d)
    run_once()
    m3 = read_manifest(spark, mp)
    assert m3.groupBy().sum("n_rows").collect()[0][0] == n1 + n2
    # batch-scoped run ids keep increments distinguishable
    assert m3.where("run_id LIKE 's1/batch=%'").count() == m3.count()

    # crash AFTER the manifest write, BEFORE the checkpoint commit:
    # Structured Streaming re-invokes foreachBatch with the SAME
    # batch_id on restart. The writer must REPLACE its rows (batch-scoped
    # overwrite), not re-append — sum-style consumers would double-count.
    from dataval_spark.streaming.validate_stream import manifest_batch_writer

    writer = manifest_batch_writer(suite, mp, "s1")
    writer(batch2, 1)  # the batch id that processed batch2's files
    assert read_manifest(spark, mp).groupBy().sum("n_rows").collect()[0][0] == n1 + n2

    # a SECOND streaming run (fresh checkpoint -> batch ids restart at 0)
    # into the same manifest must not clobber the first run's rows: the
    # subdir key includes the run_id, and multiple run_ids per manifest
    # is a supported layout (compare_runs / baseline_from_manifest)
    writer2 = manifest_batch_writer(suite, mp, "s2")
    writer2(batch2, 0)
    m5 = read_manifest(spark, mp)
    assert m5.where("run_id LIKE 's1/%'").count() > 0
    assert m5.where("run_id LIKE 's2/%'").count() > 0
    assert (
        m5.where("run_id LIKE 's1/%'").groupBy().sum("n_rows").collect()[0][0]
        == n1 + n2
    )


def test_windowed_drift_flags_shifted_window(spark, tmp_path):
    """Streaming PSI monitor: a window matching the baseline passes, a
    distribution-shifted window drifts, and the streamed PSI equals the
    batch constraints.drift._compare_hists value bit-for-bit (same
    smoothing), so streaming and batch verdicts agree."""
    import datetime as dt

    from dataval_spark.constraints.drift import _compare_hists
    from dataval_spark.streaming.validate_stream import windowed_drift
    from pyspark.sql import functions as F

    d = str(tmp_path / "in")
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    rows = []
    # window A (10:00): 30 values spread evenly over the 3 bins
    for i in range(30):
        rows.append((float(5 + 10 * (i % 3)), t0 + dt.timedelta(seconds=i)))
    # window B (10:20): all 30 values in the last bin
    tb = t0 + dt.timedelta(minutes=20)
    for i in range(30):
        rows.append((25.0, tb + dt.timedelta(seconds=i)))
    spark.createDataFrame(rows, "v double, ts timestamp").write.parquet(d)

    bins = [0.0, 10.0, 20.0, 30.0]
    baseline = [10.0, 10.0, 10.0]
    stream = spark.readStream.schema("v double, ts timestamp").parquet(d)
    out = windowed_drift(stream, F.col("v"), bins, baseline)
    q = (
        out.writeStream.format("memory")
        .queryName("drift_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    got = {
        r["window"]["start"].minute: r
        for r in spark.sql("SELECT * FROM drift_windows").collect()
    }
    assert not got[0]["drifted"] and got[0]["psi"] < 0.01
    assert got[20]["drifted"]
    expect = _compare_hists([0.0, 0.0, 30.0], baseline, 0.25, 1.0)
    assert abs(got[20]["psi"] - expect["psi"]) < 1e-5
    assert abs(got[20]["ks"] - expect["ks"]) < 1e-5


def test_manifest_baseline_feeds_windowed_drift(spark, tmp_path):
    """The documented composition: a blessed batch run's manifest
    histogram (baseline_from_manifest) IS windowed_drift's baseline
    shape. Streaming the same distribution against it must not drift;
    streaming a length-inflated corpus must."""
    from pyspark.sql import functions as F

    from dataval_spark.constraints.drift import Drift
    from dataval_spark.manifest import baseline_from_manifest
    from dataval_spark.streaming.validate_stream import (
        manifest_batch_writer,
        windowed_drift,
    )

    suite = transcript_suite()
    base = transcripts(spark, n_convs=80, seed=11, n_parts=4, with_defects=False)
    mp = str(tmp_path / "m")
    manifest_batch_writer(suite, mp, "blessed")(base, 0)

    drift_c = next(c for c in suite.constraints if isinstance(c, Drift))
    baseline = baseline_from_manifest(
        spark, mp, "blessed/batch=0", drift_c.name, drift_c.nbins
    )
    assert len(baseline) == drift_c.nbins and sum(baseline) > 0

    def run_stream(df, name):
        d = str(tmp_path / name)
        df.write.parquet(d)
        stream = spark.readStream.schema(df.schema).parquet(d)
        out = windowed_drift(
            stream, drift_c.expr(), drift_c.bins, baseline, window="3650 days"
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(200)
        q.stop()
        return spark.sql(f"SELECT * FROM {name}").collect()

    same = run_stream(
        transcripts(spark, n_convs=80, seed=12, n_parts=4, with_defects=False),
        "wd_same",
    )
    assert len(same) == 1 and not same[0]["drifted"], same
    shifted = run_stream(
        transcripts(spark, n_convs=80, seed=12, n_parts=4, with_defects=False)
        .withColumn("text", F.concat(F.col("text"), F.lit("x" * 700))),
        "wd_shift",
    )
    assert len(shifted) == 1 and shifted[0]["drifted"], shifted


def test_dedup_stream_drops_replays_within_watermark(spark, tmp_path):
    """Cross-micro-batch replay of (conv_id, turn_idx) within the
    watermark horizon must be dropped; distinct keys all pass."""
    import time as _t

    from dataval_spark.streaming.validate_stream import dedup_stream

    d = str(tmp_path / "in")
    schema = "conv_id string, turn_idx int, ts string"

    def mk(rows):
        return spark.createDataFrame(rows, schema).selectExpr(
            "conv_id", "turn_idx", "cast(ts as timestamp) AS ts"
        )

    mk([("c1", 0, "2024-01-01 00:00:00"),
        ("c1", 1, "2024-01-01 00:01:00")]).coalesce(1).write.mode("append").parquet(d)

    stream = spark.readStream.schema("conv_id string, turn_idx int, ts timestamp").parquet(d)
    q = (
        dedup_stream(stream, watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one replay (same key, later ts) + one new turn
        mk([("c1", 1, "2024-01-01 00:02:00"),
            ("c1", 2, "2024-01-01 00:03:00")]).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        _t.sleep(1)
        rows = spark.sql("SELECT conv_id, turn_idx FROM dedup_out").collect()
    finally:
        q.stop()
    keys = sorted((r.conv_id, r.turn_idx) for r in rows)
    assert keys == [("c1", 0), ("c1", 1), ("c1", 2)]  # replay dropped


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


def test_pending_overflow_watermark_keeps_flags_correct():
    """Mid-conversation attach (turns start at 5000, in order, far past
    MAX_PENDING): after overflow the watermark advances the prefix, so
    only the FIRST turn carries a gap flag — the old evict-highest would
    misflag every turn past the cap, evict-lowest would pin the set."""
    import pandas as pd

    from dataval_spark.quality import QualityFlag
    from dataval_spark.streaming.stateful import MAX_PENDING, validate_conversation

    n = MAX_PENDING + 200
    pdf = pd.DataFrame({
        "turn_idx": range(5000, 5000 + n),
        "ts": [float(i) for i in range(n)],
    })
    state = _FakeState()
    out = pd.concat(validate_conversation(("c1",), iter([pdf]), state))
    gap = int(QualityFlag.SequenceGap)
    flagged = out[out["dataval"] & gap != 0]
    assert list(flagged["turn_idx"]) == [5000]  # only the attach point
    assert (out["dataval"].iloc[1:] == 0).all()
    # state stayed bounded
    contig, max_idx, n_seen, last_ts, pend_idx, pend_flags = state.get
    assert len(pend_idx) <= MAX_PENDING
    assert n_seen == n


def test_stateful_kernel_fast_path_matches_row_loop():
    """The vectorized in-order fast path must emit byte-identical rows
    and state to the Python row loop. Same logical input twice: datetime
    ts engages the fast path; float-seconds ts (equal epoch values)
    forces the row loop. Includes non-monotonic timestamps so the OOO
    cummax is actually exercised, and a second out-of-order batch so the
    fast->slow state handoff is covered."""
    import numpy as np
    import pandas as pd

    from dataval_spark.streaming.stateful import validate_conversation

    n = 500
    secs = np.arange(n) * 10.0
    secs[50] = 0.0  # out-of-order ts inside an in-order index run
    secs[51] = 1.0
    b1_idx = np.arange(n)
    b2_idx = np.array([n + 1, n + 3, n])  # gap + fill: slow path territory
    b2_secs = np.array([5000.0, 5010.0, 4990.0])

    def run(as_datetime: bool):
        if as_datetime:
            mk = lambda s: pd.to_datetime(s, unit="s")  # noqa: E731
        else:
            mk = lambda s: s.astype(float)  # noqa: E731
        st = _FakeState()
        out1 = pd.concat(
            validate_conversation(
                ("c",), iter([pd.DataFrame({"turn_idx": b1_idx, "ts": mk(secs)})]), st
            )
        )
        out2 = pd.concat(
            validate_conversation(
                ("c",),
                iter([pd.DataFrame({"turn_idx": b2_idx, "ts": mk(b2_secs)})]),
                st,
            )
        )
        return out1, out2, st.get

    f1, f2, fs = run(True)
    s1, s2, ss = run(False)
    assert f1.values.tolist() == s1.values.tolist()
    assert f2.values.tolist() == s2.values.tolist()
    assert fs == ss
    # and the fast batch actually flagged the planted OOO timestamps
    from dataval_spark.quality import QualityFlag

    ooo = int(QualityFlag.NonMonotonicTs)
    assert set(f1[f1["dataval"] & ooo != 0]["turn_idx"]) == {50, 51}


def test_stateful_kernel_tolerates_null_idx_and_ts():
    """A NULL turn_idx (NaN via Arrow) or NULL ts (NaT) must not kill the
    streaming query: NULL idx rows are skipped (NotNull owns them),
    NULL ts neither flags OOO nor advances the watermark."""
    import numpy as np
    import pandas as pd

    from dataval_spark.streaming.stateful import validate_conversation

    pdf = pd.DataFrame({
        "turn_idx": [0.0, np.nan, 1.0, 2.0],
        "ts": pd.to_datetime(["2024-01-01", None, "2024-01-02", "2024-01-03"]),
    })
    state = _FakeState()
    out = pd.concat(validate_conversation(("c1",), iter([pdf]), state))
    assert list(out["turn_idx"]) == [0, 1, 2]  # NaN row skipped
    assert (out["dataval"] == 0).all()


def test_row_local_pipeline_ops_run_on_streams(spark, tmp_path):
    """The round-4 row-local operators (Gopher repetition metrics, URL
    canonicalization, int8 quantization, the mixing sample filter) are
    stateless column expressions, so they must run unchanged inside a
    Structured Streaming micro-batch and agree with the batch run."""
    import pyspark.sql.functions as F

    from dataval_spark.operators.mixing import uniform_hash
    from dataval_spark.operators.quality_filters import repetition_metrics
    from dataval_spark.operators.quantize import quantize_embeddings
    from dataval_spark.operators.urls import canonical_url

    rows = [
        ("d1", "the cat sat\nthe cat sat\nnew line",
         "https://Example.COM/x?utm_source=a&b=1", [1.0, -2.0, 3.0, 4.0]),
        ("d2", "all distinct words here today friends",
         "http://other.example.co.uk:80/y", [0.0, 0.0, 0.0, 0.0]),
        ("d3", None, None, None),
    ]
    schema = "doc_id string, text string, url string, embedding array<double>"
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "in")
    df.write.parquet(d)

    def transform(frame):
        from dataval_spark.operators.packing import split_long_docs
        from dataval_spark.operators.urls import filter_by_domain

        out = repetition_metrics(frame, "text", top_ns=(2,), dup_ns=(5,))
        out = out.withColumn("curl", canonical_url(F.col("url")))
        out = quantize_embeddings(out)
        # collection-branch domain filter + long-doc splitting are also
        # row-local: must run per micro-batch unchanged
        out = filter_by_domain(out, block={"blocked.example.net"})
        out = split_long_docs(out, id_col="doc_id", text_col="text",
                              window_tokens=4)
        return out.withColumn("u", F.round(uniform_hash(F.col("doc_id"), 7), 9))

    stream = spark.readStream.schema(df.schema).parquet(d)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("rowlocal_ops")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_idx"]): r.asDict()
        for r in spark.sql("select * from rowlocal_ops").collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): r.asDict()
        for r in transform(df).collect()
    }
    assert got == want and len(got) == 5  # d1 and d2 split into 2 chunks each


def test_heap_eviction_matches_linear_scan_mirror():
    """The watermark eviction picks the lowest pending index via a
    lazy-deletion heap (O(log p)); this mirror re-derives the verdict
    stream with the straightforward min()-scan bookkeeping and must
    agree row-for-row on an adversarial 20%-gap stream that crosses
    MAX_PENDING repeatedly (delays far beyond the cap force evictions,
    heals, and replays in the same run)."""
    import numpy as np
    import pandas as pd

    from dataval_spark.quality import QualityFlag
    from dataval_spark.streaming.stateful import MAX_PENDING, validate_conversation

    dup, gap, ooo = (
        int(QualityFlag.DuplicateTurn),
        int(QualityFlag.SequenceGap),
        int(QualityFlag.NonMonotonicTs),
    )

    def mirror(batches):
        contig, max_idx, n_seen, last_ts = -1, -1, 0, float("-inf")
        pending: dict[int, int] = {}
        rows = []
        for pdf in batches:
            pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
            for idx, ts_s in zip(pdf["turn_idx"].tolist(), pdf["ts"].tolist()):
                idx = int(idx)
                flags = 0
                if ts_s < last_ts:
                    flags |= ooo
                if idx <= contig or idx in pending:
                    flags |= dup
                else:
                    if idx > contig + 1 and (idx - 1) not in pending:
                        flags |= gap
                    nxt = pending.get(idx + 1)
                    if nxt is not None and nxt & gap:
                        pending[idx + 1] = nxt & ~gap
                        rows.append(("c", idx + 1, nxt & ~gap,
                                     max(max_idx, idx), n_seen + 1))
                    pending[idx] = flags

                    def advance(cur_idx, cur_flags):
                        nonlocal contig
                        while (contig + 1) in pending:
                            contig += 1
                            pending.pop(contig)
                        return cur_flags

                    flags = advance(idx, flags)
                    if len(pending) > MAX_PENDING:
                        evicted = min(pending)  # the old O(p) scan
                        pending.pop(evicted)
                        contig = max(contig, evicted)
                        flags = advance(idx, flags)
                max_idx = max(max_idx, idx)
                last_ts = max(last_ts, ts_s)
                n_seen += 1
                rows.append(("c", idx, flags, max_idx, n_seen))
        return rows

    rng = np.random.default_rng(42)
    n = 40_000
    delay = np.where(rng.random(n) < 0.2, rng.integers(1, 3 * MAX_PENDING + 500, n), 0)
    arrival = np.argsort(np.arange(n) + delay, kind="stable").astype(np.int64)
    # sprinkle replays so the duplicate branch runs under eviction too
    replays = arrival[rng.integers(0, n, 200)]
    arrival = np.concatenate([arrival, replays])
    ts = arrival.astype("float64")
    batch = 2_000
    batches = [
        pd.DataFrame({"turn_idx": arrival[i:i + batch], "ts": ts[i:i + batch]})
        for i in range(0, len(arrival), batch)
    ]

    class _St:
        hasTimedOut = False
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def setTimeoutDuration(self, ms):
            pass

    st = _St()
    got = []
    for b in batches:
        for f in validate_conversation(("c",), iter([b.copy()]), st):
            got.extend(map(tuple, f.itertuples(index=False)))
    want = mirror(batches)
    assert len(got) == len(want)
    assert got == want
