"""Exactly-once streaming sink into SnapshotTable: crash-replay
idempotence at the foreachBatch seam, watermark survival across
maintenance commits and snapshot expiry, a real availableNow run, and
the stream -> incremental-validation composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import SnapshotTable
from dataval_spark.streaming.snapshot_sink import (
    run_key,
    snapshot_batch_writer,
    stream_to_snapshot,
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("part")
    )


def test_replayed_batch_is_a_no_op(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    w = snapshot_batch_writer(t, run_id="crawl", partition_by=["part"])
    w(_batch(spark, 0, 10), 0)
    w(_batch(spark, 10, 15), 1)
    v_before = t.current_version()
    # crash replay: Spark re-invokes with the SAME batch ids
    w(_batch(spark, 0, 10), 0)
    w(_batch(spark, 10, 15), 1)
    assert t.current_version() == v_before  # no snapshot committed
    assert t.read().count() == 15
    assert sorted(r.id for r in t.read().collect()) == list(range(15))
    # the next NEW batch still lands
    w(_batch(spark, 15, 18), 2)
    assert t.read().count() == 18
    assert t.stream_batch(run_key("crawl")) == 2
    # later batches inherit the recorded layout
    assert all("part=" in rel for rel, _ in t.files(t.snapshot()))


def test_watermark_survives_maintenance_and_expiry(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    w = snapshot_batch_writer(t, run_id="crawl")
    w(_batch(spark, 0, 20), 0)
    # interleaved maintenance commits carry the watermark forward
    t.delete_where({"id": (0, 4)})
    t.compact(target_file_bytes=512 * 1024 * 1024)
    t.append(_batch(spark, 100, 105))  # an out-of-band writer
    assert t.stream_batch(run_key("crawl")) == 0
    # expire everything but the head: the marker lives in the HEAD, not
    # only in the snapshot that recorded it
    t.expire_snapshots(keep_last=1)
    assert t.stream_batch(run_key("crawl")) == 0
    w(_batch(spark, 0, 20), 0)  # replay after expiry: still a no-op
    assert t.read().count() == 20
    # rollback rewinds rows, never the exactly-once markers
    n_before = t.read().count()
    t.rollback(t.current_version())
    assert t.stream_batch(run_key("crawl")) == 0
    assert t.read().count() == n_before


def test_two_streams_keep_independent_watermarks(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    wa = snapshot_batch_writer(t, run_id="crawl-A")
    wb = snapshot_batch_writer(t, run_id="crawl-B")
    wa(_batch(spark, 0, 5), 0)
    wb(_batch(spark, 5, 9), 0)  # same batch id, different stream: lands
    assert t.read().count() == 9
    assert t.stream_batch(run_key("crawl-A")) == 0
    assert t.stream_batch(run_key("crawl-B")) == 0
    wa(_batch(spark, 0, 5), 0)  # replay of A stays a no-op
    assert t.read().count() == 9


def test_transform_runs_inside_the_batch(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    w = snapshot_batch_writer(
        t, run_id="r", transform=lambda df: df.where(F.col("id") % 2 == 0)
    )
    w(_batch(spark, 0, 10), 0)
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 4, 6, 8]


def test_available_now_streaming_run_and_restart(spark, tmp_path):
    """A real Structured Streaming run: drain wave 1, restart the query
    on the same checkpoint after wave 2 — only the delta lands, and the
    rows from wave 1 appear exactly once."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    t = SnapshotTable(spark, str(tmp_path / "t"))

    def wave(lo, hi, name):
        _batch(spark, lo, hi).coalesce(1).write.parquet(
            str(src / name), mode="overwrite"
        )

    wave(0, 10, "w1")
    schema = "id long, part int"
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = stream_to_snapshot(stream, t, run_id="crawl", checkpoint=ckpt)
    q.awaitTermination(120)
    assert sorted(r.id for r in t.read().collect()) == list(range(10))

    wave(10, 16, "w2")
    q = stream_to_snapshot(
        spark.readStream.schema(schema).parquet(str(src / "*")), t,
        run_id="crawl", checkpoint=ckpt,
    )
    q.awaitTermination(120)
    assert sorted(r.id for r in t.read().collect()) == list(range(16))
    # re-running with no new data commits nothing
    v = t.current_version()
    q = stream_to_snapshot(
        spark.readStream.schema(schema).parquet(str(src / "*")), t,
        run_id="crawl", checkpoint=ckpt,
    )
    q.awaitTermination(120)
    assert t.current_version() == v


def test_stream_then_incremental_validation(spark, tmp_path):
    """The composition the sink exists for: stream increments into a
    snapshot table, validate only the appended delta each time."""
    from dataval_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    w = snapshot_batch_writer(t, run_id="crawl")
    w(_batch(spark, 0, 12), 0)
    v0 = t.current_version()
    w(_batch(spark, 12, 20), 1)
    delta = t.incremental_read(v0)
    assert sorted(r.id for r in delta.collect()) == list(range(12, 20))


def test_audited_writer_publishes_clean_rejects_dirty(spark, tmp_path):
    from dataval_spark.fixtures import transcripts
    from dataval_spark.streaming.snapshot_sink import (
        audited_snapshot_batch_writer,
    )
    from dataval_spark.suite import transcript_suite

    t = SnapshotTable(spark, str(tmp_path / "t"))
    q = str(tmp_path / "quarantine")
    w = audited_snapshot_batch_writer(
        t, run_id="crawl", suite=transcript_suite(),
        partition_by=["part"], quarantine=q,
    )
    clean = transcripts(spark, n_convs=80, seed=2187, n_parts=4,
                        with_defects=False)
    dirty = transcripts(spark, n_convs=80, seed=2187, n_parts=4)

    w(clean, 0)
    n_clean = t.read().count()
    assert n_clean == clean.count() and t.current_version() == 0

    # dirty batch: rows never become a committed snapshot; quarantined
    w(dirty, 1)
    assert t.read().count() == n_clean
    assert t.stream_batch(run_key("crawl")) == 1  # watermark advanced
    assert spark.read.parquet(f"{q}/batch=1").count() == dirty.count()
    assert t.orphan_files() == []  # abort reclaimed the staged files

    # crash replay of both batches: no-ops (rows unchanged, quarantine
    # not duplicated, no new snapshots)
    v = t.current_version()
    w(clean, 0)
    w(dirty, 1)
    assert t.current_version() == v and t.read().count() == n_clean
    assert spark.read.parquet(f"{q}/batch=1").count() == dirty.count()

    # the next clean batch still lands on the recorded layout
    w(clean, 2)
    assert t.read().count() == 2 * n_clean
    assert all("part=" in rel for rel, _ in t.files(t.snapshot()))


def test_audited_writer_first_batch_rejected_keeps_layout(spark, tmp_path):
    from dataval_spark.fixtures import transcripts
    from dataval_spark.streaming.snapshot_sink import (
        audited_snapshot_batch_writer,
    )
    from dataval_spark.suite import transcript_suite

    t = SnapshotTable(spark, str(tmp_path / "t"))
    w = audited_snapshot_batch_writer(
        t, run_id="crawl", suite=transcript_suite(), partition_by=["part"]
    )
    dirty = transcripts(spark, n_convs=80, seed=2187, n_parts=4)
    clean = transcripts(spark, n_convs=80, seed=2187, n_parts=4,
                        with_defects=False)
    w(dirty, 0)
    # table exists (empty), watermark advanced, declared layout recorded
    assert t.read().count() == 0
    assert t.stream_batch(run_key("crawl")) == 0
    assert t.snapshot()["partition_spec"] == ["part"]
    w(clean, 1)
    assert t.read().count() == clean.count()
    assert all("part=" in rel for rel, _ in t.files(t.snapshot()))
