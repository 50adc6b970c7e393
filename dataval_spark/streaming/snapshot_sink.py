"""Exactly-once Structured Streaming sink into a SnapshotTable.

The continuous-crawl write path: a stream of documents lands in a
snapshot-committed table as one ATOMIC append per micro-batch, and a
crash-replayed batch is a metadata no-op — so downstream consumers
(``SnapshotTable.incremental_read``, ``--validate-increments``) see
each row exactly once, in committed, time-travelable increments.

Why foreachBatch + a snapshot watermark, not a plain file sink: Spark's
at-least-once replay contract re-invokes foreachBatch with the SAME
``batch_id`` after a crash (checkpointed offsets), so exactly-once is
the writer's job. This sink records ``{run_key: batch_id}`` in the
snapshot it commits; :meth:`SnapshotTable.append` copies that map
forward into EVERY later snapshot (the chain head always carries it),
so the replay probe is one current-snapshot read and is immune to
``expire_snapshots`` — the marker does not live only in the snapshot
that recorded it. This is the public Iceberg Spark sink's design
(commit the batch id into the snapshot summary, skip batches at or
below it); the reference's closest analog is its atomic per-batch
release commits (/root/reference/run_package_release.py:283-317).

Interleaved maintenance (compact / delete / merge / rollback) between
batches is safe: those commits propagate the watermark too, and the
sink always appends on top of the CURRENT snapshot.

Usage::

    writer = snapshot_batch_writer(table, run_id="crawl-A",
                                   partition_by=["days(ts)"])
    (stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start())

or the one-call face :func:`stream_to_snapshot`.
"""

from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame

from ..sources.snapshots import SnapshotTable

__all__ = [
    "run_key",
    "snapshot_batch_writer",
    "audited_snapshot_batch_writer",
    "stream_to_snapshot",
]


def run_key(run_id: str) -> str:
    """Stable short key for a stream's watermark entry (hashes the
    user-facing run id so arbitrary strings stay JSON-key-safe)."""
    return hashlib.sha1(run_id.encode("utf-8")).hexdigest()[:12]


def snapshot_batch_writer(
    table: SnapshotTable,
    run_id: str,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch callable: one snapshot-atomic append per
    micro-batch, idempotent under crash replay.

    ``partition_by`` (plain columns or partition transforms like
    ``days(ts)``) applies to the FIRST batch; later batches inherit the
    table's recorded spec, so the stream cannot commit a mixed layout.
    ``transform`` runs inside the batch (filter/derive before the
    append) — it must be deterministic, or a replayed batch could
    commit different rows than the crashed attempt would have.
    Batches whose id is at or below the table's recorded watermark for
    this ``run_id`` are skipped without reading the batch data."""
    key = run_key(run_id)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        done = table.stream_batch(key)
        if done is not None and batch_id <= done:
            return  # crash replay: this batch already snapshot-committed
        if transform is not None:
            batch_df = transform(batch_df)
        table.append(
            batch_df,
            partition_by=partition_by if not table.exists() else None,
            merge_schema=merge_schema,
            stream_marker=(key, batch_id),
        )

    return _process


def audited_snapshot_batch_writer(
    table: SnapshotTable,
    run_id: str,
    suite,
    partition_by: list[str] | None = None,
    quarantine: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """The write-audit-publish loop per micro-batch: stage the batch
    (invisible), run the validation ``suite`` on exactly what publish
    would expose, then atomically publish — or abort, so a bad crawl
    batch NEVER becomes a committed snapshot. The continuous form of
    the CLI's ``--ingest-audited`` gate.

    Exactly-once under crash replay either way: a publish records the
    batch watermark in the same atomic commit; a rejection advances the
    watermark with an empty append (rows stay out, the replayed batch
    is a no-op — without this a permanently-bad batch would re-audit
    forever). ``quarantine`` (optional) lands each rejected batch's
    rows under ``<quarantine>/batch=<id>`` with overwrite semantics, so
    a crash-replayed rejection replaces its own rows rather than
    duplicating them. The non-atomic window between quarantine/abort
    and the watermark commit is replay-safe: the replay re-stages,
    re-audits, and overwrites the same quarantine directory."""
    key = run_key(run_id)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        done = table.stream_batch(key)
        if done is not None and batch_id <= done:
            return
        handle = table.stage_append(
            batch_df,
            partition_by=partition_by if not table.exists() else None,
        )
        try:
            summary = suite.run(table.read_staged(handle)).summary()
            if summary["n_partitions_passed"] == summary["n_partitions"]:
                table.publish(handle, stream_marker=(key, batch_id))
                return
            if quarantine is not None:
                table.read_staged(handle).write.mode("overwrite").parquet(
                    f"{quarantine}/batch={batch_id}"
                )
        except BaseException:
            # a raising audit/publish (schema drift, analysis error)
            # must not leak a full batch copy per replay: reclaim the
            # staged files, THEN fail the query for the operator
            table.abort_staged(handle)
            raise
        table.abort_staged(handle)
        # advance the watermark WITHOUT the rows: the rejection is the
        # batch's permanent verdict, not a retry loop. If this is the
        # table's very first commit, carry the declared layout so later
        # good batches inherit it
        table.append(
            batch_df.limit(0),
            partition_by=partition_by if not table.exists() else None,
            stream_marker=(key, batch_id),
        )

    return _process


def stream_to_snapshot(
    stream_df: DataFrame,
    table: SnapshotTable,
    run_id: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    available_now: bool = True,
):
    """Start (and return) the streaming query writing ``stream_df``
    into ``table`` exactly once per row. ``available_now=True`` drains
    what exists and stops — the batch-ish shape tests and cron-style
    ingest use; False runs continuously."""
    writer = snapshot_batch_writer(
        table,
        run_id,
        partition_by=partition_by,
        merge_schema=merge_schema,
        transform=transform,
    )
    w = stream_df.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
