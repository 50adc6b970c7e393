"""Streaming incremental dedup: crash-replay idempotency at the
foreachBatch seam, serial-batch == global equivalence, a real
Structured Streaming run, and the CLI batch mode."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataval_spark.cli import main as cli_main
from dataval_spark.streaming.increment import (
    increment_batch_writer,
    read_store,
)


def _text(seed: int, extra: str | None = None) -> str:
    toks = [f"s{seed}w{i % 40}" for i in range(160)]
    if extra is not None:
        toks.append(extra)
    return " ".join(toks)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH0 = [(1, _text(0)), (2, _text(1)), (3, _text(0))]          # 3 dups 1
BATCH1 = [(11, _text(0)), (12, _text(2)), (13, _text(2))]       # 11 dups 1


def _kept_ids(spark, out):
    try:
        return {r.doc_id for r in spark.read.parquet(out).collect()}
    except Exception:
        return set()


def test_serial_batches_match_global(spark, tmp_path):
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    w = increment_batch_writer(store, out, run_id="r")
    w(_docs(spark, BATCH0), 0)
    w(_docs(spark, BATCH1), 1)
    # batch 0: doc 3 is an exact dup of 1 -> kept {1, 2}
    # batch 1: 11 dups stored 1, 13 dups 12 within-batch -> kept {12}
    assert _kept_ids(spark, out) == {1, 2, 12}
    srows = read_store(spark, store).collect()
    assert len(srows) == 3
    assert len({r.batch for r in srows}) == 2  # one partition per batch


def test_crash_replay_is_idempotent_and_not_self_poisoned(spark, tmp_path):
    """Re-invoking the SAME batch id (crash between writes and the
    checkpoint commit) must replace the batch's outputs — and must NOT
    treat its own previous delta as 'already accepted' corpus."""
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    w = increment_batch_writer(store, out, run_id="r")
    w(_docs(spark, BATCH0), 0)
    first_kept = _kept_ids(spark, out)
    first_store = sorted((r.fp, r.code) for r in read_store(spark, store).collect())
    w(_docs(spark, BATCH0), 0)  # replay
    assert _kept_ids(spark, out) == first_kept == {1, 2}
    assert (
        sorted((r.fp, r.code) for r in read_store(spark, store).collect())
        == first_store
    )
    # a later batch still sees exactly one copy of the store
    w(_docs(spark, BATCH1), 1)
    assert _kept_ids(spark, out) == {1, 2, 12}


def test_zero_survivor_replay_clears_stale_output(spark, tmp_path):
    """A re-executed batch that keeps ZERO docs (e.g. its docs were all
    retracted/corrected to already-accepted content) must still REPLACE
    its previous attempt's files — the empty-frame case dynamic
    partition overwrite gets wrong and directory overwrite gets right."""
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    w = increment_batch_writer(store, out, run_id="r")
    w(_docs(spark, BATCH0), 0)          # store: sigs of 1, 2
    w(_docs(spark, BATCH1), 1)          # kept {12}
    assert _kept_ids(spark, out) == {1, 2, 12}
    # corrected batch 1 replay: every doc is already accepted corpus
    w(_docs(spark, [(21, _text(0)), (22, _text(1))]), 1)
    assert _kept_ids(spark, out) == {1, 2}      # 12 retracted
    assert read_store(spark, store).count() == 2  # batch-1 sigs cleared


def test_read_store_missing_vs_broken(spark, tmp_path):
    """Missing store -> empty frame; an EXISTING store whose files are
    unreadable must raise at evaluation, never silently dedup against
    nothing (that would re-accept the whole corpus as 'new')."""
    missing = str(tmp_path / "nope")
    assert read_store(spark, missing).count() == 0
    broken = tmp_path / "broken" / "batch=x"
    broken.mkdir(parents=True)
    (broken / "part-0000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        read_store(spark, str(tmp_path / "broken")).count()


def test_path_missing_matches_error_class_not_message_text(spark):
    """Classification is by AnalysisException error class, not message
    substring: an unrelated failure whose text happens to contain
    'Path does not exist' must NOT map to the empty store."""
    from pyspark.errors import AnalysisException

    from dataval_spark.streaming.increment import _path_missing

    assert not _path_missing(
        RuntimeError("remote fetch: Path does not exist on replica")
    )
    assert not _path_missing(
        RuntimeError("FS error mentioning PATH_NOT_FOUND in passing")
    )
    # the real thing, produced by Spark itself
    try:
        spark.read.parquet("/definitely/not/here").count()
        raise AssertionError("read should have failed")
    except AnalysisException as e:
        assert _path_missing(e)


def test_streaming_end_to_end_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df0 = _docs(spark, BATCH0)
    df0.write.parquet(src)
    stream = spark.readStream.schema(df0.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            increment_batch_writer(store, out, run_id="stream-e2e")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _kept_ids(spark, out) == {1, 2}
    # second wave of files -> new micro-batch dedups against the store
    _docs(spark, BATCH1).write.mode("append").parquet(src)
    q2 = (
        spark.readStream.schema(df0.schema)
        .parquet(src)
        .writeStream.foreachBatch(
            increment_batch_writer(store, out, run_id="stream-e2e")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert _kept_ids(spark, out) == {1, 2, 12}


def test_cli_dedup_increment(spark, tmp_path, capsys):
    inp0 = str(tmp_path / "b0")
    inp1 = str(tmp_path / "b1")
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    _docs(spark, BATCH0).write.parquet(inp0)
    _docs(spark, BATCH1).write.parquet(inp1)
    rc = cli_main(["--input", inp0, "--dedup-increment", out, "--store", store,
                   "--increment-id", "inc0"])
    assert rc == 0
    r0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (r0["n_batch"], r0["n_kept"], r0["n_store_before"]) == (3, 2, 0)
    rc = cli_main(["--input", inp1, "--dedup-increment", out, "--store", store,
                   "--increment-id", "inc1"])
    assert rc == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (r1["n_batch"], r1["n_kept"], r1["n_store_before"]) == (3, 1, 2)
    assert r1["n_store_after"] == 3
    assert _kept_ids(spark, out) == {1, 2, 12}
    # same increment id re-run = replace, not append
    rc = cli_main(["--input", inp1, "--dedup-increment", out, "--store", store,
                   "--increment-id", "inc1"])
    assert rc == 0
    assert _kept_ids(spark, out) == {1, 2, 12}
    assert read_store(spark, store).count() == 3
    # an increment whose docs are ALL already accepted: n_kept 0, no crash
    rc = cli_main(["--input", inp0, "--dedup-increment", out, "--store", store,
                   "--increment-id", "inc2"])
    assert rc == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["n_kept"] == 0 and r2["n_store_after"] == 3
