"""End-to-end release pipeline: the full north-rule loop composed from
the round's pieces — audited branch ingest (multi-commit WAP), tagged
releases, continuous validation with the drift gate riding each
increment, cross-release drift between tags, and retention that keeps
tagged releases readable. One story test proving the parts compose.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataval_spark.constraints.version_drift import drift_between_versions
from dataval_spark.fixtures import transcripts
from dataval_spark.manifest import validate_snapshot_increments
from dataval_spark.sources.snapshots import SnapshotTable
from dataval_spark.suite import transcript_suite


def _clean_wave(spark, seed, offset, n_convs=40):
    """Clean transcript rows (the fixture's part 0 is the clean
    partition), re-keyed by a numeric offset so waves never collide on
    conv_id while keeping the suite's conv-%012d format."""
    return (
        transcripts(spark, n_convs=n_convs, seed=seed, n_parts=2)
        .where(F.col("part") == 0)
        .withColumn(
            "conv_id",
            F.format_string(
                "conv-%012d",
                F.substring("conv_id", 6, 12).cast("bigint") + F.lit(offset),
            ),
        )
    )


def test_release_pipeline_end_to_end(spark, tmp_path):
    table = str(tmp_path / "corpus")
    mp = str(tmp_path / "manifest")
    t = SnapshotTable(spark, table)
    suite = transcript_suite()
    drift_cols = ["length(text)"]

    # ---- wave 1: audited branch ingest, then tag the release --------
    t.append(_clean_wave(spark, 3, 0), partition_by=["part"])
    r1 = validate_snapshot_increments(
        spark, table, suite, mp, drift_columns=drift_cols
    )
    assert all(m["passed"] for m in r1.partition_metrics)
    t.tag("release-1")
    v_rel1 = t.tag_version("release-1")

    # ---- wave 2: staged on a branch, audited at the HEAD, published -
    t.create_branch("ingest-w2")
    b = t.branch("ingest-w2")
    b.append(_clean_wave(spark, 9, 1_000_000))
    b.append(_clean_wave(spark, 10, 2_000_000))
    audit = suite.run(b.read()).summary()
    assert audit["n_partitions_passed"] == audit["n_partitions"]
    t.fast_forward("ingest-w2")
    # continuous validation sees the published commits as deltas and
    # the drift gate passes (same distribution)
    r2 = validate_snapshot_increments(
        spark, table, suite, mp, drift_columns=drift_cols
    )
    assert all(m["passed"] for m in r2.partition_metrics)
    assert r2.drift is not None and not r2.drift["any_drifted"]
    assert r2.drift["mode"] == "incremental"

    # ---- wave 3: a drifted crawl (3x text) — the gate flags it ------
    w3 = _clean_wave(spark, 11, 3_000_000, n_convs=240).withColumn(
        "text", F.concat(F.col("text"), F.col("text"), F.col("text"))
    )
    t.append(w3)
    r3 = validate_snapshot_increments(
        spark, table, suite, mp, drift_columns=drift_cols
    )
    assert r3.drift is not None and r3.drift["any_drifted"]

    # ---- cross-release drift: current vs the tagged release ---------
    rel = drift_between_versions(
        t, "release-1", columns=drift_cols, part_col="part"
    )
    assert rel["any_drifted"]  # wave 3 shifted the blend vs release-1
    assert rel["ref_version"] == v_rel1

    # ---- retention: age expiry never touches the tagged release -----
    # backdate everything, then expire aggressively by age + count
    import time

    for k in range(t.current_version() + 1):
        rec = json.loads(t._read_text(t._vpath(k)))
        rec["committed_at"] = time.time() - 7200
        t._write_text(t._vpath(k), json.dumps(rec, sort_keys=True))
    t.expire_snapshots(keep_last=1, older_than_s=3600)
    t.vacuum()
    # the tagged release still reads in full; current still reads
    assert t.read("release-1").count() == r1.partition_metrics[0]["n_rows"]
    assert t.read().count() > 0
    # time travel to an expired middle version is gone (and that is the
    # documented contract, not an accident)
    missing = [
        k
        for k in range(t.current_version())
        if k != v_rel1
    ]
    assert missing
    with pytest.raises(FileNotFoundError):
        t.read(missing[0])
