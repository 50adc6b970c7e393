"""Cross-version drift on snapshot tables: planted shifts detected on
the right partition, clean appends pass, the append-only fast path is
count-identical to a forced full scan, and the ref_hists round-trip
(the zero-base-rescan release-gate loop) reproduces the full result.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataval_spark.constraints.version_drift import drift_between_versions
from dataval_spark.sources.snapshots import IncrementalReadError, SnapshotTable


def _rows(spark, n, parts, len_lo, len_hi, seed):
    """Deterministic transcript-ish rows: text length uniform-ish in
    [len_lo, len_hi), partition = id % parts."""
    return (
        spark.range(n)
        .select(
            (F.col("id") % parts).cast("int").alias("dataval_part"),
            (F.col("id") % 40).cast("int").alias("turn_idx"),
            F.repeat(
                F.lit("x"),
                (
                    F.pmod(F.xxhash64(F.col("id") + seed), F.lit(len_hi - len_lo))
                    + F.lit(len_lo)
                ).cast("int"),
            ).alias("text"),
        )
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 4000, 4, 0, 600, seed=1))  # v0: base
    return t


def test_clean_append_passes_incremental(spark, table):
    table.append(_rows(spark, 1000, 4, 0, 600, seed=2))  # same distribution
    res = drift_between_versions(table, 0)
    assert res["mode"] == "incremental"
    assert res["any_drifted"] is False
    parts = {r["part"] for r in res["records"]}
    assert parts == {"0", "1", "2", "3", "*"}
    assert {r["metric"] for r in res["records"]} == {"turn_idx", "len_text"}
    # turn_idx bins came from manifest bounds, zero data reads
    assert all(
        r["bins_source"] == "metadata"
        for r in res["records"]
        if r["metric"] == "turn_idx"
    )


def test_planted_shift_flags_the_right_partition(spark, table):
    # partition 2's new rows are 3x longer — a real distribution shift
    drifted = _rows(spark, 3000, 4, 1200, 1900, seed=3).where(
        F.col("dataval_part") == 2
    )
    clean = _rows(spark, 3000, 4, 0, 600, seed=4).where(
        F.col("dataval_part") != 2
    )
    table.append(drifted.unionByName(clean))
    res = drift_between_versions(table, 0)
    verdict = {
        (r["part"], r["metric"]): r["drifted"] for r in res["records"]
    }
    assert verdict[("2", "len_text")] is True
    assert verdict[("0", "len_text")] is False
    assert verdict[("1", "len_text")] is False
    assert verdict[("3", "len_text")] is False
    # turn_idx distribution did not move anywhere
    assert not any(
        r["drifted"] for r in res["records"] if r["metric"] == "turn_idx"
    )
    assert res["any_drifted"] is True


def test_incremental_equals_forced_full(spark, table, monkeypatch):
    table.append(_rows(spark, 1500, 4, 100, 800, seed=5))
    inc = drift_between_versions(table, 0)
    assert inc["mode"] == "incremental"

    def boom(*a, **k):
        raise IncrementalReadError("forced")

    monkeypatch.setattr(table, "added_entries", boom)
    full = drift_between_versions(table, 0)
    assert full["mode"] == "full"
    assert inc["hists"] == full["hists"]  # exact count identity
    assert inc["records"] == full["records"]


def test_ref_hists_round_trip_skips_base_rescan(spark, table):
    table.append(_rows(spark, 1000, 4, 0, 600, seed=6))  # v1
    first = drift_between_versions(table, 0)
    table.append(_rows(spark, 1000, 4, 0, 600, seed=7))  # v2
    # persist/reload like the CLI does, then compare v1 -> v2 with the
    # prior histograms standing in for a rescan of v1
    saved = json.loads(
        json.dumps({k: first[k] for k in ("cur_version", "hists", "bins")})
    )
    reused = drift_between_versions(table, 1, ref_hists=saved)
    direct = drift_between_versions(table, 1)
    strip = lambda rs: [  # noqa: E731
        {k: v for k, v in r.items() if k != "bins_source"} for r in rs
    ]
    assert strip(reused["records"]) == strip(direct["records"])
    assert {r["bins_source"] for r in reused["records"]} == {"ref_hists"}
    assert reused["mode"] == "incremental"
    # a baseline for the wrong version is refused
    with pytest.raises(ValueError, match="mismatched baseline"):
        drift_between_versions(table, 0, ref_hists=saved)


def test_row_changes_fall_back_to_full_and_report_missing(spark, table):
    # remove one partition's rows entirely -> full mode + missing row
    table.delete_where({"dataval_part": (3, 3)})
    res = drift_between_versions(table, 0)
    assert res["mode"] == "full"
    missing = [r for r in res["records"] if r.get("missing_in_current")]
    assert {r["part"] for r in missing} == {"3"}
    assert all(r["drifted"] is None and r["n_cur"] == 0 for r in missing)


def test_new_partition_compares_against_pooled(spark, table):
    extra = _rows(spark, 800, 4, 0, 600, seed=8).withColumn(
        "dataval_part", F.lit(7).cast("int")
    )
    table.append(extra)
    res = drift_between_versions(table, 0)
    new = [r for r in res["records"] if r.get("new_partition")]
    assert {r["part"] for r in new} == {"7"}
    assert not any(r["drifted"] for r in new)  # same distribution


def test_cli_drift_faces(spark, table, tmp_path, capsys):
    from dataval_spark.cli import main as cli_main

    root = table.root
    hists = str(tmp_path / "h.json")
    table.append(_rows(spark, 1000, 4, 0, 600, seed=9))
    rc = cli_main([
        "--input", root, "--drift-versions", root,
        "--from-version", "0", "--hists-out", hists, "--cpus", "8",
    ])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["mode"] == "incremental"
    # plant a shift, reuse the saved histograms for the next gate
    table.append(
        _rows(spark, 3000, 4, 1500, 1900, seed=10).where(
            F.col("dataval_part") == 1
        )
    )
    rc = cli_main([
        "--input", root, "--drift-versions", root,
        "--from-version", "1", "--hists-in", hists, "--cpus", "8",
    ])
    assert rc == 3
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    flagged = {
        r["part"] for r in lines[:-1]
        if r.get("drifted") and r["metric"] == "len_text" and r["part"] != "*"
    }
    assert flagged == {"1"}
    # missing --from-version is a usage error
    assert cli_main(["--input", root, "--drift-versions", root]) == 2
