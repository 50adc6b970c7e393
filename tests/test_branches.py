"""Branches: writable parallel version chains + fast-forward publish —
the multi-COMMIT write-audit-publish shape (stage several commits on a
branch, validate the branch head, publish atomically-per-slot or drop).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import CommitConflict, SnapshotTable


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, 0, 10))
    return t


def test_branch_commits_invisible_on_main(spark, table):
    table.create_branch("audit")
    b = table.branch("audit")
    b.append(_kv(spark, 100, 105))
    # main untouched; branch sees base + its own commit
    assert sorted(r.k for r in table.read().collect()) == list(range(10))
    assert sorted(r.k for r in b.read().collect()) == list(range(10)) + list(
        range(100, 105)
    )
    assert table.branches() == {"audit": {"base": 0, "head": 1}}
    # branch time travel: version <= base routes to main history
    assert sorted(r.k for r in b.read(0).collect()) == list(range(10))


def test_fast_forward_publishes_all_branch_commits(spark, table):
    table.create_branch("audit")
    b = table.branch("audit")
    b.append(_kv(spark, 100, 105))
    b.delete_where({"k": (0, 2)})
    b.append(_kv(spark, 200, 202))
    head = table.fast_forward("audit")
    assert head == 3 == table.current_version()
    expect = list(range(3, 10)) + list(range(100, 105)) + [200, 201]
    assert sorted(r.k for r in table.read().collect()) == expect
    # intermediate history time-travels on main now
    assert sorted(r.k for r in table.read(1).collect()) == list(range(10)) + list(
        range(100, 105)
    )
    # the branch was consumed
    assert table.branches() == {}
    with pytest.raises(FileNotFoundError):
        table.branch("audit")


def test_fast_forward_refuses_when_main_advanced(spark, table):
    table.create_branch("audit")
    b = table.branch("audit")
    b.append(_kv(spark, 100, 105))
    table.append(_kv(spark, 50, 52))  # main moves: slot v1 now foreign
    with pytest.raises(CommitConflict, match="fast-forward"):
        table.fast_forward("audit")
    # branch intact; dropping it discards the staged rows
    assert sorted(r.k for r in table.branch("audit").read().collect()) == list(
        range(10)
    ) + list(range(100, 105))
    table.drop_branch("audit")
    assert table.branches() == {}
    # main never saw the branch rows
    assert sorted(r.k for r in table.read().collect()) == list(range(10)) + [50, 51]


def test_vacuum_keeps_active_branch_files_then_reclaims_dropped(spark, table):
    table.create_branch("wip")
    b = table.branch("wip")
    b.append(_kv(spark, 100, 130))
    assert table.vacuum() == 0  # branch data is committed state
    assert sorted(r.k for r in table.branch("wip").read().collect()) == list(
        range(10)
    ) + list(range(100, 130))
    table.drop_branch("wip")
    assert table.vacuum() > 0  # branch-only data + manifest now orphans
    assert sorted(r.k for r in table.read().collect()) == list(range(10))


def test_branch_ddl_publishes_schema(spark, table):
    table.create_branch("schema-wip")
    b = table.branch("schema-wip")
    b.rename_column("v", "val")
    b.add_column("lang", "string", default="en")
    table.fast_forward("schema-wip")
    assert table.read().columns == ["k", "val", "lang"]
    assert {r.lang for r in table.read().collect()} == {"en"}


def test_maintenance_blocked_on_branch_view(spark, table):
    table.create_branch("x")
    b = table.branch("x")
    for op, args in [
        ("tag", ("r1",)),
        ("expire_snapshots", ()),
        ("vacuum", ()),
        ("create_branch", ("y",)),
        ("fast_forward", ("x",)),
    ]:
        with pytest.raises(ValueError, match="main-table operation"):
            getattr(b, op)(*args)


def test_expire_pins_branch_base(spark, table):
    table.append(_kv(spark, 10, 12))  # v1
    table.create_branch("old", version=0)
    table.append(_kv(spark, 12, 14))  # v2
    table.expire_snapshots(keep_last=1)
    # v0 survives (branch base); v1 is gone
    assert sorted(r.k for r in table.branch("old").read().collect()) == list(
        range(10)
    )
    with pytest.raises(FileNotFoundError):
        table.read(1)
    # and the branch still accepts commits chained on its base
    table.branch("old").append(_kv(spark, 300, 302))
    assert sorted(
        r.k for r in table.branch("old").read().collect()
    ) == list(range(10)) + [300, 301]


def test_create_branch_guards(spark, table):
    table.create_branch("a")
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("a")
    with pytest.raises(ValueError, match="bad branch name"):
        table.create_branch("no/slashes")
    with pytest.raises(FileNotFoundError):
        table.create_branch("b", version=99)
    with pytest.raises(ValueError, match="no commits to publish"):
        table.fast_forward("a")


def test_fast_forward_is_crash_resumable(spark, table):
    """Simulate a crash mid-publish: copy the first branch record into
    main by hand (byte-identical), then fast_forward — it must skip the
    landed slot and finish."""
    table.create_branch("audit")
    b = table.branch("audit")
    b.append(_kv(spark, 100, 103))
    b.append(_kv(spark, 200, 203))
    rec = table._read_text(b._vpath(1))
    table._write_text(table._vpath(1), rec)  # the "crashed" first copy
    head = table.fast_forward("audit")
    assert head == 2
    assert sorted(r.k for r in table.read().collect()) == list(range(10)) + list(
        range(100, 103)
    ) + list(range(200, 203))


def test_cli_branch_faces(spark, table, capsys):
    import json

    from dataval_spark.cli import main as cli_main

    root = table.root
    base = ["--input", root, "--cpus", "8"]
    assert cli_main(base + ["--create-branch", root, "--branch-name", "rel"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"branch": "rel", "base": 0}
    table.branch("rel").append(_kv(spark, 500, 502))
    assert cli_main(base + ["--branches", root]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"rel": {"base": 0, "head": 1}}
    assert cli_main(base + ["--fast-forward", root, "--branch-name", "rel"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"published": "rel", "head": 1}
    assert sorted(r.k for r in table.read().collect()) == list(range(10)) + [
        500,
        501,
    ]
    # missing --branch-name is a usage error
    assert cli_main(base + ["--create-branch", root]) == 2


def test_streaming_sink_into_branch_then_publish(spark, table):
    """The exactly-once snapshot sink composes with branches unchanged:
    micro-batches land on the branch (watermarks ride its chain, a
    replay is a no-op), main is untouched until fast_forward."""
    from dataval_spark.streaming.snapshot_sink import snapshot_batch_writer

    b = None
    table.create_branch("stream")
    b = table.branch("stream")
    w = snapshot_batch_writer(b, "runA")
    w(_kv(spark, 100, 103), 0)
    w(_kv(spark, 200, 202), 1)
    w(_kv(spark, 200, 202), 1)  # replayed batch: no-op
    assert b.current_version() == 2
    assert sorted(r.k for r in table.read().collect()) == list(range(10))
    head = table.fast_forward("stream")
    assert head == 2
    assert sorted(r.k for r in table.read().collect()) == list(range(10)) + [
        100, 101, 102, 200, 201,
    ]
    # the published chain carries the stream watermark: a replay against
    # MAIN (e.g. the stream re-pointed after publish) is still a no-op
    w2 = snapshot_batch_writer(table, "runA")
    w2(_kv(spark, 200, 202), 1)
    assert table.current_version() == 2


def test_refs_df_lists_main_tags_and_branches(spark, table):
    table.tag("release-1")
    table.create_branch("wip")
    table.branch("wip").append(_kv(spark, 50, 52))
    rows = {r.name: (r.type, r.base, r.head) for r in table.refs_df().collect()}
    assert rows == {
        "main": ("branch", None, 0),
        "release-1": ("tag", 0, 0),
        "wip": ("branch", 0, 1),
    }


def test_commit_timestamps_and_age_based_expiry(spark, table):
    """Every commit carries committed_at; derived commits (rollback,
    MOR delete, schema DDL) restamp; fast-forward keeps the branch's
    original stamps (the byte-identity its crash-resume relies on).
    expire_snapshots(older_than_s) expires only old-enough records."""
    import json as _json
    import time

    t = table
    t.append(_kv(spark, 10, 12))          # v1
    t.delete_where({"k": (0, 0)}, mode="merge-on-read")  # v2 (derived)
    t.rename_column("v", "w")             # v3 (derived)
    stamps = [t.snapshot(k).get("committed_at") for k in range(4)]
    assert all(isinstance(s, float) for s in stamps), stamps
    assert stamps == sorted(stamps)
    assert t.snapshots_df().where("committed_at is null").count() == 0
    # fast-forward preserves the branch commit's own stamp
    t.create_branch("b")
    t.branch("b").append(
        _kv(spark, 50, 52).withColumnRenamed("v", "w")
    )
    branch_stamp = t.branch("b").snapshot(4)["committed_at"]
    t.fast_forward("b")
    assert t.snapshot(4)["committed_at"] == branch_stamp
    # age-based expiry: backdate v0..v2 on disk, expire older than 1h
    for k in range(3):
        rec = _json.loads(t._read_text(t._vpath(k)))
        rec["committed_at"] = time.time() - 7200
        t._write_text(t._vpath(k), _json.dumps(rec, sort_keys=True))
    n = t.expire_snapshots(keep_last=1, older_than_s=3600)
    assert n == 3  # v0-v2 old enough; v3 too young; v4 current
    with pytest.raises(FileNotFoundError):
        t.read(0)
    assert t.snapshot(3).get("committed_at") is not None
    assert t.read(3).count() > 0


def test_time_travel_by_timestamp(spark, table):
    """read_as_of resolves the version current at an epoch time from
    the committed_at stamps; times before the first stamped commit
    raise instead of guessing."""
    import time

    t0 = t_between = None
    t = table
    t0 = t.snapshot(0)["committed_at"]
    time.sleep(0.05)
    t_between = time.time()
    time.sleep(0.05)
    t.append(_kv(spark, 10, 12))  # v1
    assert t.version_as_of(t_between) == 0
    assert sorted(r.k for r in t.read_as_of(t_between).collect()) == list(range(10))
    assert t.version_as_of(time.time()) == 1
    with pytest.raises(FileNotFoundError, match="at or before"):
        t.version_as_of(t0 - 10)


def test_cli_export_faces(spark, table, tmp_path, capsys):
    """--export materializes a snapshot state (current / version / tag /
    AS-OF) to plain parquet for consumers without the library."""
    import json as _json
    import time

    from dataval_spark.cli import main as cli_main

    root = table.root
    t_mid = time.time()
    table.append(_kv(spark, 10, 12))
    table.tag("rel", version=0)
    base = ["--input", root, "--export", root, "--cpus", "8"]

    out1 = str(tmp_path / "cur")
    assert cli_main(base + ["--to", out1]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["version"] == 1 and rep["rows"] == 12
    assert spark.read.parquet(out1).count() == 12

    out2 = str(tmp_path / "tag")
    assert cli_main(base + ["--to", out2, "--tag-name", "rel"]) == 0
    assert spark.read.parquet(out2).count() == 10
    capsys.readouterr()

    out3 = str(tmp_path / "asof")
    assert cli_main(base + ["--to", out3, "--at-timestamp", str(t_mid)]) == 0
    assert spark.read.parquet(out3).count() == 10
    capsys.readouterr()

    # guards: missing --to; more than one selector
    assert cli_main(["--input", root, "--export", root, "--cpus", "8"]) == 2
    assert cli_main(base + ["--to", str(tmp_path / "x"),
                            "--tag-name", "rel", "--at-version", "0"]) == 2


def test_lookup_prunes_per_key(spark, table):
    """lookup(key_col, keys) opens only files that could contain at
    least one key — the point-lookup read face. On 4 disjoint-range
    files, two keys from one file each open exactly those two."""
    t = SnapshotTable(spark, str(table.root) + "_lk")
    for lo in range(0, 40, 10):
        t.append(
            spark.range(lo, lo + 10).select(F.col("id").alias("k")).coalesce(1)
        )
    got = t.lookup("k", [3, 27])
    assert sorted(r.k for r in got.collect()) == [3, 27]
    assert len(got.inputFiles()) == 2  # one file per key's range
    # keys outside every range open nothing and return empty
    none = t.lookup("k", [999])
    assert none.count() == 0 and len(none.inputFiles()) == 0
    # hidden bucket partitioning prunes too
    tb = SnapshotTable(spark, str(table.root) + "_lkb")
    tb.append(
        spark.range(64).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        partition_by=["bucket(8, k)"],
    )
    got = tb.lookup("k", [5])
    assert [r.k for r in got.collect()] == [5]
    assert len(got.inputFiles()) < len(tb.read().inputFiles())
    with pytest.raises(ValueError, match="at least one key"):
        t.lookup("k", [])
    with pytest.raises(ValueError, match="NULL keys"):
        t.lookup("k", [1, None])
