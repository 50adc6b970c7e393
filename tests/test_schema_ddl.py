"""Metadata-only schema evolution on snapshot tables: rename (scope-
listed like merge-on-read deletes, so old files' physical names keep
resolving), drop (pinned schema stops loading the stale column; the
name is retired while its files live), and widen (pure metadata — the
parquet reader upcasts narrow physical types natively, SPARK-40876).

Reference parity note: the reference engine's tables are fixed-schema
(dataval TODO lists rebuild the DB on change); this is the Iceberg-
style evolution a 100 TB transcript table needs to avoid full rewrites
when the transcript schema gains/renames fields.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import IncrementalReadError, SnapshotTable


def _ab(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("a"),
        (F.col("id") * 2).cast("int").alias("b"),
    )


# --------------------------------------------------------------- rename
def test_rename_reads_old_files_and_new_appends(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_ab(spark, 0, 10))
    v_pre = t.current_version()
    t.rename_column("a", "x")
    assert t.read().columns == ["x", "b"]
    assert sorted(r.x for r in t.read().collect()) == list(range(10))
    # time travel to the pre-rename snapshot keeps the old name
    assert t.read(v_pre).columns == ["a", "b"]
    # appends after the rename write the new physical name; both
    # generations read under one logical schema
    t.append(
        spark.range(10, 15).select(
            F.col("id").cast("int").alias("x"),
            (F.col("id") * 2).cast("int").alias("b"),
        )
    )
    got = sorted((r.x, r.b) for r in t.read().collect())
    assert got == [(i, 2 * i) for i in range(15)]
    # the commit wrote no data files (metadata-only DDL)
    files_at = lambda v: {rel for rel, _ in t.files(t.snapshot(v))}  # noqa: E731
    assert files_at(v_pre) == files_at(v_pre + 1)
    assert t.snapshot(v_pre + 1)["operation"] == "schema"


def test_rename_chain_and_swap(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "one"), (2, "two")], "a bigint, b string"))
    t.rename_column("a", "tmp")
    t.rename_column("b", "a")
    t.rename_column("tmp", "b")
    # a<->b swapped: types follow the logical columns, values intact
    assert dict(t.read().dtypes) == {"b": "bigint", "a": "string"}
    assert sorted((r.b, r.a) for r in t.read().collect()) == [
        (1, "one"),
        (2, "two"),
    ]


def test_rename_scan_pruning_stays_sharp(spark, tmp_path):
    """Old files' manifest bounds live under the OLD name; pruning on
    the renamed column must translate per file, not degrade."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for lo in range(0, 40, 10):  # 4 disjoint-range files
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").cast("int").alias("a"))
            .coalesce(1)
        )
    t.rename_column("a", "x")
    sc = t.scan({"x": (25, 25)})
    assert [r.x for r in sc.collect()] == [25]
    assert len(sc.inputFiles()) < len(t.read().inputFiles())


def test_rename_rewrites_pending_mor_delete_predicates(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v")))
    t.delete_where({"k": (3, 5)}, mode="merge-on-read")
    t.rename_column("k", "kk")
    assert sorted(r.kk for r in t.read().collect()) == [0, 1, 2, 6, 7, 8, 9]
    # the stored entry now references the new logical name
    assert all(
        "kk" in d.get("filters", {}) or d.get("key_col") == "kk"
        for d in t.snapshot()["deletes"]
    )


def test_rename_survives_copy_on_write_of_other_files(spark, tmp_path):
    """delete_where rewrites only overlapping files; carried-over files
    keep their rel paths, so the rename scope keeps resolving them."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(6).select(F.col("id").alias("k"), F.col("id").alias("v")).coalesce(1)
    )
    t.append(
        spark.range(6, 12).select(F.col("id").alias("k"), F.col("id").alias("v")).coalesce(1)
    )
    t.rename_column("v", "w")
    t.delete_where({"k": (6, 8)})
    assert sorted(r.w for r in t.read().collect()) == [0, 1, 2, 3, 4, 5, 9, 10, 11]


def test_rename_guards(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(8).select(F.col("id").cast("int").alias("k"), F.col("id").alias("v")),
        partition_by=["bucket(4, k)"],
    )
    with pytest.raises(ValueError, match="partition-spec source"):
        t.rename_column("k", "kk")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("zzz", "q")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "k")
    with pytest.raises(ValueError, match="derived partition key"):
        t.rename_column("v", "k_bucket_4")


# ----------------------------------------------------------------- drop
def test_drop_hides_column_and_retires_name(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_ab(spark, 0, 10))
    t.drop_column("b")
    assert t.read().columns == ["a"]
    assert t.row_count() == 10
    # re-adding the name while the stale physical column lives would
    # resurrect old values into the new column — refused
    readd = spark.range(2).select(
        F.col("id").cast("int").alias("a"), F.lit(9).cast("int").alias("b")
    )
    with pytest.raises(ValueError, match="still carried physically"):
        t.append(readd, merge_schema=True)
    # compact() rewrites the files under the current schema, releasing
    # the name; old rows then read the re-added column as NULL
    assert t.compact() is not None
    assert t.snapshot().get("retired") is None
    t.append(readd, merge_schema=True)
    rows = sorted(
        ((r.a, r.b) for r in t.read().collect()),
        key=lambda p: (p[0], p[1] is not None, p[1] or 0),
    )
    assert rows[:2] == [(0, None), (0, 9)]
    assert rows[-1] == (9, None)


def test_drop_guards(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")))
    t.delete_where({"v": (0, 1)}, mode="merge-on-read")
    with pytest.raises(ValueError, match="pending merge-on-read"):
        t.drop_column("v")
    t.compact()  # materializes the delete
    t.drop_column("v")
    with pytest.raises(ValueError, match="only column"):
        t.drop_column("k")


# ---------------------------------------------------------------- widen
def test_widen_int_to_bigint_and_float_to_double(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(5).select(
            F.col("id").cast("int").alias("n"),
            (F.col("id") / 2).cast("float").alias("f"),
        )
    )
    t.widen_column("n", "bigint")
    t.widen_column("f", "double")
    assert dict(t.read().dtypes) == {"n": "bigint", "f": "double"}
    got = sorted((r.n, r.f) for r in t.read().collect())
    assert got == [(i, i / 2) for i in range(5)]
    # appends now carry the wide type; scan prunes across generations
    t.append(
        spark.range(100, 105).select(
            F.col("id").alias("n"), (F.col("id") / 2).cast("double").alias("f")
        )
    )
    assert sorted(r.n for r in t.scan({"n": (3, 101)}).collect()) == [3, 4, 100, 101]


def test_widen_guards(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(8).select(F.col("id").cast("int").alias("k"), F.col("id").alias("v"))
    )
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("v", "int")  # narrowing
    with pytest.raises(ValueError, match="no column"):
        t.widen_column("zzz", "bigint")
    tb = SnapshotTable(spark, str(tmp_path / "tb"))
    tb.append(
        spark.range(8).select(F.col("id").cast("int").alias("k"), F.col("id").alias("v")),
        partition_by=["bucket(4, k)"],
    )
    with pytest.raises(ValueError, match="partition transform"):
        tb.widen_column("k", "double")  # str(3) != str(3.0): would mis-prune
    tb.widen_column("k", "bigint")  # integral family: str() forms agree
    assert dict(tb.read().dtypes)["k"] == "bigint"
    assert tb.row_count() == 8


# ------------------------------------------------- interaction surfaces
def test_incremental_read_spans_schema_ddl(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(5).select(F.col("id").alias("k")))  # v0
    t.rename_column("k", "kk")  # v1: metadata-only, append-safe
    t.append(spark.range(5, 8).select(F.col("id").alias("kk")))  # v2
    assert sorted(r.kk for r in t.incremental_read(0).collect()) == [5, 6, 7]
    # row-changing ops still poison the range
    t.delete_where({"kk": (0, 0)})
    with pytest.raises(IncrementalReadError):
        t.incremental_read(0)


def test_ddl_is_pinned_to_base_version(spark, tmp_path):
    """A concurrent commit between snapshot() and the CAS must fail the
    DDL (its guards ran against a stale snapshot), not retry blindly."""
    from dataval_spark.sources.snapshots import CommitConflict

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")))
    snap = t.snapshot()
    t.append(spark.range(5, 6).select(F.col("id").alias("k"), F.col("id").alias("v")))
    with pytest.raises(CommitConflict):
        t._commit_schema(snap, t.read().schema, {})


def test_cli_alter_faces(spark, tmp_path, capsys):
    """--alter TABLE --rename/--drop/--widen: one JSON line each,
    metadata-only commits, schema reported post-DDL."""
    import json

    from dataval_spark.cli import main as cli_main

    table = str(tmp_path / "t")
    t = SnapshotTable(spark, table)
    t.append(_ab(spark, 0, 6))
    base = [
        "--input", table, "--alter", table, "--cpus", "8",
    ]
    assert cli_main(base + ["--rename", "a:x"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["renamed"] == "a" and out["schema"]["x"] == "int"
    assert cli_main(base + ["--widen", "x:bigint"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["schema"]["x"] == "bigint"
    assert cli_main(base + ["--drop", "b"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert list(out["schema"]) == ["x"]
    assert cli_main(base + ["--add", "lang:string:en"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["added"] == "lang" and out["default"] == "en"
    assert sorted((r.x, r.lang) for r in t.read().collect()) == [
        (i, "en") for i in range(6)
    ]
    # exactly one op required
    assert cli_main(base) == 2
    assert cli_main(base + ["--rename", "x:y", "--drop", "x"]) == 2


# ------------------------------------------------------------ add_column
def test_add_column_with_default_is_scoped(spark, tmp_path):
    """Existing rows read the recorded constant; rows appended AFTER
    the add keep their real values — including genuine NULLs, which the
    default must never paper over."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(3).select(F.col("id").alias("k")))
    files_before = {rel for rel, _ in t.files(t.snapshot())}
    t.add_column("lang", "string", default="en")
    # metadata-only: no data files written
    assert {rel for rel, _ in t.files(t.snapshot())} == files_before
    assert t.snapshot()["operation"] == "schema"
    t.append(
        spark.createDataFrame([(10, "fr"), (11, None)], "k bigint, lang string")
    )
    got = sorted(
        ((r.k, r.lang) for r in t.read().collect()),
        key=lambda p: (p[0], p[1] or ""),
    )
    assert got == [(0, "en"), (1, "en"), (2, "en"), (10, "fr"), (11, None)]


def test_add_column_null_default_and_typed(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(2).select(F.col("id").alias("k")))
    t.add_column("score", "double")           # NULL backfill
    t.add_column("n_tools", "int", default=0) # typed constant
    rows = sorted((r.k, r.score, r.n_tools) for r in t.read().collect())
    assert rows == [(0, None, 0), (1, None, 0)]
    assert dict(t.read().dtypes) == {
        "k": "bigint", "score": "double", "n_tools": "int",
    }
    # the default survives rename and dies with drop
    t.rename_column("n_tools", "tool_count")
    assert [r.tool_count for r in t.read().collect()] == [0, 0]
    t.drop_column("tool_count")
    assert t.read().columns == ["k", "score"]


def test_add_column_guards(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_ab(spark, 0, 4))
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("a", "int")
    with pytest.raises(ValueError, match="supports scalar types"):
        t.add_column("x", "array<int>")
    t.drop_column("b")
    with pytest.raises(ValueError, match="still carried physically"):
        t.add_column("b", "int")  # stale physical column lives on
    with pytest.raises(ValueError, match="constant scalar"):
        t.add_column("x", "int", default=[1, 2])


def test_ddl_vs_append_thread_race_stays_consistent(spark, tmp_path):
    """A rename racing a genuinely concurrent append. Legal outcomes:
    the append commits first and the rename lands on top (or loses its
    pinned slot with CommitConflict), or the rename commits first and
    the append's retry — now reading the renamed head — FAILS the
    schema guard loudly (its frame carries the stale column name;
    silently committing it would smuggle the old name back in as a new
    column). Never a half-applied schema, never lost rows from a
    COMMITTED write."""
    import threading

    from dataval_spark.sources.snapshots import CommitConflict

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_ab(spark, 0, 10))
    unexpected: list = []
    outcomes = {"append": None, "rename": None}

    def do_append():
        try:
            t.append(_ab(spark, 100, 110))
            outcomes["append"] = "committed"
        except ValueError as e:
            assert "schema mismatch" in str(e)
            outcomes["append"] = "stale-schema"
        except Exception as e:  # pragma: no cover - diagnostic
            unexpected.append(e)

    def do_rename():
        try:
            t.rename_column("a", "x")
            outcomes["rename"] = "committed"
        except CommitConflict:
            outcomes["rename"] = "conflict"
        except Exception as e:  # pragma: no cover - diagnostic
            unexpected.append(e)

    th = [threading.Thread(target=do_append), threading.Thread(target=do_rename)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not unexpected, unexpected
    assert outcomes["append"] in ("committed", "stale-schema")
    assert outcomes["rename"] in ("committed", "conflict")
    # a stale-schema append only happens when the rename won the slot
    if outcomes["append"] == "stale-schema":
        assert outcomes["rename"] == "committed"
    col = "x" if outcomes["rename"] == "committed" else "a"
    expect = list(range(10))
    if outcomes["append"] == "committed":
        expect += list(range(100, 110))
    assert sorted(r[col] for r in t.read().collect()) == expect


def test_rename_evolved_away_identity_partition_column(spark, tmp_path):
    """The hardest name-mapping case: an identity hive partition column
    whose values live ONLY in directory names for old files, whose
    layout was later evolved away, then renamed. The per-group physical
    schema carries the OLD name, so Spark's partition discovery fills
    the column from the `grp=` directories and the alias surfaces it as
    the new name — and scan() still prunes the old directories via the
    per-file physical-name translation."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(8).select(
        (F.col("id") % 2).cast("int").alias("grp"), F.col("id").alias("v")
    )
    t.append(df, partition_by=["grp"])
    t.append(
        spark.range(8, 12).select(
            (F.col("id") % 2).cast("int").alias("grp"), F.col("id").alias("v")
        ),
        partition_by=["bucket(2, v)"],
        evolve_layout=True,
    )
    t.rename_column("grp", "cohort")
    rows = sorted((r.cohort, r.v) for r in t.read().collect())
    assert rows == sorted((i % 2, i) for i in range(12))
    sc = t.scan({"cohort": (1, 1)})
    assert sorted(r.v for r in sc.collect()) == [1, 3, 5, 7, 9, 11]
    assert len(sc.inputFiles()) < len(t.read().inputFiles())


def test_widen_identity_partition_column_mixed_dir_values(spark, tmp_path):
    """Widening an identity HIVE partition column: old directories say
    grp=1, post-widen appends say grp=1.0 — discovery parses both under
    the pinned double schema and scan() prunes both generations (the
    driver-side path-value compare parses floats)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(8).select(
            (F.col("id") % 2).cast("int").alias("grp"), F.col("id").alias("v")
        ),
        partition_by=["grp"],
    )
    t.widen_column("grp", "double")
    t.append(
        spark.range(8, 12).select(
            (F.col("id") % 2).cast("double").alias("grp"), F.col("id").alias("v")
        )
    )
    assert sorted((r.grp, r.v) for r in t.read().collect()) == sorted(
        (float(i % 2), i) for i in range(12)
    )
    sc = t.scan({"grp": (1.0, 1.0)})
    assert sorted(r.v for r in sc.collect()) == [1, 3, 5, 7, 9, 11]
    assert len(sc.inputFiles()) < len(t.read().inputFiles())
