"""Partition transforms (hidden partitioning) on SnapshotTable:
spec grammar, write-side/plan-side agreement, directory-key pruning on
SOURCE-column filters, spec inheritance across append/compact/COW ops.

Iceberg parity (public spec: partition transforms); the reference
engine's closest analog is its release directory layout
(/root/reference/run_package_release.py:180-224)."""

from __future__ import annotations

import json
import zlib
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import SnapshotTable
from dataval_spark.sources.transforms import (
    Transform,
    parse_partition_specs,
    parse_transform,
)


def _events(spark, n=40):
    """n rows spread over 4 UTC days, 8 codes, ids 0..n-1."""
    return spark.range(n).select(
        F.col("id"),
        F.to_timestamp(
            F.concat(
                F.lit("2026-08-1"),
                (F.col("id") % 4 + 1).cast("string"),
                F.lit(" 0"),
                (F.col("id") % 5).cast("string"),
                F.lit(":30:00"),
            )
        ).alias("ts"),
        F.concat(F.lit("code"), (F.col("id") % 8).cast("string")).alias("code"),
        (F.col("id") * 10).alias("v"),
    )


# -- grammar ---------------------------------------------------------------


def test_parse_grammar_and_canonical_specs():
    assert parse_transform("conv_id").kind == "identity"
    t = parse_transform("days( ts )")
    assert (t.kind, t.source, t.hive_name, t.spec) == (
        "day", "ts", "ts_day", "days(ts)",
    )
    t = parse_transform("bucket(16, user_id)")
    # the parameter is IN the hive key: bucket(8) and bucket(16) on the
    # same column must present as different layouts, or old directories
    # would be reinterpreted under the new modulus and mis-pruned
    assert (t.kind, t.n, t.hive_name, t.spec) == (
        "bucket", 16, "user_id_bucket_16", "bucket(16,user_id)",
    )
    assert parse_transform("truncate(4,code)").hive_name == "code_trunc_4"
    t = parse_transform("truncate(4,code)")
    assert (t.kind, t.n, t.spec) == ("truncate", 4, "truncate(4,code)")
    # singular time forms accepted, canonicalized plural
    assert parse_transform("hour(ts)").spec == "hours(ts)"
    for bad in ("bucket(ts)", "days(2,ts)", "median(ts)", "bucket(0,x)", ""):
        with pytest.raises(ValueError):
            parse_transform(bad)
    # two specs deriving the same hive key cannot coexist
    with pytest.raises(ValueError, match="collide"):
        parse_partition_specs(["bucket(4,id)", "bucket(4,id)"])
    # different widths are DIFFERENT layouts (not a collision)
    assert len(parse_partition_specs(["bucket(4,id)", "bucket(8,id)"])) == 2


def test_driver_apply_matches_jvm_expr(spark):
    """The pruning side (driver ``apply``) and the write side (JVM
    ``expr``) must agree exactly — soundness of directory pruning."""
    df = _events(spark).withColumn("neg", F.col("id") - 20)
    specs = ["years(ts)", "months(ts)", "days(ts)", "hours(ts)",
             "bucket(4,id)", "bucket(4,code)", "truncate(3,code)",
             "truncate(7,neg)"]
    ts = parse_partition_specs(specs)
    dtypes = dict(df.dtypes)
    rows = df.select(
        "id", "ts", "code", "neg",
        *[t.expr(dtypes[t.source]).alias(f"x{i}") for i, t in enumerate(ts)],
    ).collect()
    for r in rows:
        src = {"ts": r.ts, "id": r.id, "code": r.code, "neg": r.neg}
        for i, t in enumerate(ts):
            assert t.apply(src[t.source]) == r[f"x{i}"], (t.spec, src)


def test_bucket_is_reproducible_without_jvm():
    t = Transform("bucket", "id", 16)
    assert t.apply(42) == zlib.crc32(b"42") % 16
    assert t.apply("abc") == zlib.crc32(b"abc") % 16


# -- hidden partitioning: write + read --------------------------------------


def test_hidden_partition_write_read_roundtrip(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = _events(spark)
    t.append(df, partition_by=["days(ts)"])
    # derived key lives ONLY in directory names
    rels = [rel for rel, _ in t.files(t.snapshot())]
    assert rels and all("/ts_day=2026-08-1" in f"/{rel}" for rel in rels)
    # readers see exactly the declared schema — the hive key is hidden
    out = t.read()
    assert out.columns == df.columns
    assert sorted(r.id for r in out.collect()) == list(range(40))
    # snapshot records the TRANSFORM spec, not just the hive name
    assert t.snapshot()["partition_spec"] == ["days(ts)"]
    # scan() on the SOURCE column equals the full filtered read
    lo, hi = "2026-08-12 00:00:00", "2026-08-13 23:59:59"
    expect = sorted(
        r.id for r in df.where(F.col("ts").between(lo, hi)).collect()
    )
    got = sorted(r.id for r in t.scan({"ts": (lo, hi)}).collect())
    assert got == expect and got


def test_day_filter_prunes_directories(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_events(spark), partition_by=["days(ts)"])
    snap = t.snapshot()
    hit, miss = t._split_by_overlap(
        snap, {"ts": ("2026-08-12 00:00:00", "2026-08-12 23:59:59")}
    )
    assert hit and miss
    assert all("ts_day=2026-08-12" in rel for rel, _ in hit)
    assert not any("ts_day=2026-08-12" in rel for rel, _ in miss)
    # half-open interval: everything from the 14th on
    hit, _ = t._split_by_overlap(snap, {"ts": ("2026-08-14 00:00:00", None)})
    assert hit and all("ts_day=2026-08-14" in rel for rel, _ in hit)
    # datetime filter values work the same as ISO strings
    hit2, _ = t._split_by_overlap(
        snap, {"ts": (datetime(2026, 8, 14), None)}
    )
    assert sorted(hit2) == sorted(hit)


def test_bucket_point_filter_prunes_to_one_bucket(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_events(spark), partition_by=["bucket(4,id)"])
    snap = t.snapshot()
    b = zlib.crc32(b"17") % 4
    hit, miss = t._split_by_overlap(snap, {"id": (17, 17)})
    # every bucket file's FOOTER id-range spans ~everything (buckets
    # interleave ids), so only the directory key can prune here
    assert hit and all(f"id_bucket_4={b}" in rel for rel, _ in hit)
    assert miss
    # a RANGE filter cannot be served by a hash bucket (interval() is
    # None — unit-tested below); any pruning here comes from footer
    # stats only, so files from EVERY bucket must survive
    hit, _ = t._split_by_overlap(snap, {"id": (10, 20)})
    assert {rel.split("/")[1] for rel, _ in hit} == {
        f"id_bucket_4={k}" for k in range(4)
    }
    assert Transform("bucket", "id", 4).interval(10, 20) is None
    # correctness: scan == filtered read, both shapes
    assert sorted(r.id for r in t.scan({"id": (17, 17)}).collect()) == [17]
    assert sorted(r.id for r in t.scan({"id": (10, 12)}).collect()) == [
        10, 11, 12,
    ]


def test_truncate_prunes_string_prefixes(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_events(spark), partition_by=["truncate(5,code)"])
    snap = t.snapshot()
    hit, miss = t._split_by_overlap(snap, {"code": ("code3", "code3")})
    assert hit and all("code_trunc_5=code3" in rel for rel, _ in hit) and miss
    got = sorted(r.id for r in t.scan({"code": ("code3", "code3")}).collect())
    assert got == [i for i in range(40) if i % 8 == 3]


# -- spec inheritance across the write ops ----------------------------------


def test_append_and_compact_inherit_transform_spec(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_events(spark), partition_by=["days(ts)"])
    # partition_by=None must inherit days(ts) — NOT try to partition by
    # a literal 'ts_day' column that the data does not carry
    t.append(_events(spark).where(F.col("id") < 8))
    snap = t.snapshot()
    assert snap["partition_spec"] == ["days(ts)"]
    assert all("ts_day=" in rel for rel, _ in t.files(snap))
    assert t.read().count() == 48
    # compaction keeps the hidden layout and the pruning behavior
    v = t.compact(target_file_bytes=1)
    if v is not None:
        snap = t.snapshot()
        assert snap["partition_spec"] == ["days(ts)"]
        assert all("ts_day=" in rel for rel, _ in t.files(snap))
    hit, miss = t._split_by_overlap(
        t.snapshot(), {"ts": ("2026-08-12 00:00:00", "2026-08-12 23:59:59")}
    )
    assert hit and miss
    assert all("ts_day=2026-08-12" in rel for rel, _ in hit)


def test_cow_ops_on_hidden_partitioned_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_events(spark), partition_by=["days(ts)", "bucket(2,id)"])
    snap = t.snapshot()
    assert snap["partition_spec"] == ["days(ts)", "bucket(2,id)"]
    # delete one day's rows through the source-column filter
    t.delete_where({"ts": ("2026-08-12 00:00:00", "2026-08-12 23:59:59")})
    remaining = sorted(r.id for r in t.read().collect())
    assert remaining == [i for i in range(40) if i % 4 != 1]
    # update keeps layout + schema, rewrites only overlapping files
    t.update_where({"id": (0, 0)}, {"v": 999})
    assert t.snapshot()["partition_spec"] == ["days(ts)", "bucket(2,id)"]
    assert all(
        "ts_day=" in rel and "id_bucket_2=" in rel
        for rel, _ in t.files(t.snapshot())
    )
    assert t.read().where(F.col("id") == 0).collect()[0].v == 999
    # hidden keys never leak out of any read shape
    assert t.scan({"id": (0, 0)}).columns == ["id", "ts", "code", "v"]


def test_pre_spec_snapshots_fall_back_to_identity(spark, tmp_path):
    """Tables committed before partition_spec existed (or plain-column
    tables) keep working: the path-derived hive names are identity."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(6).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("part")
    )
    t.append(df, partition_by=["part"])
    raw = json.loads(t._read_text(t._vpath(0)))
    raw.pop("partition_spec")
    t._write_text(t._vpath(0), json.dumps(raw))
    assert t.partition_specs(t.snapshot()) == ["part"]
    t.append(df)  # inherits identity layout from paths
    assert t.read().count() == 12
    assert all("part=" in rel for rel, _ in t.files(t.snapshot()))


# -- soundness regressions (review findings) ---------------------------------


def test_bucket_width_change_is_a_layout_switch(spark, tmp_path):
    """bucket(8) -> bucket(16) on the same column must NOT silently
    reuse old directories: the widths produce distinct hive keys, so an
    unsanctioned width change fails the layout guard."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_events(spark), partition_by=["bucket(4,id)"])
    with pytest.raises(ValueError, match="mixed partition layout"):
        t.append(_events(spark), partition_by=["bucket(8,id)"])


def test_escaped_path_values_prune_soundly(spark, tmp_path):
    """Hive %XX-escapes special characters in directory names; pruning
    must compare UNESCAPED values or strings with spaces mis-prune."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(12).select(
        F.col("id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("a b")).otherwise(F.lit("z:q")),
            F.lit(" "),
            F.col("id").cast("string"),
        ).alias("code"),
    )
    t.append(df, partition_by=["truncate(3,code)"])
    rels = [rel for rel, _ in t.files(t.snapshot())]
    assert any("%20" in rel or "%3A" in rel for rel in rels)  # escaping real
    # point-ish filter on the 'a b' family: exact rows, and the z:q
    # directory (escaped on disk as z%3Aq) is pruned because the
    # comparison runs on the UNESCAPED value
    hit, miss = t._split_by_overlap(t.snapshot(), {"code": ("a ", "a~")})
    assert miss and all("code_trunc_3=z%3Aq" in rel for rel, _ in miss)
    assert hit and all("code_trunc_3=a" in rel for rel, _ in hit)
    got = sorted(r.id for r in t.scan({"code": ("a ", "a~")}).collect())
    assert got == [0, 2, 4, 6, 8, 10]


def test_bucket_rejects_uncanonical_source_types(spark, tmp_path):
    """Driver pruning hashes str(v); only string/integral sources agree
    with Spark's cast-to-string, so bucket over a double must fail at
    write time rather than mis-prune at read time."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(4).select(F.col("id"), (F.col("id") * 1.5).alias("x"))
    with pytest.raises(ValueError, match="integral"):
        t.append(df, partition_by=["bucket(4,x)"])


def test_tz_aware_filter_never_prunes_wrongly(spark, tmp_path):
    """A tz-aware filter endpoint cannot be mapped through the
    wall-time transform; it must degrade to 'no directory pruning'
    (conservative), never to a wrong prune."""
    from datetime import timezone

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_events(spark), partition_by=["days(ts)"])
    aware = datetime(2026, 8, 12, tzinfo=timezone.utc)
    hit, miss = t._split_by_overlap(
        t.snapshot(), {"ts": (aware, aware.replace(hour=23))}
    )
    assert not miss  # no directory pruning on unservable values
    with pytest.raises(ValueError, match="tz-aware"):
        parse_transform("days(ts)").interval(aware, aware)


def test_transform_key_collision_with_data_column_fails(spark, tmp_path):
    """A df that already carries a column named like the derived hive
    key must fail the write — silently overwriting it would corrupt
    the column on every read."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = _events(spark).withColumn("ts_day", F.lit("user-data"))
    with pytest.raises(ValueError, match="collide with"):
        t.append(df, partition_by=["days(ts)"])
