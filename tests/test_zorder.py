"""Z-order clustering: Morton-key correctness against a pure-Python
mirror, row preservation, and the actual payoff — manifest-stats file
pruning on EVERY clustered column after a zorder compaction, where a
single-column sort only prunes on its leading key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import SnapshotTable
from dataval_spark.sources.zorder import (
    compute_boundaries,
    write_zordered,
    zorder_key,
    zordered,
)


# ------------------------------------------------------------- mirrors
def _bucket_mirror(v, bnds):
    if v is None:
        return 0
    return sum(1 for b in bnds if v >= b)


def _interleave_mirror(buckets, bits):
    z = 0
    n = len(buckets)
    for j, bkt in enumerate(buckets):
        for i in range(bits):
            z |= ((bkt >> i) & 1) << (i * n + j)
    return z


def test_zorder_key_matches_python_mirror(spark):
    rows = [
        (float(x), float(y))
        for x in (0.0, 1.5, 3.0, 7.25, 100.0)
        for y in (-5.0, 0.0, 2.0, 9.0)
    ] + [(None, 4.0), (2.0, None), (None, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    bnds = {"x": [1.0, 3.0, 50.0], "y": [-1.0, 2.0, 8.0]}
    got = df.withColumn("z", zorder_key(bnds, ["x", "y"], bits_per_col=2))
    for r in got.collect():
        want = _interleave_mirror(
            [_bucket_mirror(r.x, bnds["x"]), _bucket_mirror(r.y, bnds["y"])],
            bits=2,
        )
        assert r.z == want, (r.x, r.y, r.z, want)


def test_interleave_alternates_bits():
    # bucket 0b11 on col0 and 0b00 on col1 -> bits 0 and 2 set
    assert _interleave_mirror([3, 0], 2) == 0b0101
    assert _interleave_mirror([0, 3], 2) == 0b1010
    assert _interleave_mirror([3, 3], 2) == 0b1111


def test_boundaries_deduped_and_sorted(spark):
    # heavy-hitter value: most quantiles collapse onto it
    df = spark.createDataFrame(
        [(5.0,)] * 90 + [(float(i),) for i in range(10)], "v double"
    )
    bnds = compute_boundaries(df, ["v"], bits_per_col=4)["v"]
    assert bnds == sorted(set(bnds))
    assert all(isinstance(b, float) for b in bnds)


def test_zordered_preserves_rows_exactly(spark):
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") * 37 % 101).cast("double").alias("a"),
        (F.col("id") * 61 % 97).cast("double").alias("b"),
    )
    out = zordered(df, ["a", "b"], bits_per_col=4, n_ranges=8)
    assert out.columns == df.columns  # key column dropped
    assert sorted(r.id for r in out.collect()) == list(range(2000))


def test_param_validation(spark):
    df = spark.range(2).select(F.col("id").cast("double").alias("a"))
    with pytest.raises(ValueError, match="at least one"):
        zordered(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        compute_boundaries(df, ["a", "a"])
    with pytest.raises(ValueError, match="key bits"):
        zorder_key({}, [f"c{i}" for i in range(8)], bits_per_col=8)
    with pytest.raises(ValueError, match="bits_per_col"):
        zorder_key({}, ["a"], bits_per_col=0)


# ------------------------------------------------- the pruning payoff
def _grid_df(spark, n=20_000):
    # two INDEPENDENT uniform axes — the case a single sort cannot serve
    return spark.range(0, n).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 10_000).cast("double").alias("x"),
        (F.col("id") * 40503 % 10_000).cast("double").alias("y"),
    )


def _pruned_counts(t, filters):
    snap = t.snapshot()
    hit, miss = t._split_by_overlap(snap, filters)
    return len(hit), len(hit) + len(miss)


def test_zorder_compaction_prunes_on_both_axes(spark, tmp_path):
    df = _grid_df(spark)
    zt = SnapshotTable(spark, str(tmp_path / "zt"))
    zt.append(df)
    st = SnapshotTable(spark, str(tmp_path / "st"))
    st.append(df)

    # ~32 multi-row files: enough for pruning to have something to
    # witness, but big enough that a file spans a real value range (a
    # near-one-row-per-file layout would give EVERY ordering tight
    # bounds and prove nothing)
    total = sum(int(s) for _, s in zt.files(zt.snapshot()))
    target = max(1, total // 32)
    zt.compact(target_file_bytes=target, zorder_by=["x", "y"])
    st.compact(target_file_bytes=target, sort_by=["x"])

    win = {"x": (1000.0, 1500.0), "y": (1000.0, 1500.0)}
    for axis in ("x", "y"):
        z_hit, z_total = _pruned_counts(zt, {axis: win[axis]})
        assert z_total >= 8
        # a 5% slice of one axis must skip most files under z-order
        assert z_hit <= z_total // 2, (axis, z_hit, z_total)
    # the single-axis sort prunes x sharply but barely prunes y: a
    # 625-row x-run covers nearly the whole independent y range
    s_hit_x, s_total = _pruned_counts(st, {"x": win["x"]})
    s_hit_y, _ = _pruned_counts(st, {"y": win["y"]})
    assert s_hit_x <= s_total // 2
    assert s_hit_y >= (s_total * 9) // 10

    # pruned scan is EXACTLY the unpruned filtered read
    expect = sorted(
        r.id
        for r in df.where(
            (F.col("x") >= 1000.0) & (F.col("x") <= 1500.0)
        ).collect()
    )
    got = sorted(r.id for r in zt.scan({"x": (1000.0, 1500.0)}).collect())
    assert got == expect


def test_zorder_compaction_always_rewrites_and_conflicts_safely(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_grid_df(spark, 500))
    v_before = t.current_version()
    # already one file, but zorder_by must still rewrite (order changes)
    v = t.compact(zorder_by=["x", "y"])
    assert v == v_before + 1
    assert t.snapshot()["operation"] == "compact"
    assert t.read().count() == 500
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.compact(sort_by=["x"], zorder_by=["y"])


def test_write_zordered_roundtrip(spark, tmp_path):
    df = _grid_df(spark, 1000)
    path = str(tmp_path / "wz")
    write_zordered(df, path, ["x", "y"], bits_per_col=4, n_ranges=4)
    back = spark.read.parquet(path)
    assert sorted(r.id for r in back.collect()) == list(range(1000))


def test_increment_clustered_with_frozen_boundaries(spark, tmp_path):
    # boundaries computed once on the base keep increments consistent
    base = _grid_df(spark, 2000)
    bnds = compute_boundaries(base, ["x", "y"], bits_per_col=4)
    inc = _grid_df(spark, 100)
    out = zordered(inc, ["x", "y"], bits_per_col=4, boundaries=bnds, n_ranges=2)
    assert out.count() == 100


def test_cli_compact_zorder_and_sort_faces(spark, tmp_path, capsys):
    import json

    from dataval_spark.cli import main as cli_main

    d = str(tmp_path / "in")
    _grid_df(spark, 6).write.parquet(d)  # dummy --input; never read
    table = str(tmp_path / "t")
    t = SnapshotTable(spark, table)
    t.append(_grid_df(spark, 4000).repartition(8))
    capsys.readouterr()

    rc = cli_main([
        "--input", d, "--compact", table,
        "--target-file-mb", "1024", "--zorder-by", "x,y",
    ])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["compacted"]  # zorder always rewrites
    assert t.snapshot()["operation"] == "compact"
    stats = t.file_stats(t.snapshot())
    assert all("x" in b and "y" in b for b in stats.values())
    assert t.read().count() == 4000

    rc = cli_main([
        "--input", d, "--compact", table,
        "--target-file-mb", "1024", "--sort-by", "y",
    ])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["compacted"]
    assert t.read().count() == 4000
