"""Parquet bloom filters on SnapshotTable writes: declared once,
recorded in the snapshot, inherited by later writers and kept through
compaction. Blooms give row-group skipping for EQUALITY probes on
high-cardinality keys (conv_id-style) where min/max bounds are useless
because every file spans the whole key space. pyarrow does not expose
bloom offsets, so the write-side evidence is the bloom bytes
themselves (same data, strictly larger files for exactly the
configured column) plus read-back identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataval_spark.sources.snapshots import SnapshotTable


def _docs(spark, n=20000):
    return spark.range(n).select(
        F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
        F.col("id"),
    )


def _bytes(t):
    return sum(int(s) for _, s in t.files(t.snapshot()))


def test_bloom_bytes_written_and_rows_roundtrip(spark, tmp_path):
    plain = SnapshotTable(spark, str(tmp_path / "plain"))
    bloomed = SnapshotTable(
        spark, str(tmp_path / "bloomed"), bloom_columns={"conv_id": 20000}
    )
    df = _docs(spark).coalesce(1)
    plain.append(df)
    bloomed.append(df)
    # same rows, same layout — the extra bytes ARE the bloom
    assert _bytes(bloomed) > _bytes(plain) + 4096
    assert bloomed.read().count() == plain.read().count() == 20000
    assert (
        bloomed.read().where(F.col("conv_id") == "conv-7").collect()[0].id == 7
    )
    assert bloomed.snapshot()["bloom_columns"] == {"conv_id": 20000}


def test_bloom_spec_inherited_and_survives_compaction(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), bloom_columns={"conv_id": 20000}
    )
    t.append(_docs(spark).coalesce(1))
    # a later writer constructed WITHOUT the parameter inherits it
    t2 = SnapshotTable(spark, str(tmp_path / "t"))
    assert t2._resolved_blooms() == {"conv_id": 20000}
    t2.append(
        _docs(spark).coalesce(1).withColumn(
            "conv_id", F.concat(F.lit("x"), F.col("conv_id"))
        )
    )
    assert t2.snapshot()["bloom_columns"] == {"conv_id": 20000}
    # compaction rewrites with blooms: compare against a bloom-less
    # control compacted from the same content
    ctrl = SnapshotTable(spark, str(tmp_path / "ctrl"))
    ctrl.append(t2.read().coalesce(1))
    t2.compact(target_file_bytes=512 * 1024 * 1024)
    assert t2.snapshot()["operation"] == "compact"
    assert t2.snapshot()["bloom_columns"] == {"conv_id": 20000}
    assert _bytes(t2) > _bytes(ctrl) + 4096
    assert t2.read().count() == 40000


def test_bloom_skips_absent_columns(spark, tmp_path):
    # a configured column the frame does not carry is simply ignored
    t = SnapshotTable(
        spark, str(tmp_path / "t"), bloom_columns=["conv_id", "nope"]
    )
    t.append(_docs(spark, 100))
    assert t.read().count() == 100
