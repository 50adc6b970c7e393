"""Declarative suite spec: a JSON document must reproduce the
hand-built transcript_suite exactly (same verdicts on the fixture), and
the spec's SQL text must flow into the manifest settings guard."""

from __future__ import annotations

import json

import pytest

from dataval_spark.fixtures import transcripts
from dataval_spark.manifest import suite_hash
from dataval_spark.spec import suite_from_spec
from dataval_spark.suite import CHAR_BOUNDS, ROLE_DOMAIN, TOOL_DOMAIN, transcript_suite


def transcript_spec() -> dict:
    tools = ", ".join(f"'{t}'" for t in TOOL_DOMAIN)
    return {
        "part_col": "part",
        "reject_ratio_fail": 0.10,
        "constraints": [
            {"type": "not_null", "col": "text", "flag": "InvalidText", "max_rate": 0.05},
            {"type": "not_null", "col": "ts", "flag": "InvalidTimestamp",
             "empty_is_null": False},
            {"type": "cross_field", "name": "conv_id_format",
             "when": "conv_id IS NULL OR NOT regexp_like(conv_id, '^conv-[0-9]{12}$')",
             "flag": "InvalidConvId"},
            {"type": "unique", "keys": ["conv_id", "turn_idx"]},
            {"type": "sequence"},
            {"type": "monotonic_ts"},
            {"type": "domain", "col": "role", "values": ROLE_DOMAIN,
             "flag": "InvalidRole"},
            {"type": "cross_field", "name": "tool_consistency",
             "when": ("(role = 'tool' AND tool IS NULL) OR "
                      "(role <> 'tool' AND role IS NOT NULL AND tool IS NOT NULL) OR "
                      f"(tool IS NOT NULL AND tool NOT IN ({tools}))"),
             "flag": "InvalidTool"},
            {"type": "envelope", "expr": "CAST(length(text) AS DOUBLE)",
             "group_col": "role",
             "bounds": {k: list(v) for k, v in CHAR_BOUNDS.items()},
             "name": "text_len"},
            {"type": "status_gate", "ok_values": [1, 3]},
            {"type": "stats", "col": "text"},
            {"type": "stats", "col": "role"},
            {"type": "drift", "expr": "CAST(length(text) AS DOUBLE)",
             "bins": [float(x) for x in range(0, 901, 60)],
             "name": "drift_text_len"},
        ],
    }


def test_spec_suite_matches_handbuilt(spark):
    df = transcripts(spark, n_convs=200, seed=2187, n_parts=4).cache()
    hand = transcript_suite().run(df)
    spec = suite_from_spec(transcript_spec())
    got = spec.run(df)
    assert got.summary() == hand.summary()
    hv = {m["part"]: (m["passed"], m["n_rejected"]) for m in hand.partition_metrics}
    gv = {m["part"]: (m["passed"], m["n_rejected"]) for m in got.partition_metrics}
    assert gv == hv
    df.unpersist()


def test_spec_roundtrips_through_json(tmp_path):
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(transcript_spec()))
    s1 = suite_from_spec(str(p))
    s2 = suite_from_spec(transcript_spec())
    assert suite_hash(s1) == suite_hash(s2)


def test_spec_sql_text_changes_suite_hash():
    a = transcript_spec()
    b = transcript_spec()
    b["constraints"][2]["when"] = "conv_id IS NULL"  # different SQL
    assert suite_hash(suite_from_spec(a)) != suite_hash(suite_from_spec(b))


def test_spec_unknown_type_rejected():
    with pytest.raises(ValueError, match="unknown constraint type"):
        suite_from_spec({"constraints": [{"type": "telepathy"}]})


def test_custom_part_col_end_to_end(spark):
    """part_col is advertised as configurable: a suite keyed on a column
    NOT named 'part' must run end-to-end, with metric rows exposing the
    canonical 'part' key every consumer (manifest, compare_runs, report)
    relies on."""
    spec = transcript_spec()
    spec["part_col"] = "pid"
    suite = suite_from_spec(spec)
    df = transcripts(spark, n_convs=80, seed=2187, n_parts=4).withColumnRenamed(
        "part", "pid"
    )
    res = suite.run(df)
    assert {m["part"] for m in res.partition_metrics} == {0, 1, 2, 3}
    assert "part" in res.row_verdicts.columns
    assert "part" in res.partition_verdicts.columns
    assert res.summary()["n_rows"] == df.count()
    assert "TOTAL" in res.report()


def test_spec_default_mask_by_flag_names(spark):
    """default_mask as flag names: masking DOWN to one flag approves rows
    that only carry other flags."""
    spec = transcript_spec()
    spec["default_mask"] = ["DuplicateTurn"]
    narrow = suite_from_spec(spec)
    full = suite_from_spec(transcript_spec())
    df = transcripts(spark, n_convs=120, seed=2187, n_parts=4)
    n_narrow = narrow.run(df).summary()["n_approved"]
    n_full = full.run(df).summary()["n_approved"]
    assert n_narrow > n_full  # fewer rejection reasons -> more approvals
    assert suite_hash(narrow) != suite_hash(full)


def test_suite_on_empty_input(spark):
    """Empty input: schema-stable empty result, no crash (verify probe)."""
    df = transcripts(spark, n_convs=20, seed=2187, n_parts=2).limit(0)
    res = transcript_suite().run(df)
    assert res.partition_metrics == []
    assert res.summary() == {
        "n_rows": 0, "n_approved": 0, "n_partitions": 0, "n_partitions_passed": 0
    }
    assert res.row_verdicts.count() == 0
    assert "part" in res.partition_verdicts.columns


def test_string_part_col_with_nulls(spark):
    """String-typed partition columns must work (coalescing with an int
    literal would cast the column to BIGINT under ANSI and crash), and
    NULL string parts land in the string quarantine sentinel."""
    from pyspark.sql import functions as F

    spec = transcript_spec()
    spec["part_col"] = "source"
    suite = suite_from_spec(spec)
    df = transcripts(spark, n_convs=60, seed=2187, n_parts=2).withColumn(
        "source",
        F.when(F.col("turn_idx") % 13 == 5, None).otherwise(
            F.concat(F.lit("src-"), F.col("part").cast("string"))
        ),
    ).drop("part")
    res = suite.run(df)
    parts = {m["part"] for m in res.partition_metrics}
    assert parts == {"src-0", "src-1", "__null_part__"}
    assert res.summary()["n_rows"] == df.count()


def test_spec_default_mask_rejected_forms():
    with pytest.raises(ValueError, match="empty list"):
        suite_from_spec({"default_mask": [], "constraints": [{"type": "sequence"}]})
    with pytest.raises(ValueError, match="int bitmask or a list"):
        suite_from_spec({"default_mask": "DuplicateTurn", "constraints": [{"type": "sequence"}]})


def test_run_resumable_rejects_string_part_col(spark, tmp_path):
    """The manifest stores part as int — a string part column must fail
    loudly up front, not deep inside int(m['part'])."""
    from pyspark.sql import functions as F

    from dataval_spark.manifest import run_resumable

    spec = transcript_spec()
    spec["part_col"] = "source"
    suite = suite_from_spec(spec)
    df = transcripts(spark, n_convs=20, seed=2187, n_parts=2).withColumn(
        "source", F.concat(F.lit("s"), F.col("part").cast("string"))
    ).drop("part")
    with pytest.raises(ValueError, match="integer partition column"):
        run_resumable(spark, df, suite, str(tmp_path / "m"), "r")
