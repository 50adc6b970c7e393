"""Constraint suggestion: profile stats vs a pure-python mirror, spec
round-trip through suite_from_spec, and the end-to-end property that a
suite suggested from clean data catches planted defects."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from dataval_spark.constraints.suggest import (
    profile_table,
    suggest_spec,
    suggest_suite,
)
from dataval_spark.fixtures import transcripts
from dataval_spark.spec import suite_from_spec


@pytest.fixture(scope="module")
def small(spark):
    rows = [
        # conv, turn, role, text, tool, ts-second, part
        ("c1", 0, "user", "hello there", None, 10, 0),
        ("c1", 1, "assistant", "hi", None, 11, 0),
        ("c1", 2, "tool", "result", "search", 12, 0),
        ("c2", 0, "user", "", None, 20, 1),
        ("c2", 1, "assistant", None, None, 21, 1),
        ("c3", 0, "user", "q", None, 30, 1),
        ("c3", 1, "assistant", "a", None, 29, 1),  # ts regression
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, sec int, part int"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")
    return df


def test_profile_matches_mirror(small):
    p = profile_table(small)
    assert p["n_rows"] == 7
    c = p["columns"]
    assert c["text"]["null_rate"] == pytest.approx(1 / 7)
    assert c["text"]["empty_rate"] == pytest.approx(1 / 7)
    assert c["role"]["null_rate"] == 0.0
    assert c["role"]["domain"] == ["assistant", "tool", "user"]
    assert c["tool"]["domain"] == ["search"]
    assert c["turn_idx"]["min"] == 0 and c["turn_idx"]["max"] == 2
    s = p["sequence"]
    assert s["dup_rate"] == 0.0
    assert s["gap_rate"] == 0.0
    assert s["ts_regress_rate"] == pytest.approx(1 / 7)
    # conv_id is never collected as a domain, whatever its cardinality
    assert "domain" not in c["conv_id"]
    # role-protocol evidence from the same window pass
    assert s["transitions"] == ["assistant>tool", "user>assistant"]
    assert s["first_roles"] == ["user"]
    assert s["last_roles"] == ["assistant", "tool"]


def test_profile_single_agg_plan(small):
    """The stats pass is one global aggregation: exactly one shuffle
    Exchange in its plan (partial agg -> single-partition final)."""
    cls = type(small)  # the concrete (classic) DataFrame class
    captured = []
    orig = cls.agg

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        captured.append(out)
        return out

    cls.agg = spy
    try:
        profile_table(small, sequence_evidence=False)
    finally:
        cls.agg = orig
    assert captured, "profile_table no longer goes through DataFrame.agg"
    plan = captured[0]._jdf.queryExecution().executedPlan().toString()
    # AQE renders Final + Initial plans: scope the count to the final one
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, plan


def test_suggest_spec_rules(small):
    p = profile_table(small)
    spec, rationale = suggest_spec(p)
    kinds = {(c["type"], c.get("col", "")) for c in spec["constraints"]}
    assert ("not_null", "role") in kinds
    assert ("domain", "role") in kinds
    assert ("domain", "tool") in kinds
    # tool is mostly NULL -> domain must allow_null, not_null skipped
    tool_dom = next(
        c for c in spec["constraints"]
        if c["type"] == "domain" and c["col"] == "tool"
    )
    assert tool_dom.get("allow_null") is True
    assert not any(
        c["type"] == "not_null" and c.get("col") == "tool"
        for c in spec["constraints"]
    )
    # dialogue-protocol suggestions from the observed evidence
    tr = next(c for c in spec["constraints"] if c["type"] == "transition")
    assert tr["allowed"] == ["assistant>tool", "user>assistant"]
    cs = next(c for c in spec["constraints"] if c["type"] == "conv_shape")
    assert cs["first_roles"] == ["user"]
    assert cs["last_roles"] == ["assistant", "tool"]


def test_seq_cutoffs_respected(small):
    p = profile_table(small)
    spec, rationale = suggest_spec(p)
    kinds = [c["type"] for c in spec["constraints"]]
    # dup/gap rates are 0 -> suggested; ts regression 14% -> NOT suggested
    assert "unique" in kinds and "sequence" in kinds
    assert "monotonic_ts" not in kinds
    # text dirt = 2/7 = 0.29 > 0.05 -> not_null(text) skipped, surfaced
    assert not any(
        c["type"] == "not_null" and c.get("col") == "text"
        for c in spec["constraints"]
    )
    assert any("not_null(text): SKIPPED" in r for r in rationale)


def test_suggested_suite_runs_and_catches_planted_defects(spark):
    clean = transcripts(spark, n_convs=150, seed=11, n_parts=4, with_defects=False)
    suite, spec, rationale = suggest_suite(clean)
    # round-trip: the spec is JSON-serializable and reloads identically
    reloaded = suite_from_spec(json.loads(json.dumps(spec)))
    assert [c.name for c in reloaded.constraints] == [
        c.name for c in suite.constraints
    ]
    res = reloaded.run(clean)
    s = res.summary()
    assert s["n_rows"] > 0
    # suggested-from-clean must approve (almost all of) the clean data
    assert s["n_approved"] >= 0.99 * s["n_rows"]

    # plant defects: null texts and an out-of-domain role on part 0
    dirty = clean.withColumn(
        "text",
        F.when((F.col("part") == 0) & (F.col("turn_idx") == 1), F.lit(None)).otherwise(
            F.col("text")
        ),
    ).withColumn(
        "role",
        F.when((F.col("part") == 0) & (F.col("turn_idx") == 2), F.lit("wizard")).otherwise(
            F.col("role")
        ),
    )
    res2 = reloaded.run(dirty)
    viol = {r.constraint for r in res2.violations.collect()}
    assert "InvalidText" in viol  # null text -> suggested not_null's flag
    assert "InvalidRole" in viol  # out-of-domain role -> domain's flag
    assert res2.summary()["n_approved"] < s["n_approved"]


def test_cli_suggest_suite(spark, tmp_path):
    clean = transcripts(spark, n_convs=60, seed=5, n_parts=2, with_defects=False)
    inp = str(tmp_path / "in.parquet")
    clean.write.parquet(inp)
    out = str(tmp_path / "suggested.json")
    r = subprocess.run(
        [sys.executable, "-m", "dataval_spark.cli", "--input", inp,
         "--suggest-suite", out, "--cpus", "4"],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["n_constraints"] >= 4
    assert payload["rationale"]
    spec = json.load(open(out))
    suite = suite_from_spec(spec)  # loads back through the --suite path
    assert suite.constraints


def test_latency_and_json_shape_evidence(small):
    """The profile carries exact inter-turn gap extremes and per-column
    JSON-object rates; the rules turn them into conservative latency
    bounds and a json_shape gate only where warranted."""
    prof = profile_table(small)
    seq = prof["sequence"]
    # gaps: c1 has 1s gaps, c3 has a -1s regression -> min is negative
    assert seq["gap_seconds_min"] == -1.0 and seq["gap_seconds_max"] == 1.0
    # none of the small fixture's strings are JSON objects
    assert prof["columns"]["text"]["json_object_rate"] == 0.0

    spec, rationale = suggest_spec(prof)
    kinds = [c["type"] for c in spec["constraints"]]
    # negative observed gap -> no latency floor is safe, and the rule
    # refuses to suggest at all (MonotonicTs owns regressions)
    assert "latency" not in kinds
    assert "json_shape" not in kinds


def test_latency_and_json_shape_suggested_on_clean_payload_table(spark):
    """Clean gaps + a JSON payload column: latency bounds bracket the
    observed envelope with 4x headroom (training data never flags) and
    the payload column gets json_shape; loading the spec reproduces the
    suite (round-trip) and approves every training row."""
    rows = []
    for conv in range(30):
        for i in range(4):
            rows.append((
                f"c{conv}", i, "user" if i % 2 == 0 else "assistant",
                "turn text", None if i == 0 else '{"k": 1, "v": "x"}',
                conv * 1000 + i * 10 + (i % 3),  # gaps 8-12s
                conv % 2,
            ))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "props string, sec int, part int"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")

    prof = profile_table(df)
    assert prof["columns"]["props"]["json_object_rate"] == 1.0
    seq = prof["sequence"]
    assert seq["gap_seconds_min"] > 0

    spec, rationale = suggest_spec(prof)
    by_kind = {c["type"]: c for c in spec["constraints"]}
    lat = by_kind["latency"]
    assert lat["min_seconds"] == round(seq["gap_seconds_min"] / 4, 6)
    assert lat["max_seconds"] >= seq["gap_seconds_max"] * 4
    js = by_kind["json_shape"]
    assert js["col"] == "props"
    assert js["null_is_violation"] is False  # turn 0 has NULL props
    # text is not JSON; conv_id is excluded by rule
    assert all(
        c.get("col") != "text" for c in spec["constraints"] if c["type"] == "json_shape"
    )

    suite = suite_from_spec(spec)
    res = suite.run(df)
    n = sum(m["n_rows"] for m in res.partition_metrics)
    approved = sum(m["n_approved"] for m in res.partition_metrics)
    assert n == len(rows) and approved == n  # learned bounds never flag
