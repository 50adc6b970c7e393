"""ResponseLatency + JsonShape constraints vs hand-computed mirrors,
flag algebra, spec round-trip, and the no-extra-shuffle guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.constraints.core import JsonShape, ResponseLatency
from dataval_spark.quality import QualityFlag
from dataval_spark.suite import Suite
import dataval_spark.plans.explain as E

L = QualityFlag.InvalidLatency
P = QualityFlag.MalformedPayload


def _lat_frame(spark):
    rows = []

    def conv(cid, turns, part=0):
        # turns: list of (role, sec or None)
        for i, (role, sec) in enumerate(turns):
            rows.append((cid, i, role, f"{cid} t{i}", sec, part))

    conv("ok", [("user", 0), ("assistant", 5), ("user", 65), ("assistant", 70)])
    conv("fast", [("user", 0), ("assistant", 0)])            # 0s reply: too fast
    conv("slow", [("user", 0), ("assistant", 7200)])         # 2h gap: too slow
    conv("nullts", [("user", None), ("assistant", 5), ("user", None)])
    conv("usergap", [("assistant", 0), ("user", 7200)])      # gap INTO user turn
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, sec int, part int"
    )
    return df.withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")


def _run(spark, constraints):
    suite = Suite(constraints, part_col="part")
    df = _lat_frame(spark)
    out = suite.flag_rows(suite.enrich(suite.project(df))).collect()
    return {(r.conv_id, r.turn_idx): r for r in out}


def _has(flagged, key, flag):
    return bool(flagged[key].dataval & int(flag))


def test_latency_bounds_mirror(spark):
    flagged = _run(spark, [ResponseLatency(min_seconds=1, max_seconds=3600)])
    # legal gaps never flag; first turns exempt (no predecessor)
    assert not any(_has(flagged, ("ok", i), L) for i in range(4))
    for cid in ("ok", "fast", "slow", "nullts", "usergap"):
        assert not _has(flagged, (cid, 0), L)
    # the LATER member of the bad pair carries the flag
    assert _has(flagged, ("fast", 1), L)       # 0s < min_seconds
    assert _has(flagged, ("slow", 1), L)       # 7200s > max_seconds
    assert _has(flagged, ("usergap", 1), L)
    # NULL ts on either side: no evidence, never a latency violation
    assert not any(_has(flagged, ("nullts", i), L) for i in range(3))
    # structural flag -> rejected by the default approval algebra
    assert not flagged[("fast", 1)].approved
    assert flagged[("ok", 1)].approved


def test_latency_role_scoped(spark):
    flagged = _run(
        spark,
        [ResponseLatency(min_seconds=1, max_seconds=3600, roles=("assistant",))],
    )
    assert _has(flagged, ("fast", 1), L)       # assistant reply: in scope
    assert _has(flagged, ("slow", 1), L)
    assert not _has(flagged, ("usergap", 1), L)  # user think-time exempt


def test_latency_validation():
    with pytest.raises(ValueError):
        ResponseLatency()  # no bounds: vacuous
    with pytest.raises(ValueError):
        ResponseLatency(min_seconds=10, max_seconds=1)


def _json_frame(spark):
    rows = [
        # (conv, idx, role, props)
        ("c", 0, "user", None),                          # out of scope
        ("c", 1, "tool", '{"name": "search", "args": "{}"}'),
        ("c", 2, "tool", '{"name": "search"}'),          # missing args
        ("c", 3, "tool", "not json"),
        ("c", 4, "tool", "[1, 2]"),                      # array, not object
        ("c", 5, "tool", "42"),                          # scalar, not object
        ("c", 6, "tool", None),                          # NULL in scope
        ("c", 7, "user", "not json"),                    # out of scope: exempt
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, props string")
    return df.withColumn("ts", F.timestamp_seconds(F.col("turn_idx"))).withColumn(
        "part", F.lit(0)
    )


def test_json_shape_mirror(spark):
    suite = Suite(
        [
            JsonShape(
                col="props",
                required_keys=("name", "args"),
                when=lambda df: F.col("role") == "tool",
            )
        ],
        part_col="part",
    )
    df = _json_frame(spark)
    out = {r.turn_idx: r for r in suite.flag_rows(suite.enrich(suite.project(df))).collect()}
    assert not out[0].dataval & int(P)   # out of scope, NULL allowed
    assert not out[1].dataval & int(P)   # valid object with both keys
    assert out[2].dataval & int(P)       # missing required key
    assert out[3].dataval & int(P)       # malformed
    assert out[4].dataval & int(P)       # array is not an object
    assert out[5].dataval & int(P)       # scalar is not an object
    assert out[6].dataval & int(P)       # NULL payload in scope
    assert not out[7].dataval & int(P)   # out of scope: exempt
    assert not out[3].approved and out[1].approved


def test_json_shape_null_allowed(spark):
    suite = Suite(
        [JsonShape(col="props", null_is_violation=False)], part_col="part"
    )
    df = _json_frame(spark)
    out = {r.turn_idx: r for r in suite.flag_rows(suite.enrich(suite.project(df))).collect()}
    assert not out[0].dataval & int(P)   # NULL allowed
    assert not out[6].dataval & int(P)
    assert out[7].dataval & int(P)       # present but malformed still flags
    assert not out[1].dataval & int(P)   # no required keys: any object ok


def test_no_extra_shuffle(spark):
    """Latency rides the existing _prev_ts window column; JsonShape is
    row-local pre-shuffle — the suite stays at exactly TWO exchanges."""
    suite = Suite(
        [
            ResponseLatency(min_seconds=0, max_seconds=3600, roles=("assistant",)),
            JsonShape(col="text", null_is_violation=False),
        ],
        part_col="part",
    )
    df = _lat_frame(spark)
    pa = suite.partition_aggregate(suite.flag_rows(suite.enrich(suite.project(df))))
    pa.collect()
    assert E.shuffle_count(pa) == 2, E.physical_plan(pa)


def test_spec_roundtrip(spark):
    from dataval_spark.manifest import suite_hash
    from dataval_spark.spec import suite_from_spec

    spec = {
        "constraints": [
            {"type": "latency", "min_seconds": 1, "max_seconds": 3600,
             "roles": ["assistant"]},
            {"type": "json_shape", "col": "props",
             "required_keys": ["name"], "when": "role = 'tool'"},
        ]
    }
    s1 = suite_from_spec(spec)
    s2 = suite_from_spec(spec)
    assert suite_hash(s1) == suite_hash(s2)
    # and it actually runs: same verdicts as the directly-built suite
    df = _json_frame(spark)
    got = {
        r.turn_idx: r.dataval
        for r in s1.flag_rows(s1.enrich(s1.project(df))).collect()
    }
    direct = Suite(
        [
            ResponseLatency(min_seconds=1, max_seconds=3600, roles=("assistant",)),
            JsonShape(col="props", required_keys=("name",),
                      when=lambda d: F.col("role") == "tool"),
        ],
        part_col="part",
    )
    want = {
        r.turn_idx: r.dataval
        for r in direct.flag_rows(direct.enrich(direct.project(df))).collect()
    }
    assert got == want
