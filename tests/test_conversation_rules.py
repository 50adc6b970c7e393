"""Dialogue-protocol constraints: RoleTransition + ConversationShape
vs a hand-computed mirror, flag algebra, spec round-trip, and the
no-extra-shuffle plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.constraints.core import ConversationShape, RoleTransition
from dataval_spark.quality import QualityFlag
from dataval_spark.suite import Suite
import dataval_spark.plans.explain as E

ALLOWED = (
    "system>user", "user>assistant", "assistant>user",
    "assistant>tool", "tool>assistant",
)


def _frame(spark):
    rows = []

    def conv(cid, roles, part=0):
        for i, r in enumerate(roles):
            rows.append((cid, i, r, f"{cid} turn {i}", i * 10, part))

    conv("ok", ["system", "user", "assistant", "tool", "assistant"])
    conv("badtrans", ["user", "assistant", "assistant"])   # assistant>assistant
    conv("nullrole", ["user", None, "assistant"])          # chain broken twice
    conv("badfirst", ["assistant", "user", "assistant"])   # opening wrong
    conv("badlast", ["user", "assistant", "user"])         # closing wrong
    conv("tiny", ["user"])                                 # < min_turns
    conv("long", ["user", "assistant"] * 4)                # > max_turns
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, sec int, part int"
    )
    return df.withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")


@pytest.fixture(scope="module")
def flagged(spark):
    suite = Suite(
        [
            RoleTransition(allowed=ALLOWED),
            ConversationShape(
                first_roles=("system", "user"),
                last_roles=("assistant",),
                min_turns=2,
                max_turns=6,
            ),
        ],
        part_col="part",
    )
    df = _frame(spark)
    out = suite.flag_rows(suite.enrich(suite.project(df))).collect()
    return {(r.conv_id, r.turn_idx): r for r in out}


def _has(flagged, key, flag):
    return bool(flagged[key].dataval & int(flag))


def test_role_transition_mirror(flagged):
    T = QualityFlag.InvalidTransition
    # legal conversation: no transition flags anywhere
    assert not any(_has(flagged, ("ok", i), T) for i in range(5))
    # assistant>assistant flagged on the SECOND member of the pair
    assert not _has(flagged, ("badtrans", 1), T)
    assert _has(flagged, ("badtrans", 2), T)
    # NULL role: the NULL row breaks the chain (user>NULL) and the row
    # after it breaks again (NULL>assistant)
    assert _has(flagged, ("nullrole", 1), T)
    assert _has(flagged, ("nullrole", 2), T)
    assert not _has(flagged, ("nullrole", 0), T)  # first turn exempt


def test_conversation_shape_mirror(flagged):
    S = QualityFlag.InvalidConvShape
    # bad opening flags ONLY the first row
    assert _has(flagged, ("badfirst", 0), S)
    assert not _has(flagged, ("badfirst", 1), S)
    # bad closing flags ONLY the last row
    assert _has(flagged, ("badlast", 2), S)
    assert not _has(flagged, ("badlast", 1), S)
    # under-min flags every row of the conversation (also a bad closing)
    assert _has(flagged, ("tiny", 0), S)
    # over-max flags every row
    assert all(_has(flagged, ("long", i), S) for i in range(8))
    # a well-shaped conversation carries no shape flag
    assert not any(_has(flagged, ("ok", i), S) for i in range(5))


def test_flags_reject_under_default_mask(flagged):
    # structural flags -> rejected by the default approval algebra
    assert not flagged[("badtrans", 2)].approved
    assert not flagged[("badfirst", 0)].approved
    assert flagged[("ok", 2)].approved


def test_no_extra_shuffle(spark):
    """Adding both dialogue-protocol constraints (helper lag + conv
    count) must keep the suite at exactly TWO exchanges — the lags ride
    the existing conversation window, the count reuses its partitioning."""
    suite = Suite(
        [
            RoleTransition(allowed=ALLOWED),
            ConversationShape(first_roles=("user",), min_turns=2, max_turns=50),
        ],
        part_col="part",
    )
    df = _frame(spark)
    pa = suite.partition_aggregate(suite.flag_rows(suite.enrich(suite.project(df))))
    pa.collect()
    assert E.shuffle_count(pa) == 2, E.physical_plan(pa)


def test_spec_roundtrip(spark):
    from dataval_spark.manifest import suite_hash
    from dataval_spark.spec import suite_from_spec

    spec = {
        "part_col": "part",
        "constraints": [
            {"type": "transition", "allowed": list(ALLOWED)},
            {"type": "conv_shape", "first_roles": ["system", "user"],
             "last_roles": ["assistant"], "min_turns": 2, "max_turns": 6},
        ],
    }
    s1, s2 = suite_from_spec(spec), suite_from_spec(spec)
    assert suite_hash(s1) == suite_hash(s2)
    df = _frame(spark)
    out = {
        (r.conv_id, r.turn_idx): r
        for r in s1.flag_rows(s1.enrich(s1.project(df))).collect()
    }
    assert out[("badtrans", 2)].dataval & int(QualityFlag.InvalidTransition)
    assert out[("badfirst", 0)].dataval & int(QualityFlag.InvalidConvShape)


def test_constructor_guards():
    with pytest.raises(ValueError):
        RoleTransition(allowed=())
    with pytest.raises(ValueError):
        RoleTransition(allowed=("user-assistant",))
    with pytest.raises(ValueError):
        ConversationShape()
