"""Conversation-level duplicate detection vs a pure-python mirror."""

from __future__ import annotations

import hashlib

import pytest

from dataval_spark.operators.convdup import (
    conversation_fingerprints,
    duplicate_conversations,
)

_SENT = "\x00null"


def _py_fp(turns):
    """turns: list of (idx, text) with idx possibly None."""
    hs = [
        (i, hashlib.md5((t if t is not None else _SENT).encode()).hexdigest())
        for i, t in turns
        if i is not None
    ]
    joined = "|".join(h for _, h in sorted(hs))
    return hashlib.md5(joined.encode()).hexdigest()


def _df(spark, convs):
    rows = [
        (cid, i, t) for cid, turns in convs.items() for i, t in turns
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


CONVS = {
    "a1": [(0, "hello"), (1, "world")],
    "a2": [(1, "world"), (0, "hello")],          # same content, rows shuffled
    "b": [(0, "world"), (1, "hello")],           # same texts, other positions
    "c": [(0, "hello"), (1, "world"), (2, "!")], # superset
    "n1": [(0, None)],
    "n2": [(0, "")],                             # NULL != empty string
    "x": [(0, "solo"), (None, "ignored")],       # NULL idx excluded
    "x2": [(0, "solo")],                         # == x after exclusion
}


def test_fingerprints_match_mirror(spark):
    got = {
        r.conv: (r.conv_fp, r.n_turns)
        for r in conversation_fingerprints(_df(spark, CONVS)).collect()
    }
    for cid, turns in CONVS.items():
        expect_fp = _py_fp(turns)
        expect_n = sum(1 for i, _ in turns if i is not None)
        assert got[cid] == (expect_fp, expect_n), cid


def test_duplicate_groups_and_canonical(spark):
    dups = {
        r.conv: (r.group_size, r.canonical)
        for r in duplicate_conversations(_df(spark, CONVS)).collect()
    }
    # a1 == a2 (ingestion order irrelevant); x == x2 (NULL idx excluded)
    assert dups["a1"] == (2, "a1") and dups["a2"] == (2, "a1")
    assert dups["x"] == (2, "x") and dups["x2"] == (2, "x")
    # b (same texts, different positions), c (superset), n1/n2 are unique
    for cid in ("b", "c", "n1", "n2"):
        assert cid not in dups


def test_identity_is_content_sequence_not_index_values(spark):
    """Documented contract: offset/gapped numbering with the same
    content sequence IS a duplicate (index structure belongs to the
    sequence suite, not the duplicate check)."""
    d = {"o1": [(0, "x"), (1, "y")], "o2": [(0, "x"), (5, "y")]}
    dups = {
        r.conv: r.canonical for r in duplicate_conversations(_df(spark, d)).collect()
    }
    assert dups == {"o1": "o1", "o2": "o1"}


def test_duplicate_turn_idx_ties_deterministic(spark):
    """Duplicate (conv, idx) pairs (Unique's violation) still fingerprint
    deterministically — ties break by content hash, so the two orderings
    of the tied rows agree."""
    d1 = {"t": [(0, "a"), (1, "x"), (1, "y")]}
    d2 = {"t": [(0, "a"), (1, "y"), (1, "x")]}
    fp1 = conversation_fingerprints(_df(spark, d1)).collect()[0].conv_fp
    fp2 = conversation_fingerprints(_df(spark, d2)).collect()[0].conv_fp
    assert fp1 == fp2


@pytest.mark.parametrize("chunk_turns", [1, 2, 1000])
def test_chunked_path_identical_duplicate_groups(spark, chunk_turns):
    """The mega-conversation-safe chunked path must produce the SAME
    duplicate groups and canonicals as the default path on every fixture
    shape (shuffled ingestion, renumbered copies, NULL idx/text, ties),
    at chunk sizes below, at, and above the conversation sizes."""
    df = _df(spark, CONVS)
    want = {
        r.conv: (r.group_size, r.canonical)
        for r in duplicate_conversations(df).collect()
    }
    got = {
        r.conv: (r.group_size, r.canonical)
        for r in duplicate_conversations(df, chunk_turns=chunk_turns).collect()
    }
    assert got == want
    # n_turns agrees with the default path too
    n_default = {
        r.conv: r.n_turns for r in conversation_fingerprints(df).collect()
    }
    n_chunked = {
        r.conv: r.n_turns
        for r in conversation_fingerprints(df, chunk_turns=chunk_turns).collect()
    }
    assert n_chunked == n_default


def test_chunked_path_single_exchange(spark):
    """All three stages (rank window, per-chunk agg, per-conv agg)
    hash-cluster on conv — the plan carries exactly one Exchange."""
    df = _df(spark, CONVS)
    plan = (
        conversation_fingerprints(df, chunk_turns=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_chunked_path_million_turn_conversation(spark):
    """Forced 10^6-turn conversation: the chunked path fingerprints it
    with O(chunk_turns) per-group state (the default path would buffer
    the million structs in one aggregation buffer). A renumbered+gapped
    copy of the mega-conversation collapses with it; a copy differing in
    one middle turn does not."""
    from pyspark.sql import functions as F

    n = 1_000_000
    base = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("turn-"), F.col("id")).alias("text"),
    )
    a = base.select(F.lit("mega_a").alias("conv_id"),
                    F.col("k").alias("turn_idx"), "text")
    # same content sequence, offset + gapped numbering
    b = base.select(F.lit("mega_b").alias("conv_id"),
                    (F.col("k") * 3 + 7).alias("turn_idx"), "text")
    # one middle turn differs
    c = base.select(
        F.lit("mega_c").alias("conv_id"),
        F.col("k").alias("turn_idx"),
        F.when(F.col("k") == n // 2, F.lit("CHANGED")).otherwise(
            F.col("text")
        ).alias("text"),
    )
    df = a.unionAll(b).unionAll(c)
    dups = {
        r.conv: (r.group_size, r.canonical)
        for r in duplicate_conversations(df, chunk_turns=4096).collect()
    }
    assert dups == {"mega_a": (2, "mega_a"), "mega_b": (2, "mega_a")}
    fps = {
        r.conv: r.n_turns
        for r in conversation_fingerprints(df, chunk_turns=4096).collect()
    }
    assert fps == {"mega_a": n, "mega_b": n, "mega_c": n}


def test_chunk_turns_validation(spark):
    with pytest.raises(ValueError):
        conversation_fingerprints(_df(spark, CONVS), chunk_turns=0)
