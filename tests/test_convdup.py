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
