"""Token-budget mixture sampling vs an exact hashlib mirror."""

from __future__ import annotations

import hashlib

import pytest

from dataval_spark.operators.mixing import (
    sample_to_budget,
    temperature_weights,
    uniform_hash,
)
from pyspark.sql import functions as F

N = {"web": 3000, "code": 900, "wiki": 300}
TOK = {"web": 100, "code": 200, "wiki": 50}  # tokens per doc, by source


def _mk(spark):
    rows = []
    for src, n in N.items():
        for i in range(n):
            rows.append((f"{src}-{i:05d}", src, TOK[src]))
    rows.append(("nosrc-1", None, 10))
    return spark.createDataFrame(rows, "doc_id string, source string, n_tokens int")


def _u(doc_id: str, seed: int) -> float:
    # 13 hex digits = 52 bits: exact in a double, so == (not approx)
    # comparison against the Spark side is legitimate
    h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:13]
    return int(h, 16) / float(16**13)


@pytest.fixture(scope="module")
def docs(spark):
    return _mk(spark)


def test_uniform_hash_matches_hashlib_and_is_uniform(spark):
    ids = [(f"row-{i}",) for i in range(2000)]
    df = spark.createDataFrame(ids, "doc_id string")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", uniform_hash(F.col("doc_id"), seed=7).alias("u")
        ).collect()
    }
    for (i,) in ids:
        assert got[i] == pytest.approx(_u(i, 7), rel=1e-12)
    mean = sum(got.values()) / len(got)
    assert 0.45 < mean < 0.55


def test_uniform_hash_v1_reproduces_pre_break_draws(spark):
    """The 15->13 digit fix (HASH BREAK v2) changed every draw;
    hash_version=1 must reproduce the old 60-bit values so pre-v2
    corpora can replay their membership decisions."""
    df = spark.createDataFrame([(f"row-{i}",) for i in range(64)],
                               "doc_id string")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id",
            uniform_hash(F.col("doc_id"), seed=7, hash_version=1).alias("u"),
        ).collect()
    }
    for i, u in got.items():
        want = int(
            hashlib.md5(f"7|{i}".encode()).hexdigest()[:15], 16
        ) / float(16**15)
        assert u == pytest.approx(want, rel=1e-12)
    # and v1 != v2 bit-exactly on some rows (the break is last-ulp
    # sized — that is exactly why v2 exists: 60 bits don't fit a
    # double, so v1's cast rounds and mirrors could disagree)
    v2 = {i: _u(i, 7) for i in got}
    assert any(got[i] != v2[i] for i in got)


def test_temperature_weights_math():
    counts = {"a": 900, "b": 100}
    assert temperature_weights(counts, tau=1.0) == pytest.approx(
        {"a": 0.9, "b": 0.1}
    )
    assert temperature_weights(counts, tau=0.0) == pytest.approx(
        {"a": 0.5, "b": 0.5}
    )
    w = temperature_weights(counts, tau=0.5)
    assert w["b"] > 0.1 and w["a"] < 0.9  # small source upweighted
    with pytest.raises(ValueError):
        temperature_weights(counts, tau=-1)


def test_sample_matches_python_mirror_exactly(docs):
    budget = 150_000
    sampled, stats = sample_to_budget(docs, budget, tau=1.0, seed=3)
    got = {r["doc_id"] for r in sampled.collect()}
    rates = {s["source"]: s["rate"] for s in stats.sources}
    want = set()
    for src, n in N.items():
        for i in range(n):
            doc = f"{src}-{i:05d}"
            if _u(doc, 3) < rates[src]:
                want.add(doc)
    assert got == want
    assert "nosrc-1" not in got  # NULL source dropped


def test_budget_hit_in_expectation(docs):
    budget = 150_000
    sampled, stats = sample_to_budget(docs, budget, tau=1.0, seed=11)
    # tau=1, no clipping: expected tokens == budget exactly
    assert stats.expected_tokens == pytest.approx(budget, rel=0.01)
    total = sampled.agg(F.sum("n_tokens")).first()[0]
    assert total == pytest.approx(budget, rel=0.15)  # 4k-doc sample noise


def test_rate_clips_at_one_keeps_whole_source(docs):
    # wiki has 15k tokens; give it 90% of a 300k budget -> rate caps at 1
    sampled, stats = sample_to_budget(
        docs, 300_000, weights={"wiki": 0.9, "web": 0.1}, seed=5
    )
    by_src = {s["source"]: s for s in stats.sources}
    assert by_src["wiki"]["rate"] == 1.0
    assert by_src["code"]["rate"] == 0.0  # unweighted source dropped
    wiki_kept = sampled.where(F.col("source") == "wiki").count()
    assert wiki_kept == N["wiki"]
    assert sampled.where(F.col("source") == "code").count() == 0


def test_determinism_across_runs_and_partitionings(docs):
    a, _ = sample_to_budget(docs, 100_000, tau=0.7, seed=42)
    b, _ = sample_to_budget(docs.repartition(13), 100_000, tau=0.7, seed=42)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b


def test_sample_filter_adds_no_shuffle(docs):
    sampled, _ = sample_to_budget(docs, 100_000, tau=1.0)
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------
# assign_split: deterministic train/val/test routing
# ---------------------------------------------------------------------

def _mirror_split(doc_id: str, splits: dict[str, float], seed: int) -> str:
    u = _u(doc_id, seed)
    hi = 0.0
    names = list(splits)
    for name in names[:-1]:
        hi += splits[name]
        if u < hi:
            return name
    return names[-1]


def test_assign_split_matches_hashlib_mirror(spark):
    from dataval_spark.operators.mixing import assign_split

    splits = {"train": 0.8, "val": 0.15, "test": 0.05}
    df = spark.createDataFrame(
        [(f"doc-{i:05d}",) for i in range(3000)], "doc_id string"
    )
    got = {
        r["doc_id"]: r["split"]
        for r in df.select(
            "doc_id", assign_split(F.col("doc_id"), splits, seed=7).alias("split")
        ).collect()
    }
    for doc_id, split in got.items():
        assert split == _mirror_split(doc_id, splits, 7), doc_id
    # every bucket is populated at roughly its fraction (3000 draws)
    from collections import Counter

    c = Counter(got.values())
    assert abs(c["train"] / 3000 - 0.8) < 0.03
    assert abs(c["val"] / 3000 - 0.15) < 0.03
    assert abs(c["test"] / 3000 - 0.05) < 0.02


def test_assign_split_stable_under_repartition_and_zero_shuffle(spark):
    from dataval_spark.operators.mixing import assign_split

    df = spark.createDataFrame(
        [(f"doc-{i:04d}",) for i in range(500)], "doc_id string"
    )
    sel = lambda d: {  # noqa: E731
        r["doc_id"]: r["split"]
        for r in d.select(
            "doc_id", assign_split(F.col("doc_id")).alias("split")
        ).collect()
    }
    assert sel(df) == sel(df.repartition(17))
    plan = (
        df.select("doc_id", assign_split(F.col("doc_id")).alias("split"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_assign_split_validates_fractions():
    from dataval_spark.operators.mixing import assign_split

    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(F.col("x"), {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match=">= 0"):
        assign_split(F.col("x"), {"a": 1.5, "b": -0.5})
