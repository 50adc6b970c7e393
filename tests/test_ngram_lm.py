"""N-gram LM perplexity scoring vs an exact python Counter mirror."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataval_spark.operators.ngram_lm import (
    BOS,
    EOS,
    NgramLM,
    score_perplexity,
    train_ngram_lm,
)

REF_ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog"),
    (4, "the cat and the dog sat"),
]

DOC_ROWS = [
    (10, "the cat sat on the mat"),     # in-distribution: low ppl
    (11, "zygote quux flurble grault"),  # all-unseen: high ppl
    (12, "the dog and the cat"),
    (13, ""),                            # empty: NULL ppl
    (14, None),                          # NULL: NULL ppl
    (15, "THE   Cat  SAT"),              # case/ws-normalized like training
]


def _mirror_tokens(text: str) -> list[str]:
    t = " ".join(text.lower().strip().split())
    return t.split(" ") if t else []


def _mirror_train(rows, n: int):
    ngrams: Counter = Counter()
    contexts: Counter = Counter()
    vocab: set[str] = set()
    for _, text in rows:
        toks = _mirror_tokens(text)
        if not toks:
            continue
        padded = [BOS] * (n - 1) + toks + [EOS]
        for i in range(len(padded) - n + 1):
            ctx = " ".join(padded[i : i + n - 1])
            w = padded[i + n - 1]
            ngrams[(ctx, w)] += 1
            contexts[ctx] += 1
            vocab.add(w)
    return ngrams, contexts, len(vocab)


def _mirror_ppl(text, ngrams, contexts, v, n, k, min_count=1):
    if text is None:
        return None
    toks = _mirror_tokens(text)
    if not toks:
        return None
    padded = [BOS] * (n - 1) + toks + [EOS]
    logps = []
    for i in range(len(padded) - n + 1):
        ctx = " ".join(padded[i : i + n - 1])
        w = padded[i + n - 1]
        c = ngrams[(ctx, w)]
        if c < min_count:
            c = 0  # pruned rows are unseen at scoring time
        logps.append(math.log((c + k) / (contexts[ctx] + k * (v + 1))))
    return math.exp(-sum(logps) / len(logps))


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame(REF_ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOC_ROWS, "doc_id long, text string")


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ppl_matches_mirror(spark, ref, docs, n):
    lm = train_ngram_lm(ref, n=n, k=0.1)
    try:
        ngrams, contexts, v = _mirror_train(REF_ROWS, n)
        assert lm.vocab_size == v
        got = {
            r["doc_id"]: (r["ppl"], r["n_scored"])
            for r in score_perplexity(docs, lm).collect()
        }
        for doc_id, text in DOC_ROWS:
            want = _mirror_ppl(text, ngrams, contexts, v, n, 0.1)
            ppl, n_scored = got[doc_id]
            if want is None:
                assert ppl is None and n_scored == 0, doc_id
            else:
                assert ppl == pytest.approx(want, rel=1e-9), doc_id
                assert n_scored == len(_mirror_tokens(text)) + 1
    finally:
        lm.release()


def test_in_distribution_beats_gibberish(spark, ref, docs):
    lm = train_ngram_lm(ref, n=2)
    try:
        got = {r["doc_id"]: r["ppl"] for r in score_perplexity(docs, lm).collect()}
        assert got[10] < got[11]  # training sentence vs unseen words
        assert got[15] == pytest.approx(
            # normalization: "THE   Cat  SAT" scores as "the cat sat"
            {r["doc_id"]: r["ppl"] for r in score_perplexity(
                spark.createDataFrame([(99, "the cat sat")], "doc_id long, text string"),
                lm,
            ).collect()}[99],
            rel=1e-9,
        )
    finally:
        lm.release()


def test_min_count_prunes_but_keeps_denominators(spark, ref, docs):
    """Pruned hapax rows score as unseen, but context totals keep the
    pruned mass — probabilities stay a proper (sub-)distribution."""
    lm = train_ngram_lm(ref, n=2, k=0.5, min_count=2)
    try:
        ngrams, contexts, v = _mirror_train(REF_ROWS, 2)
        got = {r["doc_id"]: r["ppl"] for r in score_perplexity(docs, lm).collect()}
        for doc_id, text in DOC_ROWS:
            want = _mirror_ppl(text, ngrams, contexts, v, 2, 0.5, min_count=2)
            if want is not None:
                assert got[doc_id] == pytest.approx(want, rel=1e-9), doc_id
        # pruning really dropped rows
        assert lm.ngrams.count() < len(ngrams)
    finally:
        lm.release()


def test_broadcast_hint_identical_and_shuffle_free_probe(spark, ref, docs):
    lm = train_ngram_lm(ref, n=2)
    try:
        plain = {r["doc_id"]: r["ppl"] for r in score_perplexity(docs, lm).collect()}
        bcast_df = score_perplexity(docs, lm, broadcast_lm=True)
        bcast = {r["doc_id"]: r["ppl"] for r in bcast_df.collect()}
        assert bcast == pytest.approx(plain)
        # both joins broadcast: the only corpus-side exchange left is the
        # per-doc agg. The full plan string re-renders the cached LM
        # TRAINING plan under every InMemoryTableScan (its own groupBy
        # exchanges, small side) — scope the count to the scoring spine
        # above the first cache subtree, which holds both probe-side
        # BroadcastHashJoins and the doc_id aggregation.
        plan = bcast_df._jdf.queryExecution().executedPlan().toString()
        spine = plan.split("InMemoryRelation", 1)[0]
        assert spine.count("BroadcastHashJoin") == 2
        assert spine.count("Exchange hashpartitioning") == 1  # doc_id agg
        assert "SortMergeJoin" not in plan
    finally:
        lm.release()


def test_train_rejects_bad_n():
    with pytest.raises(ValueError, match="n must be"):
        train_ngram_lm(None, n=0)
