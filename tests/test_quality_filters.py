"""Gopher repetition filters vs an independent Python mirror.

The mirror recomputes every metric with collections.Counter over the
same normalization — no Spark expressions shared — so agreement checks
the HOF sort+fold counting trick, not the implementation against itself.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from dataval_spark.operators.quality_filters import (
    GOPHER_THRESHOLDS,
    gopher_repetition_ok,
    repetition_metrics,
)

DOCS = [
    ("d01", "the cat sat on the mat\nthe dog ran\nthe cat sat on the mat"),
    ("d02", "one line only"),
    ("d03", ""),
    ("d04", None),
    ("d05", "a a a a a a a a a a"),
    ("d06", "buy now click here\nbuy now click here\n\nbuy now click here"),
    # all-distinct prose long enough that the single occurrence of the
    # longest 2-gram stays under the 20% top-gram ceiling (the paper's
    # metric counts the top gram's chars even at count==1, which is why
    # Gopher pairs these filters with a minimum document length)
    (
        "d07",
        "unique alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
        "omega first second third fourth fifth sixth seventh eighth",
    ),
    ("d08", "x y x y x y x y z"),
    ("d09", "para one text\n\npara one text\n\npara two text"),
    ("d10", "  spaced   out\ttokens \n  spaced   out\ttokens  "),
    ("d11", "word " * 30),
    ("d12", "Mixed CASE Mixed case MIXED case"),
    ("d13", "a b c d e a b c d e a b c d e f g h"),
    ("d14", "\n\n\n"),
    ("d15", "tail gram tail gram tail gram tail"),
]


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def _parts(text: str, sep: str) -> list[str]:
    return [p.strip() for p in re.split(sep, text) if p.strip()]


def _dup_frac(parts: list[str]) -> float:
    if not parts:
        return 0.0
    return round((len(parts) - len(set(parts))) / len(parts), 6)


def _dup_char_frac(parts: list[str]) -> float:
    total = sum(len(p) for p in parts)
    if total == 0:
        return 0.0
    counts = Counter(parts)
    dup = sum(len(p) * c for p, c in counts.items() if c > 1)
    return round(dup / total, 6)


def _ngrams(text: str, n: int) -> list[str]:
    toks = [t for t in _norm(text).split(" ") if t]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _top_frac(text: str, n: int) -> float:
    total = len(_norm(text))
    grams = Counter(_ngrams(text, n))
    if total == 0 or not grams:
        return 0.0
    best = max(c * len(g) for g, c in grams.items())
    return round(min(1.0, best / total), 6)


def _dup_gram_frac(text: str, n: int) -> float:
    total = len(_norm(text))
    grams = Counter(_ngrams(text, n))
    if total == 0 or not grams:
        return 0.0
    dup = sum(c * len(g) for g, c in grams.items() if c > 1)
    return round(min(1.0, dup / total), 6)


def mirror(text: str | None) -> dict[str, float]:
    text = text or ""
    out = {
        "dup_line_frac": _dup_frac(_parts(text, r"\n")),
        "dup_line_char_frac": _dup_char_frac(_parts(text, r"\n")),
        "dup_para_frac": _dup_frac(_parts(text, r"\n{2,}")),
        "dup_para_char_frac": _dup_char_frac(_parts(text, r"\n{2,}")),
    }
    for n in (2, 3, 4):
        out[f"top_{n}gram_char_frac"] = _top_frac(text, n)
    for n in (5, 6, 7, 8, 9, 10):
        out[f"dup_{n}gram_char_frac"] = _dup_gram_frac(text, n)
    return out


@pytest.fixture(scope="module")
def metrics_rows(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = repetition_metrics(df, "text").collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_metrics_match_python_mirror(metrics_rows):
    for doc_id, text in DOCS:
        want = mirror(text)
        got = metrics_rows[doc_id]
        for name, exp in want.items():
            assert got[name] == pytest.approx(exp, abs=1e-6), (
                f"{doc_id}.{name}: spark={got[name]} mirror={exp}"
            )


def test_gopher_verdict_matches_thresholds(spark, metrics_rows):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    verdicts = {
        r["doc_id"]: r["repetition_ok"]
        for r in gopher_repetition_ok(df, "text").collect()
    }
    for doc_id, text in DOCS:
        want = all(
            mirror(text)[name] <= ceiling
            for name, ceiling in GOPHER_THRESHOLDS.items()
        )
        assert verdicts[doc_id] == want, doc_id


def test_repetitive_spam_fails_clean_prose_passes(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    verdicts = {
        r["doc_id"]: r["repetition_ok"]
        for r in gopher_repetition_ok(df, "text").collect()
    }
    assert verdicts["d05"] is False  # one token repeated 10x
    assert verdicts["d06"] is False  # same boilerplate line 3x
    assert verdicts["d07"] is True  # all-distinct prose
    assert verdicts["d01"] is False  # duplicate line = 2/3 of lines


def test_no_shuffle_in_plan(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = repetition_metrics(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
