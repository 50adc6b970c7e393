"""Cross-document boilerplate line removal vs a Counter-based mirror."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from dataval_spark.operators.boilerplate import (
    boilerplate_lines,
    remove_boilerplate_lines,
)

COOKIE = "This website uses cookies to improve your experience."
FOOTER = "Copyright 2021 Example Corp. All rights reserved."

DOCS = [
    ("d1", f"{COOKIE}\nunique first article body\n{FOOTER}"),
    ("d2", f"{COOKIE}\nsecond article completely different\n{FOOTER}"),
    ("d3", f"{COOKIE}\nthird article text goes here\n{FOOTER}"),
    ("d4", "a document with no boilerplate at all\njust original prose"),
    # short repeated lines are exempt (min_chars)
    ("d5", "yes\nfourth article body text\nyes"),
    ("d6", "yes\nfifth article body text here\nok"),
    # all-boilerplate doc -> empty text after cleaning
    ("d7", f"{COOKIE}\n{FOOTER}"),
    ("d8", None),
    # same line twice INSIDE one doc only: within-doc repetition is not
    # corpus boilerplate (counted per document)
    ("d9", "sixth article unique sentence\nsixth article unique sentence"),
]

MAX_OCC = 2
MIN_CHARS = 10


def _norm(line: str) -> str:
    return re.sub(r"\s+", " ", line.strip().lower())


def mirror_frequent() -> set[str]:
    per_doc = Counter()
    for _, text in DOCS:
        if text is None:
            continue
        seen = {
            _norm(l)
            for l in text.split("\n")
            if len(l.strip()) >= MIN_CHARS
        }
        per_doc.update(seen)
    return {l for l, c in per_doc.items() if c > MAX_OCC}


def mirror_clean(text: str | None, frequent: set[str]) -> str | None:
    if text is None:
        return None
    return "\n".join(l for l in text.split("\n") if _norm(l) not in frequent)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string").repartition(4)


def test_frequent_set_matches_mirror(docs_df):
    got = {
        r["example"]
        for r in boilerplate_lines(
            docs_df, max_occurrences=MAX_OCC, min_chars=MIN_CHARS
        ).collect()
    }
    want_norm = mirror_frequent()
    assert {_norm(g) for g in got} == want_norm
    assert _norm(COOKIE) in want_norm and _norm(FOOTER) in want_norm


def test_cleaned_docs_match_mirror(docs_df):
    frequent = mirror_frequent()
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            docs_df, max_occurrences=MAX_OCC, min_chars=MIN_CHARS
        ).collect()
    }
    assert len(got) == len(DOCS)
    for doc_id, text in DOCS:
        assert got[doc_id] == mirror_clean(text, frequent), doc_id


def test_within_doc_repeats_and_short_lines_survive(docs_df):
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            docs_df, max_occurrences=MAX_OCC, min_chars=MIN_CHARS
        ).collect()
    }
    assert got["d9"].count("sixth article unique sentence") == 2
    assert got["d5"].count("yes") == 2
    assert got["d7"] == ""  # all-boilerplate doc -> empty, not dropped
    assert got["d8"] is None  # NULL preserved
