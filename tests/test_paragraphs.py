"""Paragraph-level keep-first dedup vs an independent python mirror."""

import re

from dataval_spark.operators.paragraphs import (
    dedup_paragraphs,
    paragraph_fingerprints,
)


def _py_clean(docs, min_chars=20):
    """Mirror: global keep-first over normalized paragraph text."""
    norm = lambda p: re.sub(r"\s+", " ", p.strip().lower())
    occs = {}
    for doc_id, text in docs:
        if text is None:
            continue
        for pos, para in enumerate(re.split(r"\n{2,}", text)):
            if len(para.strip()) < min_chars:
                continue
            occs.setdefault(norm(para), []).append((doc_id, pos))
    removable = set()
    for _, lst in occs.items():
        if len(lst) >= 2:
            removable.update(sorted(lst)[1:])
    out = {}
    for doc_id, text in docs:
        if text is None:
            out[doc_id] = None
            continue
        paras = re.split(r"\n{2,}", text)
        rm = {p for d, p in removable if d == doc_id}
        out[doc_id] = (
            "\n\n".join(p for i, p in enumerate(paras) if i not in rm)
            if rm
            else text
        )
    return out


QUOTE = "to be or not to be that is the question of the hour"


def _mk(spark, docs):
    return spark.createDataFrame(list(docs), "doc_id long, text string")


def test_duplicated_paragraph_kept_once(spark):
    docs = [
        (1, "first intro paragraph with plenty of words\n\n" + QUOTE),
        (2, QUOTE + "\n\nsecond doc own closing paragraph right here"),
        (3, "third doc is entirely its own content and is unaffected"),
    ]
    out = {r.doc_id: r.text for r in dedup_paragraphs(_mk(spark, docs)).collect()}
    assert out == _py_clean(docs)
    assert QUOTE in out[1]          # globally first (doc 1, pos 1)
    assert QUOTE not in out[2]
    assert out[3] == docs[2][1]     # untouched doc byte-identical


def test_normalized_matching_and_min_chars(spark):
    docs = [
        (1, QUOTE + "\n\nshort"),
        (2, "  " + QUOTE.upper() + "  \n\nshort"),  # same after normalize
    ]
    out = {r.doc_id: r.text for r in dedup_paragraphs(_mk(spark, docs)).collect()}
    assert out == _py_clean(docs)
    # 'short' (< min_chars) is exempt: survives in both docs
    assert out[1].endswith("short") and out[2].endswith("short")
    assert QUOTE.upper() not in out[2]


def test_within_doc_repeat_and_null(spark):
    docs = [
        (1, QUOTE + "\n\nmiddle paragraph of ordinary length here\n\n" + QUOTE),
        (2, None),
    ]
    out = {r.doc_id: r.text for r in dedup_paragraphs(_mk(spark, docs)).collect()}
    assert out == _py_clean(docs)
    assert out[1].count("to be or not") == 1
    assert out[2] is None


def test_fingerprints_skip_short_paragraphs(spark):
    df = _mk(spark, [(1, "tiny\n\n" + QUOTE)])
    rows = paragraph_fingerprints(df).collect()
    assert [(r.doc, r.pos) for r in rows] == [(1, 1)]


def test_randomized_mirror_parity(spark):
    import random

    rng = random.Random(7)
    pool = [
        " ".join(f"para{p}word{w}" for w in range(6)) for p in range(12)
    ]
    docs = [
        (i, "\n\n".join(rng.choice(pool) for _ in range(rng.randint(1, 6))))
        for i in range(30)
    ]
    out = {r.doc_id: r.text for r in dedup_paragraphs(_mk(spark, docs)).collect()}
    assert out == _py_clean(docs)
