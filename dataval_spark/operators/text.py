"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (no Python UDFs): tokenization, token
counting, quality scoring, n-gram language-ID heuristic, document
fingerprinting. Each has an exact ANSI-SQL twin in queries.py so DuckDB
can oracle-check it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic language marker sets for the heuristic language-ID
# (n-gram/stopword scoring). Real pipelines would use fastText etc.; the
# engine-side contract is the scoring plan, not the model.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "die", "nicht", "das"],
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "y", "de", "la", "que"],
    "fr": ["le", "et", "la", "les", "des"],
    "zh": ["de0", "shi4", "le0", "zai4", "he2"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def char_len(col: Column) -> Column:
    return F.length(col)


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-style pre-tokenization: letter runs, digit runs, and single
    punctuation marks (the regex split every BPE implementation applies
    before merges). JVM-side regexp_extract_all — no UDF."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*sw)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column) -> Column:
    """Share of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: long enough, low punctuation.
    Mirrors the reference's pattern of many per-row predicates folded into
    one score/flag projection."""
    n = token_count(col)
    len_ok = F.least(n / F.lit(50.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return F.round(len_ok * 0.6 + punct_pen * 0.4, 6)


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-hit count per language over the distinct token set."""
    toks = F.array_distinct(tokens(col))

    def _counter(markers):
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    return {lang: _counter(mk) for lang, mk in sorted(LANG_MARKERS.items())}


def lang_id(col: Column) -> Column:
    """Argmax language with deterministic tie-break (first in sorted lang
    order wins on strict >; 'und' when all scores are 0)."""
    scores = lang_scores(col)
    expr = F.lit("und")
    best = F.lit(0)
    # when-chain in sorted lang order; strict > means the first language
    # reaching the max score wins ties — same CASE chain as the oracle SQL
    for lang in sorted(scores):
        s = scores[lang]
        new_expr = F.when(s > best, F.lit(lang)).otherwise(expr)
        best = F.when(s > best, s).otherwise(best)
        expr = new_expr
    return expr


# PII surface patterns (RE2-compatible so the DuckDB oracle matches the
# JVM regex engine bit-for-bit): the redaction pre-pass every
# training-data pipeline runs before release.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9() -]{7,}[0-9]",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Match count per PII class — JVM-side regexp_extract_all."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat in PII_PATTERNS.items()
    }


def pii_flag(col: Column) -> Column:
    """True when the text contains ANY PII-class match."""
    counts = list(pii_counts(col).values())
    out = F.lit(False)
    for c in counts:
        out = out | (c > 0)
    return out


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a class tag — the mutation-free
    redaction transform (pairs with Suite.clean for release prep)."""
    out = col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name}>")
    return out


def normalize(col: Column) -> Column:
    """Canonical text form for fingerprinting: lower, trim, collapse ws."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: Column, length: int = 16) -> Column:
    """Deterministic document fingerprint — md5 prefix of the normalized
    text (analog of the reference's sha1 file hashing,
    /root/reference/dataval/utilities.py:258-272)."""
    return F.substring(F.md5(normalize(col)), 1, length)
