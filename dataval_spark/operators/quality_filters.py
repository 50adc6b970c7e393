"""Gopher-style repetition quality filters — pure column expressions.

The repetition family from Rae et al. 2021 ("Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", arXiv:2112.11446,
Table A1): duplicate line/paragraph fractions, duplicate line/paragraph
*character* fractions, top-n-gram character fractions (n=2..4) and
duplicate-n-gram character fractions (n=5..10). These are the standard
pre-training quality gates that `operators.text.quality_score` (length/
punct/stopword heuristics) does not cover: they catch boilerplate,
scraped navigation, and degenerate repetition.

Scale design: every metric is a JVM-side higher-order-function fold over
a per-document array — ZERO shuffle, zero Python, embarrassingly
parallel over input splits. The only data-dependent cost is the
array_sort of a doc's n-gram array (O(t log t) per doc in tokens t), so
the operator's cost is linear in corpus size and independent of
partitioning. At 100 TB this runs as a mapper fused into whatever scan
feeds it.

The counting trick shared by all char-weighted metrics: sort the array,
then a single aggregate() fold over the sorted elements tracks
(previous element, current run length, duplicated-char sum, best
count*length product). Sorting makes equal elements adjacent, so
per-element counting needs no map state — HOFs have no dict type.

Definitions (documented where they differ from the paper's prose):
- duplicate_*_fraction: fraction of lines/paragraphs that are repeats of
  an earlier one (1 - distinct/total), the paper's definition.
- duplicate_*_char_fraction: characters inside ALL occurrences of any
  duplicated line/paragraph, over total line/paragraph characters.
- top_ngram_char_fraction: max over grams of count(g) * chars(g), over
  total normalized-text characters — the paper's "fraction of characters
  contained in the most frequently-occurring n-gram" with the standard
  count*len numerator used by the public reimplementations (NeMo
  Curator, Dolma); overlapping occurrences are not de-overlapped.
- duplicate_ngram_char_fraction: sum over duplicated grams of
  count(g) * chars(g), capped at 1.0 after normalization — same
  approximation (exact span-union de-overlap needs per-doc interval
  merging, which buys nothing at filter thresholds of 0.10-0.15).

Reference parity note: the reference engine has no text-quality layer
(astronomy payloads); this module is part of the LLM-pipeline surface
the engine adds on top of the reference's §2 inventory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataval_spark.operators.dedup import _bind
from dataval_spark.operators.text import normalize, tokens

__all__ = [
    "GOPHER_THRESHOLDS",
    "doc_lines",
    "doc_paragraphs",
    "duplicate_fraction",
    "duplicate_char_fraction",
    "word_ngrams",
    "top_ngram_char_fraction",
    "duplicate_ngram_char_fraction",
    "repetition_metrics",
    "gopher_repetition_ok",
]


def doc_lines(text: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )


def doc_paragraphs(text: Column) -> Column:
    """Non-empty trimmed paragraphs (blank-line separated)."""
    return F.filter(
        F.transform(F.split(text, r"\n{2,}"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )


def _run_stats(sorted_arr: Column) -> Column:
    """One fold over a SORTED string array -> struct(dup long, best long).

    dup  = sum of length(x) over every occurrence of any element that
           appears more than once (when a run reaches 2, the first
           occurrence is counted retroactively: +2*len at run==2, +len
           after).
    best = max over distinct elements of count * length — the
           char-weight of the most frequent element.

    The initial ``prev`` is NULL (never equal to a real element), so the
    first element always opens a run of 1 — an empty-string sentinel
    would miscount documents whose first sorted element is "".
    """
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, g: Column) -> Column:
        newrun = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        glen = F.length(g).cast("long")
        return F.struct(
            g.alias("prev"),
            newrun.alias("run"),
            (
                acc["dup"]
                + F.when(newrun == 2, 2 * glen)
                .when(newrun > 2, glen)
                .otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
            F.greatest(acc["best"], newrun.cast("long") * glen).alias("best"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        merge,
        lambda acc: F.struct(acc["dup"].alias("dup"), acc["best"].alias("best")),
    )


def duplicate_fraction(parts: Column) -> Column:
    """Fraction of array elements that repeat an earlier element.
    0.0 for empty/singleton arrays (nothing can repeat)."""
    n = F.size(parts)
    frac = F.try_divide((n - F.size(F.array_distinct(parts))).cast("double"), n)
    return F.round(F.coalesce(frac, F.lit(0.0)), 6)


def duplicate_char_fraction(parts: Column) -> Column:
    """Characters inside all occurrences of duplicated elements, over
    total element characters. 0.0 when the array is empty."""

    def from_parts(p: Column) -> Column:
        stats = _run_stats(F.array_sort(p))
        total = F.aggregate(
            p, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        return F.round(
            F.coalesce(F.try_divide(stats["dup"].cast("double"), total), F.lit(0.0)),
            6,
        )

    return _bind(parts, from_parts)


def word_ngrams(text: Column, n: int = 2) -> Column:
    """ALL word n-grams of the normalized text (with multiplicity —
    unlike dedup.shingles, which is a distinct set). Short/NULL docs
    yield an empty array; the when-guard keeps the descending
    sequence(1, k<=0) branch unevaluated (dedup.shingles docstring)."""

    def from_toks(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
        return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))

    toks = F.filter(tokens(normalize(text)), lambda x: F.length(x) > 0)
    return _bind(toks, from_toks)


def _gram_stats(text: Column, n: int) -> Column:
    """struct(dup, best) over the doc's n-gram multiset + total chars."""

    def from_grams(grams: Column) -> Column:
        return _run_stats(F.array_sort(grams))

    return _bind(word_ngrams(text, n), from_grams)


def _total_chars(text: Column) -> Column:
    return F.length(normalize(text)).cast("long")


def top_ngram_char_fraction(text: Column, n: int = 2) -> Column:
    """count * chars of the most frequent word n-gram / total chars."""
    frac = F.try_divide(
        _gram_stats(text, n)["best"].cast("double"), _total_chars(text)
    )
    # coalesce BEFORE least: least() skips NULLs, so least(NULL, 1.0)
    # is 1.0 and an empty doc would score as maximally repetitive
    return F.round(F.least(F.coalesce(frac, F.lit(0.0)), F.lit(1.0)), 6)


def duplicate_ngram_char_fraction(text: Column, n: int = 5) -> Column:
    """count * chars summed over duplicated n-grams / total chars,
    capped at 1.0 (overlap approximation — module docstring)."""
    frac = F.try_divide(
        _gram_stats(text, n)["dup"].cast("double"), _total_chars(text)
    )
    return F.round(F.least(F.coalesce(frac, F.lit(0.0)), F.lit(1.0)), 6)


# Gopher Table A1 repetition thresholds: a doc FAILS when a metric
# exceeds its ceiling.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Attach every repetition metric as a column. All metrics evaluate
    in one mapper pass; narrow the gram ranges if plan size matters more
    than full Gopher parity (each n is an independent sort+fold)."""
    text = F.col(text_col)
    out = df
    for parts, stem in ((doc_lines(text), "line"), (doc_paragraphs(text), "para")):
        out = out.withColumn(f"dup_{stem}_frac", duplicate_fraction(parts))
        out = out.withColumn(f"dup_{stem}_char_frac", duplicate_char_fraction(parts))
    for n in top_ns:
        out = out.withColumn(
            f"top_{n}gram_char_frac", top_ngram_char_fraction(text, n)
        )
    for n in dup_ns:
        out = out.withColumn(
            f"dup_{n}gram_char_frac", duplicate_ngram_char_fraction(text, n)
        )
    return out


def gopher_repetition_ok(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    out_col: str = "repetition_ok",
) -> DataFrame:
    """repetition_metrics + a single boolean verdict column: True when
    every metric is at or under its (Gopher-default) ceiling."""
    th = thresholds or GOPHER_THRESHOLDS
    metric_cols = set(th)
    top_ns = tuple(
        sorted(int(c.split("_")[1][:-4]) for c in metric_cols if c.startswith("top_"))
    )
    dup_ns = tuple(
        sorted(
            int(c.split("_")[1][:-4])
            for c in metric_cols
            if c.startswith("dup_") and c.endswith("gram_char_frac")
        )
    )
    out = repetition_metrics(df, text_col, top_ns or (2, 3, 4), dup_ns or (5,))
    ok = F.lit(True)
    for name, ceiling in th.items():
        ok = ok & (F.col(name) <= F.lit(float(ceiling)))
    return out.withColumn(out_col, ok)
