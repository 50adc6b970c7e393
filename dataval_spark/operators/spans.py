"""Repeated-span (substring-level) dedup across a corpus.

The published result this re-expresses: removing long substrings that
occur more than once ANYWHERE in the training corpus ("ExactSubstr",
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") measurably improves LM quality over document-level dedup
alone — near-dup docs share spans without being near-dups themselves
(licenses, templates, quoted passages).

Lee et al. build one suffix array over the concatenated corpus — a
single-machine design. The Spark-first shape is shingle-fingerprint
based and purely relational:

  1. every ``span_tokens``-token shingle of every doc becomes a row
     (doc, pos, fp) — fp an xxhash64 of the token window;
  2. one groupBy(fp) finds fingerprints occurring >= min_occurrences
     times corpus-wide (map-side combine; no broadcast of the frequent
     set — it is joined back by key, so it may be arbitrarily large);
  3. per doc, the matched positions merge into covered token ranges,
     and the text is rebuilt without the covered tokens.

Approximation contract vs the suffix-array original:
  * duplicated substrings SHORTER than ``span_tokens`` are invisible
    (Lee et al. use a 50-token threshold for the same reason);
  * a duplicated region of L >= span_tokens tokens is covered exactly:
    all L - span_tokens + 1 of its shingles are frequent, so the merged
    cover is the full region;
  * matching is on whitespace tokens; a doc that had spans removed is
    re-joined with single spaces (token-level rebuild).

``spare_first=True`` keeps the globally first occurrence (min
(doc, pos) per fingerprint) — Lee et al.'s remove-all-but-one. Every
shingle of a span duplicated verbatim has its first occurrence in the
same (first) document, so that document survives intact and later
copies lose the span. ``spare_first=False`` removes every occurrence
(the C4/Dolma paragraph-dedup stance).

Scale: shingle volume is O(total corpus tokens) rows of 3 longs — the
same order as the MinHash/SimHash explode stages. The only shuffles are
the fp groupBy, the fp equi-join back, and the per-doc position
collect. Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataval_spark.operators.dedup import _bind

__all__ = [
    "span_fingerprints",
    "keep_first_removable",
    "repeated_span_positions",
    "remove_repeated_spans",
]


def keep_first_removable(
    fp_rows: DataFrame,
    min_occurrences: int = 2,
    spare_first: bool = True,
) -> DataFrame:
    """(doc, pos) occurrences slated for removal from a (doc, pos, fp)
    occurrence frame: fingerprints occurring >= min_occurrences times
    corpus-wide, minus — when ``spare_first`` — the globally first
    (doc, pos) occurrence of each. Shared by the span and paragraph
    layers (one definition of the keep-first contract)."""
    agg = [F.count(F.lit(1)).alias("n_occ")]
    if spare_first:
        agg.append(F.min(F.struct("doc", "pos")).alias("first_occ"))
    freq = (
        fp_rows.groupBy("fp").agg(*agg).where(F.col("n_occ") >= min_occurrences)
    )
    hits = fp_rows.join(freq, "fp")
    if spare_first:
        hits = hits.where(
            (F.col("doc") != F.col("first_occ.doc"))
            | (F.col("pos") != F.col("first_occ.pos"))
        )
    return hits.select("doc", "pos")


def _span_fps(toks: Column, span_tokens: int) -> Column:
    """Array of xxhash64 fingerprints of every span_tokens-token window;
    empty for docs shorter than the window. Same guarded-sequence +
    once-bound-token-array shape as dedup.shingles (see its docstring
    for the HOF common-subexpression pitfall)."""

    def from_toks(t: Column) -> Column:
        k = F.size(t) - (span_tokens - 1)
        grams = F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(span_tokens)]
                )
            ),
        )
        return F.when(k >= 1, grams).otherwise(F.array().cast("array<long>"))

    return _bind(toks, from_toks)


def span_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
) -> DataFrame:
    """(doc, pos, fp) for every span_tokens-token shingle. pos is the
    0-based token offset of the span start."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc"),
            F.posexplode(_span_fps(toks, span_tokens)).alias("pos", "fp"),
        )
    )


def repeated_span_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_occurrences: int = 2,
    spare_first: bool = True,
) -> DataFrame:
    """(doc, pos) of every span occurrence slated for removal: its
    fingerprint occurs >= min_occurrences times corpus-wide (within-doc
    repeats count), minus — when ``spare_first`` — the globally first
    occurrence of each fingerprint."""
    sf = span_fingerprints(df, id_col, text_col, span_tokens)
    return keep_first_removable(sf, min_occurrences, spare_first)


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_occurrences: int = 2,
    spare_first: bool = True,
) -> DataFrame:
    """Strip corpus-duplicated spans from every document; all other
    columns pass through. Docs with nothing to remove keep their text
    byte-identical; affected docs are rebuilt from their surviving
    tokens with single spaces."""
    removable = repeated_span_positions(
        df, id_col, text_col, span_tokens, min_occurrences, spare_first
    )
    starts = removable.groupBy("doc").agg(
        F.array_sort(F.collect_list("pos")).alias("_starts")
    ).withColumnRenamed("doc", "_span_doc")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # covered token indices = union of [s, s + span_tokens) — per-doc
    # array work, no shuffle. flatten+distinct is O(covered) per doc.
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("_starts"),
                lambda s: F.sequence(s, s + F.lit(span_tokens - 1)),
            )
        )
    )
    # Rebuild LINEARLY: surviving indices = array_except(0..n-1, covered)
    # (hash-set membership, order-preserving on the first array), then a
    # gather. The earlier per-token array_contains(covered, i) filter was
    # a linear scan of `covered` PER TOKEN — O(tokens * covered) in one
    # task, ~10^11 comparisons for a heavily-templated 1M-token doc.
    kept = _bind(
        covered,
        lambda cov: _bind(
            toks,
            lambda t: F.transform(
                F.array_except(F.sequence(F.lit(0), F.size(t) - F.lit(1)), cov),
                lambda i: F.element_at(t, i + F.lit(1)),
            ),
        ),
    )
    rebuilt = F.when(
        F.col("_starts").isNull(), F.col(text_col)
    ).otherwise(F.concat_ws(" ", kept))
    return (
        df.join(starts, F.col(id_col) == F.col("_span_doc"), "left")
        .withColumn(text_col, rebuilt)
        .drop("_span_doc", "_starts")
    )
