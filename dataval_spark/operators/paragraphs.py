"""Paragraph-level exact dedup across a corpus (Dolma-style).

Dolma and RefinedWeb dedup at paragraph granularity between document
dedup and line-level boilerplate removal: a paragraph that appears
verbatim in many documents (quoted passages, templated sections) is
kept ONCE corpus-wide and stripped everywhere else. This completes the
granularity ladder: document (dedup.py) > paragraph (here) > span
(spans.py) > line (boilerplate.py).

Same relational shape as the span pass: posexplode paragraphs ->
one global fingerprint groupBy (map-side combine; frequent set joined
back by key, never broadcast) -> per-doc removable positions -> index
filter + reassembly. Paragraphs below ``min_chars`` (after trim) are
exempt — blank separators and one-word fragments are structure, not
content. Documents with nothing removed keep their text byte-identical;
affected documents are re-joined with a blank line between surviving
paragraphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataval_spark.operators.dedup import _bind
from dataval_spark.operators.text import normalize

__all__ = ["paragraph_fingerprints", "dedup_paragraphs"]

_SEP = r"\n{2,}"  # blank-line-delimited paragraphs


def paragraph_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
) -> DataFrame:
    """(doc, pos, fp) for every content paragraph: fp = md5 of the
    normalized paragraph; paragraphs shorter than ``min_chars`` after
    trim are skipped (their pos is still their index in the split)."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc"),
            F.posexplode(F.split(F.col(text_col), _SEP)).alias("pos", "_para"),
        )
        .where(F.length(F.trim(F.col("_para"))) >= min_chars)
        .select("doc", "pos", F.md5(normalize(F.col("_para"))).alias("fp"))
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
) -> DataFrame:
    """Keep one copy of every duplicated paragraph corpus-wide (the
    globally first occurrence by (doc, pos)); strip the rest. All other
    columns pass through; untouched docs keep text byte-identical."""
    from dataval_spark.operators.spans import keep_first_removable

    pf = paragraph_fingerprints(df, id_col, text_col, min_chars)
    removable = keep_first_removable(pf, min_occurrences=2)
    starts = (
        removable.groupBy("doc")
        .agg(F.array_sort(F.collect_list("pos")).alias("_rm"))
        .withColumnRenamed("doc", "_para_doc")
    )
    paras = F.split(F.col(text_col), _SEP)
    kept = _bind(
        F.col("_rm"),
        lambda rm: F.filter(paras, lambda p, i: ~F.array_contains(rm, i)),
    )
    rebuilt = F.when(F.col("_rm").isNull(), F.col(text_col)).otherwise(
        F.concat_ws("\n\n", kept)
    )
    return (
        df.join(starts, F.col(id_col) == F.col("_para_doc"), "left")
        .withColumn(text_col, rebuilt)
        .drop("_para_doc", "_rm")
    )
