"""Cross-document boilerplate removal (C4 / RefinedWeb line dedup).

C4 discards any three-sentence-plus line that occurs more than once in
the corpus; RefinedWeb and Dolma drop lines/paragraphs that repeat
across many documents (navigation, cookie banners, footers). This is a
*corpus-global* filter — unlike `quality_filters` (within-document) it
needs to see every document — implemented as:

  1. posexplode the document into trimmed lines (order index kept);
  2. fingerprint each line (md5 of the normalized form);
  3. ONE groupBy(fingerprint) count — map-side combined, the only
     corpus-wide shuffle; lines shorter than ``min_chars`` are exempt
     (never counted, never dropped: "yes", "2021", list bullets repeat
     legitimately);
  4. anti-join lines whose fingerprint count > ``max_occurrences``
     (the frequent-fingerprint side is tiny by construction — it is the
     set of *boilerplate* lines — so it broadcasts);
  5. reassemble each document with one groupBy(doc): sort the surviving
     (pos, line) structs, concat back with newlines.

Cost at scale: two shuffles (the global count and the reassembly), both
keyed well (fingerprints are uniform; docs are the natural output key).
The frequent set is O(boilerplate vocabulary), not O(corpus) — if an
adversarial corpus makes it large, raise ``min_chars`` or
``max_occurrences`` rather than letting the broadcast grow unbounded.

Documents whose every line is boilerplate come back as empty text (and
are then removed by any min-length quality gate downstream); documents
with NULL text are preserved as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataval_spark.operators.text import normalize

__all__ = ["boilerplate_lines", "remove_boilerplate_lines"]


def _lines_with_pos(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_pos", "_line"),
    ).withColumn("_fp", F.md5(normalize(F.col("_line"))))


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 2,
    min_chars: int = 10,
) -> DataFrame:
    """(fp, n_docs, example) for every qualifying line occurring in more
    than ``max_occurrences`` documents. Occurrences are counted per
    DOCUMENT (a line repeated inside one page is within-doc repetition,
    `quality_filters`' job, not corpus boilerplate)."""
    lines = _lines_with_pos(df, id_col, text_col).where(
        F.length(F.trim(F.col("_line"))) >= min_chars
    )
    return (
        lines.groupBy("_fp")
        .agg(
            F.count_distinct(F.col("_doc")).alias("n_docs"),
            F.min(F.trim(F.col("_line"))).alias("example"),
        )
        .where(F.col("n_docs") > max_occurrences)
        .select(F.col("_fp").alias("fp"), "n_docs", "example")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 2,
    min_chars: int = 10,
) -> DataFrame:
    """Strip boilerplate lines from every document; all other columns
    pass through. Line order within each document is preserved."""
    from dataval_spark.operators.dedup import _cache_swap, fan_out

    # three passes read this frame (count, keep, final join); a small
    # parquet input arrives as ONE split, serializing every explode+md5
    # pass on a single core — fan_out is a no-op once the scan has >=
    # cluster-parallelism splits
    df = fan_out(df)
    # the frequent-count pass and the keep pass both need the exploded
    # fingerprinted lines; cache them once (same one-live-entry swap as
    # the pair operators) instead of re-running the explode+md5 per pass
    lines = _cache_swap(
        "boilerplate_lines", _lines_with_pos(df, id_col, text_col)
    )
    frequent = (
        lines.where(F.length(F.trim(F.col("_line"))) >= min_chars)
        .groupBy("_fp")
        .agg(F.count_distinct(F.col("_doc")).alias("n_docs"))
        .where(F.col("n_docs") > max_occurrences)
        .select(F.col("_fp").alias("fp"))
    )
    kept = lines.join(
        F.broadcast(frequent.withColumnRenamed("fp", "_fp")), "_fp", "left_anti"
    )
    rebuilt = (
        kept.groupBy("_doc")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), F.col("_line")))
            ).alias("_parts")
        )
        .select(
            F.col("_doc"),
            F.concat_ws(
                "\n", F.transform(F.col("_parts"), lambda s: s["_line"])
            ).alias("_clean"),
        )
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["_doc"], "left").drop("_doc")
    # NULL text explodes to nothing -> no rebuilt row -> keep original NULL
    return out.withColumn(
        text_col,
        F.when(F.col(text_col).isNull(), F.col(text_col)).otherwise(
            F.coalesce(F.col("_clean"), F.lit(""))
        ),
    ).drop("_clean")
