"""Conversation-level duplicate detection — the reference's
duplicate-target check (/root/reference/dataval/dataval.py:568-585:
same target appearing under multiple entries, resolved to one canonical)
lifted to the transcript grain: two conv_ids carrying the SAME ordered
turn contents are duplicates of each other, whatever their ids say.

Shape: one groupBy(conv_id) building an order-insensitive-to-ingestion,
order-SENSITIVE-to-dialogue fingerprint (per-turn content hashes,
sorted by (turn_idx, hash), concatenated, hashed), then a tiny
aggregation over fingerprints. The first shuffle is keyed on the same
conversation id the validation suite's window uses — co-partitioned in
a pipeline that does both. The fingerprint is 32 bytes/conversation, so
the duplicate-group pass at 10^12 turns aggregates ~10^9-10^10 narrow
rows, not the turn table.

Contract:
* rows with a NULL ``order_col`` are excluded from the fingerprint
  (their position is undefined; NULL order keys are SequenceIntegrity's
  violation to flag) — both engines agree instead of inheriting
  opposite NULL-sort defaults.
* NULL text hashes to a sentinel distinct from the empty string, so
  (NULL) and ('') conversations do not collide.
* ties on duplicate ``turn_idx`` break by content hash — deterministic
  even on data that Unique would flag.
* identity is the CONTENT SEQUENCE, not the index values: ``turn_idx``
  defines the order of the turns and then drops out, so a re-ingested
  copy with offset or gapped numbering ([(0,x),(5,y)]) collapses with
  the original ([(0,x),(1,y)]). Deliberate: index structure is the
  sequence suite's dimension (SequenceIntegrity flags the gaps), and a
  duplicate-target check that a renumbering defeats is not a duplicate
  check. Callers who want index-structural identity can fingerprint
  ``concat(turn_idx, ':', text)`` as the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["turn_hash", "conversation_fingerprints", "duplicate_conversations"]

_NULL_SENTINEL = "\x00null"


def turn_hash(text: Column) -> Column:
    """Per-turn content hash; NULL-safe (sentinel, not empty string)."""
    return F.md5(F.coalesce(text.cast("string"), F.lit(_NULL_SENTINEL)))


def conversation_fingerprints(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    chunk_turns: int | None = None,
) -> DataFrame:
    """(conv, conv_fp, n_turns) — one groupBy(conv).

    Default path: one aggregation buffer per conversation holding every
    (idx, hash) struct. Bounded and fast at normal conversation sizes,
    but a pathological 10^7-turn conversation concentrates its whole
    struct array in a single task with no spill-friendly path.

    ``chunk_turns``: mega-conversation-safe path. Turns are ranked
    within the conversation by the same (order, hash) order (row_number
    over a sort-based window — external sort, spillable; never an
    in-memory array of the conversation), fingerprinted per fixed-size
    rank block, then the conversation fingerprint is the hash of its
    ordered block fingerprints. Peak per-group state drops from
    O(n_turns) to O(chunk_turns) + O(n_turns / chunk_turns). Rank
    blocks (not raw-index blocks) keep the content-sequence identity
    contract: a renumbered duplicate ranks — and therefore chunks —
    identically, so duplicate GROUPS are identical to the default
    path's. Fingerprint VALUES differ between the two paths (a chunked
    fp hashes block fps, not turn hashes); pick one path per corpus.
    All three stages hash-cluster on ``conv`` (the window's shuffle is
    reused by both groupBys — one Exchange total).
    """
    if chunk_turns is None:
        entry = F.struct(
            F.col(order_col).alias("i"), turn_hash(F.col(text_col)).alias("h")
        )
        return (
            df.where(F.col(order_col).isNotNull())
            .groupBy(F.col(conv_col).alias("conv"))
            .agg(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.array_sort(F.collect_list(entry)), lambda x: x["h"]
                        ),
                    )
                ).alias("conv_fp"),
                F.count(F.lit(1)).alias("n_turns"),
            )
        )
    if chunk_turns < 1:
        raise ValueError(f"chunk_turns must be >= 1, got {chunk_turns}")
    base = df.where(F.col(order_col).isNotNull()).select(
        F.col(conv_col).alias("conv"),
        F.col(order_col).alias("i"),
        turn_hash(F.col(text_col)).alias("h"),
    )
    pos = F.row_number().over(Window.partitionBy("conv").orderBy("i", "h")) - 1
    chunk_fps = (
        base.withColumn("pos", pos)
        .withColumn("chunk", (F.col("pos") / chunk_turns).cast("long"))
        .groupBy("conv", "chunk")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "h"))
                        ),
                        lambda x: x["h"],
                    ),
                )
            ).alias("chunk_fp"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return chunk_fps.groupBy("conv").agg(
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk", "chunk_fp"))),
                    lambda x: x["chunk_fp"],
                ),
            )
        ).alias("conv_fp"),
        F.sum("n").alias("n_turns"),
    )


def duplicate_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    chunk_turns: int | None = None,
) -> DataFrame:
    """(conv, conv_fp, group_size, canonical) for every member of a
    duplicate group — keep ``conv == canonical`` (min id, the engine's
    standard keep-first survivor rule) to dedup, or anti-join the rest
    away. ``chunk_turns``: see conversation_fingerprints."""
    fps = conversation_fingerprints(df, conv_col, order_col, text_col, chunk_turns)
    groups = (
        fps.groupBy("conv_fp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("conv").alias("canonical"),
        )
        .where(F.col("group_size") > 1)
    )
    return fps.join(groups, "conv_fp").select(
        "conv", "conv_fp", "group_size", "canonical"
    )
