"""N-gram language-model perplexity scoring for corpus quality
filtering — the CCNet recipe (Wenzek et al. 2020, public): score every
document's perplexity under a language model trained on a trusted
reference corpus (e.g. Wikipedia) and keep the low-perplexity head /
middle. The reference pipeline's quality gates are length/ratio
heuristics (see operators/quality_filters.py for the Gopher family);
this operator adds the model-based tier on top, with add-k-smoothed
n-gram counts standing in for KenLM (no external LM runtime exists in
this sandbox, and the Spark-side shape — train counts once, join docs
against them — is identical for any count-based LM).

Scale design (100 TB corpus, ~1 TB trusted reference):
* TRAIN is one explode + groupBy over the reference's token stream —
  shuffle O(reference tokens), the same order as MinHash shingling.
  Context totals and vocabulary size are derived from the (much
  smaller) distinct-ngram frame, not from a second pass over tokens.
  ``min_count`` prunes the long tail of hapax n-grams BEFORE the model
  ships to scoring (prune after context totals, so probabilities stay
  consistent: pruned mass falls into the unseen-ngram smoothing floor).
* SCORE is explode + two left equi-joins on ngram keys + one per-doc
  aggregation. The LM side has exactly one row per key; the corpus side
  is frequency-skewed on common contexts ("the", "of the"), which AQE's
  skew-join handles because the hot keys are PROBE-side only. A pruned
  reference LM (min_count>=2 on 1 TB of text) is tens of millions of
  rows — small enough that ``broadcast_lm=True`` removes both shuffles
  entirely; the default leaves the choice to AQE.
* Everything is JVM-side: slice/transform/element_at HOFs build the
  n-gram pairs inside the scan projection; no Python touches a row.

No counterpart in the astronomy reference — the closest analog is its
noise-model-based outlier gate (magnitude vs expected noise,
/root/reference/dataval/dataval.py:488-528): score each row under a
fitted model, flag the tail. Same verdict shape here: (doc, ppl) with
the gate left to the caller.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["NgramLM", "train_ngram_lm", "score_perplexity"]

# sentinel tokens: whitespace tokenization can never emit these
# (control chars never survive F.split on \s+ as standalone words in
# normal text; collisions would only soften probabilities, not crash)
BOS = "\x02"
EOS = "\x03"


@dataclass
class NgramLM:
    """A trained add-k n-gram model: distinct-ngram counts, per-context
    totals, and the closed vocabulary size the smoothing denominator
    uses. ``ngrams`` is persisted by train_ngram_lm (it is consumed by
    contexts, the vocab count, and every scoring pass); call
    ``release()`` when done."""

    ngrams: DataFrame  # (ctx string, w string, c long)
    contexts: DataFrame  # (ctx string, c_ctx long)
    vocab_size: int
    n: int
    k: float

    def release(self) -> None:
        try:
            self.ngrams.unpersist()
        except Exception:
            pass  # session already stopped


def _ngram_pairs(col: Column, n: int) -> Column:
    """array<struct<ctx,w>> of the document's n-gram (context, word)
    pairs over lowercase whitespace tokens, padded with n-1 BOS and one
    EOS — so a d-token doc yields exactly d+1 pairs and the probability
    chain is properly terminated. Empty/NULL text yields an empty array
    (EOS-only chains would make blank docs look fluent)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    toks = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    padded = F.concat(
        F.array_repeat(F.lit(BOS), n - 1), toks, F.array(F.lit(EOS))
    )

    # padded is BOUND once per row (dedup._bind's 1-element-array trick):
    # interpreted HOFs re-evaluate non-lambda subtrees per element, so
    # referencing `padded` directly inside the position lambda re-ran
    # the whole pad-concat for BOTH the slice and the element_at of
    # every position — O(len²) array builds per document (measured:
    # 130 s to explode 2.8M bigram pairs at sf1.0; ~1 s bound).
    def from_padded(p: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.size(p) - n),
            lambda i: F.struct(
                # slice() is 1-based: positions i+1 .. i+n-1 = the
                # n-1 context tokens; for n=1 the slice is empty and
                # every pair shares the "" context (pure unigram model)
                F.array_join(F.slice(p, i + 1, n - 1), " ").alias("ctx"),
                F.element_at(p, i + n).alias("w"),
            ),
        )

    return F.when(F.size(toks) == 0, F.array().cast(
        "array<struct<ctx:string,w:string>>"
    )).otherwise(
        F.element_at(F.transform(F.array(padded), from_padded), 1)
    )


def train_ngram_lm(
    ref: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: float = 0.1,
    min_count: int = 1,
) -> NgramLM:
    """Count (context, word) n-grams over the reference corpus. One
    shuffle over the token stream; context totals and |V| derive from
    the distinct-ngram frame. Runs two driver actions (materialize the
    persisted counts + the vocab-size count) — training is a prepare
    step, not a per-query cost."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from dataval_spark.operators.dedup import fan_out

    # a small reference corpus arrives as one parquet split; the n-gram
    # explode would then run on a single core (guide §2: scan
    # parallelism). No-op when the scan already has enough splits.
    pairs = fan_out(ref).select(
        F.explode(_ngram_pairs(F.col(text_col), n)).alias("_p")
    ).select("_p.ctx", "_p.w")
    from pyspark.storagelevel import StorageLevel

    full = (
        pairs.groupBy("ctx", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # context totals BEFORE pruning: pruned-tail mass must stay in the
    # denominator or rare contexts would get inflated probabilities
    contexts = full.groupBy("ctx").agg(F.sum("c").alias("c_ctx"))
    # EOS is emitted for every doc so it is always in-vocab; BOS only
    # ever appears in contexts, never as a predicted word
    vocab_size = int(full.select("w").distinct().count())
    ngrams = full
    if min_count > 1:
        ngrams = full.where(F.col("c") >= min_count)
    return NgramLM(
        ngrams=ngrams, contexts=contexts, vocab_size=vocab_size, n=n, k=k
    )


def score_perplexity(
    docs: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """(id, n_scored, avg_logp, ppl) per document under ``lm``.

    ppl = exp(-mean log p(w|ctx)) over the doc's d+1 padded n-grams,
    p(w|ctx) = (c(ctx,w) + k) / (c(ctx) + k*(|V|+1)) — add-k with one
    extra vocabulary slot standing for ALL unseen words, so unseen
    events get the floor k/(c(ctx)+k*(|V|+1)) instead of probability
    mass the seen rows already own. Empty/NULL docs score NULL (no
    evidence — the same contract as the dedup family's NULL vectors).

    ``broadcast_lm=True`` hints both LM frames broadcast-side, turning
    scoring into a shuffle-free scan -> map-join -> per-doc agg."""
    from dataval_spark.operators.dedup import fan_out

    ng, ctx = lm.ngrams, lm.contexts
    if broadcast_lm:
        ng, ctx = F.broadcast(ng), F.broadcast(ctx)
    docs = fan_out(docs)
    pairs = docs.select(
        F.col(id_col),
        F.explode_outer(_ngram_pairs(F.col(text_col), lm.n)).alias("_p"),
    ).select(id_col, "_p.ctx", "_p.w")
    v1 = float(lm.vocab_size + 1)
    scored = (
        pairs.join(ng, ["ctx", "w"], "left")
        .join(ctx, ["ctx"], "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("ctx").isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + lm.k)
                    / (F.coalesce(F.col("c_ctx"), F.lit(0)) + lm.k * v1)
                )
            ).alias("_logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("_logp").alias("n_scored"),
        F.avg("_logp").alias("avg_logp"),
        F.exp(-F.avg("_logp")).alias("ppl"),
    )
