"""End-to-end training-corpus preparation: the composition a 100-TB
pretraining pipeline actually runs, built entirely from this package's
operators so a user gets the whole flow in one call.

Stage order follows standard practice (cheapest and highest-yield
filters first, pair-generating stages on the already-shrunk corpus):

  1. quality gate      — row-local column predicates (no shuffle):
                         token-count bounds, quality score, optional
                         language allow-list, PII redaction.
  2. exact dedup       — keep the lowest-id member per normalized-text
                         fingerprint (one window shuffle).
  3. near dedup        — SimHash pigeonhole pairs -> connected
                         components -> keep each cluster's canonical.
  4. decontamination   — drop docs exactly matching OR sharing >=
                         min 8-gram hits with the benchmark set
                         (benchmark side broadcast; corpus shuffle-free).
  5. packing           — greedy context-window packing per language,
                         closed-form offsets (one shuffle on the group).

Every stage is the library operator, not a re-implementation — this
module only wires them, counts attrition per stage, and returns both the
packed corpus and the audit trail. Deliberately immutable snapshots
(Spark-native) like Suite.clean, never in-place mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataval_spark.operators import dedup as D
from dataval_spark.operators import text as X
from dataval_spark.operators.packing import pack_greedy


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_tokens: int = 5,
    max_tokens: int = 1 << 20,
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    simhash_bits: int = 60,
    max_hamming: int = 3,
    decontam_ngram: int = 8,
    window_tokens: int = 2048,
    redact: bool = True,
    checkpoint_dir: str | None = None,
    pack_shards: int = 1,
) -> dict:
    """Run the full preparation flow. NOTE: the near-dedup phase
    (SimHash code materialization + connected-components iteration) runs
    EAGERLY at call time — this is a pipeline runner, not a plan
    builder. On a real cluster pass ``checkpoint_dir`` so the CC rounds
    use reliable checkpoint() (executor-loss-safe) instead of
    localCheckpoint (see connected_components).

    Returns a dict with the per-stage frames and a ``stats`` callable
    computing the attrition funnel — one count() per stage, each
    re-deriving its (un-persisted) upstream chain, so call it for audit
    runs, not in a hot loop.

    Keys: quality_pass, exact_deduped, near_deduped, decontaminated,
    packed, stats().
    """
    tc = X.token_count(F.col(text_col))
    gate = (
        F.col(text_col).isNotNull()
        & (tc >= min_tokens)
        & (tc <= max_tokens)
        & (X.quality_score(F.col(text_col)) >= min_quality)
    )
    if langs is not None:
        gate = gate & X.lang_id(F.col(text_col)).isin(*langs)
    quality_pass = docs.where(gate)
    if redact:
        quality_pass = quality_pass.withColumn(
            text_col, X.redact_pii(F.col(text_col))
        )

    # persist: everything downstream (the simhash cache materialization,
    # the CC seed checkpoint, the strict orphan check, stats(), and the
    # user's final writes) re-derives this scan + fingerprint-window
    # shuffle otherwise — several full passes per pipeline run. Bounded
    # by the same one-live-cache swap as the pair operators.
    exact_deduped = D._cache_swap(
        "prepare_corpus_exact_deduped",
        D.dedup_keep_first(quality_pass, id_col, text_col),
    )

    pairs = D.simhash_near_pairs(
        exact_deduped, id_col, text_col, bits=simhash_bits, max_hamming=max_hamming
    )
    # content_bearing is the SAME predicate simhash_near_pairs applies
    # internally, so the seed set provably covers every pair endpoint
    # (strict connected_components raises if that ever drifts)
    ids = exact_deduped.where(D.content_bearing(F.col(text_col))).select(
        F.col(id_col).alias("doc")
    )
    labels = D.connected_components(ids, pairs, checkpoint_dir=checkpoint_dir)
    near_deduped = D.keep_cluster_canonical(exact_deduped, labels, id_col)

    decontaminated = near_deduped
    if benchmark is not None:
        exact_hits = D.contamination(near_deduped, benchmark, id_col, text_col)
        fuzzy_hits = D.ngram_contamination(
            near_deduped, benchmark, n=decontam_ngram,
            id_col=id_col, text_col=text_col,
        )
        contaminated = (
            exact_hits.select(id_col)
            .union(fuzzy_hits.select(id_col))
            .distinct()
        )
        decontaminated = near_deduped.join(contaminated, id_col, "left_anti")

    sized = decontaminated.withColumn("n_tok", X.token_count(F.col(text_col)))
    # pack_shards: at corpus scale the language key's cardinality bounds
    # the packing sort's parallelism — size ~ cores / n_langs (see
    # packing.pack_greedy)
    packed = pack_greedy(
        sized, "n_tok", window_tokens, lang_col, id_col, n_shards=pack_shards
    )

    def stats() -> dict:
        # one count() per stage; each re-derives its upstream chain
        # (audit-run cost, documented in the prepare_corpus docstring)
        return {
            "n_input": docs.count(),
            "n_quality_pass": quality_pass.count(),
            "n_exact_deduped": exact_deduped.count(),
            "n_near_deduped": near_deduped.count(),
            "n_decontaminated": decontaminated.count(),
            "n_packed_bins": packed.select(lang_col, "bin").distinct().count(),
        }

    return {
        "quality_pass": quality_pass,
        "exact_deduped": exact_deduped,
        "near_deduped": near_deduped,
        "decontaminated": decontaminated,
        "packed": packed,
        "stats": stats,
    }
