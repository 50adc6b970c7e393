"""Incremental corpus dedup: dedup a NEW batch of documents against the
fingerprint/signature store of everything already accepted — without
rescanning the accepted corpus.

A 100-TB corpus is not built in one job; it accretes from a continuous
crawl. Re-running global dedup over (corpus + batch) per increment is
O(corpus) every time. The scalable shape keeps a SIGNATURE STORE — two
narrow columns per accepted document, (fp: md5 of normalized text,
code: simhash) — and processes each increment as joins between the batch
and that store:

* **exact layer** — batch keep-first on fp (min id per group), then an
  anti-join against the store's fps: a batch doc whose exact fingerprint
  is already accepted is dropped.
* **near layer** — batch docs within Hamming ``max_hamming`` of ANY
  stored code are dropped (pigeonhole chunk-key equi-join, recall
  guaranteed — dedup.simhash_chunk_keys); the remainder is near-deduped
  within the batch by the exact-code-collapsed connected-components path
  (dedup.simhash_clusters' construction, reusing the batch's
  already-computed codes), keeping each cluster's min-id canonical.
* the survivors' (fp, code) rows are the ``store_delta`` the caller
  appends to the store (TableIO.append / Iceberg append) — the next
  increment sees them.

Semantics note (documented, tested): this is the standard greedy-online
contract — membership of earlier batches is FROZEN; a new doc cannot
evict an accepted one, and near-dup chains that span the batch boundary
resolve in arrival order. When no near-dup cluster chains across the
boundary, the two-batch result is provably identical to one global
run (test_increment_equals_global_when_no_cross_chains); when a chain
does span it, the greedy answer keeps one representative per side —
the order-dependence every online dedup has (Lee et al. 2022 §4 make
the same trade for their streaming variant).

Scale design:
* The store is never broadcast and never rescanned as text — only its
  (fp, code) columns join. Bucket the store table by ``fp``
  (sources/bucketing.py) and repeated increments shuffle only the batch
  side of the exact layer.
* The near layer explodes ``max_hamming + 1`` chunk keys per stored
  code per increment. For frequent small increments, materialize that
  key table ONCE with ``store_chunk_keys`` and append its increments
  alongside the store; pass it as ``store_keys``.
* Candidates are bounded by chunk-bucket sizes (2^16 buckets per index
  at 64/3), same as the intra-corpus pigeonhole join; the hot keys are
  store-side and AQE's skew split applies to the probe.

No counterpart in the astronomy reference — the closest analog is its
resume path (skip already-released targets by manifest lookup,
/root/reference/dataval/run_package_release.py:147-178): membership of
prior work is decided by a small per-item record, not by recomputation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataval_spark.operators.dedup import (
    _cache_swap,
    code_near_pairs,
    connected_components,
    content_bearing,
    hashed_tokens,
    simhash_chunk_keys,
    simhash_from_hashed,
)
from dataval_spark.operators.text import normalize

__all__ = [
    "IncrementResult",
    "doc_signatures",
    "empty_store",
    "store_chunk_keys",
    "dedup_increment",
]

STORE_SCHEMA = "fp string, code long"


@dataclass
class IncrementResult:
    """``kept``: surviving batch docs, original columns. ``store_delta``:
    their (fp, code) signature rows — append to the store before the
    next increment. Non-content-bearing docs (NULL/blank text) are kept
    but NOT stored: they carry no dedup evidence, same contract as the
    similarity family's ``vector_ok``."""

    kept: DataFrame
    store_delta: DataFrame


def empty_store(spark) -> DataFrame:
    """The store for the first increment: zero rows, store schema."""
    return spark.createDataFrame([], STORE_SCHEMA)


def doc_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 60
) -> DataFrame:
    """(doc, fp, code) for every content-bearing document — one
    scan-fused projection, both signatures from a single tokenization."""
    return (
        df.where(content_bearing(F.col(text_col)))
        .select(
            F.col(id_col).alias("doc"),
            F.md5(normalize(F.col(text_col))).alias("fp"),
            hashed_tokens(F.col(text_col), bits).alias("_ht"),
        )
        .select("doc", "fp", simhash_from_hashed(F.col("_ht"), bits).alias("code"))
    )


def store_chunk_keys(
    store: DataFrame, bits: int = 60, max_hamming: int = 3
) -> DataFrame:
    """(k, code) pigeonhole key rows for the store — materialize once and
    append per increment instead of re-exploding the whole store every
    batch."""
    keys = simhash_chunk_keys(F.col("code"), bits, max_hamming)
    return store.select(F.explode(F.array(*keys)).alias("k"), "code")


def dedup_increment(
    new_docs: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    max_hamming: int = 3,
    near: bool = True,
    store_keys: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> IncrementResult:
    """Dedup ``new_docs`` against ``store`` (and within itself); see the
    module docstring for the exact greedy-online contract."""
    sigs = _cache_swap(
        "dedup_increment", doc_signatures(new_docs, id_col, text_col, bits)
    )

    # exact layer: batch keep-first per fp, then drop fps the store owns.
    # min-per-group instead of a row_number window: no NULL-key hazard
    # (sigs has no NULL fp) and the agg is map-side combined.
    first = sigs.groupBy("fp").agg(F.min("doc").alias("doc"))
    exact_kept = (
        sigs.join(first, ["fp", "doc"], "left_semi")
        .join(store.select("fp").distinct(), "fp", "left_anti")
    )

    if near:
        # cross-batch: any batch doc within the Hamming radius of a
        # stored code is dropped. Both sides keyed by the pigeonhole
        # chunks; recall is guaranteed (codes within max_hamming agree
        # on >= 1 chunk), precision by the popcount filter.
        skeys = (
            store_chunk_keys(store, bits, max_hamming)
            if store_keys is None
            else store_keys
        )
        bkeys = exact_kept.select(
            "doc",
            "code",
            F.explode(
                F.array(*simhash_chunk_keys(F.col("code"), bits, max_hamming))
            ).alias("k"),
        )
        matched = (
            bkeys.alias("b")
            .join(skeys.alias("s"), F.col("b.k") == F.col("s.k"))
            .where(
                F.bit_count(
                    F.col("b.code").bitwiseXOR(F.col("s.code"))
                ) <= max_hamming
            )
            .select("b.doc")
        )
        survivors = exact_kept.join(matched, "doc", "left_anti")

        # within-batch: exact-code collapse (dedup.simhash_clusters'
        # construction over the ALREADY-computed codes — no retokenize),
        # CC over distinct-code reps, keep each cluster's min-id member.
        groups = survivors.groupBy("code").agg(F.min("doc").alias("rep"))
        rep_pairs = code_near_pairs(
            groups.select(F.col("rep").alias("doc"), "code"), bits, max_hamming
        )
        labels = connected_components(
            groups.select(F.col("rep").alias("doc")),
            rep_pairs,
            checkpoint_dir=checkpoint_dir,
        )
        canon = (
            survivors.join(groups, "code")
            .join(labels.withColumnRenamed("doc", "rep"), "rep")
            .groupBy("cluster")
            .agg(F.min("doc").alias("doc"))
            .select("doc")
        )
        survivors = survivors.join(canon, "doc", "left_semi")
    else:
        survivors = exact_kept

    # content-bearing survivors by id + evidence-free docs (kept, unstored)
    kept_ids = survivors.select("doc")
    # NULL-safe negation: content_bearing(NULL text) evaluates NULL under
    # ANSI semantics and a bare ~NULL filter would drop the row from BOTH
    # branches — coalesce pins NULL-text docs to the evidence-free side
    kept = new_docs.join(
        kept_ids, new_docs[id_col] == kept_ids["doc"], "left_semi"
    ).unionByName(
        new_docs.where(
            ~F.coalesce(content_bearing(F.col(text_col)), F.lit(False))
        )
    )
    return IncrementResult(
        kept=kept, store_delta=survivors.select("fp", "code")
    )
