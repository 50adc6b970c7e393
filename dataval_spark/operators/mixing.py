"""Source mixing and token-budget sampling for training-corpus assembly.

The last step of a pre-training data pipeline: given per-source corpora
and a total token budget, choose per-source sampling rates (uniform,
proportional, or temperature-scaled a la multilingual T5 / XLM-R,
w_s ~ n_s^tau) and draw a DETERMINISTIC sample hitting the budget in
expectation.

Scale design: one aggregation pass computes per-source token totals
(map-side combined, O(#sources) rows to the driver); the sample itself
is a stateless filter — md5-derived uniform per row compared against a
plan-literal rate map — so it fuses into the scan with ZERO shuffle and
no RNG state. Determinism means reruns, resumes, and multi-job
consumers all select the SAME rows (seeded rand() does not survive
repartitioning; a content hash does), which is the property that makes
the sample reproducible across cluster sizes — the same contract as the
engine's seeded permutation sampler (queries q37), extended to
budget-driven rates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "uniform_hash",
    "source_token_counts",
    "temperature_weights",
    "MixtureStats",
    "sample_to_budget",
    "assign_split",
]

# 52 bits: genuinely exact in a double's 53-bit mantissa.
# HASH BREAK (v2, round 5): this was 15 (60 bits, whose cast('double')
# ROUNDED, so mirrors disagreed in the last ulp). Dropping to 13 changed
# every uniform_hash draw, so sample_to_budget membership and
# assign_split routing from pre-v2 builds do NOT reproduce under v2 —
# the rerun-stability guarantee holds prospectively from v2 on. To
# reproduce a pre-v2 corpus, pin hash_version=1 at the call site.
_HEX_DIGITS = 13
UNIFORM_HASH_VERSION = 2
_DIGITS_BY_VERSION = {1: 15, 2: _HEX_DIGITS}


def uniform_hash(
    col: Column, seed: int = 0, hash_version: int = UNIFORM_HASH_VERSION
) -> Column:
    """Deterministic uniform in [0, 1): the top 52 bits of
    md5(seed | id) — 13 hex digits, below the double mantissa width, so
    conv().cast('double') is EXACT (no rounding between the Spark and
    any mirror implementation). Unlike rand(seed), the value depends
    only on row CONTENT, so it is stable under repartitioning, AQE
    re-plans, and cluster-size changes.

    ``hash_version``: draws are versioned because the digit width is
    part of the value (see the HASH BREAK note above) — pass 1 to
    reproduce membership decisions made by pre-round-5 builds."""
    digits = _DIGITS_BY_VERSION[hash_version]
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(str(seed)), col.cast("string"))),
        1,
        digits,
    )
    return F.conv(h, 16, 10).cast("double") / float(16**digits)


def source_token_counts(
    df: DataFrame, source_col: str = "source", token_col: str = "n_tokens"
) -> DataFrame:
    """(source, n_docs, n_tokens) — one map-side-combined aggregation."""
    return df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
    )


def temperature_weights(
    counts: dict[str, int], tau: float = 0.7
) -> dict[str, float]:
    """Mixture weights w_s ~ n_s^tau, normalized. tau=1 is proportional
    (natural distribution), tau=0 is uniform over sources, 0<tau<1
    upweights small sources (the multilingual-pretraining standard)."""
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    raw = {s: float(n) ** tau for s, n in counts.items() if n > 0}
    total = sum(raw.values())
    if total <= 0:
        raise ValueError("no source has positive token count")
    return {s: v / total for s, v in raw.items()}


@dataclass
class MixtureStats:
    budget: int
    sources: list[dict]  # per source: tokens, weight, rate, expected_tokens

    @property
    def expected_tokens(self) -> int:
        return int(sum(s["expected_tokens"] for s in self.sources))


def sample_to_budget(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    tau: float = 1.0,
    seed: int = 0,
) -> tuple[DataFrame, MixtureStats]:
    """Deterministic per-source sample whose expected token total is
    ``budget_tokens`` (less when a source's allocation exceeds the
    source itself — rates cap at 1.0 and the shortfall is NOT
    redistributed, matching how fixed mixture weights behave in
    published recipes; re-weight and rerun to spend the remainder).

    ``weights``: explicit mixture weights (normalized over the sources
    actually present); default = temperature_weights(counts, tau).
    Sources with zero weight — and rows with NULL source — are dropped.
    Returns (sampled_df, stats); the stats carry per-source rates so a
    manifest can record exactly what the sample was.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    counts = {
        r[source_col]: int(r["n_tokens"] or 0)
        for r in source_token_counts(df, source_col, token_col).collect()
        if r[source_col] is not None
    }
    if weights is None:
        w = temperature_weights(counts, tau)
    else:
        present = {s: float(v) for s, v in weights.items() if s in counts and v > 0}
        total = sum(present.values())
        if total <= 0:
            raise ValueError("no positive weight matches a present source")
        w = {s: v / total for s, v in present.items()}

    stats: list[dict] = []
    rates: dict[str, float] = {}
    for s, tokens in sorted(counts.items()):
        ws = w.get(s, 0.0)
        rate = min(1.0, budget_tokens * ws / tokens) if (tokens > 0 and ws > 0) else 0.0
        rates[s] = rate
        stats.append(
            {
                "source": s,
                "n_tokens": tokens,
                "weight": ws,
                "rate": rate,
                "expected_tokens": int(tokens * rate),
            }
        )

    rate_map = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(float(r)))]
    )
    rate_col = F.element_at(rate_map, F.col(source_col))
    sampled = df.where(
        F.col(source_col).isNotNull()
        & (uniform_hash(F.col(id_col), seed) < F.coalesce(rate_col, F.lit(0.0)))
    )
    return sampled, MixtureStats(budget=int(budget_tokens), sources=stats)


def assign_split(
    id_col: Column,
    splits: dict[str, float] | None = None,
    seed: int = 0,
) -> Column:
    """Deterministic train/val/test assignment as a COLUMN expression —
    the last cut before a corpus ships. The row's uniform content-hash
    draw (same ``uniform_hash`` contract as the budget sampler: stable
    under repartitioning, AQE re-plans, and cluster resizes, which
    seeded rand() is not) is bucketed against the cumulative split
    boundaries, so membership is a pure function of (id, seed): reruns,
    resumes, and incremental appends all route a given document to the
    SAME split — the property that stops eval contamination when the
    corpus is rebuilt. Zero shuffle: the expression fuses into whatever
    scan or projection it is attached to.

    ``splits`` maps name -> fraction, summing to 1 (±1e-9); iteration
    order fixes the bucket layout, so pass an explicit dict and keep it
    stable across runs. Default {"train": .98, "val": .01, "test": .01}.
    """
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not splits or any(v < 0 for v in splits.values()):
        raise ValueError(f"split fractions must be >= 0, got {splits}")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = uniform_hash(id_col, seed)
    names = list(splits)
    bounds: list[tuple[str, float]] = []
    hi = 0.0
    for name in names[:-1]:
        hi += splits[name]
        bounds.append((name, hi))
    expr = F.lit(names[-1])  # last bucket absorbs the u ~ 1.0 edge
    # build innermost-last so the FIRST split's (smallest) boundary is
    # the outermost condition of the when-chain
    for name, b in reversed(bounds):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return expr
