"""Incremental dedup against a persisted signature store.

The mirror computes each doc's (fp, code) ONCE through the engine's own
signature projection (shared with the global operators), then re-derives
the greedy-online contract in pure python sets/graphs — exact keep-first,
store-fp drop, store-code Hamming drop, within-batch connectivity
clustering — so the join/CC plumbing under test is checked against an
independent implementation of the same published semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataval_spark.operators import incremental as I

BITS = 60
MAXH = 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sigs(spark, rows) -> dict[int, tuple[str, int]]:
    """(fp, code) per content-bearing doc via the engine's projection."""
    out = I.doc_signatures(_docs(spark, rows), "doc_id", bits=BITS).collect()
    return {r.doc: (r.fp, r.code) for r in out}


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _mirror_increment(sigs, batch_ids, store):
    """Greedy-online mirror. ``store`` = set of (fp, code). Returns the
    kept content-bearing ids (evidence-free docs are always kept)."""
    store_fps = {fp for fp, _ in store}
    store_codes = [c for _, c in store]
    # exact layer: keep-first per fp within the batch, drop stored fps
    first = {}
    for d in sorted(batch_ids):
        if d not in sigs:
            continue
        fp, _ = sigs[d]
        if fp not in first:
            first[fp] = d
    exact = {d for fp, d in first.items() if fp not in store_fps}
    # near layer: drop anything near a stored code
    surv = {
        d
        for d in exact
        if all(_ham(sigs[d][1], c) > MAXH for c in store_codes)
    }
    # within-batch: connectivity over codes at <= MAXH, keep min id
    ids = sorted(surv)
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _ham(sigs[a][1], sigs[b][1]) <= MAXH:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    by_root = {}
    for d in ids:
        r = find(d)
        by_root.setdefault(r, d)
        by_root[r] = min(by_root[r], d)
    return set(by_root.values())


def _run(spark, batch_rows, store_rows, **kw):
    store = (
        I.empty_store(spark)
        if not store_rows
        else spark.createDataFrame(store_rows, I.STORE_SCHEMA)
    )
    res = I.dedup_increment(_docs(spark, batch_rows), store, **kw)
    kept = {r.doc_id for r in res.kept.collect()}
    delta = {(r.fp, r.code) for r in res.store_delta.collect()}
    return kept, delta


def _text(seed: int, extra: str | None = None) -> str:
    """160-token doc over a per-family vocabulary (simhash is a bag of
    tokens, so families must differ in token MULTISET, not order);
    ``extra`` appends one token — the near-dup knob. How near a given
    append actually lands is a property of the hash, so tests PROBE for
    a perturbation within the radius (_find_near) rather than assume."""
    toks = [f"w{seed}f{i % 40}" for i in range(160)]
    if extra is not None:
        toks.append(extra)
    return " ".join(toks)


def _find_near(spark, seed: int, base_code: int) -> str:
    """Deterministically find an appended-token variant of family
    ``seed`` whose code lands within MAXH of the base — one batched
    collect over candidate perturbations (xxhash64 is fixed, so the
    winner is stable across runs)."""
    cands = [(i, _text(seed, extra=f"p{seed}c{i}")) for i in range(64)]
    sigs = _sigs(spark, [(i, t) for i, t in cands])
    for i, t in cands:
        if i in sigs and _ham(sigs[i][1], base_code) <= MAXH:
            return t
    raise AssertionError("no near perturbation found in 64 candidates")


@pytest.fixture(scope="module")
def corpus():
    rows = []
    for s in range(6):
        rows.append((10 * s + 1, _text(s)))          # base doc per family
        rows.append((10 * s + 2, _text(s)))          # exact dup of base
        rows.append((10 * s + 3, _text(s, extra=f"x{s}")))  # perturbed variant
    rows.append((901, None))
    rows.append((902, "   "))
    return rows


def test_first_increment_matches_mirror(spark, corpus):
    sigs = _sigs(spark, corpus)
    kept, delta = _run(spark, corpus, [])
    expect = _mirror_increment(sigs, [r[0] for r in corpus], set())
    assert kept == expect | {901, 902}  # evidence-free docs always kept
    assert delta == {sigs[d] for d in expect}


def test_exact_cross_batch_drop(spark, corpus):
    sigs = _sigs(spark, corpus)
    b1 = [r for r in corpus if r[0] % 10 == 1 and r[0] < 900]
    _, d1 = _run(spark, b1, [])
    # batch 2 re-sends the same texts under new ids -> all dropped
    b2 = [(r[0] + 1000, r[1]) for r in b1]
    kept2, d2 = _run(spark, b2, sorted(d1))
    assert kept2 == set() and d2 == set()
    assert d1 == {sigs[r[0]] for r in b1}


def test_near_cross_batch_drop_and_near_flag(spark, corpus):
    sigs = _sigs(spark, corpus)
    base = [(1, _text(0))]
    near_text = _find_near(spark, 0, sigs[1][1])
    perturbed = [(2001, near_text)]
    psig = _sigs(spark, perturbed)
    assert _ham(sigs[1][1], psig[2001][1]) <= MAXH  # genuinely near
    _, d1 = _run(spark, base, [])
    kept_near, _ = _run(spark, perturbed, sorted(d1))
    assert kept_near == set()  # frozen membership: stored doc wins
    kept_exact, delta_exact = _run(spark, perturbed, sorted(d1), near=False)
    assert kept_exact == {2001}  # exact-only layer keeps the near-dup
    assert delta_exact == {psig[2001]}


def test_increment_equals_global_when_no_cross_chains(spark, corpus):
    """Docstring contract: when no near-dup chain spans the batch
    boundary, two increments == one global run over the union."""
    sigs = _sigs(spark, corpus)
    b1 = [r for r in corpus if r[0] < 30 or r[0] > 900]  # families 0-2
    b2 = [r for r in corpus if 30 <= r[0] < 900]         # families 3-5
    # no cross-boundary nearness (different vocab rotations)
    for a in b1:
        for b in b2:
            if a[0] in sigs and b[0] in sigs:
                assert _ham(sigs[a[0]][1], sigs[b[0]][1]) > MAXH
    k1, d1 = _run(spark, b1, [])
    k2, d2 = _run(spark, b2, sorted(d1))
    kg, dg = _run(spark, corpus, [])
    assert k1 | k2 == kg
    assert d1 | d2 == dg


def test_store_keys_materialized_path_identical(spark, corpus):
    b1 = [r for r in corpus if r[0] % 10 == 1 and r[0] < 900]
    _, d1 = _run(spark, b1, [])
    store = spark.createDataFrame(sorted(d1), I.STORE_SCHEMA)
    keys = I.store_chunk_keys(store, BITS, MAXH)
    b2 = [r for r in corpus if r[0] % 10 != 1]
    res_a = I.dedup_increment(_docs(spark, b2), store)
    res_b = I.dedup_increment(_docs(spark, b2), store, store_keys=keys)
    assert {r.doc_id for r in res_a.kept.collect()} == {
        r.doc_id for r in res_b.kept.collect()
    }


def test_evidence_free_docs_kept_but_unstored(spark):
    rows = [(1, _text(0)), (2, None), (3, ""), (4, "   ")]
    kept, delta = _run(spark, rows, [])
    assert kept == {1, 2, 3, 4}
    assert len(delta) == 1  # only the content-bearing survivor stored


def test_kept_preserves_original_columns(spark):
    df = spark.createDataFrame(
        [(1, _text(0), "en"), (2, _text(0), "de")],
        "doc_id long, text string, lang string",
    )
    res = I.dedup_increment(df, I.empty_store(spark))
    rows = res.kept.collect()
    assert set(res.kept.columns) == {"doc_id", "text", "lang"}
    assert {(r.doc_id, r.lang) for r in rows} == {(1, "en")}
