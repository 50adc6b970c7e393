"""Property-based tests (hypothesis) for the engine's pure algebra:
bitmask verdict combination, drift statistics, histogram quantiles.
These run without Spark jobs (driver-side math), so examples are cheap.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataval_spark.constraints.drift import Drift, _compare_hists
from dataval_spark.quality import DEFAULT_BITMASK, QualityFlag

ALL_BITS = 0
for _f in QualityFlag:
    ALL_BITS |= int(_f)


@given(st.integers(min_value=0, max_value=ALL_BITS))
def test_approved_iff_no_masked_bit(dataval):
    approved = (dataval & DEFAULT_BITMASK) == 0
    # parity with the reference's two-step UPDATE chain
    # (/root/reference/dataval/dataval.py:401-402): dataval==0 approves,
    # and dataval>0 approves iff no default-mask bit is set
    if dataval == 0:
        assert approved
    for f in QualityFlag:
        if int(f) & DEFAULT_BITMASK and dataval & int(f):
            assert not approved
            break


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=4, max_size=32),
)
def test_identical_distributions_never_drift(h):
    r = _compare_hists([float(x) for x in h], [float(x) * 3 for x in h], 0.25, 0.30)
    assert r["psi"] < 1e-6
    assert r["ks"] < 1e-9
    assert not r["drifted"]


@given(
    st.integers(min_value=4, max_value=16),
    st.integers(min_value=100, max_value=10_000),
)
def test_disjoint_distributions_always_drift(nbins, n):
    h = [float(n)] + [0.0] * (nbins - 1)
    ref = [0.0] * (nbins - 1) + [float(n)]
    r = _compare_hists(h, ref, 0.25, 0.30)
    assert r["drifted"]
    assert r["ks"] > 0.9


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=5, max_size=5),
)
@settings(max_examples=50)
def test_hist_quantiles_monotonic_and_bounded(counts):
    d = Drift(expr=None, bins=[0.0, 10.0, 20.0, 30.0, 40.0, 50.0], name="t")
    row = {f"hist_t_{i}": c for i, c in enumerate(counts)}
    qs = d.quantiles_from_hist(row, probs=(0.1, 0.5, 0.9))
    if sum(counts) == 0:
        assert all(q != q for q in qs)  # all NaN
        return
    assert qs == sorted(qs)                      # monotonic in p
    assert all(0.0 <= q <= 50.0 for q in qs)     # inside the bin range


def test_median_of_uniform_hist_is_midpoint():
    d = Drift(expr=None, bins=[0.0, 10.0, 20.0, 30.0, 40.0], name="t")
    row = {f"hist_t_{i}": 25 for i in range(4)}
    (q50,) = d.quantiles_from_hist(row, probs=(0.5,))
    assert abs(q50 - 20.0) < 1e-6


def _chunks(code: int, bits: int, max_hamming: int) -> list[int]:
    """Python mirror of dedup.simhash_chunk_keys widths/offsets."""
    m = max_hamming + 1
    base, rem = divmod(bits, m)
    out, lo = [], 0
    for i in range(m):
        width = base + (1 if i < rem else 0)
        out.append((code >> lo) & ((1 << width) - 1))
        lo += width
    return out


@given(
    st.integers(min_value=0, max_value=(1 << 63) - 1),
    st.integers(min_value=1, max_value=4),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=4),
)
@settings(max_examples=300)
def test_pigeonhole_recall_guarantee(code, max_hamming, flip_bits):
    """Two codes within Hamming distance max_hamming MUST agree on at
    least one of the max_hamming+1 disjoint chunks — the recall guarantee
    simhash_near_pairs' candidate join relies on."""
    flips = list(flip_bits)[:max_hamming]  # at most max_hamming bit flips
    other = code
    for b in flips:
        other ^= 1 << b
    a = _chunks(code, 64, max_hamming)
    b = _chunks(other, 64, max_hamming)
    assert any(x == y for x, y in zip(a, b))
    # and the chunks are a PARTITION of the code (lossless, disjoint)
    m = max_hamming + 1
    base, rem = divmod(64, m)
    rebuilt, lo = 0, 0
    for i, c in enumerate(a):
        rebuilt |= c << lo
        lo += base + (1 if i < rem else 0)
    assert rebuilt == code


def test_randomized_differential_vs_pandas_oracle(spark):
    """Randomized differential check: arbitrary small transcript frames
    (dups, gaps, nulls, ts regressions, random statuses) must produce
    IDENTICAL row verdicts from the Spark engine and the independent
    pandas oracle. Deterministic seeds — reproducible, not flaky."""
    import random

    import pandas as pd

    from dataval_spark.oracle import oracle_row_verdicts
    from dataval_spark.suite import transcript_suite

    for seed in (7, 99, 2187):
        rng = random.Random(seed)
        rows = []
        for conv in range(rng.randint(3, 8)):
            conv_id = f"conv-{conv:012d}"
            n = rng.randint(1, 12)
            idxs = list(range(n))
            # random mutations: drop (gap), duplicate, shuffle a little
            if n > 3 and rng.random() < 0.5:
                idxs.remove(rng.randrange(1, n))
            if rng.random() < 0.5:
                idxs.append(rng.choice(idxs))
            status = rng.choice([1, 1, 3, 2, 4, None])
            t0 = 1_600_000_000 + conv * 10_000
            for j, idx in enumerate(idxs):
                role = rng.choice(["system", "user", "assistant", "tool", "alien", None])
                text = rng.choice([
                    "w " * rng.randint(1, 120), "", None, "short",
                ])
                ts = t0 + idx * 300 + (-500 if rng.random() < 0.1 else 0)
                rows.append((
                    conv_id, idx, role, text,
                    "search" if role == "tool" and rng.random() < 0.8 else None,
                    ts, conv % 3, status,
                ))
        pdf = pd.DataFrame(rows, columns=[
            "conv_id", "turn_idx", "role", "text", "tool", "ts", "part", "status",
        ])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
        sdf = spark.createDataFrame(pdf)

        got = transcript_suite().run(sdf).row_verdicts.toPandas()
        exp = oracle_row_verdicts(pdf)
        key = ["conv_id", "turn_idx", "dataval", "approved"]
        g = got[key].sort_values(key).reset_index(drop=True)
        e = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            e, g.astype({"dataval": "int64"}), check_dtype=False,
        ), f"seed {seed} diverged"


# ---------------------------------------------------------------------------
# Engine-vs-python-mirror differential over hypothesis-generated corpora.
# One Spark job per example (texts batched into a single DataFrame), few
# examples — property coverage without a job-per-string explosion.

def _py_norm_tokens(text: str) -> list[str]:
    import re

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip(" \t\n\x0b\f\r")).lower()
    return norm.split(" ") if norm else [""]


def _py_shingles(text: str, n: int) -> set[str]:
    toks = _py_norm_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_minhash_sig(text: str, n_hashes: int) -> str:
    import hashlib

    toks = set(_py_norm_tokens(text))
    mins = [
        min(hashlib.md5(f"{i}:{t}".encode()).hexdigest() for t in toks)
        for i in range(n_hashes)
    ]
    return "|".join(mins)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_shingle_and_minhash_engine_matches_python_mirror(spark, texts, n):
    """Arbitrary printable-ASCII corpora: the JVM-side shingle set and
    MinHash signature must equal an independent python implementation
    (catches regressions in the _bind refactor, normalize/tokenize
    semantics, and hash portability in one sweep)."""
    from pyspark.sql import functions as F

    from dataval_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        D.shingles(F.col("text"), n).alias("sh"),
        D.minhash_signature(F.col("text"), 4).alias("sig"),
    ).collect()
    for r in rows:
        text = texts[r.doc_id]
        assert set(r.sh) == _py_shingles(text, n), (text, n)
        assert r.sig == _py_minhash_sig(text, 4), text
