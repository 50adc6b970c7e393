"""End-to-end suite tests against the independent pandas oracle.

Mirrors the reference's end-to-end invariants
(/root/reference/tests/test_dataval.py:15-50): verdict row count equals
input row count, clean targets carry no flags, defective rows carry
exactly the expected bits, and the clean partition passes.
"""

from __future__ import annotations

import pandas as pd
import pytest

from dataval_spark import DEFAULT_BITMASK, QualityFlag
from dataval_spark.fixtures import CLEAN_PART, DRIFT_PART, transcripts
from dataval_spark.oracle import oracle_partition_summary, oracle_row_verdicts
from dataval_spark.suite import transcript_suite


@pytest.fixture(scope="module")
def data(spark):
    df = transcripts(spark, n_convs=400, seed=2187, n_parts=8, with_labels=True)
    return df.cache()


@pytest.fixture(scope="module")
def result(data):
    return transcript_suite().run(data.drop("defects"))


def test_row_count_conserved(data, result):
    # verdict rows == input rows (/root/reference/tests/test_dataval.py:35-43)
    assert result.row_verdicts.count() == data.count()


def test_row_verdict_parity_with_oracle(data, result):
    pdf = data.drop("defects").toPandas()
    expected = oracle_row_verdicts(pdf)
    got = result.row_verdicts.toPandas()

    key = ["conv_id", "turn_idx", "dataval", "approved"]
    exp_sorted = expected[key].sort_values(key).reset_index(drop=True)
    got_sorted = got[key].astype({"dataval": "int64"}).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(exp_sorted, got_sorted, check_dtype=False)


def test_clean_partition_passes(result):
    clean = [m for m in result.partition_metrics if m["part"] == CLEAN_PART]
    assert len(clean) == 1
    assert clean[0]["passed"]
    assert clean[0]["n_rejected"] == 0
    assert not clean[0]["drifted"]


def test_drifted_partition_detected(result):
    drift = [m for m in result.partition_metrics if m["part"] == DRIFT_PART]
    assert len(drift) == 1
    assert drift[0]["drifted"]
    assert not drift[0]["passed"]
    assert drift[0]["dataval_part"] == int(QualityFlag.DriftedPartition)


def test_every_defect_class_fires(data, result):
    """Sabotage-style check: each injected defect label produces its flag
    (/root/reference/tests/test_run_package_release.py:207-245)."""
    flag_by_label = {
        "duplicate_turn": QualityFlag.DuplicateTurn,
        "ts_out_of_order": QualityFlag.NonMonotonicTs,
        "null_text": QualityFlag.InvalidText,
        "null_role": QualityFlag.InvalidRole,
        "bad_role": QualityFlag.InvalidRole,
        "bad_tool": QualityFlag.InvalidTool,
        "tool_mismatch": QualityFlag.InvalidTool,
        "too_long": QualityFlag.TextTooLong,
        "too_short": QualityFlag.TextTooShort,
        "bad_status_conv": QualityFlag.BadStatus,
    }
    import numpy as np

    labeled = data.toPandas()
    verdicts = result.row_verdicts.toPandas()
    # OR together the bits of all rows sharing a key (duplicate copies)
    fired = (
        verdicts.assign(dataval=verdicts["dataval"].astype(int))
        .groupby(["conv_id", "turn_idx"])["dataval"]
        .agg(lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
    )
    for label, flag in flag_by_label.items():
        rows = labeled[labeled["defects"].map(lambda d, l=label: l in list(d) if d is not None else False)]
        assert len(rows) > 0, f"fixture produced no rows for defect {label}"
        keys = list(rows[["conv_id", "turn_idx"]].itertuples(index=False, name=None))
        hit = sum(1 for k in keys if int(fired.get(k, 0)) & int(flag))
        assert hit == len(keys), f"{label}: {hit}/{len(keys)} rows flagged with {flag.name}"


def test_sequence_gap_fires(data, result):
    """Gap rows are dropped by the generator; their successors must be
    flagged. Count gaps independently in pandas."""
    pdf = data.select("conv_id", "turn_idx").toPandas()
    pdf = pdf.sort_values(["conv_id", "turn_idx"])
    prev = pdf.groupby("conv_id")["turn_idx"].shift(1)
    gaps = pdf[(prev.notna() & (pdf["turn_idx"] - prev > 1)) | (prev.isna() & (pdf["turn_idx"] > 0))]
    assert len(gaps) > 0
    verdicts = result.row_verdicts.toPandas()
    flagged = verdicts[verdicts["dataval"].astype(int) & int(QualityFlag.SequenceGap) != 0]
    assert len(flagged) >= len(gaps.drop_duplicates(["conv_id", "turn_idx"]))


def test_partition_summary_matches_oracle(data, result):
    pdf = data.drop("defects").toPandas()
    expected = oracle_partition_summary(oracle_row_verdicts(pdf))
    got = (
        pd.DataFrame(result.partition_metrics)[["part", "n_rows", "n_approved", "n_rejected"]]
        .sort_values("part")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        expected.sort_values("part").reset_index(drop=True).astype("int64"),
        got.astype("int64"),
    )


def test_default_bitmask_composition():
    assert DEFAULT_BITMASK & int(QualityFlag.DuplicateTurn)
    assert DEFAULT_BITMASK & int(QualityFlag.SequenceGap)
    assert not DEFAULT_BITMASK & int(QualityFlag.DriftedPartition)
    assert not DEFAULT_BITMASK & int(QualityFlag.BadStatus)  # handled by forced rejection


def test_drift_against_persisted_baseline(spark):
    """Production drift semantics: compare every partition against a
    reference-period histogram. Whole-dataset drift (every partition
    shifted the same way) is invisible to pooled-rest comparison but
    must fire against a baseline."""
    from dataval_spark.constraints.drift import Drift
    from dataval_spark.suite import Suite
    from pyspark.sql import functions as F

    bins = [0.0, 200.0, 400.0, 600.0, 900.0]
    text_len = lambda: F.length(F.col("text")).cast("double")  # noqa: E731

    # baseline period: clean generation
    base = transcripts(spark, n_convs=300, seed=1, n_parts=4, with_defects=False)
    d0 = Drift(expr=text_len, bins=bins, name="d")
    res0 = Suite([d0]).run(base)
    baseline = [
        sum(m[f"hist_d_{i}"] for m in res0.partition_metrics) for i in range(d0.nbins)
    ]

    # current period: every text massively longer (global shift)
    shifted = base.withColumn("text", F.repeat(F.col("text"), 3))
    d_pooled = Drift(expr=text_len, bins=bins, name="d")
    pooled = Suite([d_pooled]).run(shifted)
    assert not any(m["drifted"] for m in pooled.partition_metrics), (
        "pooled-rest comparison is blind to whole-dataset drift"
    )

    d_base = Drift(expr=text_len, bins=bins, name="d", baseline=baseline)
    against_base = Suite([d_base]).run(shifted)
    assert all(m["drifted"] for m in against_base.partition_metrics)

    # and a clean current period does NOT fire against the baseline
    clean_again = Suite([Drift(expr=text_len, bins=bins, name="d", baseline=baseline)]).run(base)
    assert not any(m["drifted"] for m in clean_again.partition_metrics)


def test_clean_quarantine_split(data, result):
    """Suite.clean: immutable cleanup (reference cleanup.py:48) —
    approved/rejected split is exact, quarantine carries the bitmask, and
    re-validating the cleaned table rejects (almost) nothing: only
    sequence gaps CREATED by removing bad turns may remain."""
    suite = transcript_suite()
    df = data.drop("defects")
    cleaned, quarantine, flagged = suite.clean(df)
    assert flagged is None  # persist=False: nothing for the caller to unpersist

    n_total = df.count()
    n_clean, n_quar = cleaned.count(), quarantine.count()
    assert n_clean + n_quar == n_total
    assert n_clean == result.summary()["n_approved"]
    assert cleaned.columns == df.columns
    # every quarantined row carries a rejection reason (mask bit or forced
    # status), never a zero mask with OK status
    bad = quarantine.where(
        (quarantine.dataval.bitwiseAND(DEFAULT_BITMASK) == 0)
        & quarantine.status.isin(1, 3)
    ).count()
    assert bad == 0

    # corrected-stage re-validation: rejections drop sharply, and the
    # ONLY rejection reasons left are sequence effects CREATED by the row
    # removal itself (a removed turn leaves a gap / exposes a masked ts
    # regression) — no original defect class survives cleaning
    r2 = transcript_suite().run(cleaned)
    n_rej_raw = result.summary()["n_rows"] - result.summary()["n_approved"]
    n_rej_clean = r2.summary()["n_rows"] - r2.summary()["n_approved"]
    # every removed defective turn can leave at most one gap flag on its
    # surviving successor, so residual < raw is the tight guarantee
    assert n_rej_clean < n_rej_raw
    residual = {r.constraint for r in r2.violations.select("constraint").distinct().collect()}
    assert residual <= {"SequenceGap", "NonMonotonicTs"}, residual


def test_sample_violations_deterministic(data, result):
    from dataval_spark.suite import sample_violations

    s1 = sample_violations(result.violations, 3).collect()
    s2 = sample_violations(result.violations, 3).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    by_c = {}
    for r in s1:
        by_c.setdefault(r.constraint, []).append(r)
    assert by_c and all(len(v) <= 3 for v in by_c.values())


def test_baseline_from_manifest_catches_global_drift(spark, tmp_path):
    """Whole-dataset drift: every partition shifts together, so
    pooled-rest comparison sees nothing — a baseline from a trusted
    previous run's manifest catches it (north rule: drift checks per
    partition with persisted lineage)."""
    from pyspark.sql import functions as F

    from dataval_spark.constraints.drift import Drift
    from dataval_spark.manifest import baseline_from_manifest, run_resumable
    from dataval_spark.suite import Suite

    good = transcripts(spark, n_convs=150, seed=2187, n_parts=4, with_defects=False)
    suite = transcript_suite()
    mp = str(tmp_path / "m")
    run_resumable(spark, good, suite, mp, "trusted")

    drift = next(c for c in suite.constraints if isinstance(c, Drift))
    base = baseline_from_manifest(spark, mp, "trusted", drift.name, drift.nbins)
    assert sum(base) == good.count()

    # globally drifted corpus: every text doubled -> all partitions shift
    drifted = good.withColumn("text", F.concat("text", F.lit(" "), "text"))

    # pooled-rest drift (the default) is blind: partitions look alike
    r_pooled = transcript_suite().run(drifted)
    assert not any(m["drifted"] for m in r_pooled.partition_metrics)

    # baseline drift flags every partition
    cons = [
        Drift(expr=c.expr, bins=c.bins, psi_threshold=c.psi_threshold,
              ks_threshold=c.ks_threshold, name=c.name, baseline=base)
        if isinstance(c, Drift) else c
        for c in suite.constraints
    ]
    r_base = Suite(cons).run(drifted)
    assert all(m["drifted"] for m in r_base.partition_metrics)


def test_null_part_lands_in_quarantine_partition(spark):
    """Rows with NULL partition metadata (dirty data) must aggregate into
    quarantine partition -1, not crash the manifest/report with a
    None-keyed metric row."""
    from pyspark.sql import functions as F

    df = transcripts(spark, n_convs=40, seed=2187, n_parts=2).withColumn(
        "part", F.when(F.col("turn_idx") % 17 == 3, None).otherwise(F.col("part"))
    )
    res = transcript_suite().run(df)
    parts = {m["part"] for m in res.partition_metrics}
    assert -1 in parts and parts == {-1, 0, 1}
    assert res.summary()["n_rows"] == df.count()
    assert "  -1" in res.report()
    rv_parts = {r.part for r in res.row_verdicts.select("part").distinct().collect()}
    assert rv_parts == {-1, 0, 1}


def test_duplicate_constraint_names_rejected(spark):
    from dataval_spark.constraints.drift import Drift
    from dataval_spark.suite import Suite
    from pyspark.sql import functions as F

    e = lambda: F.length(F.col("text")).cast("double")  # noqa: E731
    with pytest.raises(ValueError, match="duplicate constraint names"):
        Suite([Drift(expr=e, bins=[0.0, 1.0, 2.0]), Drift(expr=e, bins=[0.0, 5.0, 9.0])])


def test_status_gate_without_flag_still_forces_rejection(spark):
    from dataval_spark.constraints.core import StatusGate
    from dataval_spark.suite import Suite

    from pyspark.sql import functions as F

    df = transcripts(spark, n_convs=30, seed=2187, n_parts=2).withColumn(
        "status",
        F.when(F.col("turn_idx") % 7 == 3, 4).otherwise(F.col("status")),
    )
    suite = Suite([StatusGate(flag=None)])
    res = suite.run(df)
    n_bad = df.where("status NOT IN (1, 3) OR status IS NULL").count()
    assert n_bad > 0
    assert res.summary()["n_rows"] - res.summary()["n_approved"] == n_bad


def test_notnull_gate_counts_empty_strings(spark):
    """Empty-string dirt must trip the max_rate partition gate exactly
    like NULL dirt (row flag and partition gate share one definition)."""
    from dataval_spark.constraints.core import NotNull
    from dataval_spark.quality import QualityFlag
    from dataval_spark.suite import Suite
    from pyspark.sql import functions as F

    base = transcripts(spark, n_convs=40, seed=2187, n_parts=1, with_defects=False)
    dirty = base.withColumn(
        "text", F.when(F.col("turn_idx") % 10 < 2, "").otherwise(F.col("text"))
    )
    suite = Suite([NotNull("text", flag=QualityFlag.InvalidText, max_rate=0.05)])
    res = suite.run(dirty)
    (m,) = res.partition_metrics
    assert m["null_rate_text"] > 0.05
    assert not m["passed"]
