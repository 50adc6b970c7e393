"""Per-partition lineage manifest + resumable runs.

Analog of the reference's release-manifest resume loop: re-runs anti-join
away already-processed work and report "Nothing to process"
(/root/reference/run_package_release.py:262-268,196-198), with incremental
commits (:283-317) and a settings-consistency guard (:229-236).

Here the unit of resumable work is a verdict partition (``part``): after
each partition group is validated, one manifest row
``(run_id, suite_hash, part, n_rows, n_approved, passed, metrics_json)``
is appended. A resumed run with the same (run_id, suite_hash) skips
partitions already present; a different suite_hash for the same run_id is
rejected (settings guard). Storage is partitioned Parquet — the TableIO
seam (sources/tableio.py) swaps in an Iceberg catalog when the runtime jar
is on the classpath, giving snapshot-atomic appends; with plain Parquet we
keep appends atomic per-file and idempotent by keying on (run_id, part).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataval_spark.suite import Suite, ValidationResult

MANIFEST_SCHEMA = (
    "run_id string, suite_hash string, part int, n_rows long, "
    "n_approved long, n_rejected long, passed boolean, metrics_json string"
)


def suite_hash(suite: Suite) -> str:
    """Deterministic fingerprint of the full suite configuration —
    every constraint's parameters (bounds, thresholds, domains, bins),
    not just names — so resuming a run under changed settings is
    refused (the reference's settings-consistency guard,
    /root/reference/run_package_release.py:229-236)."""
    desc = json.dumps(
        [c.identity() for c in suite.constraints]
        + [{"mask": suite.default_mask, "reject_ratio": suite.reject_ratio_fail,
            "part_col": suite.part_col, "conv_col": suite.conv_col,
            "order_col": suite.order_col, "ts_col": suite.ts_col}],
        sort_keys=True,
    )
    return hashlib.sha1(desc.encode()).hexdigest()[:16]


def read_manifest(spark: SparkSession, path: str) -> DataFrame | None:
    """None only when the manifest genuinely does not exist yet. Works
    for remote paths (s3://, hdfs://) by asking Spark, not os.path;
    any OTHER read failure (permissions, corruption) propagates — a
    swallowed error here would silently disable resume AND the
    settings guard."""
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


def completed_parts(spark: SparkSession, path: str, run_id: str, shash: str) -> set[int]:
    m = read_manifest(spark, path)
    if m is None:
        return set()
    mine = m.where(F.col("run_id") == run_id)
    hashes = [r.suite_hash for r in mine.select("suite_hash").distinct().collect()]
    if hashes and any(h != shash for h in hashes):
        raise ValueError(
            f"manifest {path} run_id={run_id} was written by a different suite "
            f"(suite_hash {hashes} != {shash}) — refusing to mix results"
        )
    return {r.part for r in mine.select("part").distinct().collect()}


def run_resumable(
    spark: SparkSession,
    df: DataFrame,
    suite: Suite,
    manifest_path: str,
    run_id: str,
    verdicts_path: str | None = None,
) -> ValidationResult | None:
    """Validate only partitions not yet in the manifest; append results.

    Returns None when nothing is left to process (idempotent re-run).
    """
    shash = suite_hash(suite)
    done = completed_parts(spark, manifest_path, run_id, shash)
    if done:
        df = df.where(~F.col(suite.part_col).isin(*done))
        if df.limit(1).count() == 0:
            return None

    # persist the flagged frame when verdicts are also written: the
    # metrics collect and the verdicts write would otherwise each pay the
    # full scan + window shuffle
    result = suite.run(df, persist=bool(verdicts_path))
    if not result.partition_metrics:
        return None

    rows = [
        {
            "run_id": run_id,
            "suite_hash": shash,
            "part": int(m["part"]),
            "n_rows": int(m["n_rows"]),
            "n_approved": int(m["n_approved"]),
            "n_rejected": int(m["n_rejected"]),
            "passed": bool(m["passed"]),
            "metrics_json": json.dumps(
                {k: v for k, v in m.items() if isinstance(v, (int, float, bool, str))},
                default=str,
            ),
        }
        for m in result.partition_metrics
    ]
    # COMMIT ORDER: verdicts first, manifest last. The manifest append is
    # what marks partitions done; writing it first would let a crash
    # between the two writes permanently skip the verdicts on re-run.
    if verdicts_path:
        result.row_verdicts.write.mode("append").partitionBy(suite.part_col).parquet(
            verdicts_path
        )
    spark.createDataFrame(rows, schema=MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(manifest_path)
    return result
