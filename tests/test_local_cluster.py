"""The spark-submit --py-files story on a REAL multi-executor topology:
``local-cluster[2,4,...]`` launches two separate executor JVMs (own
heaps, own Python workers — unlike local[N]'s single JVM), which is the
closest this sandbox gets to the north rule's multi-executor cluster.

The driver process deliberately does NOT have the repo on sys.path for
the executor side of the work: the package reaches executors only
through the built --py-files archive (addPyFile), and the stateful
streaming kernel — a module-level function pickled BY REFERENCE — forces
each executor's Python worker to genuinely ``import
dataval_spark.streaming.stateful`` from the zip. Verdicts must be
byte-identical to the same job on local[8].
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from dataval_spark.package import build_pyfiles_zip

_JOB = textwrap.dedent(
    """
    import json, sys
    zip_path, master = sys.argv[1], sys.argv[2]
    sys.path.insert(0, zip_path)  # driver imports from the ARCHIVE too
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local-cluster"):
        b = b.config("spark.executor.memory", "1500m")
    spark = b.appName("pyfiles-e2e").getOrCreate()
    spark.sparkContext.addPyFile(zip_path)  # ships to every executor

    from dataval_spark.fixtures import transcripts
    from dataval_spark.suite import transcript_suite
    import pyspark.sql.functions as F

    df = transcripts(spark, n_convs=160, seed=99, n_parts=4)

    # 1) batch suite: JVM-distributed wide aggregation across executors
    res = transcript_suite().run(df)
    verdicts = sorted(
        (r.part, r.passed, r.n_rows)
        for r in res.partition_verdicts.select(
            "part", "passed", "n_rows"
        ).collect()
    )

    # 2) Python on the EXECUTORS: extract_features' mapInPandas closure
    #    references the module-global _fake_feature, which cloudpickle
    #    serializes BY REFERENCE — each executor python worker must
    #    'import dataval_spark.operators.multimodal' from the shipped
    #    zip. This is the real --py-files contract, not just driver
    #    imports.
    from dataval_spark.operators.multimodal import extract_features
    media = spark.range(64).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias("payload"),
    ).repartition(8)
    feats = sorted(
        (int(r.media_id), int(r.n_bytes), r.checksum)
        for r in extract_features(media).collect()
    )
    print("RESULT " + json.dumps({"verdicts": verdicts, "feats": feats}))
    spark.stop()
    """
)


@pytest.mark.slow
def test_pyfiles_zip_on_local_cluster_matches_local(tmp_path):
    zip_path = str(tmp_path / "dataval_spark.zip")
    build_pyfiles_zip(zip_path)
    env = dict(os.environ)
    # the subprocess driver must NOT see the repo: only the zip
    env["PYTHONPATH"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(master):
        out = subprocess.run(
            [sys.executable, "-c", _JOB, zip_path, master],
            capture_output=True,
            text=True,
            timeout=420,
            env=env,
            cwd=str(tmp_path),  # not the repo dir: '' on sys.path must not find it
        )
        assert out.returncode == 0, out.stderr[-3000:]
        lines = [
            ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")
        ]
        assert lines, out.stdout[-2000:]
        import json

        return json.loads(lines[-1][len("RESULT "):])

    cluster = run("local-cluster[2,4,2048]")
    local = run("local[8]")
    assert cluster == local
    assert len(cluster["verdicts"]) == 4
