#!/usr/bin/env python
"""Separate-executor-JVM scaling measurement (see BENCH/BASELINE.md,
"Separate-executor-JVM pairing").

Runs the full transcript constraint suite on the bench_scaling.py input
at local-cluster[1,4] (4 cores, one executor JVM) vs local-cluster[4,4]
(16 cores, four executor JVMs): unlike local[N]'s in-process exchange,
cross-executor shuffle here crosses JVM boundaries over localhost TCP,
so the pairing includes the serialization + transport cost a real
cluster pays — the closest this sandbox gets to "N vs 4N executors".

Usage: python bench_scaling_cluster.py   (expects bench_scaling.py's
input at $SPARK_GRAFT_BENCH_INPUT, default /tmp/dataval_bench_input_v2;
run bench_scaling.py first to generate it)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

INPUT = os.environ.get("SPARK_GRAFT_BENCH_INPUT", "/tmp/dataval_bench_input_v2")
SAMPLES = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
REPO = os.path.dirname(os.path.abspath(__file__))


def run_once(execs: int, cores_per: int = 4, mem: str = "6g") -> dict:
    code = f"""
import json, sys, time, glob
sys.path.insert(0, {REPO!r})
from dataval_spark.session import get_spark
from dataval_spark.suite import transcript_suite
spark = get_spark(app_name="lc_bench",
                  master="local-cluster[{execs},{cores_per},8192]",
                  shuffle_partitions={2 * execs * cores_per},
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                              "spark.executor.memory": "{mem}",
                              "spark.ui.enabled": "false"}})
spark.range(1_000_000).selectExpr("sum(id)").collect()   # JVM warm-up
one = sorted(glob.glob({INPUT!r} + "/part-*.parquet"))[0]
transcript_suite().run(spark.read.parquet(one))          # codegen warm-up
df = spark.read.parquet({INPUT!r})
t0 = time.perf_counter()
res = transcript_suite().run(df)
wall = time.perf_counter() - t0
n = sum(m["n_rows"] for m in res.partition_metrics)
print("RESULT " + json.dumps({{"execs": {execs}, "wall": round(wall, 2),
      "rows": n, "tps": round(n / wall)}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main() -> None:
    samples: dict[int, list[float]] = {1: [], 4: []}
    for rnd in range(SAMPLES):
        for execs in (1, 4):  # interleaved so host drift hits both
            r = run_once(execs)
            samples[execs].append(r["wall"])
            print(json.dumps({"round": rnd, **r}), flush=True)
    w1, w4 = min(samples[1]), min(samples[4])
    print(json.dumps({
        "pairing": "local-cluster 1x4 -> 4x4 (4 -> 16 cores, "
                   "separate executor JVMs)",
        "walls_1x4": samples[1],
        "walls_4x4": samples[4],
        "efficiency": round((w1 / w4) / 4, 3),
    }))


if __name__ == "__main__":
    main()
