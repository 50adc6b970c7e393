#!/usr/bin/env python
"""Build dataval_spark.zip for spark-submit --py-files.

Usage:
    python package.py [out.zip]
    spark-submit --py-files dataval_spark.zip run_validate.py \
        --input s3://bucket/transcripts --manifest s3://bucket/manifest --run-id r1

(spark-submit takes a primary application FILE — run_validate.py is the
thin wrapper around dataval_spark.cli.main.)

Mirrors the reference's deployable-CLI contract (run_dataval.py /
run_package_release.py) for multi-executor clusters.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "dataval_spark.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(root, "dataval_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dataval_spark.zip"))
