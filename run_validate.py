#!/usr/bin/env python
"""spark-submit entry point for the validation engine.

    spark-submit --py-files dataval_spark.zip run_validate.py \
        --input <table-path> [--manifest <path> --run-id <id>] [--validate]

Mirrors the reference's run_dataval.py deployable script; all flag
semantics live in dataval_spark.cli.
"""

import sys

from dataval_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
