"""Build the ``--py-files`` archive for cluster submission.

The engine ships to a multi-executor cluster as a single zip on the
driver/executor PYTHONPATH::

    python -m dataval_spark.package -o dataval_spark.zip
    spark-submit --py-files dataval_spark.zip --master yarn \
        your_job.py --input s3://corpus/transcripts --validate

Python imports packages from zip archives natively (zipimport), so the
archive holds the package SOURCE tree rooted at ``dataval_spark/`` —
``.py`` files plus embedded data modules, no bytecode, no tests. The
walk is sorted and timestamps are pinned, so the same tree produces a
byte-identical archive — rebuilding on a clean checkout never invalidates
a cluster-side file-distribution cache keyed on content.

The reference distributes itself as an installed console-script package
(/root/reference/setup.py entry_points); this is the Spark-native
equivalent, where the unit of deployment is the job-attached archive
rather than a per-node install.
"""

from __future__ import annotations

import argparse
import os
import zipfile

__all__ = ["build_pyfiles_zip"]

# fixed timestamp inside the archive -> byte-identical rebuilds
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str, package_dir: str | None = None) -> list[str]:
    """Write the package zip to ``out_path``; return the archive names
    written (sorted). ``package_dir`` defaults to this installed
    package's own directory."""
    if package_dir is None:
        package_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(package_dir.rstrip(os.sep))
    root = os.path.dirname(package_dir)
    names: list[str] = []
    for dirpath, dirnames, filenames in os.walk(package_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            names.append(os.path.relpath(full, root))
    if f"{pkg_name}{os.sep}__init__.py".replace(os.sep, "/") not in [
        n.replace(os.sep, "/") for n in names
    ]:
        raise ValueError(f"{package_dir} is not a python package (no __init__.py)")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in names:
            with open(os.path.join(root, rel), "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return [n.replace(os.sep, "/") for n in names]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m dataval_spark.package",
        description="Build the spark-submit --py-files archive.",
    )
    ap.add_argument("-o", "--output", default="dataval_spark.zip")
    args = ap.parse_args(argv)
    names = build_pyfiles_zip(args.output)
    print(f"{args.output}: {len(names)} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
