"""--py-files archive: complete, importable from the zip, reproducible."""

from __future__ import annotations

import subprocess
import sys

from dataval_spark.package import build_pyfiles_zip


def test_zip_contains_package_tree(tmp_path):
    out = str(tmp_path / "dataval_spark.zip")
    names = build_pyfiles_zip(out)
    assert "dataval_spark/__init__.py" in names
    assert "dataval_spark/suite.py" in names
    assert "dataval_spark/operators/dedup.py" in names
    assert "dataval_spark/sources/layout.py" in names
    assert not [n for n in names if "__pycache__" in n or not n.endswith(".py")]


def test_zip_importable_like_an_executor(tmp_path):
    """Executors import from the archive via zipimport — prove a clean
    interpreter with ONLY the zip on sys.path resolves the package and
    its submodules (pyspark itself comes from the normal environment)."""
    out = str(tmp_path / "dataval_spark.zip")
    build_pyfiles_zip(out)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import dataval_spark, dataval_spark.operators.mixing as m\n"
        "assert dataval_spark.__file__.startswith(sys.argv[1]), dataval_spark.__file__\n"
        "assert callable(m.assign_split)\n"
        "print('OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, out], capture_output=True, text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_zip_reproducible(tmp_path):
    a, b = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    build_pyfiles_zip(a)
    build_pyfiles_zip(b)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_cli_entrypoint(tmp_path):
    out = str(tmp_path / "pkg.zip")
    r = subprocess.run(
        [sys.executable, "-m", "dataval_spark.package", "-o", out],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "files" in r.stdout
