"""Packaging surface: console entry points resolve and the wheel manifest
covers the native kernel sources.

Parity: the reference is run from a checkout (`README.md:33-47`); the TPU
framework additionally installs as `ccdm-tpu` with `ccdm-train`/`ccdm-eval`
console scripts (pyproject.toml).
"""

import importlib
import subprocess
import sys
import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_entry_points_resolve():
    with open(REPO / "pyproject.toml", "rb") as f:
        cfg = tomllib.load(f)
    scripts = cfg["project"]["scripts"]
    assert set(scripts) == {"ccdm-train", "ccdm-eval"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))


def test_native_sources_ship_in_package_data():
    with open(REPO / "pyproject.toml", "rb") as f:
        cfg = tomllib.load(f)
    globs = cfg["tool"]["setuptools"]["package-data"]["ccdm_tpu.native"]
    assert "*.cpp" in globs and "Makefile" in globs
    assert (REPO / "ccdm_tpu/native/confusion_matrix.cpp").exists()


def test_root_shims_run_help():
    for shim in ("ccdm_train.py", "ccdm_eval.py"):
        out = subprocess.run(
            [sys.executable, str(REPO / shim), "--help"],
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        assert "params_file" in out.stdout
