"""Ruff-as-test lint gate, modeled on the reference's tests/test_lint.py
(`ruff check .` must pass as part of the suite).

The build container has no ruff (and installs are forbidden there), so the
tests skip when the binary is absent; any environment that installs the
`dev` extra gets the full gate.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

pytestmark = pytest.mark.skipif(shutil.which("ruff") is None, reason="ruff not installed")


def test_ruff_check():
    result = subprocess.run(["ruff", "check", "."], capture_output=True, text=True)
    assert result.returncode == 0, f"`ruff check .` failed:\n{result.stdout}\n{result.stderr}"


def test_ruff_format():
    result = subprocess.run(["ruff", "format", "--check", "."], capture_output=True, text=True)
    assert result.returncode == 0, f"`ruff format --check .` failed:\n{result.stdout}\n{result.stderr}"


def test_pyflakes_no_errors():
    # Redundant with test_ruff_check (F rules) but kept separate so a lint
    # failure distinguishes "undefined name / unused import" (this test)
    # from style-class violations.
    result = subprocess.run(["ruff", "check", "--select", "F", "."], capture_output=True, text=True)
    assert result.returncode == 0, f"pyflakes-class violations:\n{result.stdout}\n{result.stderr}"
