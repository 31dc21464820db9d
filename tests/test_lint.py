"""Ruff-as-test lint gate, modeled on the reference's tests/test_lint.py
(`ruff check .` must pass as part of the suite).

The build container has no ruff and cannot fetch one — the per-round
install attempt and its failure are committed as
tools/ruff_install_attempt.log (the delta-spark evidence precedent), so
the three ruff tests skip with that pointer; any environment that installs
the `dev` extra gets the full gate. test_stdlib_compile_gate below is the
in-sandbox fallback that ALWAYS runs: every source file must parse and
byte-compile, which catches the syntax-error class of lint failure with
zero third-party dependencies.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

_RUFF_SKIP = pytest.mark.skipif(
    shutil.which("ruff") is None,
    reason="ruff not installed (install attempt failed: tools/ruff_install_attempt.log)",
)


@_RUFF_SKIP
def test_ruff_check():
    result = subprocess.run(["ruff", "check", "."], capture_output=True, text=True)
    assert result.returncode == 0, f"`ruff check .` failed:\n{result.stdout}\n{result.stderr}"


@_RUFF_SKIP
def test_ruff_format():
    result = subprocess.run(["ruff", "format", "--check", "."], capture_output=True, text=True)
    assert result.returncode == 0, f"`ruff format --check .` failed:\n{result.stdout}\n{result.stderr}"


@_RUFF_SKIP
def test_pyflakes_no_errors():
    # Redundant with test_ruff_check (F rules) but kept separate so a lint
    # failure distinguishes "undefined name / unused import" (this test)
    # from style-class violations.
    result = subprocess.run(["ruff", "check", "--select", "F", "."], capture_output=True, text=True)
    assert result.returncode == 0, f"pyflakes-class violations:\n{result.stdout}\n{result.stderr}"


def test_stdlib_compile_gate():
    # In-sandbox fallback (always runs): every source file must compile to
    # an AST. Catches the syntax-error lint class without ruff and writes
    # nothing to disk; the style/F-rule classes remain gated on the three
    # tests above.
    import ast
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    targets = [root / f for f in ("bench.py", "__spark_entry__.py", "setup.py")]
    for rel in ("phabricator_etl_spark", "tests", "tools"):
        targets.extend(sorted((root / rel).rglob("*.py")))
    failures = []
    for path in targets:
        try:
            ast.parse(path.read_text(), filename=str(path))
        except SyntaxError as e:
            failures.append(f"{path}: {e}")
    assert len(targets) > 50 and not failures, "\n".join(failures) or "too few files"
