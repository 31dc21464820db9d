"""Hygiene gate: no internal/non-public URLs or package-index hostnames in tracked files.

Round-8 incident: a pip install-failure log was committed verbatim and carried the
hostname of a private package index (first LEAKCHECK hit in four rounds; scrubbed
from the working tree and from git history in round 9 — see tools/LEAK_SCRUB_NOTE.md).
This test makes the working-tree half of that gate permanent: every URL in every
tracked text file must resolve to a known-public host, and install logs must never
embed a "Looking in indexes:" line pointing anywhere (redact before committing).
"""
from __future__ import annotations

import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Public hosts that may legitimately appear in docs/code. Anything else fails.
PUBLIC_HOST_ALLOWLIST = {
    "www.apache.org",
    "apache.org",
    "spark.apache.org",
    "archive.apache.org",
    "github.com",
    "raw.githubusercontent.com",
    "pypi.org",
    "files.pythonhosted.org",
    "arxiv.org",
    "duckdb.org",
    "docs.python.org",
    "example.com",  # plus any subdomain, handled below
    "localhost",
}

# Substrings that indicate private infrastructure no matter the TLD.
INTERNAL_INDICATORS = ("corp.", ".internal", "intranet", "-virtual/simple")

URL_RE = re.compile(r"https?://([A-Za-z0-9._-]+)")

# Inverted filter (r9 advisor): scan EVERY tracked file except known-binary
# suffixes, so extensionless files (Makefile, Dockerfile, LICENSE, scripts)
# cannot escape the permanent leak gate. Binary content is additionally
# detected by a NUL probe below.
BINARY_SUFFIXES = {".parquet", ".png", ".jpg", ".jpeg", ".gif", ".ico", ".zip",
                   ".gz", ".whl", ".so", ".pyc", ".jar", ".db", ".bin", ".pdf"}


def _tracked_text_files() -> list[Path]:
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.splitlines()
    files = []
    for f in out:
        if Path(f).suffix.lower() in BINARY_SUFFIXES:
            continue
        p = REPO / f
        try:
            if b"\x00" in p.read_bytes()[:8192]:  # binary content regardless of name
                continue
        except OSError:
            continue
        files.append(p)
    return files


def _host_ok(host: str) -> bool:
    host = host.lower().rstrip(".")
    if host in PUBLIC_HOST_ALLOWLIST:
        return True
    # allow subdomains of explicitly-public domains (e.g. hg.example.com)
    return any(host.endswith("." + base) for base in PUBLIC_HOST_ALLOWLIST)


def test_all_urls_point_at_public_hosts():
    bad: list[str] = []
    for path in _tracked_text_files():
        try:
            text = path.read_text(errors="replace")
        except OSError:
            continue
        for lineno, line in enumerate(text.splitlines(), 1):
            for match in URL_RE.finditer(line):
                host = match.group(1)
                if not _host_ok(host):
                    bad.append(f"{path.relative_to(REPO)}:{lineno}: {host}")
    assert not bad, "non-public URL hostnames in tracked files:\n" + "\n".join(bad)


def test_no_internal_infrastructure_indicators():
    bad: list[str] = []
    for path in _tracked_text_files():
        if path.name == "test_hygiene_no_internal_refs.py":
            continue  # the indicator list itself
        try:
            text = path.read_text(errors="replace")
        except OSError:
            continue
        for lineno, line in enumerate(text.splitlines(), 1):
            lowered = line.lower()
            if "example." in lowered:  # fictional fixture hosts like db.example.internal
                continue
            for ind in INTERNAL_INDICATORS:
                if ind in lowered:
                    bad.append(f"{path.relative_to(REPO)}:{lineno}: contains {ind!r}")
    assert not bad, "internal-infrastructure indicators in tracked files:\n" + "\n".join(bad)


def test_install_logs_redact_index_lines():
    """pip's 'Looking in indexes:' echoes the configured index URL — the exact
    round-8 leak vector. Install-failure evidence logs must redact that value."""
    bad: list[str] = []
    for path in (REPO / "tools").glob("*_install_attempt.log"):
        for lineno, line in enumerate(path.read_text(errors="replace").splitlines(), 1):
            if "Looking in indexes:" in line and "redacted" not in line.lower():
                bad.append(f"{path.relative_to(REPO)}:{lineno}")
    assert not bad, "unredacted pip index lines in install logs:\n" + "\n".join(bad)
