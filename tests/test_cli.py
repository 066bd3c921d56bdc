"""CLI + sanity-fixture tests (the reversecomptest scenario of the
reference sanitytests/, driven through the real CLI)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "sanitytests", "reversecomptest.txt")

ENV = dict(
    os.environ,
    PYTHONPATH=REPO,
    JAX_PLATFORMS="cpu",
    PALLAS_AXON_POOL_IPS="",
)


def run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "bella_tpu.cli"] + args,
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=600,
    )


def test_reversecomp_sanity(tmp_path):
    out = tmp_path / "rc"
    r = run_cli(["-f", FIXTURE, "-o", str(out), "-k", "17", "-l", "2", "-u", "4"])
    assert r.returncode == 0, r.stderr
    rows = open(str(out) + ".out").read().splitlines()
    assert len(rows) == 1, rows
    v = rows[0].split("\t")
    # one pair, 'c' strand, full-length overlap
    assert v[0] == "fwd_read" and v[1] == "rc_read"
    assert v[5] == "c"
    assert int(v[4]) >= 990  # overlap ~ full 1000bp
    assert int(v[3]) >= 950  # near-perfect score


def test_skip_alignment_cli(tmp_path):
    out = tmp_path / "rc2"
    r = run_cli(
        ["-f", FIXTURE, "-o", str(out), "-k", "17", "-l", "2", "-u", "4",
         "--skip-alignment"]
    )
    assert r.returncode == 0, r.stderr
    rows = open(str(out) + ".out").read().splitlines()
    assert len(rows) == 1
    v = rows[0].split("\t")
    assert len(v) == 6
    assert int(v[3]) == 1000  # overlap estimate = full read length


def test_cli_missing_args():
    r = run_cli([])
    assert r.returncode == 2


def test_paf_cli(tmp_path):
    out = tmp_path / "rc3"
    r = run_cli(
        ["-f", FIXTURE, "-o", str(out), "-k", "17", "-l", "2", "-u", "4", "--paf"]
    )
    assert r.returncode == 0, r.stderr
    rows = open(str(out) + ".out").read().splitlines()
    assert len(rows) == 1
    v = rows[0].split("\t")
    assert len(v) == 12 and v[4] == "-"
