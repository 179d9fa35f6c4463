"""CLI smoke tests (the reference CI runs ``chimeralm -h``)."""

import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "chimeralm_tpu", *args],
        capture_output=True,
        text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "PYTHONPATH": "."},
        cwd=".",
    )


def test_cli_help():
    out = _run("-h")
    assert out.returncode == 0, out.stderr
    assert "predict" in out.stdout and "filter" in out.stdout and "web" in out.stdout


def test_cli_version():
    out = _run("--version")
    assert out.returncode == 0
    assert "chimeralm" in out.stdout


def test_cli_banner():
    out = _run("-h")
    assert "Genomic Language Model" in out.stdout


def test_cli_filter_requires_args():
    out = _run("filter")
    assert out.returncode != 0


def test_cli_tools_passthrough():
    out = _run("tools", "query")
    assert out.returncode == 0, out.stderr
    assert "Hello, world!" in out.stdout
