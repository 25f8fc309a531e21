"""Every example program must run clean (the reference builds and runs its
tests/examples/sample_*.cpp in CI; bench_tests.cmake does the same for the
benchmark drivers). Run in-process so the jax import is shared."""

import runpy
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).parent.parent / "examples").glob("sample_*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=[p.stem for p in EXAMPLES])
def test_example_runs(path, capsys):
    sys.path.insert(0, str(path.parent))
    try:
        runpy.run_path(str(path), run_name="__main__")
    finally:
        sys.path.remove(str(path.parent))
    out = capsys.readouterr().out
    assert "FAIL" not in out
