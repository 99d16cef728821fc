"""Smoke tests: the runnable walkthroughs and the benchmark harness."""

import pathlib
import runpy
import sys

import pytest

_EXAMPLES = sorted(
    (pathlib.Path(__file__).parents[1] / "docs" / "examples").glob("0*.py")
)


class TestWalkthroughs:
    @pytest.mark.parametrize("path", _EXAMPLES, ids=lambda p: p.stem)
    def test_runs_and_asserts(self, path, capsys):
        runpy.run_path(str(path), run_name="__main__")
        assert "all checks passed" in capsys.readouterr().out


class TestBenchmarkHarness:
    def test_small_sweep_writes_csv(self, tmp_path, monkeypatch, capsys):
        from linalg_tpu.ops import benchmark_qr

        out = tmp_path / "bench_results.csv"
        monkeypatch.setattr(
            sys, "argv",
            ["benchmark_qr", "--sizes", "32x32", "--repeats", "1",
             "--out", str(out)],
        )
        benchmark_qr.main()
        text = out.read_text()
        header = text.splitlines()[0].split(",")
        assert header == ["kernel", "size", "sec", "sec/ref",
                          "residual/ref", "orth_err"]
        assert "HH-QR" in text and "MGS-QR" in text and "GE" in text
