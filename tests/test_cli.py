"""CLI end-to-end: headless fly-path render on a tiny synthetic scene."""

import json
import os

import numpy as np
import pytest

from gswt_renderer_tpu.viewer import cli


def test_cli_render_headless(tmp_path):
    fp = [
        dict(timestamp=0.0, position_x=0.0, position_y=0.0, position_z=5.0,
             target_x=0.0, target_y=5.0, target_z=1.0),
        dict(timestamp=0.5, position_x=1.0, position_y=1.0, position_z=5.0,
             target_x=1.0, target_y=6.0, target_z=1.0),
    ]
    fp_path = tmp_path / "path.json"
    fp_path.write_text(json.dumps(fp))
    out_dir = tmp_path / "frames"
    cli.main([
        "render",
        "--fly-path", str(fp_path),
        "--out", str(out_dir),
        "--size", "64x64",
        "--half", "1",
        "--surface", "none",
        "--merge", "none",
        "--tile-sort", "distance",
        "--synth-lods", "2",
        "--synth-splats", "32",
        "--fps", "4",
        "--sync",
    ])
    frames = sorted(os.listdir(out_dir))
    assert len(frames) >= 1
    data = (out_dir / frames[0]).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_bench_headless(tmp_path, capsys):
    cli.main([
        "bench",
        "--size", "64x64",
        "--half", "1",
        "--surface", "none",
        "--merge", "none",
        "--tile-sort", "distance",
        "--synth-lods", "2",
        "--synth-splats", "32",
        "--sync",
    ])
    out = capsys.readouterr().out
    assert "fps" in out and "\\pm" in out


def test_bench_dense_only_dispatch(monkeypatch, capsys):
    """bench.py --dense-only W H must parse argv, run _dense_row, and print
    its dict as the LAST stdout line (the contract main()'s subprocess
    wrapper parses — a hung/slow dense compile is bounded by the child's
    timeout instead of killing the run, the round-4 failure shape)."""
    import importlib.util
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(root, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    calls = {}

    def fake_dense(width, height, n_frames=64):
        calls["wh"] = (width, height)
        return {"fps": 3.5, "frame_ms": 285.7}

    monkeypatch.setattr(bench, "_dense_row", fake_dense)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--dense-only", "320", "200"])
    bench._dense_only_main()
    assert calls["wh"] == (320, 200)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == {"fps": 3.5, "frame_ms": 285.7}
