"""CLI surface tests (subprocess, CPU)."""

import json
import os
import subprocess
import sys

import numpy as np

ENV = dict(os.environ, JAX_PLATFORMS="cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=420):
    return subprocess.run([sys.executable, "-m", "gsrt.cli", *args],
                          capture_output=True, text=True, env=ENV,
                          cwd=REPO, timeout=timeout)


def test_render_demo_scene(tmp_path):
    out = tmp_path / "demo.png"
    hm = tmp_path / "heat.png"
    r = run_cli("render", "--scene", "3DGS", "--width", "16", "--height",
                "16", "--mode", "fast", "--out", str(out),
                "--heatmap", str(hm), "--stats")
    assert r.returncode == 0, r.stderr[-800:]
    assert out.exists() and hm.exists()
    stats = json.loads([ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")][0])
    assert stats["n_splats"] == 2


def test_compare_identical(tmp_path):
    out = tmp_path / "a.png"
    run_cli("render", "--scene", "3DGS", "--width", "16", "--height", "16",
            "--mode", "fast", "--out", str(out))
    r = run_cli("compare", str(out), str(out))
    assert r.returncode == 0
    rec = json.loads(r.stdout.splitlines()[-1])
    assert rec["ssim"] == 1.0


def test_unknown_scene_fails_cleanly():
    r = run_cli("render", "--scene", "nonsense")
    assert r.returncode == 2
    assert "unknown" in r.stderr


def test_progressive_accumulator():
    from gsrt.utils.accumulate import ProgressiveAccumulator
    acc = ProgressiveAccumulator(gamma_correction=False)
    acc.add(np.full((4, 4, 3), 0.25), samples=1)
    acc.add(np.full((4, 4, 3), 0.75), samples=3)
    np.testing.assert_allclose(acc.image, 0.625)
    assert acc.total_samples == 4
    acc.reset()
    acc.add(np.ones((4, 4, 3)))
    np.testing.assert_allclose(acc.image, 1.0)
