"""Smoke tests for the analysis tools (interpret_prompt, parse_test_res)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_interpret_prompt_on_checkpoint(tmp_path):
    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401
    from test_coop_end2end import make_cfg

    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    ckpt = os.path.join(cfg.OUTPUT_DIR, "prompt_learner", "model.pkl-1")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "interpret_prompt.py"),
         ckpt, "--backbone", "test-tiny", "--topk", "3"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert result.returncode == 0, result.stderr[-1500:]
    assert "ctx[0]:" in result.stdout
    assert "Size of context:" in result.stdout


def test_interpret_prompt_deep_layers(tmp_path):
    """MaPLe/IVLP checkpoints carry per-layer deep text prompts; the tool
    walks them like the reference (interpret_prompt.py:50-62)."""
    import pickle

    import numpy as np

    ckpt = tmp_path / "model.pkl-1"
    state = {
        "ctx": np.zeros((2, 64), np.float32),
        "compound_text": np.zeros((3, 2, 64), np.float32),
    }
    with open(ckpt, "wb") as f:
        pickle.dump({"state_dict": state, "epoch": 1}, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "interpret_prompt.py"),
         str(ckpt), "--backbone", "test-tiny", "--topk", "2"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert result.returncode == 0, result.stderr[-1500:]
    assert "== input context ==" in result.stdout
    assert "== layer 4 context ==" in result.stdout


def test_bench_infer_smoke():
    """tools/bench_infer.py (serving-throughput bench) runs on CPU with the
    tiny arch and prints one JSON line per batch size."""
    import json

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_ARCH="test-tiny",
        BENCH_CLASSES="7",
        INFER_BATCHES="4",
        INFER_STEPS="2",
        INFER_INNER="2",
    )
    result = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "bench_infer.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert result.returncode == 0, result.stderr[-1500:]
    lines = [l for l in result.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["batch"] == 4 and rec["value"] > 0, rec
