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
