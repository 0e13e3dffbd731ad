"""CLI end-to-end: train.py with the flagship PromptSRC on synthetic data,
checking the log contract the aggregation tooling scrapes."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, out_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, os.path.join(ROOT, "train.py")] + args,
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=env,
        timeout=600,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    return result.stdout


def test_cli_promptsrc_synthetic(tmp_path):
    out_dir = str(tmp_path / "out")
    stdout = run_cli(
        [
            "--trainer", "PromptSRC",
            "--seed", "1",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/tests/synthetic_tiny.yaml",
            "--output-dir", out_dir,
            "TRAINER.PROMPTSRC.PREC", "fp32",
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT", "2",
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION", "2",
            "OPTIM.MAX_EPOCH", "2",
        ],
        out_dir,
    )
    # evaluator block (parse_test_res contract)
    assert "=> result" in stdout
    assert "* accuracy:" in stdout
    assert "Classification Report" in stdout
    # log tee written
    assert os.path.exists(os.path.join(out_dir, "log.txt"))
    # checkpoint written under the registered model name
    assert os.path.exists(os.path.join(out_dir, "VLPromptLearner", "checkpoint"))

    # aggregation tool parses the log
    seed_dir = tmp_path / "agg" / "seed1"
    seed_dir.mkdir(parents=True)
    os.link(os.path.join(out_dir, "log.txt"), seed_dir / "log.txt")
    result = subprocess.run(
        [sys.executable, os.path.join(ROOT, "parse_test_res.py"), str(tmp_path / "agg")],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert result.returncode == 0
    assert "* accuracy:" in result.stdout


def test_cli_coop_simclr_override(tmp_path):
    """LOSS_TYPE simclr triggers the two-view loader override in the CLI
    (reference train.py:296-321 behavior)."""
    out_dir = str(tmp_path / "out")
    stdout = run_cli(
        [
            "--trainer", "CoOp",
            "--seed", "1",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/tests/synthetic_tiny.yaml",
            "--output-dir", out_dir,
            "TRAINER.COOP.LOSS_TYPE", "simclr",
            "OPTIM.MAX_EPOCH", "2",
            "TEST.NO_TEST", "True",
        ],
        out_dir,
    )
    assert "overriding train_loader_x with a two-view loader" in stdout
    assert "Finish training" in stdout


def test_cli_extra_opts_env(tmp_path):
    """FSVLM_EXTRA_OPTS appends config overrides after CLI opts (how the
    stock scripts/ drivers are re-targeted without edits)."""
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["FSVLM_EXTRA_OPTS"] = "OPTIM.MAX_EPOCH 1 TEST.NO_TEST True"
    result = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "train.py"),
            "--trainer", "CoOp",
            "--seed", "1",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/tests/synthetic_tiny.yaml",
            "--output-dir", out_dir,
            "OPTIM.MAX_EPOCH", "5",  # env override must win (applied after)
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=env,
        timeout=600,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    assert "MAX_EPOCH: 1" in result.stdout
    assert "Finish training" in result.stdout
