"""Smoke the stock scripts/ protocol drivers end-to-end on synthetic data.

Every driver accepts OUT_ROOT (output prefix), CFG (config name, resolved
relative to the trainer's config dir), and FSVLM_EXTRA_OPTS (appended
config overrides) so the reference protocols run unmodified offline.
Covers the imbalanced base2new_fewshot train->test chain
(reference scripts/promptsrc/base2new_fewshot_{train,test}.sh), the LoRA
regularized-validation driver (scripts/lora/main_val.sh), and the
subsampled zero-shot driver (scripts/zsclip/zeroshot_sub.sh).
"""

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = "../tests/synthetic_tiny"  # resolves from any trainer's config dir

pytestmark = pytest.mark.slow


def run_script(script, args, extra_env, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    result = subprocess.run(
        ["bash", os.path.join(ROOT, script)] + args,
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=env,
        timeout=timeout,
    )
    assert result.returncode == 0, (
        script + "\n" + result.stdout[-3000:] + result.stderr[-3000:]
    )
    return result.stdout


def test_base2new_fewshot_chain(tmp_path):
    """Train on all classes with an imbalanced shot list, then evaluate the
    checkpoint on the new class half — the fork's flagship protocol."""
    out_root = str(tmp_path / "out")
    env = {
        "OUT_ROOT": out_root,
        "CFG": TINY,
        "LOADEP": "2",
        "FSVLM_EXTRA_OPTS": (
            "OPTIM.MAX_EPOCH 2 TRAINER.PROMPTSRC.PREC fp32 "
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT 2 "
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION 2"
        ),
    }
    shots = "[4,4,4,4,1,1,1,1]"  # synthetic has 8 classes
    stdout = run_script(
        "scripts/promptsrc/base2new_fewshot_train.sh",
        ["synthetic", "1", shots], env,
    )
    assert "Finish training" in stdout
    train_dir = os.path.join(
        out_root, "base2new/train_all/synthetic/shots_-2/PromptSRC",
        TINY + "/seed1",
    )
    assert os.path.isdir(os.path.normpath(train_dir))

    stdout = run_script(
        "scripts/promptsrc/base2new_fewshot_test.sh",
        ["synthetic", "1", shots], env,
    )
    assert "=> result" in stdout
    assert "* accuracy:" in stdout
    # the new-half eval sees only the second half of the classes
    assert "SUBSAMPLE_CLASSES: new" in stdout


def test_reproduce_base2novel_roundtrip(tmp_path):
    """The reproduce driver replays a 'published' torch checkpoint: train
    tiny PromptSRC on the base half, export to the reference checkpoint
    layout (<weightspath>/base/seed1/VLPromptLearner/model.pth.tar-2), then
    scripts/promptsrc/reproduce_base2novel_setting.sh imports it and
    evaluates base + novel (reference reproduce_base2novel_setting.sh)."""
    out_root = str(tmp_path / "out")
    env = {
        "OUT_ROOT": out_root,
        "CFG": TINY,
        "LOADEP": "2",
        "FSVLM_EXTRA_OPTS": (
            "OPTIM.MAX_EPOCH 2 TRAINER.PROMPTSRC.PREC fp32 "
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT 2 "
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION 2"
        ),
    }
    stdout = run_script(
        "scripts/promptsrc/base2new_train.sh", ["synthetic", "1"], env
    )
    assert "Finish training" in stdout

    ckpt = os.path.normpath(os.path.join(
        out_root, "base2new/train_base/synthetic/shots_16/PromptSRC",
        TINY, "seed1", "VLPromptLearner", "model.pkl-2",
    ))
    assert os.path.exists(ckpt)

    weightspath = tmp_path / "published"
    torch_dir = weightspath / "base" / "seed1" / "VLPromptLearner"
    os.makedirs(torch_dir)
    exported = torch_dir / "model.pth.tar-2"
    env_cpu = dict(os.environ, JAX_PLATFORMS="cpu")
    import subprocess as sp
    import sys

    r = sp.run(
        [sys.executable, os.path.join(ROOT, "tools", "import_torch_prompts.py"),
         ckpt, "--trainer", "PromptSRC", "--export", str(exported)],
        capture_output=True, text=True, timeout=600, env=env_cpu,
    )
    assert r.returncode == 0, r.stderr[-1500:]

    stdout = run_script(
        "scripts/promptsrc/reproduce_base2novel_setting.sh",
        ["synthetic", "1", str(weightspath)], env, timeout=1200,
    )
    assert stdout.count("=> result") == 2  # base + novel evals
    assert "SUBSAMPLE_CLASSES: new" in stdout
    assert "Imported PromptSRC prompt leaves" in stdout


def test_lora_main_val(tmp_path):
    """main_val.sh passes the LORA.*_LOSS_WEIGHT opts the reference script
    sets but whose keys the reference config never defines."""
    stdout = run_script(
        "scripts/lora/main_val.sh",
        ["synthetic", "1", "4", TINY],
        {
            "OUT_ROOT": str(tmp_path / "out"),
            "SAMPLER": "WeightedClassSampler",
            "FSVLM_EXTRA_OPTS": "OPTIM.MAX_EPOCH 1 TEST.NO_TEST True",
        },
    )
    assert "Finish training" in stdout
    assert "WeightedClassSampler" in stdout


def test_zeroshot_sub(tmp_path):
    stdout = run_script(
        "scripts/zsclip/zeroshot_sub.sh",
        ["synthetic", "base"],
        {
            "OUT_ROOT": str(tmp_path / "out"),
            "CFG": TINY,
            "BACKBONE": "test-tiny",
        },
    )
    assert "* accuracy:" in stdout
    assert "SUBSAMPLE_CLASSES: base" in stdout


def test_all_scripts_parse():
    """Every shipped driver parses (bash -n) — including the reference-named
    aliases and the fork's per-method train/test imbalanced drivers."""
    import glob

    scripts = glob.glob(
        os.path.join(ROOT, "scripts", "**", "*.sh"), recursive=True)
    assert len(scripts) >= 85, f"expected the full driver surface, got {len(scripts)}"
    for s in scripts:
        r = subprocess.run(["bash", "-n", s], capture_output=True, text=True)
        assert r.returncode == 0, f"{s}:\n{r.stderr}"


def _script_default_config_paths(text):
    """Resolve each driver's default --config-file path statically.

    Drivers assign config names via ``CFG=${3:-name}`` / ``CFG=${CFG:-name}``
    / ``CFG=name`` and reference them as
    ``--config-file configs/trainers/<T>/${CFG}.yaml``.  Returns the resolved
    paths whose variables all have static defaults (paths with positional
    holes like ``${DATASET}`` are skipped — those are exercised by the
    execution tests).
    """
    import re

    defaults = {}
    # nested positional/env defaults first: CFG=${3:-${CFG:-name}}
    for m in re.finditer(
        r"(?:^|;)\s*([A-Z_]+)=\$\{(?:[0-9]+|[A-Z_]+):-\$\{[A-Z_]+:-([^}$]*)\}\}",
        text, re.M,
    ):
        defaults.setdefault(m.group(1), m.group(2))
    for m in re.finditer(
        r"(?:^|;)\s*([A-Z_]+)=(?:\$\{(?:[0-9]+|[A-Z_]+):-([^}$]*)\}|([^$\s;]+))",
        text, re.M,
    ):
        defaults.setdefault(m.group(1), m.group(2) or m.group(3) or "")
    out = []
    for m in re.finditer(r"--config-file\s+(\S+)", text):
        path = m.group(1).strip('"')

        def sub(mm):
            return defaults.get(mm.group(1), mm.group(0))

        resolved = re.sub(r"\$\{?([A-Z_]+)\}?", sub, path)
        if "$" not in resolved:
            out.append(resolved)
    return out


def test_all_script_default_configs_exist():
    """Every driver's *default* --config-file path resolves to a yaml that
    ships (ADVICE r3: the reference's independent-vlp train.sh defaults to a
    _kd config it never ships — we ship the yaml so the driver works)."""
    import glob

    checked = 0
    for s in glob.glob(os.path.join(ROOT, "scripts", "**", "*.sh"),
                       recursive=True):
        with open(s) as f:
            text = f.read()
        for path in _script_default_config_paths(text):
            assert os.path.exists(os.path.join(ROOT, path)), (
                f"{s}: default --config-file {path} does not exist")
            checked += 1
    assert checked >= 40, f"resolver found only {checked} static config paths"


def test_fork_train_test_driver_chain(tmp_path):
    """The fork's 7-positional CoOp train/test drivers (reference
    scripts/coop/{train,test}.sh) run end-to-end offline: base-half
    training, then the eval-only reload through the shared directory
    contract."""
    out_root = str(tmp_path / "out")
    env = {
        "OUT_ROOT": out_root,
        "LOADEP": "1",
        "FSVLM_EXTRA_OPTS": "OPTIM.MAX_EPOCH 1 DATALOADER.TRAIN_X.BATCH_SIZE 8",
    }
    args = ["synthetic", "../tests/synthetic_tiny", "end", "4", "4", "False", "1"]
    stdout = run_script("scripts/coop/train.sh", args, env)
    assert "Finish training" in stdout
    stdout = run_script("scripts/coop/test.sh", args, env)
    assert "* accuracy:" in stdout
    assert "SUBSAMPLE_CLASSES: all" in stdout
