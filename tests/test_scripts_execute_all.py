"""Execute EVERY shipped driver end-to-end on synthetic data (slow tier).

tests/test_scripts_smoke.py smokes representative chains; this module is the
completeness tier (VERDICT r3 item 7): every `.sh` under scripts/ invokes
train.py (or its tool) at least once in CI, on the synthetic dataset with the
tiny CLIP, through the same OUT_ROOT / CFG / FSVLM_EXTRA_OPTS / LOADEP
contract real runs use.  Drivers that hardcode a real dataset (xd_*,
imagenet.sh, ...) run with their dataset yaml and an appended
``DATASET.NAME Synthetic`` override — the CLI surface, config resolution,
and directory contract are exactly the production ones.

``test_every_driver_is_executed_somewhere`` pins the inventory: adding a new
driver without wiring a CI execution fails the suite.

Run time: ~35 train.py invocations; marked ``slow`` —
``pytest -m "not slow"`` skips the tier (see CLAUDE.md test lanes).
"""

import glob
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = "../tests/synthetic_tiny"  # resolves from any trainer's config dir

pytestmark = pytest.mark.slow

# tiny-model overrides appended after every driver's own opts (train.py
# consumes FSVLM_EXTRA_OPTS last, so these win)
BASE_OPTS = (
    "MODEL.BACKBONE.NAME test-tiny MODEL.BACKBONE.PRETRAINED False "
    "INPUT.SIZE [32,32] DATASET.NAME Synthetic "
    "OPTIM.MAX_EPOCH 1 OPTIM.WARMUP_EPOCH 0 "
    "DATALOADER.TRAIN_X.BATCH_SIZE 8 DATALOADER.TEST.BATCH_SIZE 8 "
    "TRAIN.PRINT_FREQ 100 TEST.FINAL_MODEL last_step "
    "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT 2 "
    "TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION 2 "
    "TRAINER.IVLP.PROMPT_DEPTH_TEXT 2 TRAINER.IVLP.PROMPT_DEPTH_VISION 2 "
    "TRAINER.MAPLE.PROMPT_DEPTH 2"
)

# every driver this module executes (paths relative to repo root);
# scripts also covered by test_scripts_smoke.py are listed in SMOKED.
EXECUTED = set()

SMOKED = {
    "scripts/promptsrc/base2new_fewshot_train.sh",
    "scripts/promptsrc/base2new_fewshot_test.sh",
    "scripts/promptsrc/base2new_train.sh",
    "scripts/promptsrc/reproduce_base2novel_setting.sh",
    "scripts/lora/main_val.sh",
    "scripts/zsclip/zeroshot_sub.sh",
    "scripts/coop/train.sh",
    "scripts/coop/test.sh",
}

# sourced/exec'd indirectly by the family drivers executed here
INDIRECT = {
    "scripts/_lib/base2new_fewshot.sh",  # via */base2new_fewshot_{train,test}.sh
    "scripts/_lib/base2new_test.sh",     # via */base2new_test.sh
}

# download helper: network-gated by design (gdown), cannot execute in CI
EXCLUDED = {"scripts/datasets/visda17.sh"}


def mark(script):
    EXECUTED.add(script)
    return os.path.join(ROOT, script)


def run(script, args, env_extra, timeout=900, extra_opts=""):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["CFG"] = TINY
    env["LOADEP"] = "1"
    env["FSVLM_EXTRA_OPTS"] = (BASE_OPTS + " " + extra_opts).strip()
    env.update(env_extra)
    r = subprocess.run(
        ["bash", mark(script)] + [str(a) for a in args],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=timeout,
    )
    assert r.returncode == 0, (
        f"{script} {args}\n--- stdout:\n{r.stdout[-3000:]}\n--- stderr:\n"
        f"{r.stderr[-3000:]}"
    )
    return r.stdout


def export_torch(out_root, ckpt_rel, trainer, dest):
    """Export an fsvlm checkpoint to the reference torch layout (the input
    the reproduce_* drivers take)."""
    ckpt = os.path.normpath(os.path.join(out_root, ckpt_rel))
    assert os.path.exists(ckpt), ckpt
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "import_torch_prompts.py"),
         ckpt, "--trainer", trainer, "--export", dest],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]


# --------------------------------------------------------------------------
# CoOp family


def test_coop_drivers(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out, "SEEDS": "1", "SHOTS": "2", "SHOT_SWEEP": "2",
           "NCTX": "4"}
    # main.sh <dataset> <shots> [config]: trains output/synthetic/CoOp/...
    assert "Finish training" in run(
        "scripts/coop/main.sh", ["synthetic", 2, TINY], env)
    # instance drivers reuse main.sh with the dataset pinned; DATASET.NAME
    # Synthetic (BASE_OPTS) redirects the loader while the real dataset
    # yaml + directory contract are exercised
    for s in ("imagenet", "fgvc_aircraft", "pets"):
        assert "Finish training" in run(f"scripts/coop/{s}.sh", [], env)
    # eval.sh <dataset> [config]: loads the imagenet-trained prompt above
    assert "accuracy" in run(
        "scripts/coop/eval.sh", ["synthetic", TINY], env)
    # few-shot sweep (bounded to one shot count via SHOT_SWEEP)
    assert "Finish training" in run(
        "scripts/coop/few_shot.sh", ["synthetic", 1, TINY], env)


def test_coop_base2new_chain(tmp_path):
    env = {"OUT_ROOT": str(tmp_path / "out")}
    assert "Finish training" in run(
        "scripts/coop/base2new_train.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/coop/base2new_test.sh", ["synthetic", 1], env)


def test_coop_base2new_fewshot_chain(tmp_path):
    env = {"OUT_ROOT": str(tmp_path / "out")}
    shots = "[2,2,2,2,1,1,1,1]"
    assert "Finish training" in run(
        "scripts/coop/base2new_fewshot_train.sh", ["synthetic", 1, shots], env)
    assert "* accuracy:" in run(
        "scripts/coop/base2new_fewshot_test.sh", ["synthetic", 1, shots], env)


def test_imbalance_sweeps(tmp_path):
    env = {"OUT_ROOT": str(tmp_path / "out"), "TAIL_SWEEP": "1",
           "SETTING_B_PAIRS": "2 1"}
    # coop wrappers exec the generic scripts/imbalance drivers
    mark("scripts/imbalance/run_setting_a.sh")
    mark("scripts/imbalance/run_setting_b.sh")
    assert "Finish training" in run(
        "scripts/coop/run_setting_a.sh", ["synthetic", 1, TINY, 4, 4], env)
    assert "Finish training" in run(
        "scripts/coop/run_setting_b.sh", ["synthetic", 1, TINY, 4, 4], env)


# --------------------------------------------------------------------------
# CoCoOp family


def test_cocoop_drivers(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out, "SHOTS": "2"}
    assert "Finish training" in run(
        "scripts/cocoop/train.sh", ["synthetic", 1, TINY], env)
    assert "* accuracy:" in run(
        "scripts/cocoop/test.sh", ["synthetic", 1, TINY], env)
    assert "Finish training" in run(
        "scripts/cocoop/main.sh", ["synthetic", 1, 2, TINY], env)
    # cross-dataset: train on (synthetic-overridden) imagenet, eval elsewhere
    assert "Finish training" in run("scripts/cocoop/xd_train.sh", [1], env)
    assert "* accuracy:" in run(
        "scripts/cocoop/xd_test.sh", ["synthetic", 1], env)


def test_cocoop_base2new_chains(tmp_path):
    env = {"OUT_ROOT": str(tmp_path / "out")}
    assert "Finish training" in run(
        "scripts/cocoop/base2new_train.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/cocoop/base2new_test.sh", ["synthetic", 1], env)
    shots = "[2,2,2,2,1,1,1,1]"
    assert "Finish training" in run(
        "scripts/cocoop/base2new_fewshot_train.sh",
        ["synthetic", 1, shots], env)
    assert "* accuracy:" in run(
        "scripts/cocoop/base2new_fewshot_test.sh",
        ["synthetic", 1, shots], env)


# --------------------------------------------------------------------------
# MaPLe family


def test_maple_drivers(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out, "SHOTS": "2"}
    assert "Finish training" in run(
        "scripts/maple/train.sh", ["synthetic", 1, TINY], env)
    assert "* accuracy:" in run(
        "scripts/maple/test.sh", ["synthetic", 1, TINY], env)
    assert "Finish training" in run(
        "scripts/maple/main.sh", ["synthetic", 1, 2, TINY], env)


def test_maple_base2new_and_reproduce(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out}
    assert "Finish training" in run(
        "scripts/maple/base2new_train.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/maple/base2new_test.sh", ["synthetic", 1], env)
    shots = "[2,2,2,2,1,1,1,1]"
    assert "Finish training" in run(
        "scripts/maple/base2new_fewshot_train.sh", ["synthetic", 1, shots],
        env)
    assert "* accuracy:" in run(
        "scripts/maple/base2new_fewshot_test.sh", ["synthetic", 1, shots],
        env)
    # reference-named aliases drive the same canonical scripts
    assert "Finish training" in run(
        "scripts/maple/base2new_train_maple.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/maple/base2new_test_maple.sh", ["synthetic", 1], env)

    # reproduce: export the just-trained checkpoint to the published torch
    # layout, then replay it
    weights = tmp_path / "published"
    export_torch(
        out,
        f"base2new/train_base/synthetic/shots_16/MaPLe/{TINY}/seed1/"
        "MultiModalPromptLearner/model.pkl-1",
        "MaPLe",
        str(weights / "base" / "seed1" / "MultiModalPromptLearner"
            / "model.pth.tar-1"),
    )
    stdout = run("scripts/maple/reproduce_maple.sh",
                 ["synthetic", 1, str(weights)], env)
    assert stdout.count("=> result") == 2  # base + novel


def test_maple_xd_chain(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out}
    assert "Finish training" in run("scripts/maple/xd_train.sh", [1], env)
    assert "* accuracy:" in run(
        "scripts/maple/xd_test.sh", ["synthetic", 1], env)
    assert "Finish training" in run(
        "scripts/maple/xd_train_maple.sh", [1], env)
    assert "* accuracy:" in run(
        "scripts/maple/xd_test_maple.sh", ["synthetic", 1], env)

    weights = tmp_path / "published_xd"
    export_torch(
        out,
        f"imagenet/MaPLe/{TINY}_16shots/seed1/"
        "MultiModalPromptLearner/model.pkl-1",
        "MaPLe",
        str(weights / "seed1" / "MultiModalPromptLearner" / "model.pth.tar-1"),
    )
    assert "=> result" in run(
        "scripts/maple/reproduce_maple_xd.sh",
        ["synthetic", 1, str(weights)], env)


# --------------------------------------------------------------------------
# IVLP family


def test_ivlp_drivers(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out, "SHOTS": "2", "SETTING_B_PAIRS": "2 1"}
    assert "Finish training" in run(
        "scripts/independent-vlp/train.sh", ["synthetic", 1, TINY], env)
    assert "* accuracy:" in run(
        "scripts/independent-vlp/test.sh", ["synthetic", 1, TINY], env)
    assert "Finish training" in run(
        "scripts/independent-vlp/main.sh", ["synthetic", 1, 2, TINY], env)
    mark("scripts/imbalance/run_setting_b.sh")
    assert "Finish training" in run(
        "scripts/independent-vlp/run_setting_b.sh",
        ["synthetic", 1, TINY, 4, 4], env)


def test_ivlp_base2new_and_reproduce(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out}
    assert "Finish training" in run(
        "scripts/independent-vlp/base2new_train.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/independent-vlp/base2new_test.sh", ["synthetic", 1], env)
    assert "Finish training" in run(
        "scripts/independent-vlp/base2new_train_ivlp.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/independent-vlp/base2new_test_ivlp.sh", ["synthetic", 1], env)
    shots = "[2,2,2,2,1,1,1,1]"
    assert "Finish training" in run(
        "scripts/independent-vlp/base2new_fewshot_train.sh",
        ["synthetic", 1, shots], env)
    assert "* accuracy:" in run(
        "scripts/independent-vlp/base2new_fewshot_test.sh",
        ["synthetic", 1, shots], env)

    weights = tmp_path / "published"
    export_torch(
        out,
        f"base2new/train_base/synthetic/shots_16/IVLP/{TINY}/seed1/"
        "VLPromptLearner/model.pkl-1",
        "IVLP",
        str(weights / "base" / "seed1" / "VLPromptLearner" / "model.pth.tar-1"),
    )
    stdout = run("scripts/independent-vlp/reproduce_ivlp.sh",
                 ["synthetic", 1, str(weights)], env)
    assert stdout.count("=> result") == 2


# --------------------------------------------------------------------------
# PromptSRC family (base2new chains live in test_scripts_smoke.py)


def test_promptsrc_fewshot_and_sweeps(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out, "SEEDS": "1", "SETTING_B_PAIRS": "2 1"}
    # the base2new train leg is smoked in test_scripts_smoke; the test leg
    # runs here against a fresh train
    assert "Finish training" in run(
        "scripts/promptsrc/base2new_train.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/promptsrc/base2new_test.sh", ["synthetic", 1], env)
    assert "Finish training" in run(
        "scripts/promptsrc/few_shot.sh", ["synthetic", 2], env)
    mark("scripts/imbalance/run_setting_b.sh")
    assert "Finish training" in run(
        "scripts/promptsrc/run_setting_b.sh", ["synthetic", 1, TINY, 4, 4], env)

    # reproduce_few_shot replays the few_shot checkpoint through the
    # published torch layout (<weights>/<K>shot/seed<S>/VLPromptLearner)
    weights = tmp_path / "published_fs"
    export_torch(
        out,
        f"synthetic/PromptSRC/{TINY}_2shots/seed1/"
        "VLPromptLearner/model.pkl-1",
        "PromptSRC",
        str(weights / "2shot" / "seed1" / "VLPromptLearner"
            / "model.pth.tar-1"),
    )
    assert "=> result" in run(
        "scripts/promptsrc/reproduce_few_shot.sh",
        ["synthetic", 2, 1, str(weights)], env)


def test_promptsrc_xd_chain(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out, "DG_DATASETS": "imagenetv2"}
    assert "Finish training" in run("scripts/promptsrc/xd_train.sh", [1], env)
    assert "* accuracy:" in run(
        "scripts/promptsrc/xd_test.sh", ["synthetic", 1], env)
    # DG suite loops xd_test over the shift datasets (bounded to one here);
    # the imagenetv2 yaml resolves, the loader is the synthetic override
    assert "* accuracy:" in run(
        "scripts/promptsrc/xd_eval_dg_suite.sh", [1], env)

    weights = tmp_path / "published_xd"
    export_torch(
        out,
        f"imagenet/PromptSRC/{TINY}_16shots/seed1/"
        "VLPromptLearner/model.pkl-1",
        "PromptSRC",
        str(weights / "seed1" / "VLPromptLearner" / "model.pth.tar-1"),
    )
    assert "=> result" in run(
        "scripts/promptsrc/reproduce_xd.sh", ["synthetic", 1, str(weights)],
        env)


# --------------------------------------------------------------------------
# PLIP / LoRA


def test_plip_drivers(tmp_path):
    # no SHOTS env: base2new train legs hardcode shots_16 (reference
    # behavior) while the test legs honor SHOTS — an override would split
    # the chain's directory contract
    env = {"OUT_ROOT": str(tmp_path / "out")}
    assert "Finish training" in run(
        "scripts/plip/main.sh", ["synthetic", 1, 2, TINY], env)
    assert "Finish training" in run(
        "scripts/plip/base2new_train.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/plip/base2new_test.sh", ["synthetic", 1], env)


def test_lora_drivers(tmp_path):
    env = {"OUT_ROOT": str(tmp_path / "out")}  # no SHOTS env (see plip note)
    assert "Finish training" in run(
        "scripts/lora/main.sh", ["synthetic", 1, 2, TINY], env)
    assert "Finish training" in run(
        "scripts/lora/base2new_train.sh", ["synthetic", 1], env)
    assert "* accuracy:" in run(
        "scripts/lora/base2new_test.sh", ["synthetic", 1], env)


# --------------------------------------------------------------------------
# Linear probe


def test_linear_probe_drivers(tmp_path):
    out = str(tmp_path / "out")
    env = {"OUT_ROOT": out, "SHOTS": "2", "BACKBONE": "test-tiny"}
    env_b2n = {"OUT_ROOT": out, "BACKBONE": "test-tiny"}  # see plip note
    assert "Finish training" in run(
        "scripts/linear_probe/train.sh",
        ["synthetic", "test-tiny", "ce", 1], env)
    assert "* accuracy:" in run(
        "scripts/linear_probe/test.sh",
        ["synthetic", "test-tiny", "ce", 1], env)
    assert "Finish training" in run(
        "scripts/linear_probe/main.sh", ["synthetic", 1, 2, TINY], env)
    assert "Finish training" in run(
        "scripts/linear_probe/base2new_train.sh", ["synthetic", 1], env_b2n)
    assert "* accuracy:" in run(
        "scripts/linear_probe/base2new_test.sh", ["synthetic", 1], env_b2n)
    # instance drivers (dataset pinned, synthetic override)
    for s in ("aircraft", "imagenet", "pets"):
        assert "Finish training" in run(
            f"scripts/linear_probe/{s}.sh", [], env)


# --------------------------------------------------------------------------
# lpclip / zsclip


def test_lpclip_chain(tmp_path):
    env = {"OUT_ROOT": str(tmp_path / "out")}
    stdout = run("scripts/lpclip/feat_extractor.sh",
                 ["synthetic", "test-tiny", 2, 1], env)
    assert "val acc" in stdout or "test acc" in stdout.lower()
    stdout = run("scripts/lpclip/linear_probe.sh",
                 ["synthetic", "test-tiny", 2, 1], env)
    assert "acc" in stdout.lower()


def test_zsclip_zeroshot(tmp_path):
    env = {"OUT_ROOT": str(tmp_path / "out")}
    assert "* accuracy:" in run(
        "scripts/zsclip/zeroshot.sh", ["synthetic", "test-tiny"], env)


# --------------------------------------------------------------------------
# Completeness gate


def test_every_driver_is_executed_somewhere():
    """The union of this module's executions + the smoke-test chains +
    indirect libraries covers every shipped driver (minus the download
    helper, excluded with its reason above).  Order-independent: coverage
    is read statically from this module's source (every `run()` call names
    its script as a literal, and f-string loops expand over literal
    tuples), so the gate holds even when run in isolation."""
    import re

    src = open(os.path.abspath(__file__)).read()
    referenced = set(re.findall(r"scripts/[\w./-]+\.sh", src))
    # expand the f-string loops: scripts/coop/{imagenet,fgvc_aircraft,pets},
    # scripts/linear_probe/{aircraft,imagenet,pets}
    for fam, names in (("coop", ("imagenet", "fgvc_aircraft", "pets")),
                       ("linear_probe", ("aircraft", "imagenet", "pets"))):
        for n in names:
            referenced.add(f"scripts/{fam}/{n}.sh")

    all_scripts = {
        os.path.relpath(p, ROOT)
        for p in glob.glob(os.path.join(ROOT, "scripts", "**", "*.sh"),
                           recursive=True)
    }
    covered = referenced | SMOKED | INDIRECT | EXCLUDED
    missing = sorted(all_scripts - covered)
    assert not missing, (
        "drivers shipped but never executed in CI — wire them into "
        f"test_scripts_execute_all.py: {missing}")
    stale = sorted(covered - all_scripts)
    assert not stale, f"coverage table references deleted drivers: {stale}"
