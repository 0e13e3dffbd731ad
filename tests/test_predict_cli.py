"""tools/predict.py: classify arbitrary image files with a trained model.

The reference's only inference surface is --eval-only over a registered
dataset split (PromptSRC/train.py:117-125); predict.py serves a trained
checkpoint over loose image files.  Covered here: the core predict()
loop (batch padding, top-k, prob normalization) and the CLI end-to-end
(train 1 epoch -> predict --model-dir -> JSONL)."""

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


def _write_images(d, n=5):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        arr = rng.randint(0, 255, (48, 40, 3), np.uint8)
        ext = ".jpg" if i % 2 else ".png"
        p = os.path.join(d, f"im{i}{ext}")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_predict_inprocess(tmp_path):
    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401
    from test_coop_end2end import make_cfg

    import predict as predict_mod

    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()

    paths = _write_images(str(tmp_path / "imgs"), n=5)
    # pred_batch 4 over 5 images exercises the pad-to-compiled-shape branch
    results = list(predict_mod.predict(t, cfg, paths, topk=3, pred_batch=4))
    assert [p for p, _ in results] == paths
    classnames = set(t.dm.lab2cname.values())
    for _, tk in results:
        assert len(tk) == 3
        names = [n for n, _ in tk]
        probs = [p for _, p in tk]
        assert set(names) <= classnames
        assert probs == sorted(probs, reverse=True)
        assert all(0.0 <= p <= 1.0 for p in probs)
    # full softmax over all classes sums to 1; top-3 can't exceed it
    assert sum(p for _, p in results[0][1]) <= 1.0 + 1e-6


def test_predict_int8_serving(tmp_path):
    """MODEL.QUANT_INT8 flows through predict(): the engine swaps the
    frozen visual tower for its int8 copy at first eval (engine/trainer.py
    _get_frozen_eval) and the CLI serves it like test() does."""
    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401
    from test_coop_end2end import make_cfg

    import predict as predict_mod

    cfg = make_cfg(tmp_path, **{
        "OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True, "MODEL.QUANT_INT8": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()

    paths = _write_images(str(tmp_path / "imgs"), n=2)
    results = list(predict_mod.predict(t, cfg, paths, topk=2, pred_batch=2))
    assert len(results) == 2
    from fsvlm_tpu.ops.quant import is_quantized

    assert is_quantized(
        t._get_frozen_eval()["clip"]["visual"]["blocks"]["attn"]["w_qkv"])
    for _, tk in results:
        assert all(0.0 <= p <= 1.0 for _, p in tk)


def test_predict_cli_end_to_end(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_dir = str(tmp_path / "run")
    common = [
        "--trainer", "CoOp", "--seed", "1",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/tests/synthetic_tiny.yaml",
    ]
    r = subprocess.run(
        [sys.executable, "train.py", *common, "--output-dir", out_dir,
         "OPTIM.MAX_EPOCH", "1", "TEST.NO_TEST", "True"],
        cwd=ROOT, capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    paths = _write_images(str(tmp_path / "imgs"), n=3)
    pred_file = str(tmp_path / "preds.jsonl")
    r = subprocess.run(
        [sys.executable, "tools/predict.py", *common,
         "--output-dir", str(tmp_path / "pred_out"),
         "--model-dir", out_dir, "--load-epoch", "1",
         "--topk", "2", "--pred-batch", "3",
         "--out", pred_file, "--images", str(tmp_path / "imgs")],
        cwd=ROOT, capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in open(pred_file)]
    assert len(lines) == 3
    assert [os.path.basename(l["path"]) for l in lines] == [
        os.path.basename(p) for p in paths]
    for l in lines:
        assert len(l["topk"]) == 2
        assert all(set(e) == {"label", "prob"} for e in l["topk"])
