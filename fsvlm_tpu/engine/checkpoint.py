"""Checkpoint save/load/resume.

Format parity with the reference contract (dassl/utils/torchtools.py:27-157,
SURVEY.md §5.4): per registered model name, a pickle of
{"state_dict": <numpy pytree>, "epoch": int, "optimizer": <numpy pytree>,
"val_result": float} at ``<dir>/<name>/model.pkl-<epoch>`` with a
``checkpoint`` pointer file naming the latest; best-val copies to
``model-best.pkl``.  (The reference's .pth.tar torch serialization is
replaced by pickled numpy pytrees — no torch dependency on the load path.)
"""

import os
import pickle
import shutil

import jax
import numpy as np

from ..utils import mkdir_if_missing


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state, save_dir, is_best=False, model_name=""):
    mkdir_if_missing(save_dir)
    state = dict(state)
    state["state_dict"] = _to_numpy_tree(state["state_dict"])
    for key in ("optimizer", "extra"):
        if state.get(key) is not None:
            state[key] = _to_numpy_tree(state[key])

    epoch = state["epoch"]
    # only regular epoch saves advance the resume pointer: a crash after a
    # best-val save must resume from the LATEST epoch, not the best one
    # (which would replay epochs and corrupt the epoch count)
    update_pointer = not model_name
    if not model_name:
        model_name = f"model.pkl-{epoch}"
    fpath = os.path.join(save_dir, model_name)
    with open(fpath, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"Checkpoint saved to {fpath}")

    if update_pointer:
        # pointer file consumed by resume_from_checkpoint
        with open(os.path.join(save_dir, "checkpoint"), "w") as f:
            f.write(os.path.basename(fpath))

    if is_best:
        shutil.copy(fpath, os.path.join(save_dir, "model-best.pkl"))
    return fpath


def load_checkpoint(fpath):
    if fpath is None or not os.path.exists(fpath):
        raise FileNotFoundError(f'File is not found at "{fpath}"')
    with open(fpath, "rb") as f:
        checkpoint = pickle.load(f)
    return checkpoint


def resume_from_checkpoint(fdir):
    """Read the pointer file and return the latest checkpoint dict, or None."""
    pointer = os.path.join(fdir, "checkpoint")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        model_name = f.read().strip()
    fpath = os.path.join(fdir, model_name)
    if not os.path.exists(fpath):
        return None
    print(f'Loading checkpoint from "{fpath}"')
    return load_checkpoint(fpath)
