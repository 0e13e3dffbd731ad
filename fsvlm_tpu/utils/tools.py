"""Misc utilities (parity: dassl/utils/tools.py)."""

import errno
import json
import os
import random

import numpy as np


def set_random_seed(seed):
    """Seed python & numpy RNGs (parity: dassl/utils/tools.py:72-76).

    JAX randomness is explicit (jax.random.PRNGKey(seed) threaded through the
    code), so unlike the torch reference there is no global device RNG to
    seed here; the same cfg.SEED feeds the PRNGKey at trainer build time.
    """
    random.seed(seed)
    np.random.seed(seed)


def mkdir_if_missing(dirname):
    if dirname == "":
        return
    try:
        os.makedirs(dirname, exist_ok=True)
    except OSError as e:  # pragma: no cover
        if e.errno != errno.EEXIST:
            raise


def check_isfile(fpath):
    isfile = os.path.isfile(fpath)
    if not isfile:
        print(f'No file found at "{fpath}"')
    return isfile


def read_json(fpath):
    with open(fpath, "r") as f:
        return json.load(f)


def write_json(obj, fpath):
    mkdir_if_missing(os.path.dirname(fpath))
    with open(fpath, "w") as f:
        json.dump(obj, f, indent=4, separators=(",", ": "))


def read_image(path):
    """Read an image as an RGB PIL.Image, retrying on transient IO errors
    (parity: dassl/utils/tools.py:109-118)."""
    from PIL import Image

    if not os.path.exists(path):
        raise IOError(f'No file exists at "{path}"')
    while True:
        try:
            img = Image.open(path).convert("RGB")
            return img
        except IOError:
            print(f'Cannot read image from "{path}", probably due to heavy IO. Will re-try.')


def listdir_nohidden(path, sort=False):
    items = [f for f in os.listdir(path) if not f.startswith(".")]
    if sort:
        items.sort()
    return items


def collect_env_info():
    """Environment summary printed at startup (parity: tools.py:121-129)."""
    import platform

    import jax

    lines = [
        f"python: {platform.python_version()}",
        f"jax: {jax.__version__}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"default_backend: {jax.default_backend()}",
    ]
    return "\n".join(lines)
