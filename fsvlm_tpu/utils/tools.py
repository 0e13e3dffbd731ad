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


def device_probe(timeout_s=600):
    """True iff a tiny device op completes within `timeout_s` seconds.

    The axon TPU tunnel can wedge so that every buffer op hangs while
    jax.devices() still answers; probing with a real (tiny) computation
    under a timeout turns an infinite hang into a diagnosable failure.
    Shared by bench.py and the tools/bench_*.py drivers so wedge handling
    cannot drift between them.
    """
    import threading

    ok = {}

    def probe():
        import jax.numpy as jnp

        ok["v"] = float(jnp.ones((8, 8)).sum())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return "v" in ok


def enable_compile_cache(path="/root/.jax_compile_cache", min_secs=5.0):
    """Persistent XLA compile cache: remote (axon) compiles take minutes for
    the full two-tower program; repeat bench runs hit the cache.  CPU runs
    skip it — XLA:CPU AOT artifacts are machine-feature-specific, and
    loading one compiled on a different host risks SIGILL (it also spams
    feature-mismatch warnings)."""
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    except Exception:
        pass
