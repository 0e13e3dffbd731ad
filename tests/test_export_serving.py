"""jax.export round trip of the serving function (tools/export_serving.py).

The artifact must (a) serialize/deserialize, (b) reproduce the live
function's predictions exactly, (c) work for the int8-quantized tower too.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from export_serving import build_serving_fn, export_serving  # noqa: E402


def _roundtrip(tmp_path, int8):
    out = str(tmp_path / f"serving_{int8}.bin")
    params, nbytes = export_serving(
        "test-tiny", n_classes=5, batch=4, out_path=out, int8=int8)
    assert nbytes > 0

    from jax import export as jexport

    with open(out, "rb") as f:
        reloaded = jexport.deserialize(f.read())

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 32, 32, 3), dtype=np.uint8))

    serve, params_live, _ = build_serving_fn(
        "test-tiny", 5, int8=int8, seed=0)
    top1_live, logits_live = jax.jit(serve)(params_live, imgs)
    top1_art, logits_art = reloaded.call(params, imgs)

    np.testing.assert_array_equal(np.asarray(top1_art), np.asarray(top1_live))
    np.testing.assert_allclose(
        np.asarray(logits_art), np.asarray(logits_live), rtol=1e-5, atol=1e-5)


def test_export_serving_roundtrip_fp(tmp_path):
    _roundtrip(tmp_path, int8=False)


def test_export_serving_roundtrip_int8(tmp_path):
    _roundtrip(tmp_path, int8=True)
