"""FSVLM_SCAN_UNROLL is a pure lowering knob: unrolling k layers per scan
iteration must be numerically identical to the default one-layer body."""

import os

import numpy as np

from fsvlm_tpu.models.clip import ARCHS, encode_image, encode_text_embeds
from fsvlm_tpu.models.clip.convert import random_clip_params
from fsvlm_tpu.trainers.prompts import assemble_prompts, build_prompt_context

CLASSNAMES = ["cat", "golden retriever", "aircraft carrier"]


def _features(params, cfg, images, pc):
    tx = np.asarray(
        encode_text_embeds(
            params, cfg,
            assemble_prompts(pc["init_ctx"], pc["base_embed"], pc["ctx_scatter"]),
            pc["eot_idx"],
        )
    )
    im = np.asarray(encode_image(params, cfg, images))
    return tx, im


def test_unroll_is_numerically_identical():
    cfg = ARCHS["test-tiny"]
    params = random_clip_params(cfg, seed=0)
    pc = build_prompt_context(params, CLASSNAMES, n_ctx=4,
                              rng=np.random.RandomState(1))
    images = np.random.RandomState(2).randn(
        2, cfg.image_resolution, cfg.image_resolution, 3
    ).astype(np.float32)

    prev = os.environ.pop("FSVLM_SCAN_UNROLL", None)
    try:
        tx1, im1 = _features(params, cfg, images, pc)
        os.environ["FSVLM_SCAN_UNROLL"] = "3"
        tx3, im3 = _features(params, cfg, images, pc)
    finally:
        if prev is None:
            os.environ.pop("FSVLM_SCAN_UNROLL", None)
        else:
            os.environ["FSVLM_SCAN_UNROLL"] = prev

    np.testing.assert_allclose(tx3, tx1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(im3, im1, rtol=1e-6, atol=1e-6)
