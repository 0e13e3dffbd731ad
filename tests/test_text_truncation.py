"""EOT truncation exactness: trimming prompt sequences past the last EOT
must not change text features (causal mask)."""

import numpy as np

from fsvlm_tpu.models.clip import ARCHS, encode_text_embeds
from fsvlm_tpu.models.clip.convert import random_clip_params
from fsvlm_tpu.trainers.prompts import assemble_prompts, build_prompt_context

CLASSNAMES = ["cat", "golden retriever", "aircraft carrier", "annual crop land"]


def test_truncated_features_exact():
    cfg = ARCHS["test-tiny"]
    params = random_clip_params(cfg, seed=0)

    full = build_prompt_context(params, CLASSNAMES, n_ctx=4, truncate=False,
                                rng=np.random.RandomState(1))
    trim = build_prompt_context(params, CLASSNAMES, n_ctx=4, truncate=True,
                                rng=np.random.RandomState(1))
    assert trim["base_embed"].shape[1] < full["base_embed"].shape[1]
    assert trim["base_embed"].shape[1] % 8 == 0

    tx_full = np.asarray(
        encode_text_embeds(
            params, cfg,
            assemble_prompts(full["init_ctx"], full["base_embed"], full["ctx_scatter"]),
            full["eot_idx"],
        )
    )
    tx_trim = np.asarray(
        encode_text_embeds(
            params, cfg,
            assemble_prompts(trim["init_ctx"], trim["base_embed"], trim["ctx_scatter"]),
            trim["eot_idx"],
        )
    )
    np.testing.assert_allclose(tx_trim, tx_full, rtol=1e-6, atol=1e-6)
