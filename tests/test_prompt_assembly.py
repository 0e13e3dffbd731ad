"""Prompt assembly golden tests: the scatter-einsum construction must equal
the reference's concatenation logic (coop.py:262-305) for all class-token
positions, including CSC, plus end-to-end text-feature parity for a
CoOp-style prompt against the torch oracle."""

import numpy as np
import pytest

from fsvlm_tpu.models.clip.tokenizer import get_tokenizer, tokenize
from fsvlm_tpu.trainers.prompts import assemble_prompts, build_prompt_context
from reference_oracle import reference_available

CLASSNAMES = ["cat", "golden retriever", "aircraft carrier", "forest"]


def _expected_prompts(token_embedding, ctx, position, n_ctx):
    """Direct re-statement of PromptLearner.forward (coop.py:262-305)."""
    tok = get_tokenizer()
    names = [n.replace("_", " ") for n in CLASSNAMES]
    name_lens = [len(tok.encode(n)) for n in names]
    prompt_prefix = " ".join(["X"] * n_ctx)
    ids = tokenize([prompt_prefix + " " + n + "." for n in names])
    emb = token_embedding[ids]  # (C, 77, D)
    prefix = emb[:, :1]
    suffix = emb[:, 1 + n_ctx :]
    if ctx.ndim == 2:
        ctx = np.broadcast_to(ctx, (len(names), n_ctx, ctx.shape[-1]))

    out = []
    for i in range(len(names)):
        nl = name_lens[i]
        if position == "end":
            rows = [prefix[i], ctx[i], suffix[i]]
        elif position == "middle":
            h = n_ctx // 2
            rows = [prefix[i], ctx[i, :h], suffix[i, :nl], ctx[i, h:], suffix[i, nl:]]
        else:  # front
            rows = [prefix[i], suffix[i, :nl], ctx[i], suffix[i, nl:]]
        out.append(np.concatenate(rows, axis=0))
    return np.stack(out), ids


@pytest.mark.parametrize("position", ["end", "middle", "front"])
@pytest.mark.parametrize("csc", [False, True])
def test_scatter_assembly_matches_concat(position, csc):
    rng = np.random.RandomState(0)
    D = 32
    token_embedding = rng.randn(49408, D).astype(np.float32) * 0.02
    clip_params = {"text": {"token_embedding": token_embedding}}

    n_ctx = 4
    pc = build_prompt_context(
        clip_params,
        CLASSNAMES,
        n_ctx=n_ctx,
        class_token_position=position,
        csc=csc,
        rng=np.random.RandomState(1),
    )
    ctx = pc["init_ctx"]
    got = np.asarray(assemble_prompts(ctx, pc["base_embed"], pc["ctx_scatter"]))
    expected, ids = _expected_prompts(token_embedding, np.asarray(ctx), position, n_ctx)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    # EOT position must be position-invariant
    np.testing.assert_array_equal(pc["eot_idx"], ids.argmax(-1))


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
def test_coop_text_features_match_oracle():
    """End-to-end: assembled CoOp prompts through our text tower ==
    the oracle CLIP consuming the same concatenated prompt embeddings."""
    import torch

    from reference_oracle import import_reference_clip

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip import clip_params_from_state_dict, encode_text_embeds

    torch.manual_seed(0)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2, design).eval()
    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))

    pc = build_prompt_context(params, CLASSNAMES, n_ctx=4,
                              rng=np.random.RandomState(3))
    prompts = np.asarray(
        assemble_prompts(pc["init_ctx"], pc["base_embed"], pc["ctx_scatter"])
    )

    # oracle: TextEncoder path = pos-emb + transformer + ln + EOT @ proj
    with torch.no_grad():
        x = torch.from_numpy(prompts) + model.positional_embedding
        x = model.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = model.ln_final(x)
        eot = torch.from_numpy(pc["eot_idx"]).long()
        ref = (x[torch.arange(x.shape[0]), eot] @ model.text_projection).numpy()

    ours = np.asarray(
        encode_text_embeds(params, cfg, prompts, pc["eot_idx"])
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
