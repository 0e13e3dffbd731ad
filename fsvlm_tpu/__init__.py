"""fsvlm_tpu: TPU-native few-shot prompt learning for vision-language models.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
PromptSRC-family prompt-learning stack (CoOp, CoCoOp, MaPLe, IVLP, PromptSRC,
PLIP, CLIP-LoRA, linear probe, zero-shot CLIP) under imbalanced few-shot
datasets.  Reference behavior documented in /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # honor the env var even when a sitecustomize force-set jax_platforms
    # programmatically (e.g. the axon TPU plugin overrides it to "axon,cpu");
    # lets JAX_PLATFORMS=cpu actually force CPU for tests/tools
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
