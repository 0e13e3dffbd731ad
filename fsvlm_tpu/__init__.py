"""fsvlm_tpu: TPU-native few-shot prompt learning for vision-language models.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
PromptSRC-family prompt-learning stack (CoOp, CoCoOp, MaPLe, IVLP, PromptSRC,
PLIP, CLIP-LoRA, linear probe, zero-shot CLIP) under imbalanced few-shot
datasets.  Reference behavior documented in /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
