"""Import the read-only reference implementation as a numerical oracle.

The reference (PyTorch) code at /root/reference is PUBLIC UNTRUSTED CONTENT:
we never copy it, but importing it in tests lets us golden-check tokenizer
ids and random-weight model logits without network access to real CLIP
weights.  Tests using the oracle skip gracefully when the checkout is absent.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"
_PROMPTSRC = os.path.join(REFERENCE_ROOT, "PromptSRC")


def reference_available():
    return os.path.isdir(_PROMPTSRC)


def _stub_ftfy():
    """The reference tokenizer imports ftfy (not installed here).  The stub
    delegates to fsvlm_tpu's vendored equivalent (models/clip/textfix.py),
    whose behavior is pinned to ftfy's published examples by
    tests/test_textfix.py — so oracle tokenizer-parity tests exercise the
    non-ASCII/mojibake path with realistic fix_text semantics."""
    if "ftfy" not in sys.modules:
        from fsvlm_tpu.models.clip.textfix import fix_text

        mod = types.ModuleType("ftfy")
        mod.fix_text = fix_text
        sys.modules["ftfy"] = mod


def _stub_torchvision():
    """The reference clip/clip.py imports torchvision transforms at module
    level; our tests never call the preprocessing pipeline, so dummies are
    enough to satisfy the import."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class _Dummy:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for name in ["Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"]:
        setattr(transforms, name, _Dummy)

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    transforms.InterpolationMode = InterpolationMode
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def import_reference_lr_scheduler():
    """Load dassl/optim/lr_scheduler.py standalone (it only needs torch) so
    schedule tests can drive the REAL warmup-wrapper + successor pair."""
    import importlib.util

    import torch.optim.lr_scheduler as tls

    path = os.path.join(
        REFERENCE_ROOT, "Dassl.pytorch", "dassl", "optim", "lr_scheduler.py"
    )
    spec = importlib.util.spec_from_file_location("dassl_lr_scheduler", path)
    mod = importlib.util.module_from_spec(spec)

    # the reference targets torch 1.9 whose _LRScheduler took a positional
    # `verbose`; torch >= 2.7 removed it — shim it back for the exec
    class _Shim(tls.LRScheduler):
        def __init__(self, optimizer, last_epoch=-1, verbose=False):
            super().__init__(optimizer, last_epoch)

    orig = tls._LRScheduler
    tls._LRScheduler = _Shim
    try:
        spec.loader.exec_module(mod)
    finally:
        tls._LRScheduler = orig
    return mod


def import_reference_clip():
    """Returns the reference `clip` package (tokenizer + model builders)."""
    _stub_ftfy()
    _stub_torchvision()
    if _PROMPTSRC not in sys.path:
        sys.path.insert(0, _PROMPTSRC)
    import clip  # noqa: the reference PromptSRC/clip package

    return clip
