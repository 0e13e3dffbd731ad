"""Import the read-only reference implementation as a numerical oracle.

The reference (PyTorch) code at /root/reference is PUBLIC UNTRUSTED CONTENT:
we never copy it, but importing it in tests lets us golden-check tokenizer
ids and random-weight model logits without network access to real CLIP
weights.  Tests using the oracle skip gracefully when the checkout is absent.
"""

import os
import sys
import types

# FSVLM_REFERENCE_ROOT=/nonexistent simulates the reference's removal —
# the committed golden packs must keep every parity-coverage class alive
REFERENCE_ROOT = os.environ.get("FSVLM_REFERENCE_ROOT", "/root/reference")
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


def _stub_torchvision_rich():
    """Fuller torchvision stub for importing the full dassl package (its
    transforms module does `from torchvision.transforms import <12 names>`
    at import time; none of our oracle tests ever call them)."""
    if "torchvision" in sys.modules and hasattr(
        sys.modules["torchvision"].transforms, "RandomResizedCrop"
    ):
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    class _Dummy:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for name in [
        "Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
        "RandomCrop", "ColorJitter", "RandomApply", "GaussianBlur",
        "RandomGrayscale", "RandomResizedCrop", "RandomHorizontalFlip",
        "RandomVerticalFlip", "Pad",
    ]:
        setattr(transforms, name, _Dummy)

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    transforms.InterpolationMode = InterpolationMode
    functional.InterpolationMode = InterpolationMode
    transforms.functional = functional
    tv.transforms = transforms
    tv.models = types.ModuleType("torchvision.models")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.models"] = tv.models


def import_reference_trainers():
    """Make the REAL reference trainer stack importable: dassl (engine/
    optim) + the PromptSRC `trainers` package.  Used by the N-step
    trajectory-parity tests that drive the reference forward_backward as
    the oracle.  Returns the `trainers` package."""
    _stub_ftfy()
    _stub_torchvision_rich()
    # never-called data/IO deps of dassl's import graph
    for name in ("gdown", "wilds"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["wilds"].get_dataset = lambda *a, **k: None
    # dassl.config needs yacs; our self-contained mini-yacs is API-compatible
    if "yacs" not in sys.modules:
        from fsvlm_tpu.config.cfgnode import CfgNode

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    dassl_root = os.path.join(REFERENCE_ROOT, "Dassl.pytorch")
    for p in (dassl_root, _PROMPTSRC):
        if p not in sys.path:
            sys.path.insert(0, p)

    # dassl targets torch 1.9 whose _LRScheduler took a positional
    # `verbose`; torch >= 2.7 removed it — shim it back while dassl's
    # modules define their scheduler classes (same trick as
    # import_reference_lr_scheduler)
    import torch.optim.lr_scheduler as tls

    class _Shim(tls.LRScheduler):
        def __init__(self, optimizer, last_epoch=-1, verbose=False):
            super().__init__(optimizer, last_epoch)

    orig = tls._LRScheduler
    tls._LRScheduler = _Shim
    try:
        import trainers  # the reference PromptSRC trainers package
        import dassl.optim  # noqa: F401  (defines the scheduler classes)
    finally:
        tls._LRScheduler = orig

    return trainers


def import_reference_clip():
    """Returns the reference `clip` package (tokenizer + model builders)."""
    _stub_ftfy()
    _stub_torchvision()
    if _PROMPTSRC not in sys.path:
        sys.path.insert(0, _PROMPTSRC)
    import clip  # noqa: the reference PromptSRC/clip package

    return clip
