"""Analytic FLOP model invariants (fsvlm_tpu/utils/flops.py) — the bench
and roofline denominators hang off these inventories."""

from fsvlm_tpu.models.clip import ARCHS
from fsvlm_tpu.utils import flops as F

CFG = ARCHS["ViT-B/16"]


def test_promptsrc_teacher_lanes_ordering():
    per_step = F.promptsrc_step_flops(CFG, 48, 100, 10)
    cached = F.promptsrc_step_flops(CFG, 48, 100, 10, teacher="cached")
    int8 = F.promptsrc_step_flops(CFG, 48, 100, 10, teacher="int8")
    # cached drops the whole per-step teacher forward; int8 keeps the same
    # GEMM count (rate difference lives in the ceiling, not the count)
    assert cached < per_step
    assert int8 == per_step


def test_cocoop_chunking_preserves_total_text_flops():
    """Chunk boundaries must not change how much text-tower work the step
    does (modulo the remat recompute, tested separately): full-batch vs
    chunk=100 vs an uneven chunk=96 agree once remat is off."""
    full = F.cocoop_step_flops(CFG, 32, 500, 10, chunk=0, remat=False)
    even = F.cocoop_step_flops(CFG, 32, 500, 10, chunk=100, remat=False)
    uneven = F.cocoop_step_flops(CFG, 32, 500, 10, chunk=96, remat=False)
    assert full == even == uneven


def test_cocoop_remat_counts_text_forward_twice():
    no_remat = F.cocoop_step_flops(CFG, 32, 500, 10, chunk=100, remat=False)
    remat = F.cocoop_step_flops(CFG, 32, 500, 10, chunk=100, remat=True)
    text_fwd = F.total_flops(F.text_gemms(CFG, 32 * 500, 10, backward=False))
    assert remat - no_remat == text_fwd
    # the fully-batched path doesn't checkpoint — remat flag is a no-op
    assert (F.cocoop_step_flops(CFG, 32, 500, 10, chunk=0, remat=True)
            == F.cocoop_step_flops(CFG, 32, 500, 10, chunk=0, remat=False))


def test_cocoop_image_tower_forward_only():
    gemms = F.cocoop_step_gemms(CFG, 32, 500, 10, chunk=100)
    image = [g for g in gemms if g.name.startswith("image")]
    assert image and not any("dgrad" in g.name for g in image)
    # text dominates: >80% of the step at 500 classes
    text = sum(g.flops for g in gemms if g.name.startswith("text"))
    assert text / F.total_flops(gemms) > 0.8
