"""Arithmetic-only checks for utils/vpu_probe (the measured-rate probes
run on hardware via tools/vpu_roofline.py; timing is not asserted here)."""

from knowledgegraphembedding_tpu.ops import pallas_rank
from knowledgegraphembedding_tpu.utils import vpu_probe

FAKE_RATES = {
    "alu": (600e9, {}),
    "sqrt_chain": (800e9, {}),
    "sin_chain": (30e9, {}),
}


def test_kernel_mix_covers_pallas_models():
    for m in vpu_probe.KERNEL_MIX:
        assert pallas_rank.supports(m), m


def test_roofline_positive_and_scales_linearly():
    for m in vpu_probe.KERNEL_MIX:
        t1 = vpu_probe.roofline_seconds_per_batch(m, 16, 4096, 512, FAKE_RATES)
        t2 = vpu_probe.roofline_seconds_per_batch(m, 32, 4096, 512, FAKE_RATES)
        assert t1 > 0
        assert abs(t2 / t1 - 2.0) < 1e-9


def test_special_op_costs_extra():
    """RotatE (6 alu + sqrt) must floor above a hypothetical 6-alu-only
    mix; the sqrt surcharge is the chain rate minus one alu issue."""
    t_rotate = vpu_probe.roofline_seconds_per_batch(
        "RotatE", 16, 4096, 512, FAKE_RATES)
    n = 16 * 4096 * 512
    t_alu_only = 6 * n / FAKE_RATES["alu"][0]
    assert t_rotate > t_alu_only
