"""Arithmetic-only checks for utils/vpu_probe (the measured-rate probes
run on hardware via tools/vpu_roofline.py; timing is not asserted here)."""

from knowledgegraphembedding_tpu.ops import pallas_rank
from knowledgegraphembedding_tpu.utils import vpu_probe

FAKE_RATES = {
    "alu": (2800e9, {}),
    "sqrt_chain": (1900e9, {}),
    "sin_chain": (440e9, {}),
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
    """RotatE (5 fused slots + sqrt) must floor above a hypothetical
    alu-only mix; the sqrt surcharge is the chain rate minus one alu
    issue."""
    t_rotate = vpu_probe.roofline_seconds_per_batch(
        "RotatE", 16, 4096, 512, FAKE_RATES)
    n = 16 * 4096 * 512
    t_alu_only = 5 * n / FAKE_RATES["alu"][0]
    assert t_rotate > t_alu_only


def test_with_w_adapts_two_arg_links():
    f2 = lambda z, j: z + j
    f3 = vpu_probe._with_w(f2)
    assert f3(1.0, 99.0, 2) == 3.0
    g3 = lambda z, w, j: z + w + j
    assert vpu_probe._with_w(g3) is g3
