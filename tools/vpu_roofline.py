"""CLI wrapper for the measured VPU-op roofline (VERDICT r4 weak #3).

All logic lives in knowledgegraphembedding_tpu/utils/vpu_probe.py (bench.py
uses the same module for its eval-row floors — one implementation, no
drift). This wrapper just runs the probes on the default platform and
prints the per-op rates plus the YAGO-shape rooflines as one JSON line.

Usage:  python tools/vpu_roofline.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

from knowledgegraphembedding_tpu.utils import compile_cache, vpu_probe

compile_cache.enable()


def main():
    rates = vpu_probe.measure_rates()
    bw = vpu_probe.hbm_bandwidth()
    out = {
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "hbm_gbps": round(bw[0] / 1e9, 1),
        "hbm_parts": bw[1],
        "rates_gops": {k: round(v[0] / 1e9, 1) for k, v in rates.items()},
        "probe_times": {k: v[1] for k, v in rates.items()},
    }
    # YAGO3-10 eval shape (bench.py eval_rows): E=123,182 -> Epad=123,392;
    # d=500 -de -> padded half 512 (RotatE) / padded 512 single (others);
    # B=16 rows per kernel batch
    B, Epad, elems = 16, 123392, 512
    out["roofline_ms_per_batch16_yago"] = {
        m: round(1e3 * vpu_probe.roofline_seconds_per_batch(
            m, B, Epad, elems, rates), 3)
        for m in vpu_probe.KERNEL_MIX
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
