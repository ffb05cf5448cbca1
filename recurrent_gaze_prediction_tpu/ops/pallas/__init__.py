import jax

from .convgru import convgru_scan, convgru_scan_pallas
from .convgru_vjp2 import convgru_scan_trainable_v2
from .convlstm import convlstm_scan, convlstm_scan_pallas


def supported() -> bool:
    """True when the default backend can run compiled Mosaic TPU kernels."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


__all__ = ["convgru_scan", "convgru_scan_pallas",
           "convgru_scan_trainable_v2", "convlstm_scan",
           "convlstm_scan_pallas", "supported"]
