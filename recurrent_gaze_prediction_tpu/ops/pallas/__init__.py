import jax

from .convgru import convgru_scan, convgru_scan_pallas
from .convlstm import convlstm_scan, convlstm_scan_pallas


def supported() -> bool:
    """True when the default backend can run compiled Mosaic TPU kernels."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


__all__ = ["convgru_scan", "convgru_scan_pallas", "convlstm_scan",
           "convlstm_scan_pallas", "supported"]
