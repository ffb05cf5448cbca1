from . import metrics_jax, metrics_np
from .metrics_jax import (
    AVAILABLE_METRICS,
    auc_borji_batch,
    auc_judd_batch,
    auc_shuffled_batch,
    build_other_map_union,
    cc_batch,
    evaluate_batch,
    kld_batch,
    nss_batch,
    sim_batch,
)

__all__ = [
    "metrics_np",
    "metrics_jax",
    "AVAILABLE_METRICS",
    "cc_batch",
    "sim_batch",
    "nss_batch",
    "kld_batch",
    "auc_judd_batch",
    "auc_borji_batch",
    "auc_shuffled_batch",
    "build_other_map_union",
    "evaluate_batch",
]
