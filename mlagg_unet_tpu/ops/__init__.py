import jax

from mlagg_unet_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_seq_ref,
)
from mlagg_unet_tpu.ops.selective_scan_pallas import selective_scan_pallas
from mlagg_unet_tpu.ops.flash_attention import flash_attention, attention_reference


def selective_scan_auto(*args, **kwargs):
    """Dispatch: Pallas kernel on TPU (15x faster at MSMM shapes — VMEM-
    resident chunk scans), XLA chunked associative scan elsewhere (the
    Pallas interpreter is too slow for production shapes off-TPU)."""
    if jax.default_backend() == "tpu":
        return selective_scan_pallas(*args, **kwargs)
    return selective_scan(*args, **kwargs)
