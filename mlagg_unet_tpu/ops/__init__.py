import jax

from mlagg_unet_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_seq_ref,
)
from mlagg_unet_tpu.ops.selective_scan_pallas import selective_scan_pallas
from mlagg_unet_tpu.ops.flash_attention import flash_attention, attention_reference


_SCAN_IMPL = "auto"  # 'auto' | 'pallas' | 'xla'


def set_default_scan_impl(impl: str) -> None:
    """Override the selective-scan dispatch. 'xla' is needed when computing
    on CPU devices while the default backend is a TPU (e.g. virtual-mesh
    dry runs)."""
    global _SCAN_IMPL
    assert impl in ("auto", "pallas", "xla")
    _SCAN_IMPL = impl


def scan_impl_is_pallas() -> bool:
    """True iff selective_scan_auto will dispatch to the Pallas kernels
    (models gate Pallas-only options, e.g. interleaved layouts, on this)."""
    return _SCAN_IMPL == "pallas" or (
        _SCAN_IMPL == "auto" and jax.default_backend() == "tpu"
    )


def selective_scan_auto(*args, **kwargs):
    """Dispatch: Pallas kernel on TPU (15x faster at MSMM shapes — VMEM-
    resident chunk scans), XLA chunked associative scan elsewhere (the
    Pallas interpreter is too slow for production shapes off-TPU)."""
    if scan_impl_is_pallas():
        return selective_scan_pallas(*args, **kwargs)
    assert not kwargs.pop("interleaved", False), (
        "interleaved operand layout is a Pallas-only contract; gate the "
        "caller on scan_impl_is_pallas()")
    return selective_scan(*args, **kwargs)
