"""mlagg_unet_tpu: a TPU-native (JAX / XLA / Pallas / pjit) medical image
segmentation framework with the capabilities of MLAgg-UNet (aticejiang/MLAgg-UNet).

The framework re-implements, TPU-first, the full nnU-Net-v2-style pipeline the
reference ships (fingerprint -> plan -> preprocess -> train -> sliding-window
predict -> evaluate/ensemble/postprocess) plus its model zoo, with Pallas
kernels replacing the reference's CUDA/Triton dependencies (mamba_ssm
selective_scan, flash-attn, csm_triton).

Design tenets (see SURVEY.md section 7):
  * static shapes everywhere; all hot paths live inside jit
  * NHWC/NDHWC layouts (channels-last) for TPU conv efficiency
  * data parallelism via jax.sharding.Mesh + NamedSharding (GSPMD inserts
    collectives; global batch-dice falls out of plain jnp.sum)
  * bf16 compute with fp32 islands (selective scan, softmax, dice accumulation)
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Cache compiled XLA executables on disk (~/.cache/mlagg_jax) so repeat
    runs skip the slow remote TPU compile. Harmless on CPU; disable with
    MLAGG_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("MLAGG_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/mlagg_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
