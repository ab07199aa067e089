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
