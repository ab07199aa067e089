"""TPU smoke: jit a tiny forward of each major zoo family on the real chip.

CPU tests run the Pallas kernels in interpret mode, which skips Mosaic's
layout/VMEM constraints — this catches TPU-only compile/runtime failures.
"""
from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


class _FakeCfg:
    patch_size = [32, 32]
    UNet_base_num_features = 8
    unet_max_num_features = 32
    pool_op_kernel_sizes = [[1, 1], [2, 2], [2, 2]]
    conv_kernel_sizes = [[3, 3], [3, 3], [3, 3]]
    n_conv_per_stage_encoder = [1, 1, 1]
    n_conv_per_stage_decoder = [1, 1]


class _FakeCfg3D:
    patch_size = [32, 32, 32]
    UNet_base_num_features = 8
    unet_max_num_features = 32
    pool_op_kernel_sizes = [[1, 1, 1], [2, 2, 2], [2, 2, 2]]
    conv_kernel_sizes = [[3, 3, 3]] * 3
    n_conv_per_stage_encoder = [1, 1, 1]
    n_conv_per_stage_decoder = [1, 1]


def main():
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper
    from mlagg_unet_tpu.models.mednext_net import MedNeXtNet
    from mlagg_unet_tpu.models.vmamba import MambaUNet, VMUNet
    from mlagg_unet_tpu.models.vmunet3d import VMUNet3D
    from mlagg_unet_tpu.models.mamba_variants import (
        LightMUNet, SegMamba, UltraLightVMUNet, NNMamba,
    )
    from mlagg_unet_tpu.models.lkm_unet import LKMUNet
    from mlagg_unet_tpu.models.msvm_unet import MSVMUNet
    from mlagg_unet_tpu.models.swin_umamba import SwinUMamba, SwinUMambaD
    from mlagg_unet_tpu.models.more_variants import SwinTUNet
    from mlagg_unet_tpu.training.registry import NETWORK_BUILDERS

    x2d = jnp.zeros((1, 64, 64, 1), jnp.float32)
    x32 = jnp.zeros((1, 32, 32, 1), jnp.float32)
    x3d = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)

    cases = [
        ("MLLAUper", MLLAUper(out_channels=3), x2d),
        ("MedNeXtNet+skip", MedNeXtNet(n_classes=3, n_channels=16,
                                       use_mamba_skip=True,
                                       mamba_hidden_dim=8,
                                       kernel_size=3, exp_r=2), x2d),
        ("UMambaBot", NETWORK_BUILDERS["umamba_bot"](_FakeCfg(), 1, 3, True),
         x32),
        ("UMambaEnc", NETWORK_BUILDERS["umamba_enc"](_FakeCfg(), 1, 3, True),
         x32),
        ("VMUNet", VMUNet(num_classes=3), x2d),
        ("VMUNet3D", VMUNet3D(num_classes=3), x3d),
        ("LightMUNet", LightMUNet(num_classes=3), x2d),
        ("SegMamba", SegMamba(num_classes=3), x3d),
        ("UltraLightVMUNet", UltraLightVMUNet(num_classes=3), x2d),
        ("NNMamba", NNMamba(num_classes=3), x3d),
        ("LKMUNet", LKMUNet(num_classes=3), x2d),
        ("MSVMUNet", MSVMUNet(num_classes=3), x2d),
        ("SwinUMamba", SwinUMamba(num_classes=3), x2d),
        ("SwinUMambaD", SwinUMambaD(num_classes=3), x2d),
        ("SwinTUNet", SwinTUNet(num_classes=3), x2d),
        ("MambaUNet", MambaUNet(num_classes=3), x2d),
        ("VMUNet3D_new_SwinT", VMUNet3D(num_classes=3, no_z=True,
                                        use_encoder5=False,
                                        last_stage_swin=True), x3d),
        ("UMambaBot_SS3D", NETWORK_BUILDERS["umamba_bot_ss3d"](
            _FakeCfg3D(), 1, 3, False), x3d),
        ("UMambaEnc_SS3D", NETWORK_BUILDERS["umamba_enc_ss3d"](
            _FakeCfg3D(), 1, 3, False), x3d),
    ]

    failures = []
    for name, model, x in cases:
        try:
            params = jax.jit(model.init)(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x)
            out = jax.jit(lambda p, xx: model.apply(p, xx))(params, x)
            jax.block_until_ready(out)
            shape = (out[0].shape if isinstance(out, (list, tuple))
                     else out.shape)
            print(f"OK   {name}: {shape}", flush=True)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            traceback.print_exc(limit=3)
    print("failures:", failures or "none")


if __name__ == "__main__":
    main()
