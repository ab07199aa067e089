"""VMamba backbone (VSSM) and VM-UNet.

TPU-native equivalents of the reference's VMamba library
(variants/mamba/vmamba/vmamba.py:433-456 SS2D cells + VSSM stages; the
Triton cross-scan kernels become ops/cross_scan.py) and the VM-UNet trainer
family (nnUNetTrainer_VMUNet.py): a U-shape over VSS blocks.

VSSBlock: LN -> SS2D (4-direction selective scan cell) -> DropPath residual
-> LN -> MLP -> residual. VSSM: patch embed (stride-4 conv) + stages with
stride-2 patch merging.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.layers import DropPath, Mlp, gelu
from mlagg_unet_tpu.models.mamba_block import SS2D
from mlagg_unet_tpu.models.mednext import OutBlock


class VSSBlock(nn.Module):
    drop_path: float = 0.0
    d_state: int = 16
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    forward_type: str = "v2"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(name="ln_1")(x)
        h = SS2D(d_model=x.shape[-1], d_state=self.d_state,
                 expand=self.ssm_ratio, forward_type=self.forward_type,
                 name="self_attention")(h, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        if self.mlp_ratio > 0:
            h = nn.LayerNorm(name="ln_2")(x)
            h = Mlp(int(x.shape[-1] * self.mlp_ratio), name="mlp")(
                h, deterministic)
            x = x + DropPath(self.drop_path)(h, deterministic)
        return x


class PatchMerging2D(nn.Module):
    """Swin-style 2x2 patch merging (vmamba.py PatchMerging2D)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # torch concat order [x0, x1, x2, x3] = (h,w) offsets
        # (0,0),(1,0),(0,1),(1,1): w-offset outer, h-offset inner
        x = jnp.transpose(x, (0, 1, 3, 4, 2, 5)).reshape(
            B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


class VSSM(nn.Module):
    """VMamba encoder: returns per-stage feature maps."""

    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.1
    forward_type: str = "v2"

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        import numpy as np

        from mlagg_unet_tpu.models.layers import torch_bias_init

        # stride-4 patch embed (torch-style bias init: zero-padded regions
        # must not feed exactly-zero vectors into the LayerNorm)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                    bias_init=torch_bias_init(x.shape[-1] * 16),
                    name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)

        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]

        outs = []
        for i, depth in enumerate(self.depths):
            for b in range(depth):
                x = VSSBlock(
                    drop_path=dpr[sum(self.depths[:i]) + b],
                    d_state=self.d_state, forward_type=self.forward_type,
                    name=f"stage{i}_block{b}",
                )(x, deterministic)
            outs.append(x)
            if i < len(self.depths) - 1:
                x = PatchMerging2D(self.dims[i + 1], name=f"merge{i}")(x)
        return outs


class PatchExpand2D(nn.Module):
    """VM-UNet decoder upsampling: linear expand + pixel shuffle."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = nn.Dense(self.out_dim * 4, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, 2, 2, self.out_dim)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, 2 * H, 2 * W, self.out_dim)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class _V0Block(nn.Module):
    """VM-UNet / Mamba-UNet VSSBlock (nnUNetTrainer_VMUNet.py:563-580):
    LN -> SS2D (v0 cell, fp32 scan + z gate) -> DropPath residual. No MLP
    (unlike the newer VMamba backbone blocks)."""

    drop_path: float = 0.0
    d_state: int = 16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        h = SS2D(d_model=x.shape[-1], d_state=self.d_state, expand=2.0,
                 forward_type="v0", name="self_attention")(h, deterministic)
        return x + DropPath(self.drop_path)(h, deterministic)


class _FinalExpand(nn.Module):
    """Final_PatchExpand2D (nnUNetTrainer_VMUNet.py:311-327: Dense to
    scale*dim, pixel-shuffle scale x scale, LN) and FinalPatchExpand_X4
    (nnUNetTrainer_MambaUNet.py:317-333: Dense to 16*dim keeping dim
    channels). ``expand_to`` is the Dense width; out channels =
    expand_to // scale**2."""

    expand_to: int
    scale: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        p = self.scale
        c = self.expand_to // (p * p)
        x = nn.Dense(self.expand_to, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, p, p, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, p * H, p * W, c)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class VMUNet(nn.Module):
    """VM-UNet, faithful (nnUNetTrainer_VMUNet.py:713-880 VSSM + :853
    VMUNet): patch-4 embed, encoder VSSLayers (no-MLP v0 blocks, merging
    at stage end), decoder VSSLayer_ups that upsample FIRST then run
    depths_decoder blocks, ADDITIVE skips taken from each stage's INPUT
    (the stage-0 skip is never used — reference quirk, forward_features_up
    :821-828), and a single x4 final expand + 1x1 conv. No deep
    supervision (trainer subclasses nnUNetTrainerNoDeepSupervision).
    Weight parity: tests/test_torch_parity.py::test_vmunet_parity."""

    num_classes: int
    depths: Sequence[int] = (2, 2, 2, 2)
    depths_decoder: Sequence[int] = (2, 2, 2, 1)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        import numpy as np

        from mlagg_unet_tpu.models.layers import torch_bias_init

        dims = self.dims
        n = len(self.depths)
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4),
                    bias_init=torch_bias_init(x.shape[-1] * 16),
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        dpr = [float(v) for v in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]
        dpr_dec = [float(v) for v in
                   np.linspace(0, self.drop_path_rate,
                               sum(self.depths_decoder))][::-1]

        skips = []
        for i, depth in enumerate(self.depths):
            skips.append(x)
            for b in range(depth):
                x = _V0Block(dpr[sum(self.depths[:i]) + b], self.d_state,
                             name=f"layer{i}_block{b}")(x, deterministic)
            if i < n - 1:
                x = PatchMerging2D(dims[i + 1], name=f"downsample{i}")(x)

        dims_dec = list(dims)[::-1]
        for i, depth in enumerate(self.depths_decoder):
            if i > 0:
                x = x + skips[n - i]
                x = PatchExpand2D(dims_dec[i], name=f"up{i}")(x)
            for b in range(depth):
                x = _V0Block(
                    dpr_dec[sum(self.depths_decoder[:i]) + b],
                    self.d_state,
                    name=f"uplayer{i}_block{b}")(x, deterministic)
        # Final_PatchExpand2D(dim=96, scale 4): Dense 96->384, out 24 ch
        x = _FinalExpand(4 * dims[0], scale=4, name="final_up")(x)
        return nn.Conv(self.num_classes, (1, 1), name="final_conv")(x)


class MambaUNet(nn.Module):
    """Mamba-UNet, faithful (nnUNetTrainer_MambaUNet.py:772-915 VSSM,
    Swin-UNet style): patch-4 embed, encoder with end-of-stage merging and
    a bottleneck LN, decoder that CONCATS skips + concat_back_dim Linear,
    runs blocks THEN upsamples (VSSLayer_up :706-770 — opposite order to
    VM-UNet), decoder drop-path REUSING the encoder schedule slices, final
    LN + x4 expand (keeping embed_dim channels) + bias-free 1x1 conv.
    Weight parity: tests/test_torch_parity.py::test_mamba_unet_parity."""

    num_classes: int
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        import numpy as np

        from mlagg_unet_tpu.models.layers import torch_bias_init

        dims = self.dims
        n = len(self.depths)
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4),
                    bias_init=torch_bias_init(x.shape[-1] * 16),
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        dpr = [float(v) for v in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]

        skips = []
        for i, depth in enumerate(self.depths):
            skips.append(x)
            for b in range(depth):
                x = _V0Block(dpr[sum(self.depths[:i]) + b], self.d_state,
                             name=f"layer{i}_block{b}")(x, deterministic)
            if i < n - 1:
                x = PatchMerging2D(dims[i + 1], name=f"downsample{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)

        for i in range(n):
            if i == 0:
                # layers_up.0 is a bare PatchExpand
                x = PatchExpand2D(dims[n - 1] // 2, name="up0")(x)
                continue
            x = jnp.concatenate([x, skips[n - 1 - i]], axis=-1)
            x = nn.Dense(dims[n - 1 - i], name=f"concat_back{i}")(x)
            depth = self.depths[n - 1 - i]
            for b in range(depth):
                x = _V0Block(
                    dpr[sum(self.depths[:n - 1 - i]) + b], self.d_state,
                    name=f"uplayer{i}_block{b}")(x, deterministic)
            if i < n - 1:
                x = PatchExpand2D(dims[n - 1 - i] // 2, name=f"up{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_up")(x)
        # FinalPatchExpand_X4: Dense 96->16*96, out keeps 96 channels
        x = _FinalExpand(16 * dims[0], scale=4, name="up")(x)
        return nn.Conv(self.num_classes, (1, 1), use_bias=False,
                       name="output")(x)
