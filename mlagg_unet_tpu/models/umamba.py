"""U-Mamba networks — faithful ports of the reference's U-Mamba family.

Reference: variants/mamba/UMambaBot_2d.py (whole file; UMambaBot :367-441,
UNetResEncoder :106-258, UNetResDecoder :260-365, BasicResBlock :67-104,
MambaLayer :39-64, UpsampleLayer :20-37) and UMambaEnc_2d.py
(ResidualMambaEncoder :151-310 with its per-stage Mamba placement and
channel-token rule, UMambaEnc :421-489). 3D variants (UMambaBot_3d.py /
UMambaEnc_3d.py) share the same code with Conv3d.

Architecture notes (these differ from a plain nnU-Net and are reproduced
exactly; torch-weight parity is tested in tests/test_torch_parity.py):

* Residual encoder: a stem of BasicResBlock + (n-1) BasicBlockD at stage-0
  features, then per stage BasicResBlock(stride, 1x1-conv shortcut) +
  (n-1) BasicBlockD. BasicResBlock's shortcut is a bare 1x1 conv (NO norm),
  its convs always carry bias, and the residual add happens before the
  second activation (:97-104).
* MambaLayer = LN -> mamba_ssm.Mamba on flattened tokens with NO residual
  around it (:52-64 returns the Mamba output directly).
  - Bot: one MambaLayer on the bottleneck skip (UMambaBot.forward :430).
  - Enc: see the dim rule below; when the stage's flattened spatial size
    <= its channel count the layer runs in channel-token mode (tokens =
    channels, d_model = spatial size, UMambaEnc_2d.py:175-181).
* Decoder upsamples with nearest-neighbour interpolation + 1x1 conv
  (UpsampleLayer, NOT a transposed conv), then BasicResBlock(1x1-conv
  shortcut) + (n-1) BasicBlockD, with a 1x1 seg head per stage for deep
  supervision.
* The 2D and 3D reference files genuinely differ (not just Conv2d/3d):
  - 2D decoder concatenates the skip for every stage EXCEPT the last
    (UNetResDecoder.forward, UMambaBot_2d.py:334-335 `s < len(stages)-1`;
    the stage-0 encoder output is never used as a skip); the 3D decoder
    concatenates on EVERY stage (UMambaBot_3d.py:341).
  - Enc 2D places a MambaLayer after stage s iff bool(s%2)^bool(n%2);
    Enc 3D places one after EVERY stage (UMambaEnc_3d.py:257).
  We key both behaviors off the kernel dimensionality, as the reference
  keys the file choice off the plans dim.
* The blocks-per-stage halving rule of UMambaBot.__init__ :404-408: deeper
  halves of encoder/decoder get a single block regardless of plans.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import BasicBlockD
from mlagg_unet_tpu.models.layers import InstanceNorm
from mlagg_unet_tpu.models.mamba_block import MambaBlock


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


class BasicResBlock(nn.Module):
    """conv->IN->lrelu->conv->IN [+ 1x1-conv shortcut, no norm] -> lrelu
    (UMambaBot_2d.py:67-104). All convs biased (torch default — conv_bias
    is not forwarded to this block in the reference)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_1x1conv: bool = False

    @nn.compact
    def __call__(self, x):
        pad = [(k // 2, k // 2) for k in self.kernel_size]
        y = nn.Conv(self.features, tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=pad,
                    name="conv1")(x)
        y = InstanceNorm(name="norm1")(y)
        y = _lrelu(y)
        y = nn.Conv(self.features, tuple(self.kernel_size),
                    padding=[(k // 2, k // 2) for k in self.kernel_size],
                    name="conv2")(y)
        y = InstanceNorm(name="norm2")(y)
        if self.use_1x1conv:
            x = nn.Conv(self.features, (1,) * len(self.kernel_size),
                        strides=tuple(self.strides), name="conv3")(x)
        return _lrelu(y + x)


class MambaLayer(nn.Module):
    """LN -> Mamba on flattened tokens, NO residual (UMambaBot_2d.py:39-64).
    channel_token=True flattens spatial dims into d_model and scans over
    channels (UMambaEnc_2d.py:70-81)."""

    d_state: int = 16
    channel_token: bool = False

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        L = 1
        for s in spatial:
            L *= s
        if self.channel_token:
            # tokens = channels, d_model = flattened spatial size. torch
            # x.flatten(2) on (B, C, *sp) gives (B, C, prod(sp)); our NHWC
            # layout needs the channel axis moved first.
            tokens = x.reshape(B, L, C)
            tokens = jnp.swapaxes(tokens, 1, 2)         # (B, C, L=d_model)
            h = nn.LayerNorm(epsilon=1e-5, name="norm")(tokens)
            h = MambaBlock(d_model=L, d_state=self.d_state, name="mamba")(h)
            return jnp.swapaxes(h, 1, 2).reshape(B, *spatial, C)
        tokens = x.reshape(B, L, C)
        # epsilon matches torch nn.LayerNorm default (1e-5); at small
        # d_model (stage-0 dim=4 in Enc-3D) the flax default 1e-6 skews
        # the normalization enough to compound through the scan recurrence.
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(tokens)
        h = MambaBlock(d_model=C, d_state=self.d_state, name="mamba")(h)
        return h.reshape(B, *spatial, C)


class _Upsample(nn.Module):
    """nearest-neighbour scale + 1x1 conv (UpsampleLayer :20-37)."""

    features: int
    scale: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for ax, s in enumerate(self.scale):
            if s != 1:
                x = jnp.repeat(x, s, axis=1 + ax)
        return nn.Conv(self.features, (1,) * len(self.scale), name="conv")(x)


def _halved_blocks(n_stages: int, enc: Sequence[int], dec: Sequence[int]):
    """UMambaBot.__init__ :404-408."""
    enc = list(enc)
    dec = list(dec)
    for s in range(math.ceil(n_stages / 2), n_stages):
        enc[s] = 1
    for s in range(math.ceil((n_stages - 1) / 2 + 0.5), n_stages - 1):
        dec[s] = 1
    return enc, dec


class UMambaUNet(nn.Module):
    """mamba_mode='bot': Mamba at the bottleneck only;
    'enc': Mamba after alternating encoder stages (last always included)."""

    num_classes: int
    n_stages: int
    features_per_stage: Sequence[int]
    conv_kernel_sizes: Sequence[Sequence[int]]
    pool_op_kernel_sizes: Sequence[Sequence[int]]
    n_conv_per_stage_encoder: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    deep_supervision: bool = True
    mamba_mode: str = "bot"
    # UMambaEnc decides channel-token mode from the PLANS patch size
    # (get_umamba_enc_2d_from_plans passes configuration_manager.patch_size,
    # UMambaEnc_2d.py:514), not the runtime shape. None -> runtime shape
    # (equivalent whenever the input is the configured patch size).
    input_size: Union[Sequence[int], None] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        n = self.n_stages
        feats = list(self.features_per_stage)
        kernels = [list(k) for k in self.conv_kernel_sizes]
        strides = [list(s) for s in self.pool_op_kernel_sizes]
        n_enc, n_dec = _halved_blocks(n, self.n_conv_per_stage_encoder,
                                      self.n_conv_per_stage_decoder)

        # channel-token decision replicates the reference's FLOOR-divided
        # size estimate (UMambaEnc_2d.py:177-181 `i // j`) — which can
        # disagree with the actual (ceil) strided-conv output sizes on
        # non-divisible inputs; bug-compatibility over recomputation.
        est = list(self.input_size) if self.input_size is not None \
            else list(x.shape[1:-1])
        channel_token = []
        for s in range(n):
            est = [i // j for i, j in zip(est, strides[s])]
            prod = 1
            for v in est:
                prod *= v
            channel_token.append(prod <= feats[s])

        # ---- stem (stride 1, stage-0 features)
        x = BasicResBlock(feats[0], kernels[0], [1] * len(kernels[0]),
                          use_1x1conv=True, name="stem_block0")(x)
        for i in range(1, n_enc[0]):
            x = BasicBlockD(feats[0], kernels[0], [1] * len(kernels[0]),
                            name=f"stem_block{i}")(x)

        # ---- encoder stages
        skips = []
        for s in range(n):
            x = BasicResBlock(feats[s], kernels[s], strides[s],
                              use_1x1conv=True, name=f"stage{s}_block0")(x)
            for i in range(1, n_enc[s]):
                x = BasicBlockD(feats[s], kernels[s],
                                [1] * len(kernels[s]),
                                name=f"stage{s}_block{i}")(x)
            if self.mamba_mode == "enc":
                # 2D: alternating placement (last stage always included);
                # 3D: after every stage (UMambaEnc_3d.py:257)
                if len(kernels[0]) == 3 or bool(s % 2) ^ bool(n % 2):
                    x = MambaLayer(channel_token=channel_token[s],
                                   name=f"enc_mamba{s}")(x)
            elif self.mamba_mode == "enc_ss3d":
                # SS3D variant: a 12-direction VSS block after EVERY stage
                # (no channel-token mode), depth 1, d_state=1 (!)
                # (UMambaEnc_SS3D.py:645-660)
                from mlagg_unet_tpu.models.vmunet3d import VSSBlock3D

                # mlp_ratios = [2]*2 + [4]*(n-2); z gate removed
                # (UMambaEnc_SS3D.py:151,342-352,604)
                x = VSSBlock3D(d_state=1, expand=2.0,
                               mlp_ratio=2.0 if s < 2 else 4.0,
                               mlp_type="plain", no_z=True,
                               name=f"enc_vss{s}")(x, deterministic)
            skips.append(x)

        if self.mamba_mode == "bot":
            skips[-1] = MambaLayer(name="bot_mamba")(skips[-1])
        elif self.mamba_mode == "bot_ss3d":
            # UMambaBot_SS3D.py:806-821: bottleneck VSSLayer(depth=1,
            # d_state=1, expand=2, mlp_ratio=4) of 12-direction SS3D blocks
            from mlagg_unet_tpu.models.vmunet3d import VSSBlock3D

            # z gate removed in this file's SS3D (UMambaBot_SS3D.py:119,
            # 310-320)
            skips[-1] = VSSBlock3D(d_state=1, expand=2.0, mlp_ratio=4.0,
                                   no_z=True,
                                   name="bot_vss0")(skips[-1],
                                                    deterministic)

        # ---- decoder (nearest-upsample + 1x1; 2D: no skip concat on the
        # last stage, UMambaBot_2d.py:334-335; 3D: concat everywhere,
        # UMambaBot_3d.py:341)
        seg_outputs = []
        lres = skips[-1]
        n_dec_stages = n - 1
        for s in range(n_dec_stages):
            feats_skip = feats[n - 2 - s]
            up = _Upsample(feats_skip, strides[n - 1 - s],
                           name=f"up{s}")(lres)
            if len(kernels[0]) == 3 or s < n_dec_stages - 1:
                up = jnp.concatenate([up, skips[n - 2 - s]], axis=-1)
            up = BasicResBlock(feats_skip, kernels[n - 2 - s],
                               [1] * len(kernels[n - 2 - s]),
                               use_1x1conv=True,
                               name=f"dec_stage{s}_block0")(up)
            for i in range(1, n_dec[s] if s < len(n_dec) else 1):
                up = BasicBlockD(feats_skip, kernels[n - 2 - s],
                                 [1] * len(kernels[n - 2 - s]),
                                 name=f"dec_stage{s}_block{i}")(up)
            if self.deep_supervision or s == n_dec_stages - 1:
                seg_outputs.append(
                    nn.Conv(self.num_classes,
                            (1,) * len(kernels[0]), name=f"seg{s}")(up))
            lres = up

        seg_outputs = seg_outputs[::-1]
        if not self.deep_supervision:
            return seg_outputs[0]
        return seg_outputs


def umamba_from_plans(configuration_manager, num_input_channels: int,
                      num_output_channels: int, deep_supervision: bool = True,
                      mamba_mode: str = "bot") -> UMambaUNet:
    n_stages = len(configuration_manager.pool_op_kernel_sizes)
    base = configuration_manager.UNet_base_num_features
    max_feat = configuration_manager.unet_max_num_features
    features = [min(base * 2 ** i, max_feat) for i in range(n_stages)]
    return UMambaUNet(
        num_classes=num_output_channels,
        n_stages=n_stages,
        features_per_stage=features,
        conv_kernel_sizes=configuration_manager.conv_kernel_sizes,
        pool_op_kernel_sizes=configuration_manager.pool_op_kernel_sizes,
        n_conv_per_stage_encoder=configuration_manager.n_conv_per_stage_encoder,
        n_conv_per_stage_decoder=configuration_manager.n_conv_per_stage_decoder,
        deep_supervision=deep_supervision,
        mamba_mode=mamba_mode,
        input_size=getattr(configuration_manager, "patch_size", None),
    )
