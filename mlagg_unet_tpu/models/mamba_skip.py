"""Multi-Scale Mamba Module (MSMM) skip connections, TPU-native.

Ports of the reference's MambaSkip.py: ``SS2D_skip`` (:266-543) — the
multi-scale 4-direction selective scan over the *concatenated* token sequence
of all encoder scales — and the ``VSS_Conv_Block``/``VSS_Conv_Layer``
channel-split mamba+conv skip module (:669-805). The CUDA
``selective_scan_fn`` is replaced by our chunked associative scan
(ops/selective_scan.py); the stack/flip/transpose scan-order plumbing by
ops/cross_scan.py.

S4D-real initialization (A_log = log(1..d_state), D = 1) and the softplus-
inverse dt bias init (:348-403) are reproduced exactly.
"""
from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.layers import (
    ConvolutionalGLU,
    DepthwiseConv,
    DropPath,
    InstanceNorm,
)
from mlagg_unet_tpu.ops.cross_scan import (
    cross_merge_multiscale_tokens_2dir,
    cross_merge_multiscale_tokens_2dir_il,
    cross_scan_multiscale_2dir,
    cross_scan_multiscale_2dir_il,
    il_pad_mask,
)
from mlagg_unet_tpu.ops import scan_impl_is_pallas
from mlagg_unet_tpu.ops import selective_scan_auto as selective_scan
from mlagg_unet_tpu.ops.selective_scan_pallas import (
    IL_MEGA,
    interleaved_scan_ok,
    padded_scan_len,
)


def _a_log_init(copies: int, d_inner: int, d_state: int):
    def init(key, shape, dtype=jnp.float32):
        A = np.tile(np.arange(1, d_state + 1, dtype=np.float32), (d_inner, 1))
        A_log = np.log(A)
        return jnp.asarray(np.tile(A_log, (copies, 1, 1)).reshape(shape), dtype)

    return init


def _dt_proj_weight_init(dt_rank: int, dt_scale: float = 1.0):
    std = dt_rank ** -0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


def _dt_proj_bias_init(dt_min: float = 0.001, dt_max: float = 0.1,
                       dt_init_floor: float = 1e-4):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, dt_init_floor)
        # inverse of softplus
        inv_dt = dt + jnp.log(-jnp.expm1(-dt))
        return inv_dt.astype(dtype)

    return init


class SS2DSkip(nn.Module):
    """Multi-scale 4-direction selective scan cell (MambaSkip.py:266-543).

    __call__ takes the list of per-scale NHWC feature maps (each with
    d_model channels) and returns the same-shaped list. K=4 scan directions,
    scales concatenated along L inside each direction.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: float = 2.0
    dt_rank: str | int = "auto"
    stage_num: int = 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], deterministic: bool = True):
        d_inner = int(self.expand * self.d_model)
        dt_rank = (
            math.ceil(self.d_model / 16) if self.dt_rank == "auto" else self.dt_rank
        )
        K = 4
        B = xs[0].shape[0]
        shapes = [(x.shape[1], x.shape[2]) for x in xs]

        # shared input projection applied per scale (no z branch, :301)
        in_proj = nn.Dense(d_inner, use_bias=False, name="in_proj")
        # per-scale depthwise conv + SiLU (:302-313)
        feats = []
        for i, x in enumerate(xs):
            h = in_proj(x)
            h = DepthwiseConv(kernel_size=self.d_conv, spatial_dims=2,
                              name=f"conv2d_{i}")(h)
            feats.append(jax.nn.silu(h))

        # pre-pad L to the scan kernel's chunk geometry so its own pad and
        # un-pad slice (two full-tensor HBM copies at MSMM sizes) vanish.
        # Only the TWO un-reversed layouts are materialized: directions 2/3
        # are the same sequences scanned right-to-left, which the Pallas
        # kernel does natively (reverse=True index maps) — the reference's
        # per-scale flip copies (MambaSkip.py:414-422) vanish entirely.
        #
        # Interleaved fast path (Pallas v2): build the operands directly in
        # the kernel's (S=128, T) lane order (composing the interleave into
        # the cross-scan transposes — saves the wrapper's four interleave
        # shuffles, ~7.3 ms/call at flagship shapes). Scales are padded to
        # IL_MEGA individually; pad lanes get delta = -1e9 (softplus -> 0)
        # so state passes through pads untouched and the cross-scale
        # "implicit causality" is bit-exact (reference MambaSkip.py:405-422).
        use_il = (scan_impl_is_pallas()
                  and interleaved_scan_ok(B, 2, d_inner, self.d_state))
        if use_il:
            xs_fwd, _ = cross_scan_multiscale_2dir_il(feats, IL_MEGA)
            xs_rev, _ = cross_scan_multiscale_2dir_il(feats, IL_MEGA,
                                                      reverse_scales=True)
            # additive mask (0 real / -1e9 pad) instead of a select: adds
            # fuse into the dts einsum epilogue (a separate select pass
            # measured 0.95 ms at batch 20); -1e9 + O(1) == -1e9 in fp32
            # and sigmoid(-1e9) underflows to exactly 0, so forward AND
            # gradient behavior match the select formulation bit-for-bit
            mask_f = jnp.asarray(
                np.where(il_pad_mask(shapes, IL_MEGA, False), 0.0, -1e9)
                .astype(np.float32))[None, None, None, :]
            mask_r = jnp.asarray(
                np.where(il_pad_mask(shapes, IL_MEGA, True), 0.0, -1e9)
                .astype(np.float32))[None, None, None, :]
            l_split = None
        else:
            l_real = sum(x.shape[1] * x.shape[2] for x in feats)
            pad_to = padded_scan_len(l_real, d_inner, self.d_state)
            xs_fwd, l_split = cross_scan_multiscale_2dir(feats, pad_to=pad_to)
            xs_rev, _ = cross_scan_multiscale_2dir(feats, pad_to=pad_to,
                                                   reverse_scales=True)
            mask_f = mask_r = None
        L = xs_fwd.shape[-1]

        x_proj_weight = self.param(
            "x_proj_weight", nn.initializers.lecun_normal(),
            (K, dt_rank + 2 * self.d_state, d_inner), jnp.float32,
        )
        dt_projs_weight = self.param(
            "dt_projs_weight", _dt_proj_weight_init(dt_rank),
            (K, d_inner, dt_rank), jnp.float32,
        )
        dt_projs_bias = self.param(
            "dt_projs_bias", _dt_proj_bias_init(), (K, d_inner), jnp.float32,
        )
        A_logs = self.param(
            "A_logs", _a_log_init(K, d_inner, self.d_state),
            (K, d_inner, self.d_state), jnp.float32,
        )
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner), jnp.float32)

        # x_dbl = einsum("b k d l, k c d -> b k c l") (:431). The reference
        # runs these projections under AMP autocast (fp16) and only casts to
        # fp32 at the selective-scan boundary (MambaSkip.py:443-448); we do
        # the same in the model compute dtype — the Pallas kernel upcasts
        # its operands to fp32 in VMEM.
        cdt = xs_fwd.dtype
        A = -jnp.exp(A_logs)                                 # (K, Din, N)

        def project_and_scan(xs, k_slice, reverse, mask):
            x_dbl = jnp.einsum(
                "bkdl,kcd->bkcl", xs, x_proj_weight[k_slice].astype(cdt),
                preferred_element_type=cdt,
            )
            dts = x_dbl[:, :, :dt_rank]
            Bs = x_dbl[:, :, dt_rank: dt_rank + self.d_state]
            Cs = x_dbl[:, :, dt_rank + self.d_state:]
            dts = jnp.einsum(
                "bkrl,kdr->bkdl", dts, dt_projs_weight[k_slice].astype(cdt),
                preferred_element_type=cdt,
            )
            if mask is not None:
                # interior pad lanes: delta -> -1e9 so softplus(dt+bias)=0
                # => a=1, bx=0 (exact passthrough). u/B/C are already 0
                # there. Additive form fuses into the einsum epilogue.
                dts = dts + mask.astype(dts.dtype)
            return selective_scan(
                xs, dts, A[k_slice], Bs, Cs, Ds[k_slice],
                dt_projs_bias[k_slice], delta_softplus=True,
                reverse=reverse, interleaved=use_il,
            )                                 # (B,2,Din,L), cdt (fp32 accum)

        out_fwd = project_and_scan(xs_fwd, slice(0, 2), False, mask_f)
        out_rev = project_and_scan(xs_rev, slice(2, 4), True, mask_r)

        # per-scale token tensors: LN/out_proj are token-pointwise, so
        # applying them per scale is exact and skips the full-length fp32
        # re-concat + (B,C,L)->(B,L,C) swap of a merged tensor
        if use_il:
            y_scales = cross_merge_multiscale_tokens_2dir_il(
                out_fwd, out_rev, shapes, IL_MEGA)
        else:
            y_scales = cross_merge_multiscale_tokens_2dir(
                out_fwd, out_rev, shapes, l_split)
        # LN in fp32 (autocast semantics), then back to the compute dtype
        # for the projection (reference out_proj runs in fp16 under AMP)
        out_norm = nn.LayerNorm(name="out_norm")
        out_proj = nn.Dense(self.d_model, use_bias=False, name="out_proj")
        out = []
        for (H, W), y in zip(shapes, y_scales):
            y = out_proj(out_norm(y).astype(cdt))
            out.append(y.reshape(B, H, W, self.d_model))
        return out


class VSSConvBlock(nn.Module):
    """Channel-split mamba+conv skip block (MambaSkip.py:669-753).

    Inputs: list of per-scale NHWC features with channel counts
    feature_dims[i]. The first hidden_dim channels go through the shared
    multi-scale scan + per-scale ConvGLU MLP; the rest through a per-scale
    Conv3x3+InstanceNorm+SiLU branch; halves are re-concatenated.
    """

    feature_dims: Sequence[int]
    hidden_dim: int
    drop_path: float = 0.0
    d_state: int = 16
    ssm_ratio: float = 2.0

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], deterministic: bool = True):
        n = len(inputs)
        m_branch, c_branch, shapes = [], [], []
        for i, x in enumerate(inputs):
            shapes.append((x.shape[1], x.shape[2]))
            m_branch.append(x[..., : self.hidden_dim])
            c_branch.append(x[..., self.hidden_dim:])

        ln_1 = nn.LayerNorm(epsilon=1e-6, name="ln_1")
        normed = [ln_1(m) for m in m_branch]
        scanned = SS2DSkip(
            d_model=self.hidden_dim, d_state=self.d_state,
            expand=self.ssm_ratio, stage_num=n, name="self_attention",
        )(normed, deterministic)

        dp = DropPath(self.drop_path)
        norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2")
        outs = []
        for i in range(n):
            m = m_branch[i] + dp(scanned[i], deterministic)
            m = norm2(m)
            mlp_out = ConvolutionalGLU(
                hidden_features=int(self.hidden_dim * 4),
                act=jax.nn.silu, name=f"mlp{i}",
            )(m, deterministic)
            m = m + dp(mlp_out, deterministic)

            c = c_branch[i]
            c = nn.Conv(c.shape[-1], (3, 3), padding="SAME",
                        name=f"conv_branch{i}")(c)
            c = InstanceNorm(affine=True, name=f"conv_norm{i}")(c)
            c = jax.nn.silu(c)
            outs.append(jnp.concatenate([m, c], axis=-1))
        return outs


class VSSConvLayer(nn.Module):
    """Stack of VSSConvBlocks over the encoder scales (MambaSkip.py:756-805)."""

    feature_dims: Sequence[int]
    hidden_dim: int
    depth: int = 1
    drop_path: float = 0.0
    d_state: int = 16
    ssm_ratio: float = 2.0

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], deterministic: bool = True):
        for i in range(self.depth):
            xs = VSSConvBlock(
                feature_dims=self.feature_dims,
                hidden_dim=self.hidden_dim,
                drop_path=self.drop_path,
                d_state=self.d_state,
                ssm_ratio=self.ssm_ratio,
                name=f"block{i}",
            )(xs, deterministic)
        return xs
