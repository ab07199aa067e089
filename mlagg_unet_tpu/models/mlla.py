"""MLLA encoder: aggregated attention blocks + patch embedding (NHWC).

Ports of the flagship encoder (nnUNetTrainer_MLAgg_2D_dt_MS.py):
* AggregatedAttention (:625-784) — TransNeXt-style attention with
  Differential-Transformer lambda re-weighting. The *local* branch replaces
  torch unfold with shifted-slice window attention (ops/local_attention.py);
  the *pooled* branch replaces the 4 flash_attn_func calls (:745-751) with 2
  calls to our Pallas flash attention using dk != dv (v = concat(v1, v2),
  the decomposition the reference comments at :738-740 — mathematically
  identical to its 4-call form since k1 is shared by v1 and v2).
* Attention (:787-821) — plain softmax attention + LePE, used when
  sr_ratio == 1.
* MLLABlock (:824-915), BasicLayer (:918-969), project (:972-1001),
  PatchEmbed (:1004-1043), MLLA_Enc (:1046-1179).

Scale parity note: the reference pre-scales q by head_dim**-0.5 (:688) AND
flash_attn_func internally rescales by head_dim**-0.5, so the pooled branch
logits are q.k/head_dim. We reproduce that exactly (trained-weight parity
beats "fixing" it).
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.layers import (
    DropPath,
    DWConv2d,
    PointwiseConv,
    RMSNorm,
    avg_pool_to,
    gelu,
    trunc_normal_init,
)
from mlagg_unet_tpu.models.mednext import MedNeXtDownBlock
from mlagg_unet_tpu.ops.flash_attention import flash_attention
from mlagg_unet_tpu.ops.local_attention import (
    local_window_attention_apply,
    local_window_attention_logits,
)


def _lambda_init(std: float = 0.1):
    return nn.initializers.normal(stddev=std)


class _DenseParams(nn.Module):
    """Param-only twin of nn.Dense: identical tree ({kernel, bias}),
    identical shapes and init draws — exists so MLLABlock can route the
    SAME weights through either the functional reference tail or the
    fused Pallas tail kernel (ops/mlla_fused.py)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LayerNormParams(nn.Module):
    """Param-only twin of nn.LayerNorm ({scale, bias})."""

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones, (features,))
        b = self.param("bias", nn.initializers.zeros, (features,))
        return s, b


class _MlpParams(nn.Module):
    """Param-only twin of layers.Mlp ({Dense_0, Dense_1})."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, in_features: int):
        k1, b1 = _DenseParams(self.hidden, name="Dense_0")(in_features)
        k2, b2 = _DenseParams(self.out, name="Dense_1")(self.hidden)
        return k1, b1, k2, b2


class _RMSNormParams(nn.Module):
    """Param-only twin of layers.RMSNorm ({scale})."""

    @nn.compact
    def __call__(self, features: int):
        return self.param("scale", nn.initializers.ones, (features,))


class _DWConvParams(nn.Module):
    """Param-only twin of layers.DWConv2d (child Conv_0{kernel, bias})."""

    @nn.compact
    def __call__(self, channels: int, kernel_size: int = 3):
        class _Inner(nn.Module):
            @nn.compact
            def __call__(self_inner):
                k = self_inner.param(
                    "kernel", nn.initializers.lecun_normal(),
                    (kernel_size, kernel_size, 1, channels))
                b = self_inner.param("bias", nn.initializers.zeros,
                                     (channels,))
                return k, b

        return _Inner(name="Conv_0")()


def _dense(x, kernel, bias):
    """Functional twin of nn.Dense (dtype promotion semantics)."""
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    y = jnp.dot(x.astype(dt), kernel.astype(dt))
    return y + bias.astype(dt)


def _rms_norm(x, scale, eps=1e-5):
    """Functional twin of layers.RMSNorm (fp32 stats, x.dtype out)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * scale).astype(x.dtype)


def _depthwise3x3(x, kernel, bias):
    """Functional twin of layers.DWConv2d (shifted-FMA SAME conv).
    x: (B, H, W, C); kernel: (3, 3, 1, C)."""
    kern = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    out = None
    for i in range(3):
        for j in range(3):
            term = xp[:, i:i + H, j:j + W, :] * kern[i, j, 0]
            out = term if out is None else out + term
    return out + bias.astype(out.dtype)


def _layer_norm(x, scale, bias, eps):
    """Functional twin of nn.LayerNorm (use_fast_variance, f32 stats,
    output in the promoted input dtype)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(jnp.promote_types(x.dtype, scale.dtype))


class AggregatedAttention(nn.Module):
    """One half (local or pooled) of the flagship's dual attention.

    Input x: (B, H, W, C) with C == dim. num_heads refers to the
    *differential* head count; internally q/k use 2*num_heads heads of
    head_dim = dim // num_heads // 2 and v uses num_heads heads of
    2*head_dim (reference :634,:687-703).
    """

    num_heads: int
    local: bool = True
    window_size: int = 3
    sr_ratio: int = 1
    qkv_bias: bool = True
    lambda_init_value: float = 0.8

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        nh = self.num_heads
        head_dim = C // nh // 2
        scale = head_dim ** -0.5
        N = H * W

        lambda_q1 = self.param("lambda_q1", _lambda_init(), (head_dim,), jnp.float32)
        lambda_k1 = self.param("lambda_k1", _lambda_init(), (head_dim,), jnp.float32)
        lambda_q2 = self.param("lambda_q2", _lambda_init(), (head_dim,), jnp.float32)
        lambda_k2 = self.param("lambda_k2", _lambda_init(), (head_dim,), jnp.float32)
        lambda_full = (
            jnp.exp(jnp.sum(lambda_q1 * lambda_k1))
            - jnp.exp(jnp.sum(lambda_q2 * lambda_k2))
            + self.lambda_init_value
        ).astype(jnp.float32)

        # q/kv/subln/lepe params via twins (identical trees to the
        # nn.Dense/RMSNorm/DWConv2d modules they replace) so the same
        # weights serve the functional path and the fused Pallas kernel
        wq, bq = _DenseParams(C, name="q")(C)
        wkv, bkv = _DenseParams(2 * C, name="kv")(C)
        sub_scale = _RMSNormParams(name="subln")(2 * head_dim)
        lepe_k, lepe_b = _DWConvParams(name="lepe")(C, 3)

        if self.local:
            import os

            # the fused local-attention kernel is OFF by default: measured
            # 3.28 ms/block-pair at layer0 vs ~2.5 ms for the XLA path
            # (48-lane arrays waste 62% of the VPU; degenerate (T,1)
            # head matmuls) — kept for future layout tuning
            if (deterministic
                    and os.environ.get("MLAGG_FUSED_LOCAL_ATTN") == "1"
                    and jax.default_backend() == "tpu"
                    and self.window_size == 3
                    and not self.is_initializing()):
                from mlagg_unet_tpu.ops.mlla_attn_fused import (
                    local_aggregated_attention_fused,
                )

                return local_aggregated_attention_fused(
                    x, wq, bq, wkv, bkv, sub_scale, lepe_k, lepe_b,
                    lambda_full, nh, self.lambda_init_value)

            q = _dense(x, wq, bq) * scale                   # (B,H,W,C)
            kv = _dense(x, wkv, bkv)
            k, v = jnp.split(kv, 2, axis=-1)
            # channel layout (2nh, hd) for q/k; (nh, 2hd) for v (:687-703)
            q_img = q.reshape(B, H, W, 2 * nh, head_dim)
            k_img = k.reshape(B, H, W, 2 * nh, head_dim)
            logits = local_window_attention_logits(q_img, k_img, self.window_size)
            attn = jax.nn.softmax(logits, axis=-1)          # (B,H,W,2nh,ws^2)
            attn = attn.reshape(B, H, W, nh, 2, self.window_size ** 2)
            attn = attn[..., 0, :] - lambda_full * attn[..., 1, :]
            v_img = v.reshape(B, H, W, nh, 2 * head_dim)
            out = local_window_attention_apply(attn, v_img, self.window_size)
            out = _rms_norm(out, sub_scale)                 # (B,H,W,nh,2hd)
            out = out * (1 - self.lambda_init_value)
            out = out.reshape(B, H, W, C).astype(x.dtype)
            return out + _depthwise3x3(v, lepe_k, lepe_b)
        else:
            q = _dense(x, wq, bq) * scale                   # (B,H,W,C)
            kv = _dense(x, wkv, bkv)
            k, v = jnp.split(kv, 2, axis=-1)
            v_pe = v  # LePE acts on pre-window v (:691,781-782)
            pool_h, pool_w = H // self.sr_ratio, W // self.sr_ratio
            x_ = gelu(PointwiseConv(C, name="sr")(x))
            x_ = avg_pool_to(x_, (pool_h, pool_w))
            x_ = nn.LayerNorm(name="norm")(
                x_.reshape(B, pool_h * pool_w, C)
            )
            # the reference REUSES the same kv projection on the pooled
            # tokens (:731 "k_pool, v_pool = self.kv(x_)") — not a separate
            # set of weights
            kv_pool = _dense(x_, wkv, bkv)
            k_pool, v_pool = jnp.split(kv_pool, 2, axis=-1)
            P = pool_h * pool_w

            # (B, L, nh, 2, hd) -> groups; heads go to axis 1 for attention
            qg = q.reshape(B, N, nh, 2, head_dim)
            kg = k_pool.reshape(B, P, nh, 2, head_dim)
            vg = v_pool.reshape(B, P, nh, 2 * head_dim)
            q1 = jnp.transpose(qg[:, :, :, 0], (0, 2, 1, 3))
            q2 = jnp.transpose(qg[:, :, :, 1], (0, 2, 1, 3))
            k1 = jnp.transpose(kg[:, :, :, 0], (0, 2, 1, 3))
            k2 = jnp.transpose(kg[:, :, :, 1], (0, 2, 1, 3))
            vv = jnp.transpose(vg, (0, 2, 1, 3))            # (B,nh,P,2hd)

            # q is already pre-scaled; flash applies its own 1/sqrt(hd):
            # logits = q.k/hd, matching the reference flash path exactly
            attn1 = flash_attention(q1, k1, vv, scale=scale)
            attn2 = flash_attention(q2, k2, vv, scale=scale)
            # cast the fp32 lambda scalar down so the combine stays in the
            # model compute dtype (a f32 array operand would promote the
            # whole downstream graph to fp32)
            out = attn1 - lambda_full.astype(attn1.dtype) * attn2
            out = jnp.transpose(out, (0, 2, 1, 3))          # (B,N,nh,2hd)
            out = _rms_norm(out, sub_scale)
            out = out * (1 - self.lambda_init_value)
            out = out.reshape(B, H, W, C).astype(x.dtype)

        return out + _depthwise3x3(v_pe, lepe_k, lepe_b)


class Attention(nn.Module):
    """Full softmax attention + LePE for sr_ratio == 1 stages (:787-821)."""

    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        nh = self.num_heads
        head_dim = C // nh
        scale = head_dim ** -0.5
        N = H * W

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, nh, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = jnp.transpose(q, (0, 2, 1, 3)) * scale
        k = jnp.transpose(k, (0, 2, 1, 3))
        v_t = jnp.transpose(v, (0, 2, 1, 3))

        # reference applies NO additional scale inside softmax (q pre-scaled)
        out = flash_attention(q, k, v_t, scale=1.0)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, H, W, C)
        v_img = v.reshape(B, H, W, C)
        out = out + DWConv2d(name="lepe")(v_img)
        return out


class MLLABlock(nn.Module):
    """Mamba-like gated attention block (:824-915). NHWC in/out."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    drop_path: float = 0.0
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        shortcut = x

        from mlagg_unet_tpu.ops.mlla_fused import (
            fused_tail_enabled,
            mlla_block_front_fused,
            mlla_block_tail_fused,
        )

        n1_s, n1_b = _LayerNormParams(name="norm1")(C)
        wa, ba = _DenseParams(C, name="act_proj")(C)
        wi, bi = _DenseParams(C, name="in_proj")(C)
        use_fused = (deterministic and fused_tail_enabled()
                     and not self.is_initializing())
        if use_fused:
            a_f, h_f = mlla_block_front_fused(
                x.reshape(B, H * W, C), n1_s, n1_b, wa, ba, wi, bi)
            act_res = a_f.reshape(B, H, W, C)
            h = h_f.reshape(B, H, W, C)
        else:
            hn = _layer_norm(x, n1_s, n1_b, 1e-6)
            act_res = jax.nn.silu(_dense(hn, wa, ba))
            h = _dense(hn, wi, bi)
        h = jax.nn.silu(DWConv2d(name="dwc")(h))

        if self.sr_ratio == 1:
            h = Attention(self.num_heads, self.qkv_bias, name="attn")(
                h, deterministic
            )
        else:
            h1, h2 = jnp.split(h, 2, axis=-1)
            h1 = AggregatedAttention(
                self.num_heads // 2, local=True, qkv_bias=self.qkv_bias,
                sr_ratio=self.sr_ratio, name="attn_local",
            )(h1, deterministic)
            h2 = AggregatedAttention(
                self.num_heads // 2, local=False, qkv_bias=self.qkv_bias,
                sr_ratio=self.sr_ratio, name="attn_pool",
            )(h2, deterministic)
            h = jnp.concatenate([h1, h2], axis=-1)

        # block tail: gate-mul -> out_proj -> +res -> norm2 -> MLP -> +res.
        # Params are declared via twins with nn.Dense/LayerNorm/Mlp-identical
        # trees so the SAME weights serve both the functional reference path
        # (training / CPU) and the fused single-HBM-pass Pallas kernel
        # (inference on TPU; ops/mlla_fused.py).
        hidden = int(C * self.mlp_ratio)
        wo, bo = _DenseParams(C, name="out_proj")(C)
        ln_s, ln_b = _LayerNormParams(name="norm2")(C)
        w1, b1, w2, b2 = _MlpParams(hidden, C, name="mlp")(C)

        if use_fused:
            out = mlla_block_tail_fused(
                h.reshape(B, H * W, C), act_res.reshape(B, H * W, C),
                shortcut.reshape(B, H * W, C),
                wo, bo, ln_s, ln_b, w1, b1, w2, b2)
            return out.reshape(B, H, W, C)

        h = _dense(h * act_res, wo, bo)
        x = shortcut + DropPath(self.drop_path)(h, deterministic)

        h = _layer_norm(x, ln_s, ln_b, 1e-6)
        h = gelu(_dense(h, w1, b1))
        if self.drop:
            h = nn.Dropout(self.drop)(h, deterministic=deterministic)
        h = _dense(h, w2, b2)
        if self.drop:
            h = nn.Dropout(self.drop)(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        return x


class BasicLayer(nn.Module):
    """A stack of MLLABlocks for one stage (:918-969)."""

    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dp = (
                self.drop_path[i]
                if isinstance(self.drop_path, (list, tuple))
                else self.drop_path
            )
            x = MLLABlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop, drop_path=dp,
                sr_ratio=self.sr_ratio, name=f"block{i}",
            )(x, deterministic)
        return x


class ProjectBlock(nn.Module):
    """conv3x3(stride) -> act -> LN -> conv3x3 -> [act -> LN] (:972-1001).

    Conv biases use the torch default init — required so zero-padded image
    regions don't produce exactly-zero channel vectors into the LayerNorms
    (see layers.torch_bias_init)."""

    out_dim: int
    stride: int
    last: bool = False

    @nn.compact
    def __call__(self, x):
        from mlagg_unet_tpu.models.layers import torch_bias_init

        cin = x.shape[-1]
        x = nn.Conv(self.out_dim, (3, 3), strides=(self.stride, self.stride),
                    padding=1, bias_init=torch_bias_init(cin * 9),
                    name="conv1")(x)
        x = gelu(x)
        x = nn.LayerNorm(name="norm1")(x)
        x = nn.Conv(self.out_dim, (3, 3), padding=1,
                    bias_init=torch_bias_init(self.out_dim * 9),
                    name="conv2")(x)
        if not self.last:
            x = gelu(x)
            x = nn.LayerNorm(name="norm2")(x)
        return x


class PatchEmbed(nn.Module):
    """Two ProjectBlocks; total stride = 2 * (patch_size // 2) (:1004-1043)."""

    patch_size: int = 2
    embed_dim: int = 96

    @nn.compact
    def __call__(self, x):
        x = ProjectBlock(self.embed_dim // 2, 2, last=False, name="proj1")(x)
        x = ProjectBlock(self.embed_dim, max(self.patch_size // 2, 1),
                         last=True, name="proj2")(x)
        return x


class MLLAEncoder(nn.Module):
    """4-stage MLLA encoder with MedNeXtDownBlock inter-stage downsampling
    (:1046-1179). Returns [input, stage0, ..., stage3] feature maps."""

    patch_size: int = 2
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    sr_ratio: Sequence[int] = (16, 8, 4, 2)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_layers = len(self.depths)
        total_depth = sum(self.depths)
        import numpy as np

        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total_depth)]

        outs = [x]
        h = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(x)
        for i in range(num_layers):
            h = BasicLayer(
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                drop_path=dpr[sum(self.depths[:i]): sum(self.depths[: i + 1])],
                sr_ratio=self.sr_ratio[i],
                name=f"layer{i}",
            )(h, deterministic)
            outs.append(h)
            if i < num_layers - 1:
                h = MedNeXtDownBlock(
                    out_channels=int(self.embed_dim * 2 ** (i + 1)),
                    exp_r=int(self.mlp_ratio),
                    kernel_size=3,
                    do_res=True,
                    name=f"down{i}",
                )(h)
        return outs
