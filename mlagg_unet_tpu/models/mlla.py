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
    Mlp,
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

        q = nn.Dense(C, use_bias=self.qkv_bias, name="q")(x)  # (B,H,W,C)
        q = q * scale
        kv_dense = nn.Dense(2 * C, use_bias=self.qkv_bias, name="kv")
        kv = kv_dense(x)
        k, v = jnp.split(kv, 2, axis=-1)
        v_pe = v  # LePE positional term acts on pre-window v (:691,781-782)

        if self.local:
            # channel layout (2nh, hd) for q/k; (nh, 2hd) for v (:687-703)
            q_img = q.reshape(B, H, W, 2 * nh, head_dim)
            k_img = k.reshape(B, H, W, 2 * nh, head_dim)
            logits = local_window_attention_logits(q_img, k_img, self.window_size)
            attn = jax.nn.softmax(logits, axis=-1)          # (B,H,W,2nh,ws^2)
            attn = attn.reshape(B, H, W, nh, 2, self.window_size ** 2)
            attn = attn[..., 0, :] - lambda_full * attn[..., 1, :]
            v_img = v.reshape(B, H, W, nh, 2 * head_dim)
            out = local_window_attention_apply(attn, v_img, self.window_size)
            out = RMSNorm(name="subln")(out)                # (B,H,W,nh,2hd)
            out = out * (1 - self.lambda_init_value)
            out = out.reshape(B, H, W, C).astype(x.dtype)
        else:
            pool_h, pool_w = H // self.sr_ratio, W // self.sr_ratio
            x_ = gelu(PointwiseConv(C, name="sr")(x))
            x_ = avg_pool_to(x_, (pool_h, pool_w))
            x_ = nn.LayerNorm(name="norm")(
                x_.reshape(B, pool_h * pool_w, C)
            )
            # the reference REUSES the same kv projection on the pooled
            # tokens (:731 "k_pool, v_pool = self.kv(x_)") — not a separate
            # set of weights
            kv_pool = kv_dense(x_)
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
            out = RMSNorm(name="subln")(out)
            out = out * (1 - self.lambda_init_value)
            out = out.reshape(B, H, W, C).astype(x.dtype)

        out = out + DWConv2d(name="lepe")(v_pe)
        return out


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

        h = nn.LayerNorm(name="norm1")(x)
        act_res = jax.nn.silu(nn.Dense(C, name="act_proj")(h))
        h = nn.Dense(C, name="in_proj")(h)
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

        h = nn.Dense(C, name="out_proj")(h * act_res)
        x = shortcut + DropPath(self.drop_path)(h, deterministic)

        h = nn.LayerNorm(name="norm2")(x)
        h = Mlp(int(C * self.mlp_ratio), drop=self.drop, name="mlp")(
            h, deterministic
        )
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
