"""Mamba-1 block + single-scale SS2D cell.

TPU-native equivalents of the external CUDA modules the reference's variant
zoo calls into:
* ``Mamba`` — mamba_ssm's full block (in_proj -> causal depthwise conv1d +
  SiLU -> x_proj/dt_proj -> selective scan -> gate -> out_proj), used
  directly by the U-Mamba trainers (variants/mamba/UMambaBot_2d.py:15,39-64).
  The causal conv1d CUDA kernel (SURVEY.md N2) becomes a 'causal'-padded
  depthwise lax conv; the selective-scan CUDA kernel (N1) our chunked
  associative scan.
* ``SS2D`` — VMamba's single-scale 4-direction scan cell
  (MambaSkip.py:33-263, vmamba/vmamba.py SS2Dv0), used by the
  MedNext-Mambaskip lineage and VMamba-style variants.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.mamba_skip import (
    _a_log_init,
    _dt_proj_bias_init,
    _dt_proj_weight_init,
)
from mlagg_unet_tpu.ops.cross_scan import cross_merge_2d, cross_scan_2d
from mlagg_unet_tpu.ops import selective_scan_auto as selective_scan


class MambaBlock(nn.Module):
    """mamba_ssm.Mamba equivalent. Input/output: (B, L, d_model).

    ``bimamba_type='v3'`` enables SegMamba's tri-orientated Mamba (ToM):
    three independent causal-conv + selective-scan branches — forward,
    backward (sequence flipped), and inter-slice (sequence re-ordered so the
    scan walks across the ``nslices`` depth slices at each within-slice
    position) — summed before the shared gate/out_proj. Matches the SegMamba
    mamba_ssm fork's ``bimamba_type="v3", nslices=n`` forward (branch params
    ``conv1d_b/x_proj_b/dt_proj_b/A_b_log/D_b`` and ``*_s``); used by
    variants/mamba/nnUNetTrainer_SegMamba.py:119-143."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    # project_out=False returns the gated d_inner features without the final
    # out_proj (LKM-UNet's Bi*MambaLayers share one out_proj across the
    # forward/backward passes, nnUNetTrainer_LKM_UNet.py:163-180)
    project_out: bool = True
    bimamba_type: Optional[str] = None
    nslices: int = 0

    @nn.compact
    def __call__(self, x):
        B, L, _ = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
        xh, z = jnp.split(xz, 2, axis=-1)

        def branch(xb, suffix):
            """causal depthwise conv1d + SiLU -> x_proj/dt_proj ->
            selective scan, on a (possibly re-ordered) token sequence."""
            h = nn.Conv(
                d_inner, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
                feature_group_count=d_inner, name=f"conv1d{suffix}",
            )(xb)
            h = jax.nn.silu(h)

            x_dbl = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False,
                             name=f"x_proj{suffix}")(h)
            dt = x_dbl[..., :dt_rank]
            Bs = x_dbl[..., dt_rank: dt_rank + self.d_state]
            Cs = x_dbl[..., dt_rank + self.d_state:]

            dt_w = self.param(f"dt_proj{suffix}_weight",
                              _dt_proj_weight_init(dt_rank),
                              (d_inner, dt_rank), jnp.float32)
            dt_b = self.param(f"dt_proj{suffix}_bias", _dt_proj_bias_init(),
                              (d_inner,), jnp.float32)
            A_log = self.param(f"A{suffix}_log",
                               _a_log_init(1, d_inner, self.d_state),
                               (1, d_inner, self.d_state), jnp.float32)
            D = self.param(f"D{suffix}", nn.initializers.ones,
                           (d_inner,), jnp.float32)

            dts = jnp.einsum("bld,dr->blr", dt.astype(jnp.float32), dt_w.T)
            # to scan layout (b, g=1, d, l)
            u = jnp.swapaxes(h, 1, 2)[:, None]
            delta = jnp.swapaxes(dts, 1, 2)[:, None]
            Bs_s = jnp.swapaxes(Bs, 1, 2)[:, None].astype(jnp.float32)
            Cs_s = jnp.swapaxes(Cs, 1, 2)[:, None].astype(jnp.float32)
            A = -jnp.exp(A_log)

            y = selective_scan(
                u, delta, A, Bs_s, Cs_s, D[None], dt_b[None],
                delta_softplus=True,
            )[:, 0]                                    # (B, d_inner, L)
            return jnp.swapaxes(y, 1, 2)               # (B, L, d_inner)

        y = branch(xh, "")
        if self.bimamba_type == "v3":
            # backward branch: scan the flipped sequence, flip back. The
            # fork gates each branch with its own permuted z, which after
            # un-permuting aligns with the original z — so gating once
            # after the sum is exact.
            y = y + branch(xh[:, ::-1], "_b")[:, ::-1]
            ns = self.nslices
            assert ns > 0 and L % ns == 0, (
                f"bimamba v3 needs nslices ({ns}) dividing L ({L})")
            # inter-slice order: token s*(L/ns)+p -> position p*ns+s
            xs = xh.reshape(B, ns, L // ns, d_inner)
            xs = jnp.swapaxes(xs, 1, 2).reshape(B, L, d_inner)
            ys = branch(xs, "_s")
            ys = ys.reshape(B, L // ns, ns, d_inner)
            y = y + jnp.swapaxes(ys, 1, 2).reshape(B, L, d_inner)
        elif self.bimamba_type is not None:
            raise NotImplementedError(self.bimamba_type)

        y = y * jax.nn.silu(z)
        if not self.project_out:
            return y
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class SS2D(nn.Module):
    """Single-scale VMamba cell (MambaSkip.py:33-263): in_proj w/ z-gate ->
    depthwise conv -> 4-direction selective scan -> LN -> gate -> out_proj.
    Input/output: (B, H, W, d_model)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    conv_bias: bool = True
    expand: float = 2.0
    dropout: float = 0.0
    # forward_type ablation dispatch (reference vmamba.py:394-458). Base
    # tags: v0/v01/v02/v03/v2 = fp32 scan (our default); v04/v05/v3 = scan in
    # the input dtype; v31d/v051d = 1-direction; v32d/v052d = 2-direction.
    # Postfixes: _no32, _noz, _nozact, _onnone, _onsoftmax, _onsigmoid,
    # _ondwconv3. (All kernel-backend choices — Mamba/Core/Oflex/Triton —
    # collapse onto the one Pallas/XLA scan.)
    forward_type: str = "v2"

    def _parse_forward_type(self):
        ft = self.forward_type
        flags = {}
        tags = ("_no32", "_noz", "_nozact", "_onnone", "_onsoftmax",
                "_onsigmoid", "_ondwconv3")
        # strip until fixpoint: combined strings like "v05_noz_onsoftmax"
        # carry multiple tags in arbitrary order
        stripped = True
        while stripped:
            stripped = False
            for tag in tags:
                if ft.endswith(tag):
                    flags[tag] = True
                    ft = ft[: -len(tag)]
                    stripped = True
        force_fp32 = (ft not in ("v04", "v05", "v3", "v051d", "v052d",
                                 "v31d", "v32d")
                      and not flags.get("_no32"))
        if ft in ("v31d", "v051d"):
            directions = 1
        elif ft in ("v32d", "v052d"):
            directions = 2
        else:
            directions = 4
        return flags, force_fp32, directions

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from mlagg_unet_tpu.ops.cross_scan import (
            cross_merge_1direction,
            cross_merge_2direction,
            cross_scan_1direction,
            cross_scan_2direction,
        )

        flags, force_fp32, directions = self._parse_forward_type()
        scan_fn, merge_fn = {
            1: (cross_scan_1direction, cross_merge_1direction),
            2: (cross_scan_2direction, cross_merge_2direction),
            4: (cross_scan_2d, cross_merge_2d),
        }[directions]
        disable_z = flags.get("_noz", False)

        B, H, W, _ = x.shape
        d_inner = int(self.expand * self.d_model)
        dt_rank = math.ceil(self.d_model / 16)
        K = 4
        L = H * W

        if disable_z:
            xh = nn.Dense(d_inner, use_bias=False, name="in_proj")(x)
            z = None
        else:
            xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
            xh, z = jnp.split(xz, 2, axis=-1)
        xh = nn.Conv(d_inner, (self.d_conv, self.d_conv), padding="SAME",
                     feature_group_count=d_inner, use_bias=self.conv_bias,
                     name="conv2d")(xh)
        xh = jax.nn.silu(xh)

        x_proj_weight = self.param(
            "x_proj_weight", nn.initializers.lecun_normal(),
            (K, dt_rank + 2 * self.d_state, d_inner), jnp.float32,
        )
        dt_projs_weight = self.param(
            "dt_projs_weight", _dt_proj_weight_init(dt_rank),
            (K, d_inner, dt_rank), jnp.float32,
        )
        dt_projs_bias = self.param("dt_projs_bias", _dt_proj_bias_init(),
                                   (K, d_inner), jnp.float32)
        A_logs = self.param("A_logs",
                            _a_log_init(K, d_inner, self.d_state),
                            (K, d_inner, self.d_state), jnp.float32)
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner), jnp.float32)
        A = -jnp.exp(A_logs)

        def project_and_scan(xs, k_sl, reverse, interleaved=False):
            scan_dtype = jnp.float32 if force_fp32 else xs.dtype
            x_dbl = jnp.einsum("bkdl,kcd->bkcl", xs.astype(scan_dtype),
                               x_proj_weight[k_sl].astype(scan_dtype),
                               preferred_element_type=scan_dtype)
            dts = jnp.einsum("bkrl,kdr->bkdl", x_dbl[:, :, :dt_rank],
                             dt_projs_weight[k_sl].astype(scan_dtype),
                             preferred_element_type=scan_dtype)
            Bs = x_dbl[:, :, dt_rank: dt_rank + self.d_state]
            Cs = x_dbl[:, :, dt_rank + self.d_state:]
            return selective_scan(xs, dts, A[k_sl], Bs, Cs, Ds[k_sl],
                                  dt_projs_bias[k_sl], delta_softplus=True,
                                  reverse=reverse, interleaved=interleaved)

        if directions == 4:
            # kernel-folded reversal: directions 2/3 scan the SAME two
            # layouts right-to-left (reverse=True index maps) — no flip
            # copies in scan or merge (see ops/cross_scan._dirs01)
            from mlagg_unet_tpu.ops import scan_impl_is_pallas
            from mlagg_unet_tpu.ops.cross_scan import (
                _dirs01,
                deinterleave_to_tokens,
                interleave_tokens,
            )
            from mlagg_unet_tpu.ops.selective_scan_pallas import (
                IL_MEGA,
                interleaved_scan_ok,
            )

            use_il = (scan_impl_is_pallas()
                      and interleaved_scan_ok(B, 2, d_inner, self.d_state))
            if use_il:
                # interleaved fast path (same contract as the MSMM,
                # mamba_skip.py): operands born in the v2 kernels' lane
                # order, composing the interleave into the cross-scan
                # transposes. Single scale => the zero pad is TERMINAL for
                # the forward scan and LEADING for the reverse one; both
                # keep h = 0 through it (u = B = 0), so no delta mask is
                # needed and y's pad region is never read.
                row_t = xh.reshape(B, L, d_inner)
                col_t = jnp.transpose(xh, (0, 2, 1, 3)).reshape(B, L, d_inner)
                xs2 = jnp.stack([interleave_tokens(row_t, IL_MEGA),
                                 interleave_tokens(col_t, IL_MEGA)], axis=1)
            else:
                d0, d1 = _dirs01(xh)
                xs2 = jnp.stack([d0, d1], axis=1)      # (B, 2, Din, L)
            y_f = project_and_scan(xs2, slice(0, 2), False, use_il)
            y_r = project_and_scan(xs2, slice(2, 4), True, use_il)
            if use_il:
                tf = deinterleave_to_tokens(y_f, IL_MEGA, L)  # (B,2,L,Din)
                tr = deinterleave_to_tokens(y_r, IL_MEGA, L)
                row = tf[:, 0] + tr[:, 0]              # token-major already
                col = tf[:, 1] + tr[:, 1]
                col = jnp.transpose(col.reshape(B, W, H, d_inner),
                                    (0, 2, 1, 3)).reshape(B, L, d_inner)
                y = row + col                          # (B, L, Din)
            else:
                row = y_f[:, 0] + y_r[:, 0]            # (B, Din, L)
                col = y_f[:, 1] + y_r[:, 1]
                col = jnp.transpose(col.reshape(B, d_inner, W, H),
                                    (0, 1, 3, 2)).reshape(B, d_inner, L)
                y = jnp.swapaxes(row + col, 1, 2)      # (B, L, Din)
        else:
            xs = scan_fn(xh)                           # (B, 4, Din, L)
            out_y = project_and_scan(xs, slice(0, K), False)
            y = merge_fn(out_y, H, W)                  # (B,Din,L)
            y = jnp.swapaxes(y, 1, 2)                  # (B,L,Din)
        if flags.get("_onnone"):
            pass
        elif flags.get("_onsoftmax"):
            y = jax.nn.softmax(y, axis=1)              # over L (ref v05x)
        elif flags.get("_onsigmoid"):
            y = jax.nn.sigmoid(y)
        elif flags.get("_ondwconv3"):
            y = y.reshape(B, H, W, d_inner)
            y = nn.Conv(d_inner, (3, 3), padding="SAME",
                        feature_group_count=d_inner, name="out_norm_dwconv")(y)
            y = y.reshape(B, L, d_inner)
        else:
            y = nn.LayerNorm(name="out_norm")(y)
        y = y.reshape(B, H, W, d_inner)
        if z is not None:
            y = y * (z if flags.get("_nozact") else jax.nn.silu(z))
        y = nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y
