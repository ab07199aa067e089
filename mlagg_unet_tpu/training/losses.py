"""Segmentation losses, TPU-first.

Functional JAX ports of the reference losses
(mlagg/nnunetv2/training/loss/dice.py:59 MemoryEfficientSoftDiceLoss,
compound_losses.py:8 DC_and_CE, :60 DC_and_BCE, :103 DC_and_topk,
robust_ce_loss.py, deep_supervision.py:4), with two deliberate departures:

* channels-LAST layout: logits are (B, *spatial, C); integer targets are
  (B, *spatial); one-hot/region targets are (B, *spatial, C).
* distribution: the reference's AllGatherGrad autograd function
  (utilities/ddp_allgather.py:25, used dice.py:104-107) is unnecessary here —
  under jit with a batch-sharded input, ``jnp.sum`` over the batch axis IS the
  cross-device reduction (GSPMD inserts the psum), and it is differentiable
  for free. Global batch-dice therefore has no distribution-specific code.

All dice accumulations are forced to float32 (bf16 sums across a whole patch
lose precision).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


def _one_hot(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, *spatial) int -> (B, *spatial, C) float32 one-hot."""
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def soft_dice_terms(
    probs: jnp.ndarray,
    target_onehot: jnp.ndarray,
    loss_mask: Optional[jnp.ndarray] = None,
):
    """Per-(batch, class) intersect / sum_pred / sum_gt, reduced over spatial.

    probs, target_onehot: (B, *spatial, C); loss_mask: (B, *spatial) or None.
    Returns three (B, C) float32 arrays.
    """
    probs = probs.astype(jnp.float32)
    target_onehot = target_onehot.astype(jnp.float32)
    spatial_axes = tuple(range(1, probs.ndim - 1))
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)[..., None]
        intersect = jnp.sum(probs * target_onehot * m, axis=spatial_axes)
        sum_pred = jnp.sum(probs * m, axis=spatial_axes)
        sum_gt = jnp.sum(target_onehot * m, axis=spatial_axes)
    else:
        intersect = jnp.sum(probs * target_onehot, axis=spatial_axes)
        sum_pred = jnp.sum(probs, axis=spatial_axes)
        sum_gt = jnp.sum(target_onehot, axis=spatial_axes)
    return intersect, sum_pred, sum_gt


def memory_efficient_soft_dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    apply_nonlin: Optional[Callable] = jax.nn.softmax,
    batch_dice: bool = False,
    do_bg: bool = True,
    smooth: float = 1.0,
    loss_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference: MemoryEfficientSoftDiceLoss (dice.py:59-117).

    logits: (B, *spatial, C). target: (B, *spatial) int labelmap or
    (B, *spatial, C) one-hot (regions). loss_mask: (B, *spatial), 1 = valid.
    """
    num_classes = logits.shape[-1]
    x = logits.astype(jnp.float32)
    if apply_nonlin is not None:
        x = apply_nonlin(x)

    if target.ndim == x.ndim:
        y_onehot = target.astype(jnp.float32)
    else:
        y_onehot = _one_hot(target, num_classes)

    if not do_bg:
        x = x[..., 1:]
        y_onehot = y_onehot[..., 1:]

    intersect, sum_pred, sum_gt = soft_dice_terms(x, y_onehot, loss_mask)

    if batch_dice:
        # with a batch-sharded input this sum is the global cross-device
        # reduction (replaces AllGatherGrad, dice.py:104-107)
        intersect = intersect.sum(0)
        sum_pred = sum_pred.sum(0)
        sum_gt = sum_gt.sum(0)

    dc = (2.0 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth, 1e-8)
    return -dc.mean()


def _select_class_logp(logp: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """logp[..., tgt] via a one-hot contraction: gathers lower to slow
    scalar loads on TPU (measured 8.5 ms at bs10 full-res vs ~0.2 ms for
    the one-hot multiply-sum, which fuses into the log_softmax)."""
    oh = jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype)
    return jnp.sum(logp * oh, axis=-1)


def robust_cross_entropy_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Mean softmax CE (reference robust_ce_loss.py). logits (B,*s,C),
    target (B,*s) int. ignore_index voxels contribute 0 and are excluded
    from the mean."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if ignore_index is not None:
        valid = (target != ignore_index).astype(jnp.float32)
        tgt = jnp.where(target == ignore_index, 0, target)
        nll = -_select_class_logp(logp, tgt)
        return jnp.sum(nll * valid) / jnp.clip(jnp.sum(valid), 1.0)
    nll = -_select_class_logp(logp, target)
    return nll.mean()


def topk_cross_entropy_loss(
    logits: jnp.ndarray, target: jnp.ndarray, k_percent: float = 10.0,
    label_smoothing: float = 0.0, ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """TopK CE (reference robust_ce_loss.py:19): mean over the hardest
    k% voxels. Static k keeps shapes static under jit. label_smoothing
    follows torch CE semantics (nnUNetTrainerTopk10LossLS01 uses 0.1);
    ignore_index voxels contribute zero loss before the top-k selection
    (matching the reference's reduction='none' + topk path)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = target
    if ignore_index is not None:
        tgt = jnp.where(target == ignore_index, 0, target)
    nll = -_select_class_logp(logp, tgt)
    if label_smoothing > 0.0:
        smooth_nll = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth_nll
    if ignore_index is not None:
        nll = jnp.where(target == ignore_index, 0.0, nll)
    flat = nll.reshape(-1)
    k = max(1, int(flat.shape[0] * k_percent / 100.0))
    topk = jax.lax.top_k(flat, k)[0]
    return topk.mean()


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy with logits (no reduction)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def dc_and_ce_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    batch_dice: bool = False,
    smooth: float = 1e-5,
    do_bg: bool = False,
    ignore_label: Optional[int] = None,
) -> jnp.ndarray:
    """DC_and_CE_loss (compound_losses.py:8-57). target: (B, *spatial) int."""
    if ignore_label is not None:
        mask = (target != ignore_label).astype(jnp.float32)
        target_dice = jnp.where(target == ignore_label, 0, target)
        num_fg = mask.sum()
    else:
        mask = None
        target_dice = target
        num_fg = None

    dc = memory_efficient_soft_dice_loss(
        logits, target_dice, apply_nonlin=jax.nn.softmax, batch_dice=batch_dice,
        do_bg=do_bg, smooth=smooth, loss_mask=mask,
    ) if weight_dice != 0 else 0.0

    if weight_ce != 0:
        ce = robust_cross_entropy_loss(logits, target, ignore_index=ignore_label)
        if ignore_label is not None:
            # reference skips CE entirely when no fg voxel is valid
            ce = jnp.where(num_fg > 0, ce, 0.0)
    else:
        ce = 0.0
    return weight_ce * ce + weight_dice * dc


def dc_and_bce_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    batch_dice: bool = False,
    smooth: float = 1e-5,
    use_ignore_label: bool = False,
) -> jnp.ndarray:
    """DC_and_BCE_loss for region-based training (compound_losses.py:60-101).

    target: (B, *spatial, C[+1]) one-hot regions; if use_ignore_label the
    LAST channel marks ignored voxels.
    """
    if use_ignore_label:
        mask = 1.0 - target[..., -1].astype(jnp.float32)
        target_regions = target[..., :-1]
    else:
        mask = None
        target_regions = target

    dc = memory_efficient_soft_dice_loss(
        logits, target_regions, apply_nonlin=jax.nn.sigmoid,
        batch_dice=batch_dice, do_bg=True, smooth=smooth, loss_mask=mask,
    ) if weight_dice != 0 else 0.0

    ce_elem = bce_with_logits(logits, target_regions)
    if mask is not None:
        ce = jnp.sum(ce_elem * mask[..., None]) / jnp.clip(
            mask.sum() * ce_elem.shape[-1], 1e-8
        )
    else:
        ce = ce_elem.mean()
    return weight_ce * ce + weight_dice * dc


def dc_and_topk_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    batch_dice: bool = False,
    smooth: float = 1e-5,
    do_bg: bool = False,
    k_percent: float = 10.0,
    ignore_label: Optional[int] = None,
) -> jnp.ndarray:
    """DC_and_topk_loss (compound_losses.py:103)."""
    if ignore_label is not None:
        mask = (target != ignore_label).astype(jnp.float32)
        target_dice = jnp.where(target == ignore_label, 0, target)
    else:
        mask = None
        target_dice = target
    dc = memory_efficient_soft_dice_loss(
        logits, target_dice, apply_nonlin=jax.nn.softmax, batch_dice=batch_dice,
        do_bg=do_bg, smooth=smooth, loss_mask=mask,
    ) if weight_dice != 0 else 0.0
    ce = topk_cross_entropy_loss(logits, target, k_percent) if weight_ce != 0 else 0.0
    return weight_ce * ce + weight_dice * dc


def deep_supervision_loss(
    loss_fn: Callable,
    outputs: Sequence[jnp.ndarray],
    targets: Sequence[jnp.ndarray],
    weights: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """DeepSupervisionWrapper (deep_supervision.py:4): weighted sum of
    loss_fn over matched output/target pairs."""
    if weights is None:
        weights = [1.0] * len(outputs)
    total = 0.0
    for w, o, t in zip(weights, outputs, targets):
        if w == 0:
            continue
        total = total + w * loss_fn(o, t)
    return total


def deep_supervision_weights(num_scales: int, drop_lowest: int = 0) -> List[float]:
    """Exponentially decaying, normalized DS weights
    (reference nnUNetTrainer.py:344-351 / flagship trainer :120-128)."""
    import numpy as np

    w = np.array([1.0 / (2.0 ** i) for i in range(num_scales)])
    if drop_lowest > 0:
        w[-drop_lowest:] = 0.0
    w = w / w.sum()
    return list(w)


def downsample_seg_for_ds(
    seg: jnp.ndarray, scales: Sequence[Sequence[float]]
) -> List[jnp.ndarray]:
    """Nearest-neighbor downsampling of an integer (B, *spatial) seg to each
    DS scale (reference DownsampleSegForDSTransform2). Runs on device with
    static shapes; exact power-of-two scales become strided slices."""
    out = []
    for scale in scales:
        if all(s == 1 for s in scale):
            out.append(seg)
            continue
        slicer = tuple(
            [slice(None)]
            + [slice(0, None, int(round(1.0 / s))) for s in scale]
        )
        out.append(seg[slicer])
    return out


def get_tp_fp_fn_tn(
    probs: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    batch_reduce: bool = True,
):
    """Hard tp/fp/fn/tn per class for the online "pseudo dice"
    (reference dice.py:120 + nnUNetTrainer.py:895-941). probs may be hard
    one-hot predictions. Returns (C,) if batch_reduce else (B, C)."""
    probs = probs.astype(jnp.float32)
    target = target.astype(jnp.float32)
    axes = tuple(range(1, probs.ndim - 1))
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        probs = probs * m
        target = target * m
    tp = jnp.sum(probs * target, axis=axes)
    fp = jnp.sum(probs * (1 - target), axis=axes)
    fn = jnp.sum((1 - probs) * target, axis=axes)
    tn = jnp.sum((1 - probs) * (1 - target), axis=axes)
    if batch_reduce:
        return tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0)
    return tp, fp, fn, tn
