"""Pretrained-weight transfer (reference: run/load_pretrained_weights.py:5):
name- and shape-matched parameter transfer for fine-tuning
(-pretrained_weights flag). Params whose path+shape match are copied;
everything else keeps its fresh initialization.
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

from mlagg_unet_tpu.training.checkpoint import load_checkpoint


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = leaf
    return flat


def load_pretrained_weights(params, pretrained_checkpoint_path: str,
                            verbose: bool = False) -> Tuple[dict, int, int]:
    """Returns (updated params, n_transferred, n_total)."""
    ckpt = load_checkpoint(pretrained_checkpoint_path)
    source = ckpt["network_weights"] if "network_weights" in ckpt else ckpt
    src_flat = _flatten(source)

    n_transferred = 0
    n_total = 0

    def maybe_replace(path, leaf):
        nonlocal n_transferred, n_total
        n_total += 1
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if key in src_flat and tuple(src_flat[key].shape) == tuple(leaf.shape):
            n_transferred += 1
            if verbose:
                print(f"transfer: {key} {leaf.shape}")
            return np.asarray(src_flat[key]).astype(leaf.dtype)
        if verbose:
            print(f"keep init: {key} {leaf.shape}")
        return leaf

    new_params = jax.tree_util.tree_map_with_path(maybe_replace, params)
    return new_params, n_transferred, n_total
