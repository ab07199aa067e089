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


# ---------------------------------------------------------------------------
# Reference-flagship key mapping (MLLA_Uper checkpoints).
#
# Verified end-to-end by tests/test_torch_parity.py: a reference
# nnUNetTrainer_MLAgg_2D_dt_MS checkpoint converted through these rules
# reproduces the torch forward to <=1e-4 relative on every output.
# ---------------------------------------------------------------------------

import re as _re

REFERENCE_FLAGSHIP_RULES = [
    (r"^mlla\.layers\.(\d+)\.blocks\.(\d+)\.", r"mlla.layer\1.block\2."),
    (r"^mlla\.layers\.(\d+)\.downsample\.", r"mlla.down\1."),
    (r"^mlla\.downs\.(\d+)\.norm\.", r"mlla.down\1.norm.GroupNorm_0."),
    (r"^mlla\.downs\.(\d+)\.", r"mlla.down\1."),
    (r"\.attn\.0\.", ".attn_local."),
    (r"\.attn\.1\.", ".attn_pool."),
    (r"^mambaskip\.blocks\.(\d+)\.", r"mambaskip.block\1."),
    (r"\.conv2d\.(\d+)\.", r".conv2d_\1."),
    (r"\.mlps\.(\d+)\.", r".mlp\1."),
    (r"\.conv_branches\.(\d+)\.0\.", r".conv_branch\1."),
    (r"\.conv_branches\.(\d+)\.1\.", r".conv_norm\1.GroupNorm_0."),
    (r"^dec_block_(\d+)\.(\d+)\.", r"dec_block_\1_\2."),
    (r"\.dwconv\.dwconv\.", ".DWConv2d_0.Conv_0."),
    (r"\.dwc\.", ".dwc.Conv_0."),
    (r"\.lepe\.", ".lepe.Conv_0."),
    (r"\.fc1\.", ".Dense_0."),
    (r"\.fc2\.", ".Dense_1."),
    (r"^(encoder0|decoder0)\.(.*)\.conv\.", r"\1.\2."),
    (r"^(dec_block_\d+_\d+)\.norm\.", r"\1.norm.GroupNorm_0."),
    (r"^(up_\d+)\.norm\.", r"\1.norm.GroupNorm_0."),
    (r"^(encoder0|decoder0)\.(.*)\.norm(\d)\.", r"\1.\2.norm\3.GroupNorm_0."),
    (r"^out_(\d)\.conv_out\.conv\.", r"out_\1.conv_out."),
]

# keys whose tensors use torch's ConvTranspose layout (I, O/g, *k) —
# including OutBlock, which the reference implements as ConvTranspose(k=1)
_REFERENCE_TRANSPOSED = _re.compile(
    r"(transp_conv|up_\d+\.conv1|up_\d+\.res_conv|out_\d+\.conv_out)"
    r"(\.conv)?\.(weight|bias)$")


def reference_key_to_flax(key: str) -> str:
    for pat, rep in REFERENCE_FLAGSHIP_RULES:
        key = _re.sub(pat, rep, key)
    return key


# MedNeXt family checkpoints (network_architecture/mednextv1/
# MedNextV1_new.py and MedNextV1_new_Mambaskip.py)
REFERENCE_MEDNEXT_RULES = [
    # MSMM skip module (Mambaskip variant)
    (r"^mambaskip\.blocks\.(\d+)\.", r"mambaskip.block\1."),
    (r"\.conv2d\.(\d+)\.", r".conv2d_\1."),
    (r"\.mlps\.(\d+)\.", r".mlp\1."),
    (r"\.conv_branches\.(\d+)\.0\.", r".conv_branch\1."),
    (r"\.conv_branches\.(\d+)\.1\.", r".conv_norm\1.GroupNorm_0."),
    (r"\.dwconv\.dwconv\.", ".DWConv2d_0.Conv_0."),
    (r"\.fc1\.", ".Dense_0."),
    (r"\.fc2\.", ".Dense_1."),
    # MedNeXt trunk
    (r"^(enc_block|dec_block)_(\d+)\.(\d+)\.", r"\1_\2_\3."),
    (r"^bottleneck\.(\d+)\.", r"bottleneck_\1."),
    (r"\.norm\.", ".norm.GroupNorm_0."),
    (r"^out_(\d)\.conv_out\.conv\.", r"out_\1.conv_out."),
]


def _convert_reference_state_dict(state_dict, rules) -> Dict[str, np.ndarray]:
    out = {}
    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key == "dummy_tensor":
            continue
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        # reference merges the K=4 scan directions: A_logs (K*d, n),
        # Ds (K*d,) (MambaSkip.py:339-341); ours keep the K axis
        leaf_name = key.split(".")[-1]
        if leaf_name == "A_logs":
            arr = arr.reshape(4, -1, arr.shape[-1])
        elif leaf_name == "Ds":
            arr = arr.reshape(4, -1)
        elif key.endswith(("grn_beta", "grn_gamma")):
            # torch channels-first (1, C, 1, 1[, 1]) -> channels-last
            arr = np.moveaxis(arr, 1, -1)
        transposed = bool(_REFERENCE_TRANSPOSED.search(key))
        mapped = key
        for pat, rep in rules:
            mapped = _re.sub(pat, rep, mapped)
        parts = mapped.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim >= 3:
                # torch ConvTranspose stores (I, O/g, *k); ours is
                # (*k, I/g, O). For DEPTHWISE transposed convs (O/g == 1,
                # e.g. MedNeXtUpBlock conv1) the torch dim-0 is the group
                # axis and maps to our LAST axis — same as a forward conv.
                if transposed and arr.shape[1] != 1:
                    arr = np.moveaxis(arr, (0, 1), (-2, -1))
                else:
                    arr = np.moveaxis(arr, (0, 1), (-1, -2))
                leaf = "kernel"
            elif arr.ndim == 2:
                arr = arr.T
                leaf = "kernel"
            else:
                leaf = "scale"
        out["/".join(parts[:-1] + [leaf])] = arr
    return out


def convert_reference_flagship_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch MLLA_Uper state_dict -> {'a/b/c': array} in flax layout."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_FLAGSHIP_RULES)


def convert_reference_mednext_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch MedNeXt (MedNextV1_new) state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_MEDNEXT_RULES)


def load_pretrained_torch_weights(params, torch_checkpoint_path: str,
                                  verbose: bool = False,
                                  key_map: str = "generic",
                                  ) -> Tuple[dict, int, int]:
    """Name+shape-matched transfer from a torch .pth/.pt checkpoint into a
    flax params tree. Returns (updated params, n_transferred, n_total).

    key_map="reference_flagship" applies the verified MLLA_Uper name/layout
    mapping (see convert_reference_flagship_state_dict); "generic" uses the
    plain layout conversion with exact-key matching."""
    import jax

    state_dict = load_torch_checkpoint_state_dict(torch_checkpoint_path)
    if key_map == "reference_flagship":
        src_flat = convert_reference_flagship_state_dict(state_dict)
    elif key_map == "reference_mednext":
        src_flat = convert_reference_mednext_state_dict(state_dict)
    else:
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
