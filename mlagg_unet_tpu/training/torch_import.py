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
    r"(transp_conv|transpconvs\.\d+|up_\d+\.conv1|up_\d+\.res_conv"
    r"|out_\d+\.conv_out)(\.conv)?\.(weight|bias)$")


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


# MSVM-UNet checkpoints (variants/mamba/nnUNetTrainer_MSVM_UNet.py:2685-
# 2960: VSSM tiny_0230s encoder + LKPE/MSVSS decoder). Verified end-to-end
# by tests/test_torch_parity.py::test_msvm_unet_forward_parity.
REFERENCE_MSVM_RULES = [
    (r"^encoder\.layer0\.0\.", "encoder.patch_embed.conv1."),
    (r"^encoder\.layer0\.2\.", "encoder.patch_embed.norm1."),
    (r"^encoder\.layer1\.0\.", "encoder.patch_embed.conv2."),
    (r"^encoder\.layer1\.2\.", "encoder.patch_embed.norm2."),
    (r"^encoder\.layers\.(\d+)\.blocks\.(\d+)\.", r"encoder.layer\1_block\2."),
    (r"^encoder\.downsamples\.(\d+)\.1\.", r"encoder.downsample\1.conv."),
    (r"^encoder\.downsamples\.(\d+)\.3\.", r"encoder.downsample\1.norm."),
    (r"^decoder\.layers\.(\d+)\.up\.expand\.0\.", r"up\1.up.expand_conv1."),
    (r"^decoder\.layers\.(\d+)\.up\.expand\.1\.", r"up\1.up.bn."),
    (r"^decoder\.layers\.(\d+)\.up\.expand\.3\.", r"up\1.up.expand_dwconv."),
    (r"^decoder\.layers\.(\d+)\.up\.norm\.", r"up\1.up.norm."),
    (r"^decoder\.layers\.(\d+)\.concat_layer\.", r"up\1.concat_layer."),
    (r"^decoder\.layers\.(\d+)\.vss_layer\.blocks\.(\d+)\.", r"up\1.block\2."),
    (r"^decoder\.out_layers\.0\.expand\.0\.", "final.expand_conv1."),
    (r"^decoder\.out_layers\.0\.expand\.1\.", "final.bn."),
    (r"^decoder\.out_layers\.0\.expand\.3\.", "final.expand_dwconv."),
    (r"^decoder\.out_layers\.0\.norm\.", "final.norm."),
    (r"^decoder\.out_layers\.0\.out\.", "final.out."),
    (r"\.multiscale_conv\.dw_convs\.(\d+)\.", r".multiscale_conv.dw\1."),
]


# LKM-UNet checkpoints (variants/mamba/nnUNetTrainer_LKM_UNet.py:122-730).
# Verified by tests/test_torch_parity.py::test_lkm_unet_forward_parity.
REFERENCE_LKM_RULES = [
    (r"^decoder\.encoder\.", None),        # duplicate module registration
    (r"^encoder\.stem\.convs\.(\d+)\.norm\.",
     r"stem.conv\1.norm.GroupNorm_0."),
    (r"^encoder\.stem\.convs\.(\d+)\.", r"stem.conv\1."),
    (r"^encoder\.stages\.(\d+)\.blocks\.(\d+)\.", r"stage\1.block\2."),
    (r"^encoder\.mamba_layers\.(\d+)\.", r"pixel_mamba\1.bi."),
    (r"^encoder\.w_mamba_layers\.(\d+)\.", r"window_mamba\1.bi."),
    (r"^decoder\.transpconvs\.(\d+)\.", r"transpconv\1."),
    (r"^decoder\.stages\.(\d+)\.blocks\.(\d+)\.", r"dec_stage\1.block\2."),
    (r"^decoder\.seg_layers\.(\d+)\.", r"seg\1."),
    (r"\.skip\.0\.", ".skip.conv."),
    (r"\.skip\.1\.", ".skip.norm.GroupNorm_0."),
    (r"\.(conv1|conv2)\.norm\.", r".\1.norm.GroupNorm_0."),
    (r"\.dt_proj\.weight$", ".dt_proj_weight"),
    (r"\.dt_proj\.bias$", ".dt_proj_bias"),
]


# Swin-UMamba checkpoints (variants/mamba/nnUNetTrainerSwinUMambaScratch.py
# :556-734 and nnUNetTrainerSwinUMambaDScratch.py:728-744). Verified by
# tests/test_torch_parity.py::test_swin_umamba{,_d}_forward_parity.
_SWIN_UMAMBA_SHARED = [
    (r"^(decoder\.)?vssm_encoder\.patch_embed\.proj\.",
     "vssm_encoder.patch_embed_proj."),
    (r"^(decoder\.)?vssm_encoder\.patch_embed\.norm\.",
     "vssm_encoder.patch_embed_norm."),
    (r"^vssm_encoder\.layers\.(\d+)\.blocks\.(\d+)\.",
     r"vssm_encoder.layer\1.block\2."),
    (r"^vssm_encoder\.downsamples\.(\d+)\.", r"vssm_encoder.downsample\1."),
]

REFERENCE_SWIN_UMAMBA_RULES = _SWIN_UMAMBA_SHARED + [
    (r"^stem\.0\.", "stem_conv."),
    (r"^stem\.1\.", "stem_norm.GroupNorm_0."),
    (r"^out_layers\.(\d+)\.conv\.conv\.", r"out\1.conv."),
    (r"\.transp_conv\.conv\.", ".transp_conv."),
    (r"\.(conv1|conv2|conv3)\.conv\.", r".\1."),
    (r"\.(norm1|norm2|norm3)\.", r".\1.GroupNorm_0."),
]

REFERENCE_SWIN_UMAMBA_D_RULES = _SWIN_UMAMBA_SHARED + [
    (r"^decoder\.expand_layers\.(\d+)\.", r"expand\1."),
    (r"^decoder\.stages\.(\d+)\.blocks\.(\d+)\.", r"stage\1.block\2."),
    (r"^decoder\.concat_back_dim\.(\d+)\.", r"concat_back_dim\1."),
    (r"^decoder\.seg_layers\.(\d+)\.", r"seg\1."),
]


# U-Mamba checkpoints (variants/mamba/UMambaBot_2d.py:367-441 /
# UMambaEnc_2d.py:421-489 and their _3d twins). Verified by
# tests/test_torch_parity.py::test_umamba_{bot,enc}_forward_parity.
REFERENCE_UMAMBA_RULES = [
    (r"^decoder\.encoder\.", None),        # duplicate module registration
    # SS3D variants: VSS blocks at the bottleneck / per stage
    # (UMambaBot_SS3D.py:806-821, UMambaEnc_SS3D.py:645-660)
    (r"^mamba_layer\.blocks\.(\d+)\.", r"bot_vss\1."),
    (r"^encoder\.mamba_layers\.(\d+)\.blocks\.0\.", r"enc_vss\1."),
    (r"\.mlp\.dwconv\.dwconv\.", ".mlp.dwconv."),
    # protect the VSS blocks' LayerNorms from the BasicResBlock
    # InstanceNorm rewrite below (marker stripped by the last rule)
    (r"^((?:bot|enc)_vss\d+)\.norm", r"\1.@ln@norm"),
    (r"^encoder\.stem\.(\d+)\.", r"stem_block\1."),
    (r"^encoder\.stages\.(\d+)\.(\d+)\.", r"stage\1_block\2."),
    (r"^encoder\.mamba_layers\.(\d+)\.", r"enc_mamba\1."),
    (r"^mamba_layer\.", "bot_mamba."),
    (r"^decoder\.upsample_layers\.(\d+)\.", r"up\1."),
    (r"^decoder\.stages\.(\d+)\.(\d+)\.", r"dec_stage\1_block\2."),
    (r"^decoder\.seg_layers\.(\d+)\.", r"seg\1."),
    (r"\.(conv1|conv2)\.norm\.", r".\1.norm.GroupNorm_0."),   # BasicBlockD
    (r"\.norm([12])\.", r".norm\1.GroupNorm_0."),             # BasicResBlock
    (r"\.dt_proj\.weight$", ".dt_proj_weight"),
    (r"\.dt_proj\.bias$", ".dt_proj_bias"),
    (r"@ln@", ""),
]


# SegMamba checkpoints (variants/mamba/nnUNetTrainer_SegMamba.py:264-416:
# MambaEncoder 'vit' + monai UnetrBasicBlock/UnetrUpBlock decoder). The
# tri-orientated Mamba branch params (_b/_s) follow the same dt_proj
# flattening as the main branch. Verified by
# tests/test_torch_parity.py::test_segmamba_forward_parity.
REFERENCE_SEGMAMBA_RULES = [
    (r"^vit\.downsample_layers\.0\.0\.", "vit.stem."),
    (r"^vit\.downsample_layers\.(\d+)\.1\.", r"vit.downsample\1."),
    (r"^vit\.gscs\.(\d+)\.", r"vit.gsc\1."),
    (r"^vit\.stages\.(\d+)\.(\d+)\.", r"vit.stage\1_\2."),
    (r"^vit\.mlps\.(\d+)\.", r"vit.mlp\1."),
    (r"\.dt_proj(_b|_s)?\.(weight|bias)$", r".dt_proj\1_\2"),
    (r"^out\.conv\.conv\.", "out."),
    (r"\.transp_conv\.conv\.", ".transp_conv."),
    (r"\.(conv1|conv2|conv3)\.conv\.", r".\1."),
    (r"\.(norm1|norm2|norm3)\.", r".\1.GroupNorm_0."),
]


def convert_reference_segmamba_state_dict(state_dict
                                          ) -> Dict[str, np.ndarray]:
    """torch SegMamba state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_SEGMAMBA_RULES)


# LightM-UNet (nnUNetTrainer_LightMUNet.py:292-417, MONAI SegResNet
# skeleton). Verified by test_torch_parity.py::test_lightm_unet_parity.
REFERENCE_LIGHTM_RULES = [
    (r"^convInit\.0\.conv\.", "convInit.dw."),
    (r"^convInit\.1\.conv\.", "convInit.pw."),
    (r"^down_layers\.(\d+)\.0\.0\.", r"down\1_mamba."),
    (r"^down_layers\.(\d+)\.(\d+)\.", lambda m: (
        f"down{m.group(1)}_block{int(m.group(2)) - 1}.")),
    (r"^up_samples\.(\d+)\.0\.conv\.", r"up\1_conv."),
    (r"^up_layers\.(\d+)\.(\d+)\.", r"up\1_block\2."),
    (r"^conv_final\.0\.", "final_norm.GroupNorm_0."),
    (r"^conv_final\.2\.0\.conv\.", "conv_final.dw."),
    (r"^conv_final\.2\.1\.conv\.", "conv_final.pw."),
    (r"\.conv\.0\.conv\.", ".conv.dw."),        # ResUpBlock dwconv
    (r"\.conv\.1\.conv\.", ".conv.pw."),
    (r"\.(norm1|norm2)\.", r".\1.GroupNorm_0."),
    (r"\.dt_proj\.(weight|bias)$", r".dt_proj_\1"),
]


def convert_reference_lightm_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch LightMUNet state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict, REFERENCE_LIGHTM_RULES)


# VM-UNet (nnUNetTrainer_VMUNet.py:713-880). SS2D-internal names match our
# cell directly (see test_vmamba_ss2d_cell_parity's empty rule set).
# Verified by test_torch_parity.py::test_vmunet_parity.
REFERENCE_VMUNET_RULES = [
    (r"^vmunet\.patch_embed\.proj\.", "patch_embed."),
    (r"^vmunet\.patch_embed\.norm\.", "patch_norm."),
    (r"^vmunet\.layers\.(\d+)\.blocks\.(\d+)\.", r"layer\1_block\2."),
    (r"^vmunet\.layers\.(\d+)\.downsample\.", r"downsample\1."),
    (r"^vmunet\.layers_up\.(\d+)\.blocks\.(\d+)\.", r"uplayer\1_block\2."),
    (r"^vmunet\.layers_up\.(\d+)\.upsample\.", r"up\1."),
    (r"^vmunet\.", ""),                      # final_up / final_conv
]


def convert_reference_vmunet_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch VMUNet state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict, REFERENCE_VMUNET_RULES)


# Mamba-UNet (nnUNetTrainer_MambaUNet.py:772-915, Swin-UNet-style VSSM).
# Verified by test_torch_parity.py::test_mamba_unet_parity.
REFERENCE_MAMBA_UNET_RULES = [
    (r"^patch_embed\.proj\.", "patch_embed."),
    (r"^patch_embed\.norm\.", "patch_norm."),
    (r"^layers\.(\d+)\.blocks\.(\d+)\.", r"layer\1_block\2."),
    (r"^layers\.(\d+)\.downsample\.", r"downsample\1."),
    (r"^layers_up\.0\.", "up0."),
    (r"^layers_up\.(\d+)\.blocks\.(\d+)\.", r"uplayer\1_block\2."),
    (r"^layers_up\.(\d+)\.upsample\.", r"up\1."),
    (r"^concat_back_dim\.(\d+)\.", r"concat_back\1."),
]


def convert_reference_mamba_unet_state_dict(state_dict
                                            ) -> Dict[str, np.ndarray]:
    """torch Mamba-UNet VSSM state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_MAMBA_UNET_RULES)


# VM-UNet-3D / VSSM_UNETR (nnUNetTrainer_VMUNet3D.py:660-808: 3D VSSM with
# 12-direction SS3D cells + UNETR decoder). Verified by
# test_torch_parity.py::test_vmunet3d_parity.
REFERENCE_VMUNET3D_RULES = [
    (r"relative_position_index$", None),     # buffer, recomputed statically
    (r"^vssm\.downsample\.0\.", "vssm.patch_embed."),
    # PatchMerging3D.reduction = Sequential[Permute, Conv3d, Permute, LN]
    (r"^vssm\.downsample\.(\d+)\.reduction\.1\.",
     r"vssm.merge\1.reduction."),
    (r"^vssm\.downsample\.(\d+)\.reduction\.3\.", r"vssm.merge\1.norm."),
    (r"^vssm\.layers\.(\d+)\.blocks\.(\d+)\.", r"vssm.stage\1_block\2."),
    (r"\.mlp\.dwconv\.dwconv\.", ".mlp.dwconv."),
    (r"^(encoder\d)\.layer\.", r"\1."),
    (r"\.transp_conv\.conv\.", ".transp_conv."),
    (r"\.(conv1|conv2|conv3)\.conv\.", r".\1."),
    (r"^((?:encoder|decoder)\d.*)\.(norm1|norm2|norm3)\.",
     r"\1.\2.GroupNorm_0."),
    (r"^out\.conv\.conv\.", "out."),
]


def convert_reference_vmunet3d_state_dict(state_dict
                                          ) -> Dict[str, np.ndarray]:
    """torch VSSM_UNETR state_dict -> flax layout (K=12 scan directions)."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_VMUNET3D_RULES,
                                         k_dirs=12)


# nnMamba (nnUNetTrainer_nnMamba.py:237-296). BatchNorm running stats come
# out as running_mean/running_var for the caller's batch_stats collection.
# The layer-shared MambaLayer appears under BOTH owning blocks in the torch
# state_dict (same tensors); both map onto the single flax mamba{k} path.
# Verified by test_torch_parity.py::test_nnmamba_parity.
REFERENCE_NNMAMBA_RULES = [
    (r"^layer(\d+)\.\d+\.mamba_layer\.", r"mamba\1."),
    (r"^layer(\d+)\.(\d+)\.", r"layer\1_block\2."),
    (r"\.downsample\.0\.", ".ds_conv."),
    (r"\.downsample\.1\.", ".ds_bn."),
    (r"^att(\d+)\.layer(\d+)\.", r"att\1_layer\2."),
    (r"\.conv\.0\.", ".conv_a."),
    (r"\.conv\.1\.", ".bn_a."),
    (r"\.conv\.3\.", ".conv_b."),
    (r"\.conv\.4\.", ".bn_b."),
    (r"\.dt_proj\.(weight|bias)$", r".dt_proj_\1"),
]


# UltraLight VM-UNet (nnUNetTrainer_UltraLightVMUNet.py:209-326).
# Verified by test_torch_parity.py::test_ultralight_parity.
REFERENCE_ULTRALIGHT_RULES = [
    (r"^(encoder|decoder)(\d+)\.0\.", r"\1\2."),
    (r"^scab\.catt\.get_all_att\.", "scab.get_all_att."),
    (r"^scab\.catt\.att(\d+)\.", r"scab.att\1."),
    (r"^scab\.satt\.shared_conv2d\.0\.", "scab.satt_conv."),
    (r"\.dt_proj\.(weight|bias)$", r".dt_proj_\1"),
]


def convert_reference_ultralight_state_dict(state_dict
                                            ) -> Dict[str, np.ndarray]:
    """torch UltraLight_VM_UNet state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_ULTRALIGHT_RULES)


def convert_reference_nnmamba_state_dict(state_dict
                                         ) -> Dict[str, np.ndarray]:
    """torch nnMambaSeg state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_NNMAMBA_RULES)


# MLLA_UNet baseline checkpoints (nnUNetTrainer_MLLA_UNet.py:89-850).
# Verified by tests/test_torch_parity.py::test_mlla_unet_forward_parity.
REFERENCE_MLLA_UNET_RULES = [
    # constant cos/sin buffer (recomputed on the fly in our port)
    (r"\.rope\.rotations$", None),
    (r"^layers\.(\d+)\.blocks\.(\d+)\.", r"layer\1_block\2."),
    (r"^layers\.(\d+)\.downsample\.conv\.(\d+)\.", r"down\1.conv_\2."),
    (r"^layers_up\.0\.conv\.1\.", "up0.deconv."),
    (r"^layers_up\.0\.conv\.(\d+)\.", r"up0.conv_\1."),
    (r"^layers_up\.0\.norm\.", "up0.norm."),
    (r"^layers_up\.(\d+)\.blocks\.(\d+)\.", r"layer_up\1_block\2."),
    (r"^layers_up\.(\d+)\.upsample\.conv\.1\.", r"layer_up\1_upsample.deconv."),
    (r"^layers_up\.(\d+)\.upsample\.conv\.(\d+)\.",
     r"layer_up\1_upsample.conv_\2."),
    (r"^layers_up\.(\d+)\.upsample\.norm\.", r"layer_up\1_upsample.norm."),
    (r"^concat_back_dim\.(\d+)\.", r"concat_back\1."),
    (r"^up\.expand\.", "up_expand."),
    (r"^up\.norm\.", "up_norm."),
    (r"^patch_embed\.conv(\d)\.(\d)\.", r"patch_embed.conv\1_\2."),
    (r"\.cpe1\.", ".cpe1.Conv_0."),
    (r"\.cpe2\.", ".cpe2.Conv_0."),
    (r"\.dwc\.", ".dwc.Conv_0."),
    (r"\.lepe\.", ".lepe.Conv_0."),
    (r"\.fc1\.", ".Dense_0."),
    (r"\.fc2\.", ".Dense_1."),
]


# TransUNet baseline checkpoints (nnUNetTrainerTransUNet.py:211-803).
# Verified by tests/test_torch_parity.py::test_transunet_forward_parity.
REFERENCE_TRANSUNET_RULES = [
    (r"^transformer\.embeddings\.hybrid_model\.root\.conv\.",
     "hybrid_model.root_conv."),
    (r"^transformer\.embeddings\.hybrid_model\.root\.gn\.",
     "hybrid_model.root_gn."),
    (r"^transformer\.embeddings\.hybrid_model\.body\.block(\d+)\.unit(\d+)\.",
     r"hybrid_model.block\1_unit\2."),
    (r"^transformer\.embeddings\.patch_embeddings\.", "patch_embeddings."),
    (r"^transformer\.embeddings\.position_embeddings$",
     "position_embeddings"),
    (r"^transformer\.encoder\.layer\.(\d+)\.", r"encoder_block\1."),
    (r"^transformer\.encoder\.encoder_norm\.", "encoder_norm."),
    (r"\.ffn\.fc1\.", ".ffn.Dense_0."),
    (r"\.ffn\.fc2\.", ".ffn.Dense_1."),
    (r"^decoder\.conv_more\.0\.", "conv_more.conv."),
    (r"^decoder\.conv_more\.1\.", "conv_more.bn."),
    (r"^decoder\.blocks\.(\d+)\.conv(\d)\.0\.",
     r"decoder_block\1.conv\2.conv."),
    (r"^decoder\.blocks\.(\d+)\.conv(\d)\.1\.",
     r"decoder_block\1.conv\2.bn."),
    (r"^segmentation_head\.0\.", "seg_head."),
]


def convert_reference_transunet_state_dict(state_dict
                                           ) -> Dict[str, np.ndarray]:
    """torch TransUNet (VisionTransformer R50-ViT-B_16) state_dict ->
    flax layout. BatchNorm running stats come out as
    .../running_mean|running_var keys for the caller."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_TRANSUNET_RULES)


# SwinUNETR_2d baseline checkpoints (nnUNetTrainerSwinUNETR_2d.py:38-46,
# monai SwinUNETR spatial_dims=2). Verified by
# tests/test_torch_parity.py::test_swin_unetr_forward_parity.
REFERENCE_SWIN_UNETR_RULES = [
    (r"\.relative_position_index$", None),      # buffer, derived
    (r"^swinViT\.layers(\d)\.0\.", r"swinViT.layers\1."),
    (r"\.blocks\.(\d+)\.", r".blocks\1."),
    (r"\.mlp\.linear1\.", ".mlp.Dense_0."),
    (r"\.mlp\.linear2\.", ".mlp.Dense_1."),
    (r"^swinViT\.patch_embed\.proj\.", "swinViT.patch_embed."),
    # protect swin LayerNorms from the instance-norm rewrite below
    (r"^(swinViT\..*)\.norm([12])\.", r"\1.@ln@norm\2."),
    (r"\.transp_conv\.conv\.", ".transp_conv."),
    (r"\.(conv1|conv2|conv3)\.conv\.", r".\1."),
    (r"\.(norm1|norm2|norm3)\.", r".\1.GroupNorm_0."),
    (r"^out\.conv\.conv\.", "out."),
    (r"@ln@", ""),
]


def convert_reference_swin_unetr_state_dict(state_dict
                                            ) -> Dict[str, np.ndarray]:
    """torch (monai) SwinUNETR 2D state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_SWIN_UNETR_RULES)


def _convert_reference_state_dict(state_dict, rules,
                                  k_dirs: int = 4) -> Dict[str, np.ndarray]:
    out = {}
    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key == "dummy_tensor" or key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        # reference merges the K scan directions: A_logs (K*d, n),
        # Ds (K*d,) (MambaSkip.py:339-341; K=12 for the VMUNet3D SS3D);
        # ours keep the K axis
        leaf_name = key.split(".")[-1]
        if leaf_name == "A_logs":
            arr = arr.reshape(k_dirs, -1, arr.shape[-1])
        elif leaf_name == "Ds":
            arr = arr.reshape(k_dirs, -1)
        elif leaf_name in ("A_log", "A_b_log", "A_s_log") and arr.ndim == 2:
            # mamba_ssm keeps (d, n); our MambaBlock holds (1, d, n)
            # (_b/_s: SegMamba tri-orientated branches)
            arr = arr[None]
        elif key.endswith(("grn_beta", "grn_gamma")):
            # torch channels-first (1, C, 1, 1[, 1]) -> channels-last
            arr = np.moveaxis(arr, 1, -1)
        transposed = bool(_REFERENCE_TRANSPOSED.search(key))
        mapped = key
        dropped = False
        for pat, rep in rules:
            if rep is None:
                if _re.search(pat, mapped):
                    dropped = True
                    break
                continue
            mapped = _re.sub(pat, rep, mapped)
        if dropped:
            continue
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


def convert_reference_lkm_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch LKMUNet state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict, REFERENCE_LKM_RULES)


def convert_reference_swin_umamba_state_dict(
        state_dict, d_variant: bool = False) -> Dict[str, np.ndarray]:
    """torch SwinUMamba / SwinUMambaD state_dict -> flax layout."""
    rules = (REFERENCE_SWIN_UMAMBA_D_RULES if d_variant
             else REFERENCE_SWIN_UMAMBA_RULES)
    return _convert_reference_state_dict(state_dict, rules)


def convert_reference_umamba_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch UMambaBot/UMambaEnc state_dict -> flax layout."""
    return _convert_reference_state_dict(state_dict, REFERENCE_UMAMBA_RULES)


def convert_reference_umamba_ss3d_state_dict(state_dict
                                             ) -> Dict[str, np.ndarray]:
    """torch UMambaBot/Enc_SS3D state_dict -> flax layout (the VSS blocks'
    A_logs/Ds merge K=12 scan directions)."""
    return _convert_reference_state_dict(state_dict, REFERENCE_UMAMBA_RULES,
                                         k_dirs=12)


def convert_reference_mlla_unet_state_dict(state_dict
                                           ) -> Dict[str, np.ndarray]:
    """torch MLLA_UNet baseline state_dict -> flax layout. BatchNorm
    running stats come out as .../running_mean|running_var keys for the
    caller to place into batch_stats."""
    return _convert_reference_state_dict(state_dict,
                                         REFERENCE_MLLA_UNET_RULES)


def convert_reference_msvm_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch MSVMUNet state_dict -> flax layout. BatchNorm running stats
    come out as .../running_mean|running_var keys for the caller to place
    into the batch_stats collection (mean/var leaves)."""
    return _convert_reference_state_dict(state_dict, REFERENCE_MSVM_RULES)


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


# ---------------------------------------------------------------------------
# Reference checkpoint-folder import.
#
# The reference predictor rebuilds nets from a results folder of torch
# checkpoints (predict_from_raw_data.py:83-99: fold_X/checkpoint_final.pth
# with 'network_weights'/'trainer_name'/'init_args'). These helpers let
# NNUNetPredictor.initialize_from_trained_model_folder consume such a
# folder directly: the state_dict is converted with the family-specific
# verified rules and strict-filled into a freshly initialized flax tree.
# ---------------------------------------------------------------------------

def _swin_umamba_d_converter(state_dict):
    return convert_reference_swin_umamba_state_dict(state_dict,
                                                    d_variant=True)


CONVERTERS_BY_NETWORK = {
    "mlla_uper": convert_reference_flagship_state_dict,
    "mednext_b3": convert_reference_mednext_state_dict,
    "mednext_b5": convert_reference_mednext_state_dict,
    "umamba_bot": convert_reference_umamba_state_dict,
    "umamba_enc": convert_reference_umamba_state_dict,
    "umamba_bot_ss3d": convert_reference_umamba_ss3d_state_dict,
    "umamba_enc_ss3d": convert_reference_umamba_ss3d_state_dict,
    "segmamba": convert_reference_segmamba_state_dict,
    "lightm_unet": convert_reference_lightm_state_dict,
    "ultralight_vmunet": convert_reference_ultralight_state_dict,
    "nnmamba": convert_reference_nnmamba_state_dict,
    "vmunet": convert_reference_vmunet_state_dict,
    "mamba_unet": convert_reference_mamba_unet_state_dict,
    "vmunet3d": convert_reference_vmunet3d_state_dict,
    "vmunet3d_new": convert_reference_vmunet3d_state_dict,
    "vmunet3d_swint": convert_reference_vmunet3d_state_dict,
    "swin_umamba": convert_reference_swin_umamba_state_dict,
    "swin_umamba_d": _swin_umamba_d_converter,
    "lkm_unet": convert_reference_lkm_state_dict,
    "msvm_unet": convert_reference_msvm_state_dict,
    "mlla_unet": convert_reference_mlla_unet_state_dict,
    "transunet": convert_reference_transunet_state_dict,
    "swin_unetr": convert_reference_swin_unetr_state_dict,
}


def convert_reference_network_state_dict(network_key: str, state_dict
                                         ) -> Dict[str, np.ndarray]:
    """Dispatch to the verified per-family converter by registry network
    key (training.registry.NETWORK_BUILDERS)."""
    conv = CONVERTERS_BY_NETWORK.get(network_key)
    if conv is None:
        raise KeyError(
            f"no verified torch-checkpoint converter for network "
            f"'{network_key}'; available: {sorted(CONVERTERS_BY_NETWORK)}")
    return conv(state_dict)


def reference_state_dict_to_variables(network, example_input_shape,
                                      state_dict, network_key: str):
    """Convert a reference torch state_dict and strict-fill it into the
    flax module's freshly initialized tree.

    example_input_shape: NHWC/NDHWC shape used only for shape inference.
    Returns (params, model_state) where model_state is {} or
    {'batch_stats': ...} for BatchNorm nets. Raises on any key or shape
    mismatch — a reference checkpoint must convert exactly.
    """
    import flax
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom
    from jax.tree_util import tree_flatten_with_path

    flat_src = {tuple(k.split("/")): v for k, v in
                convert_reference_network_state_dict(
                    network_key, state_dict).items()}
    bn_stats = {k: v for k, v in flat_src.items()
                if k[-1] in ("running_mean", "running_var")}
    flat_src = {k: v for k, v in flat_src.items() if k not in bn_stats}

    x = jnp.zeros(example_input_shape, jnp.float32)
    variables = jax.eval_shape(
        lambda: network.init({"params": jrandom.PRNGKey(0),
                              "dropout": jrandom.PRNGKey(1)}, x))
    params = variables["params"]
    flat, _ = tree_flatten_with_path(params)
    flat = {tuple(p.key for p in path): leaf for path, leaf in flat}
    missing = sorted(set(flat) - set(flat_src))
    extra = sorted(set(flat_src) - set(flat))
    if missing or extra:
        raise ValueError(
            "reference checkpoint does not convert exactly:\n"
            + "\n".join("flax-only: " + "/".join(k) for k in missing[:20])
            + "\n".join("torch-only: " + "/".join(k) for k in extra[:20]))
    mismatched = [(k, tuple(flat[k].shape), tuple(flat_src[k].shape))
                  for k in flat
                  if tuple(flat[k].shape) != tuple(flat_src[k].shape)]
    if mismatched:
        raise ValueError(f"shape mismatches: {mismatched[:10]}")

    new_params = flax.core.unfreeze(params)
    for path, val in flat_src.items():
        node = new_params
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = jnp.asarray(val)

    model_state = {}
    if bn_stats:
        # need real (non-eval_shape) batch_stats structure for defaults
        stats_vars = network.init({"params": jrandom.PRNGKey(0),
                                   "dropout": jrandom.PRNGKey(1)}, x)
        new_stats = flax.core.unfreeze(stats_vars.get("batch_stats", {}))
        for path, val in bn_stats.items():
            node = new_stats
            for p in path[:-1]:
                node = node[p]
            leaf = {"running_mean": "mean", "running_var": "var"}[path[-1]]
            node[leaf] = jnp.asarray(val)
        model_state["batch_stats"] = new_stats
    return new_params, model_state
