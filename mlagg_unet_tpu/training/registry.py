"""Trainer registry: declarative configs replacing the reference's
trainer-subclass-as-config pattern (the entire variants/ tree discovered via
recursive_find_python_class, run_training.py:39). Each named trainer is a
TrainerConfig: hyperparameters + a network builder.

Names match the reference trainers 1:1 so CLI invocations carry over.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, List, Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class TrainerConfig:
    name: str
    num_epochs: int = 1000
    num_iterations_per_epoch: int = 250
    num_val_iterations_per_epoch: int = 50
    initial_lr: float = 1e-2
    weight_decay: float = 3e-5
    optimizer: str = "sgd"            # 'sgd' (momentum .99 nesterov) | 'adamw' | 'adan'
    adam_eps: float = 1e-8
    lr_scheduler: str = "poly"        # 'poly' | 'cosine_warmup' | 'constant'
    warmup_epochs: int = 10
    grad_clip_norm: float = 12.0
    oversample_foreground_percent: float = 0.33
    enable_deep_supervision: bool = True
    network: str = "plans_unet"       # key into NETWORK_BUILDERS
    # fixed DS scales override (flagship uses 5 fixed levels, trainer :101-104)
    deep_supervision_scales_override: Optional[Sequence[Sequence[float]]] = None
    disable_mirroring: bool = False
    # restrict mirroring to specific axes (nnUNetTrainer_onlyMirror01)
    mirror_axes_override: Optional[Sequence[int]] = None
    disable_da: bool = False
    probabilistic_oversampling: bool = False
    benchmark: bool = False          # record fastest epoch time to json
    no_data_loading: bool = False    # feed one cached dummy batch (isolates device speed)
    loss: str = "default"            # 'default' (DC+CE / DC+BCE) | 'ce' | 'dice' | 'dc_topk'
    da_level: str = "default"        # 'default' | 'DA5' (heavy augmentation)
    # spatial-augmentation resampling orders (nnUNetTrainerDAOrd0.py: the
    # DAOrd0 variant uses 0/0, DASegOrd0 uses 3/0)
    order_resampling_data: int = 3
    order_resampling_seg: int = 1
    compute_dtype: str = "bfloat16"  # forward compute dtype ('float32' | 'bfloat16');
                                     # master params/optimizer stay fp32 (AMP analogue)


TRAINER_REGISTRY = {}


def register_trainer(cfg: TrainerConfig):
    TRAINER_REGISTRY[cfg.name] = cfg
    return cfg


def get_trainer_config(name: str) -> TrainerConfig:
    if name not in TRAINER_REGISTRY:
        raise KeyError(
            f"Unknown trainer {name}. Known: {sorted(TRAINER_REGISTRY)}"
        )
    return TRAINER_REGISTRY[name]


# ---------------------------------------------------------------------------
# network builders: name -> fn(configuration_manager, num_input_channels,
#                              num_output_channels, deep_supervision) -> module
# ---------------------------------------------------------------------------

def _build_plans_unet(configuration_manager, num_input_channels,
                      num_output_channels, deep_supervision):
    from mlagg_unet_tpu.models.dynamic_unet import network_from_plans

    return network_from_plans(configuration_manager, num_input_channels,
                              num_output_channels, deep_supervision)


def _build_mlla_uper(configuration_manager, num_input_channels,
                     num_output_channels, deep_supervision):
    """Flagship build (nnUNetTrainer_MLAgg_2D_dt_MS.py:62-92)."""
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    assert len(configuration_manager.patch_size) == 2, (
        "MLAgg flagship is a 2D architecture; use a 2d configuration"
    )
    return MLLAUper(
        out_channels=num_output_channels,
        embed_dim=96,
        patch_size=2,
        depths=(2, 2, 2, 2),
        num_heads=(2, 4, 8, 16),
        mlp_ratio=2,
        qkv_bias=True,
        drop_rate=0.0,
        drop_path_rate=0.1,
        sr_ratio=(16, 8, 4, 2),
        deep_supervision=deep_supervision,
    )


def _build_umamba_bot(configuration_manager, num_input_channels,
                      num_output_channels, deep_supervision):
    from mlagg_unet_tpu.models.umamba import umamba_from_plans

    return umamba_from_plans(configuration_manager, num_input_channels,
                             num_output_channels, deep_supervision, "bot")


def _build_umamba_enc(configuration_manager, num_input_channels,
                      num_output_channels, deep_supervision):
    from mlagg_unet_tpu.models.umamba import umamba_from_plans

    return umamba_from_plans(configuration_manager, num_input_channels,
                             num_output_channels, deep_supervision, "enc")


def _build_umamba_bot_ss3d(configuration_manager, num_input_channels,
                           num_output_channels, deep_supervision):
    """UMambaBot_SS3D.py:806-821 — 3D-only, VSS bottleneck."""
    from mlagg_unet_tpu.models.umamba import umamba_from_plans

    assert len(configuration_manager.patch_size) == 3, "SS3D is 3D-only"
    return umamba_from_plans(configuration_manager, num_input_channels,
                             num_output_channels, deep_supervision,
                             "bot_ss3d")


def _build_umamba_enc_ss3d(configuration_manager, num_input_channels,
                           num_output_channels, deep_supervision):
    """UMambaEnc_SS3D.py:645-660 — 3D-only, per-stage VSS layers."""
    from mlagg_unet_tpu.models.umamba import umamba_from_plans

    assert len(configuration_manager.patch_size) == 3, "SS3D is 3D-only"
    return umamba_from_plans(configuration_manager, num_input_channels,
                             num_output_channels, deep_supervision,
                             "enc_ss3d")


def _make_mednext_builder(model_id: str, kernel_size: int,
                          use_mamba_skip: bool = False):
    def build(configuration_manager, num_input_channels, num_output_channels,
              deep_supervision):
        from mlagg_unet_tpu.models.mednext_net import create_mednext_v1

        dim = len(configuration_manager.patch_size)
        return create_mednext_v1(
            num_input_channels, num_output_channels, model_id, kernel_size,
            deep_supervision, spatial_dims=dim,
            use_mamba_skip=use_mamba_skip,
        )

    return build


NETWORK_BUILDERS = {
    "plans_unet": _build_plans_unet,
    "mlla_uper": _build_mlla_uper,
    "umamba_bot": _build_umamba_bot,
    "umamba_enc": _build_umamba_enc,
    "mednext_b3": _make_mednext_builder("B", 3),
    "mednext_b5": _make_mednext_builder("B", 5),
    "mednext_b3_mambaskip": _make_mednext_builder("B", 3,
                                                  use_mamba_skip=True),
}


def get_network_builder(key: str) -> Callable:
    return NETWORK_BUILDERS[key]


# ---------------------------------------------------------------------------
# registry entries (reference trainer classes)
# ---------------------------------------------------------------------------

_default = register_trainer(TrainerConfig(name="nnUNetTrainer"))

# training-length variants (variants/training_length/*)
for _ep in (1, 5, 10, 20, 50, 100, 250, 500, 2000, 4000, 8000):
    register_trainer(replace(_default, name=f"nnUNetTrainer_{_ep}epochs",
                             num_epochs=_ep))

register_trainer(replace(_default, name="nnUNetTrainer_Adamw",
                         optimizer="adamw", initial_lr=3e-4))
register_trainer(replace(_default, name="nnUNetTrainerCosAnneal",
                         lr_scheduler="cosine_warmup", warmup_epochs=0))
register_trainer(replace(_default, name="nnUNetTrainerNoDeepSupervision",
                         enable_deep_supervision=False))
register_trainer(replace(_default, name="nnUNetTrainerNoMirroring",
                         disable_mirroring=True))
register_trainer(replace(_default, name="nnUNetTrainerNoDA",
                         disable_da=True, disable_mirroring=True))
register_trainer(replace(
    _default, name="nnUNetTrainer_probabilisticOversampling",
    # -1 sentinel: compute the deterministic sampler's effective percent
    # from the batch size (reference sampling/:19-26)
    probabilistic_oversampling=True, oversample_foreground_percent=-1.0,
))

register_trainer(replace(_default, name="nnUNetTrainerDA5",
                         da_level="DA5"))

# loss variants (variants/loss/*)
register_trainer(replace(_default, name="nnUNetTrainerCELoss", loss="ce"))
register_trainer(replace(_default, name="nnUNetTrainerDiceLoss", loss="dice"))
register_trainer(replace(_default, name="nnUNetTrainerDiceCELoss_noSmooth",
                         loss="default"))
register_trainer(replace(_default, name="nnUNetTrainerTopk10Loss",
                         loss="topk10"))
register_trainer(replace(_default, name="nnUNetTrainerTopk10LossLS01",
                         loss="topk10_ls01"))
register_trainer(replace(_default, name="nnUNetTrainerDiceTopK10Loss",
                         loss="dc_topk"))

# benchmarking variants (variants/benchmarking/
# nnUNetTrainerBenchmark_5epochs.py:8-66)
register_trainer(replace(_default, name="nnUNetTrainerBenchmark_5epochs",
                         num_epochs=5, benchmark=True))
register_trainer(replace(
    _default, name="nnUNetTrainerBenchmark_5epochs_noDataLoading",
    num_epochs=5, benchmark=True, no_data_loading=True,
))

# flagship (nnUNetTrainer_MLAgg_2D_dt_MS.py:42-147)
_FLAGSHIP_DS_SCALES = [
    list(s) for s in (1 / np.cumprod(
        np.vstack([[1, 1], [2, 2], [2, 2], [2, 2], [2, 2]]), axis=0))
]
register_trainer(TrainerConfig(
    name="nnUNetTrainer_MLAgg_2D_dt_MS",
    num_epochs=500,
    initial_lr=5e-4,
    weight_decay=3e-5,
    optimizer="adamw",
    adam_eps=1e-4,
    lr_scheduler="cosine_warmup",
    warmup_epochs=10,
    network="mlla_uper",
    deep_supervision_scales_override=_FLAGSHIP_DS_SCALES,
))

def _build_mlla_unet(configuration_manager, num_input_channels,
                     num_output_channels, deep_supervision):
    """nnUNetTrainer_MLLA_UNet.py:46-65: embed 64, depths 2/4/8/4,
    decoder depths 1/2/2/2, mlp 4, drop_path 0.1, no deep supervision."""
    from mlagg_unet_tpu.models.mlla_unet import MLLAUNet

    assert len(configuration_manager.patch_size) == 2, "MLLA-UNet is 2D"
    return MLLAUNet(num_classes=num_output_channels)


NETWORK_BUILDERS["mlla_unet"] = _build_mlla_unet

# MLLA baseline (linear attention + RoPE, nnUNetTrainer_MLLA_UNet.py:25-87:
# AdamW 1e-4/wd 3e-5, timm cosine + 10ep warmup, 500 epochs, no DS)
register_trainer(replace(
    TRAINER_REGISTRY["nnUNetTrainer_MLAgg_2D_dt_MS"],
    name="nnUNetTrainer_MLLA_UNet", network="mlla_unet",
    initial_lr=1e-4, adam_eps=1e-8, enable_deep_supervision=False,
    deep_supervision_scales_override=None,
))

# U-Mamba variants (variants/mamba/nnUNetTrainerUMamba{Bot,Enc}.py)
register_trainer(replace(_default, name="nnUNetTrainerUMambaBot",
                         network="umamba_bot"))
register_trainer(replace(_default, name="nnUNetTrainerUMambaEnc",
                         network="umamba_enc"))

def _build_vmunet(configuration_manager, num_input_channels,
                  num_output_channels, deep_supervision):
    from mlagg_unet_tpu.models.vmamba import VMUNet

    assert len(configuration_manager.patch_size) == 2, "VM-UNet is 2D"
    return VMUNet(num_classes=num_output_channels)


NETWORK_BUILDERS["vmunet"] = _build_vmunet

# VM-UNet: AdamW 1e-4/1e-3, timm cosine warmup, 500 epochs, no deep
# supervision (nnUNetTrainer_VMUNet.py:15-28,58-64)
register_trainer(replace(_default, name="nnUNetTrainer_VMUNet",
                         network="vmunet", enable_deep_supervision=False,
                         optimizer="adamw", initial_lr=1e-4,
                         weight_decay=1e-3, lr_scheduler="cosine_warmup",
                         num_epochs=500))


def _make_simple_builder(module_path: str, cls_name: str, two_d_only=False,
                         **model_kwargs):
    def build(configuration_manager, num_input_channels, num_output_channels,
              deep_supervision):
        import importlib

        mod = importlib.import_module(module_path)
        cls = getattr(mod, cls_name)
        if two_d_only:
            assert len(configuration_manager.patch_size) == 2, (
                f"{cls_name} is 2D-only"
            )
        kwargs = dict(model_kwargs)
        if "deep_supervision" in cls.__dataclass_fields__:
            kwargs["deep_supervision"] = deep_supervision
        return cls(num_classes=num_output_channels, **kwargs)

    return build


def _build_nnmamba(configuration_manager, num_input_channels,
                   num_output_channels, deep_supervision):
    """nnMambaSeg takes its 4 layer strides from the plan's pool ops
    (nnUNetTrainer_nnMamba.py:36-40: pool_op_kernel_sizes[1:5])."""
    from mlagg_unet_tpu.models.mamba_variants import NNMamba

    strides = [list(s) for s in
               configuration_manager.pool_op_kernel_sizes[1:5]]
    while len(strides) < 4:
        strides.append([1] * len(configuration_manager.patch_size))
    return NNMamba(num_classes=num_output_channels,
                   strides=tuple(tuple(s) for s in strides))


NETWORK_BUILDERS.update({
    "segmamba": _make_simple_builder(
        "mlagg_unet_tpu.models.mamba_variants", "SegMamba"),
    "lightm_unet": _make_simple_builder(
        "mlagg_unet_tpu.models.mamba_variants", "LightMUNet"),
    "ultralight_vmunet": _make_simple_builder(
        "mlagg_unet_tpu.models.mamba_variants", "UltraLightVMUNet",
        two_d_only=True),
    "nnmamba": _build_nnmamba,
    "swin_unetr": _make_simple_builder(
        "mlagg_unet_tpu.models.swin_unetr", "SwinUNETR", two_d_only=True),
})

# SegMamba trainer subclasses nnUNetTrainerNoDeepSupervision with AdamW
# lr 1e-4 / wd 1e-3, timm cosine + 10-epoch warmup, 500 epochs
# (nnUNetTrainer_SegMamba.py:16-65)
register_trainer(replace(_default, name="nnUNetTrainer_SegMamba",
                         network="segmamba", enable_deep_supervision=False,
                         optimizer="adamw", initial_lr=1e-4,
                         weight_decay=1e-3, lr_scheduler="cosine_warmup",
                         num_epochs=500))
# LightM-UNet: Adam (L2 wd) 1e-4/1e-5 eps 1e-5, poly LR
# (nnUNetTrainer_LightMUNet.py:26-28,118-123)
register_trainer(replace(_default, name="nnUNetTrainer_LightMUNet",
                         network="lightm_unet",
                         enable_deep_supervision=False,
                         optimizer="adam_l2", initial_lr=1e-4,
                         weight_decay=1e-5, adam_eps=1e-5))
# UltraLight VM-UNet: AdamW 1e-3/1e-2 ('from source code'), timm cosine
# warmup (nnUNetTrainer_UltraLightVMUNet.py:18-22,66-72)
register_trainer(replace(_default, name="nnUNetTrainer_UltraLightVMUNet",
                         network="ultralight_vmunet",
                         enable_deep_supervision=False, optimizer="adamw",
                         initial_lr=1e-3, weight_decay=1e-2,
                         lr_scheduler="cosine_warmup", num_epochs=500))
# nnMamba: AdamW 1e-4/1e-3, timm cosine + 10-epoch warmup, 500 epochs
# (nnUNetTrainer_nnMamba.py:14-27,57-62); strides from the plan's pool ops
register_trainer(replace(_default, name="nnUNetTrainer_nnMamba",
                         network="nnmamba", enable_deep_supervision=False,
                         optimizer="adamw", initial_lr=1e-4,
                         weight_decay=1e-3, lr_scheduler="cosine_warmup",
                         num_epochs=500))
NETWORK_BUILDERS["transunet"] = _make_simple_builder(
    "mlagg_unet_tpu.models.transunet", "TransUNet", two_d_only=True)
register_trainer(replace(_default, name="nnUNetTrainerTransUNet",
                         network="transunet",
                         enable_deep_supervision=False, optimizer="adamw",
                         initial_lr=1e-4))
NETWORK_BUILDERS.update({
    # faithful ports (parity-tested vs the reference torch sources)
    "swin_umamba": _make_simple_builder(
        "mlagg_unet_tpu.models.swin_umamba", "SwinUMamba", two_d_only=True),
    "swin_umamba_d": _make_simple_builder(
        "mlagg_unet_tpu.models.swin_umamba", "SwinUMambaD",
        two_d_only=True),
    "swin_tunet": _make_simple_builder(
        "mlagg_unet_tpu.models.more_variants", "SwinTUNet", two_d_only=True),
    "umamba_bot_ss3d": _build_umamba_bot_ss3d,
    "umamba_enc_ss3d": _build_umamba_enc_ss3d,
})


def _build_mamba_unet(configuration_manager, num_input_channels,
                      num_output_channels, deep_supervision):
    from mlagg_unet_tpu.models.vmamba import MambaUNet

    assert len(configuration_manager.patch_size) == 2, "MambaUNet is 2D"
    # reference builder: VSSM(depths=[2,2,2,2], drop_path_rate=0.2)
    # (nnUNetTrainer_MambaUNet.py:37-40)
    return MambaUNet(num_classes=num_output_channels)


NETWORK_BUILDERS["mamba_unet"] = _build_mamba_unet

register_trainer(replace(_default, name="nnUNetTrainerSwinUMambaScratch",
                         network="swin_umamba", optimizer="adamw",
                         initial_lr=1e-4))
register_trainer(replace(_default, name="nnUNetTrainerSwinUMambaDScratch",
                         network="swin_umamba_d", optimizer="adamw",
                         initial_lr=1e-4))
register_trainer(replace(_default, name="nnUNetTrainer_SwinTUNet",
                         network="swin_tunet", optimizer="adamw",
                         initial_lr=1e-4, enable_deep_supervision=False))
register_trainer(replace(_default, name="nnUNetTrainer_MambaUNet",
                         network="mamba_unet", optimizer="adamw",
                         initial_lr=1e-3))
register_trainer(replace(_default, name="nnUNetTrainerUMambaBot_SS3D",
                         network="umamba_bot_ss3d"))
register_trainer(replace(_default, name="nnUNetTrainerUMambaEnc_SS3D",
                         network="umamba_enc_ss3d"))
def _build_lkm_unet(configuration_manager, num_input_channels,
                    num_output_channels, deep_supervision):
    """Plans-driven LKM-UNet, mirroring get_lkmunet_from_plans
    (nnUNetTrainer_LKM_UNet.py:677-729): features = min(base * 2^i, max),
    kernels/strides/blocks straight from the configuration. 2D and 3D."""
    from mlagg_unet_tpu.models.lkm_unet import LKMUNet

    cm = configuration_manager
    num_stages = len(cm.conv_kernel_sizes)
    feats = [min(cm.UNet_base_num_features * 2 ** i,
                 cm.unet_max_num_features) for i in range(num_stages)]
    return LKMUNet(
        num_classes=num_output_channels,
        n_stages=num_stages,
        features_per_stage=tuple(feats),
        kernel_sizes=tuple(tuple(k) for k in cm.conv_kernel_sizes),
        strides=tuple(tuple(s) for s in cm.pool_op_kernel_sizes),
        n_conv_per_stage=tuple(cm.n_conv_per_stage_encoder),
        n_conv_per_stage_decoder=tuple(cm.n_conv_per_stage_decoder),
        deep_supervision=deep_supervision,
    )


NETWORK_BUILDERS.update({
    "lkm_unet": _build_lkm_unet,
    "msvm_unet": _make_simple_builder(
        "mlagg_unet_tpu.models.msvm_unet", "MSVMUNet", two_d_only=True),
})
register_trainer(replace(_default, name="nnUNetTrainer_LKM_UNet",
                         network="lkm_unet"))
# reference nnUNetTrainer_MSVM_UNet.py:21-27,59-64: AdamW 1e-4 / wd 3e-5,
# timm cosine w/ 10-epoch warmup, 500 epochs, no deep supervision
register_trainer(replace(_default, name="nnUNetTrainer_MSVM_UNet",
                         network="msvm_unet", optimizer="adamw",
                         initial_lr=1e-4, num_epochs=500,
                         lr_scheduler="cosine_warmup",
                         enable_deep_supervision=False))
register_trainer(replace(_default, name="nnUNetTrainerSwinUNETR_2d",
                         network="swin_unetr",
                         enable_deep_supervision=False, optimizer="adamw",
                         initial_lr=1e-4))

# MedNeXt trainers (nnUNetTrainer_MedNeXt*.py: AdamW 1e-3-ish recipes)
register_trainer(replace(_default, name="nnUNetTrainer_MedNeXt",
                         network="mednext_b3", optimizer="adamw",
                         initial_lr=1e-3))
register_trainer(replace(_default, name="nnUNetTrainer_MedNeXt_Mambaskip",
                         network="mednext_b3_mambaskip", optimizer="adamw",
                         initial_lr=1e-3))


# VM-UNet-3D family (nnUNetTrainer_VMUNet3D*.py: VSSM_UNETR, AdamW 1e-4,
# wd 1e-2, timm cosine warmup-10, 500 epochs, no deep supervision).
# *_woinit only comments out the init (same architecture); *_woinit_new
# additionally removes the SS3D z gate AND the encoder5 bottleneck
# res-block (nnUNetTrainer_VMUNet3D_woinit_new.py:246-248,752-811);
# *_SwinT further swaps the last VSSM stage for a 3D shifted-window
# transformer layer.
def _make_vmunet3d_builder(swin: bool = False, new: bool = False):
    def build(configuration_manager, num_input_channels, num_output_channels,
              deep_supervision):
        from mlagg_unet_tpu.models.vmunet3d import VMUNet3D

        assert len(configuration_manager.patch_size) == 3, "VMUNet3D is 3D"
        return VMUNet3D(num_classes=num_output_channels,
                        last_stage_swin=swin, no_z=new,
                        use_encoder5=not new)

    return build


NETWORK_BUILDERS["vmunet3d"] = _make_vmunet3d_builder()
NETWORK_BUILDERS["vmunet3d_new"] = _make_vmunet3d_builder(new=True)
NETWORK_BUILDERS["vmunet3d_swint"] = _make_vmunet3d_builder(swin=True,
                                                            new=True)

_vmunet3d = replace(_default, name="nnUNetTrainer_VMUNet3D",
                    network="vmunet3d", optimizer="adamw", initial_lr=1e-4,
                    weight_decay=1e-2, lr_scheduler="cosine_warmup",
                    num_epochs=500, enable_deep_supervision=False)
register_trainer(_vmunet3d)
register_trainer(replace(_vmunet3d, name="nnUNetTrainer_VMUNet3D_woinit"))
register_trainer(replace(_vmunet3d, name="nnUNetTrainer_VMUNet3D_woinit_new",
                         network="vmunet3d_new"))
register_trainer(replace(_vmunet3d,
                         name="nnUNetTrainer_VMUNet3D_woinit_new_SwinT",
                         network="vmunet3d_swint"))


# BatchNorm-instead-of-InstanceNorm plans UNet (variants/network_architecture/
# nnUNetTrainerBN.py: same PlainConvUNet topology with batchnorm ops; running
# stats live in the trainer's model_state / checkpoint "model_state").
def _build_plans_unet_bn(configuration_manager, num_input_channels,
                         num_output_channels, deep_supervision):
    from mlagg_unet_tpu.models.dynamic_unet import network_from_plans

    return network_from_plans(configuration_manager, num_input_channels,
                              num_output_channels, deep_supervision,
                              norm="batch")


NETWORK_BUILDERS["plans_unet_bn"] = _build_plans_unet_bn
register_trainer(replace(_default, name="nnUNetTrainerBN",
                         network="plans_unet_bn"))

# augmentation resampling-order variants (nnUNetTrainerDAOrd0.py)
register_trainer(replace(_default, name="nnUNetTrainerDAOrd0",
                         order_resampling_data=0, order_resampling_seg=0))
register_trainer(replace(_default, name="nnUNetTrainer_DASegOrd0",
                         order_resampling_data=3, order_resampling_seg=0))
register_trainer(replace(_default, name="nnUNetTrainer_DASegOrd0_NoMirroring",
                         order_resampling_data=3, order_resampling_seg=0,
                         disable_mirroring=True))

# Adan optimizer family (variants/optimizer/nnUNetTrainerAdan.py:12-63)
_adan = replace(_default, name="nnUNetTrainerAdan", optimizer="adan")
register_trainer(_adan)
register_trainer(replace(_adan, name="nnUNetTrainerAdan1en3",
                         initial_lr=1e-3))
register_trainer(replace(_adan, name="nnUNetTrainerAdan3en4",
                         initial_lr=3e-4))
register_trainer(replace(_adan, name="nnUNetTrainerAdan1en1",
                         initial_lr=1e-1))
register_trainer(replace(_adan, name="nnUNetTrainerAdanCosAnneal",
                         lr_scheduler="cosine_warmup", warmup_epochs=0))


# ---------------------------------------------------------------------------
# remaining reference trainer names: aliases + small hyperparameter combos
# ---------------------------------------------------------------------------

# Adam family (variants/optimizer/nnUNetTrainerAdam.py): nnUNetTrainerAdam =
# AdamW(amsgrad=True) + poly LR; VanillaAdam = plain Adam (coupled L2 decay)
_adam = replace(_default, name="nnUNetTrainerAdam", optimizer="adamw_amsgrad")
register_trainer(_adam)
register_trainer(replace(_adam, name="nnUNetTrainerAdam1en3",
                         initial_lr=1e-3))
register_trainer(replace(_adam, name="nnUNetTrainerAdam3en4",
                         initial_lr=3e-4))
_vadam = replace(_default, name="nnUNetTrainerVanillaAdam",
                 optimizer="adam_l2")
register_trainer(_vadam)
register_trainer(replace(_vadam, name="nnUNetTrainerVanillaAdam1en3",
                         initial_lr=1e-3))
register_trainer(replace(_vadam, name="nnUNetTrainerVanillaAdam3en4",
                         initial_lr=3e-4))

# DA5 combinations (variants/data_augmentation/nnUNetTrainerDA5.py tail)
register_trainer(replace(_default, name="nnUNetTrainerDA5_10epochs",
                         da_level="DA5", num_epochs=10))
register_trainer(replace(_default, name="nnUNetTrainerDA5ord0",
                         da_level="DA5", order_resampling_data=0,
                         order_resampling_seg=0))
register_trainer(replace(_default, name="nnUNetTrainerDA5Segord0",
                         da_level="DA5", order_resampling_data=3,
                         order_resampling_seg=0))

# epoch-count combos (variants/training_length/nnUNetTrainer_Xepochs*.py)
register_trainer(replace(_default, name="nnUNetTrainer_1epoch", num_epochs=1))
for _ep in (250, 2000, 4000, 8000):
    register_trainer(replace(
        _default, name=f"nnUNetTrainer_{_ep}epochs_NoMirroring",
        num_epochs=_ep, disable_mirroring=True))
register_trainer(replace(_default, name="nnUNetTrainer_500e", num_epochs=500))

# mirror only the first spatial axis pair (nnUNetTrainer_onlyMirror01)
register_trainer(replace(_default, name="nnUNetTrainer_onlyMirror01",
                         mirror_axes_override=(0, 1)))

# probabilistic oversampling percent variants
# (variants/sampling/nnUNetTrainer_probabilisticOversampling.py:63-74; the
# base class computes the effective percent from the batch size, sentinel -1)
register_trainer(replace(
    _default, name="nnUNetTrainer_probabilisticOversampling_033",
    probabilistic_oversampling=True, oversample_foreground_percent=0.33))
register_trainer(replace(
    _default, name="nnUNetTrainer_probabilisticOversampling_010",
    probabilistic_oversampling=True, oversample_foreground_percent=0.1))

# naming aliases: some reference variants exist under two class names
for _alias, _orig in (
    ("nnUNetTrainerLightMUNet", "nnUNetTrainer_LightMUNet"),
    ("nnUNetTrainerMambaUNet", "nnUNetTrainer_MambaUNet"),
    ("nnUNetTrainerSegMamba", "nnUNetTrainer_SegMamba"),
    ("nnUNetTrainerUltraLightVMUNet", "nnUNetTrainer_UltraLightVMUNet"),
    ("nnUNetTrainerVMUNet", "nnUNetTrainer_VMUNet"),
    ("nnUNetTrainernnMamba", "nnUNetTrainer_nnMamba"),
    ("nnUNetTrainer_SwinUNETR_2d", "nnUNetTrainerSwinUNETR_2d"),
    ("nnUNetTrainer_MedNeXt_new", "nnUNetTrainer_MedNeXt"),
):
    register_trainer(replace(TRAINER_REGISTRY[_orig], name=_alias))
