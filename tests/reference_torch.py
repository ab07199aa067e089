"""Load the reference flagship torch model from /root/reference for
numerical parity testing — WITHOUT its CUDA-only / unavailable deps.

The reference model classes (MLLA_Uper and friends) live in
nnUNetTrainer_MLAgg_2D_dt_MS.py below the trainer class, needing only
torch + einops + four unavailable packages which we shim with exact-math
CPU implementations:

  * flash_attn.flash_attn_func  -> plain fp32 softmax attention in the
    (B, S, H, D) flash layout with the same default scale (D**-0.5).
    This matches the semantics the reference itself documents in its
    commented non-flash fallback (nnUNetTrainer_MLAgg_2D_dt_MS.py:762-777).
  * mamba_ssm selective_scan_fn -> sequential fp32 recurrence (the
    mathematical definition the CUDA kernel implements).
  * timm.models.layers          -> DropPath / to_2tuple / trunc_normal_.
  * monai blocks/layers         -> UnetOutBlock / UnetrBasicBlock /
    UnetrUpBlock / get_conv_layer / get_norm_layer following monai's
    module structure (state_dict-compatible with real monai).

NOTE on evidence strength: the MLLA encoder, MSMM (SS2D_skip), MedNeXt
decoder and all the glue run the REFERENCE's own code; only the flash /
selective-scan primitives (whose math is fixed) and the two monai head
blocks are re-implemented here.

Nothing from /root/reference is copied into the repo — the sources are
exec'd at test time and the tests skip when the mount is absent.
"""
from __future__ import annotations

import enum as _enum
import pathlib
import sys
import types

import numpy as np

REF_DIR = pathlib.Path(
    "/root/reference/mlagg/nnunetv2/training/nnUNetTrainer")
FLAGSHIP = REF_DIR / "nnUNetTrainer_MLAgg_2D_dt_MS.py"
MAMBASKIP = REF_DIR / "variants/mamba/MambaSkip.py"
MEDNEXT_DIR = pathlib.Path(
    "/root/reference/mlagg/nnunetv2/network_architecture/mednextv1")


def available() -> bool:
    return FLAGSHIP.exists() and MAMBASKIP.exists()


def _install_shims():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "flash_attn" in sys.modules:
        return

    # ---------------- timm.models.layers ----------------
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = float(drop_prob or 0.0)

        def forward(self, x):
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x / keep * mask

    def to_2tuple(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
        return tensor

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    # ---------------- flash_attn ----------------
    def flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None,
                        causal=False, **kwargs):
        assert not causal and dropout_p == 0.0
        scale = softmax_scale if softmax_scale is not None \
            else q.shape[-1] ** -0.5
        s = torch.einsum("bqhd,bkhd->bhqk", q.float(), k.float()) * scale
        p = s.softmax(dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", p, v.float())
        return o.to(q.dtype)

    flash = types.ModuleType("flash_attn")
    flash.flash_attn_func = flash_attn_func
    sys.modules["flash_attn"] = flash

    # ---------------- mamba_ssm selective scan ----------------
    def selective_scan_fn(u, delta, A, B, C, D=None, z=None,
                          delta_bias=None, delta_softplus=False,
                          return_last_state=False):
        """Sequential fp32 S6 recurrence. u/delta: (b, KD, L); A: (KD, n);
        B/C: (b, K, n, L) (group form); D/delta_bias: (KD,)."""
        b, kd, L = u.shape
        n = A.shape[1]
        K = B.shape[1]
        d = kd // K
        uf = u.float()
        delta = delta.float()
        if delta_bias is not None:
            delta = delta + delta_bias.float()[None, :, None]
        if delta_softplus:
            delta = F.softplus(delta)
        Af = A.float()
        Be = B.float().repeat_interleave(d, dim=1)      # (b, KD, n, L)
        Ce = C.float().repeat_interleave(d, dim=1)
        h = uf.new_zeros(b, kd, n)
        ys = []
        for t in range(L):
            dt = delta[:, :, t].unsqueeze(-1)           # (b, KD, 1)
            h = torch.exp(dt * Af[None]) * h \
                + dt * Be[:, :, :, t] * uf[:, :, t].unsqueeze(-1)
            ys.append((h * Ce[:, :, :, t]).sum(-1))
        y = torch.stack(ys, dim=-1)                     # (b, KD, L) fp32
        if D is not None:
            y = y + D.float()[None, :, None] * uf
        if z is not None:
            y = y * F.silu(z.float())
        if return_last_state:
            return y, h
        return y

    mamba = types.ModuleType("mamba_ssm")
    mamba_ops = types.ModuleType("mamba_ssm.ops")
    mamba_iface = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
    mamba_iface.selective_scan_fn = selective_scan_fn
    mamba_iface.selective_scan_ref = selective_scan_fn
    mamba.ops = mamba_ops
    mamba_ops.selective_scan_interface = mamba_iface
    sys.modules["mamba_ssm"] = mamba
    sys.modules["mamba_ssm.ops"] = mamba_ops
    sys.modules["mamba_ssm.ops.selective_scan_interface"] = mamba_iface

    # ------- selective_scan_cuda{,_core,_oflex} (VMamba wrappers) -------
    def _cuda_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus):
        if B.dim() == 3:
            B = B.unsqueeze(1)
            C = C.unsqueeze(1)
        out = selective_scan_fn(u, delta, A, B, C, D=D,
                                delta_bias=delta_bias,
                                delta_softplus=delta_softplus)
        return out, torch.empty(0)

    sscuda = types.ModuleType("selective_scan_cuda")
    sscuda.fwd = lambda u, d, A, B, C, D, z, db, dsp: _cuda_fwd(
        u, d, A, B, C, D, db, dsp)
    sscore = types.ModuleType("selective_scan_cuda_core")
    sscore.fwd = lambda u, d, A, B, C, D, db, dsp, nrows: _cuda_fwd(
        u, d, A, B, C, D, db, dsp)
    ssoflex = types.ModuleType("selective_scan_cuda_oflex")
    ssoflex.fwd = lambda u, d, A, B, C, D, db, dsp, nrows, oflex: _cuda_fwd(
        u, d, A, B, C, D, db, dsp)
    sys.modules["selective_scan_cuda"] = sscuda
    sys.modules["selective_scan_cuda_core"] = sscore
    sys.modules["selective_scan_cuda_oflex"] = ssoflex

    # ------- loguru (MSVM file imports it at module level) -------
    loguru = types.ModuleType("loguru")

    class _SilentLogger:
        def __getattr__(self, name):
            return lambda *a, **k: None

    loguru.logger = _SilentLogger()
    sys.modules["loguru"] = loguru

    # ------- fake triton (csm_triton decorates at module level) -------
    class _FakeJit:
        def __call__(self, fn=None, **kw):
            if fn is None:
                return lambda f: f
            return fn

    # torch._dynamo probes triton.language.dtype at import when it sees a
    # 'triton' module — import it now (real-triton absent => clean path)
    # so the fake module can't break later optimizer construction
    try:
        import torch._dynamo  # noqa: F401
    except Exception:
        pass
    triton = types.ModuleType("triton")
    triton.jit = _FakeJit()
    tl = types.ModuleType("triton.language")

    tl.constexpr = object
    tl.dtype = type("dtype", (), {})
    triton.language = tl
    sys.modules["triton"] = triton
    sys.modules["triton.language"] = tl

    # ---------------- monai (blocks used by the flagship) ----------------
    def _norm(name, spatial_dims, channels):
        kwargs = {}
        if isinstance(name, tuple):
            name, kwargs = name[0], dict(name[1]) if len(name) > 1 else {}
        name = str(name).lower()
        if name == "group":
            return nn.GroupNorm(kwargs.get("num_groups", 8), channels)
        assert name == "instance", name
        cls = nn.InstanceNorm2d if spatial_dims == 2 else nn.InstanceNorm3d
        return cls(channels, affine=True)

    class _Convolution(nn.Sequential):
        """monai Convolution with act/norm None: Sequential holding 'conv'."""

        def __init__(self, spatial_dims, in_ch, out_ch, kernel_size=3,
                     stride=1, bias=True, is_transposed=False,
                     output_padding=None, groups=1):
            super().__init__()
            conv_cls = (
                (nn.ConvTranspose2d if spatial_dims == 2
                 else nn.ConvTranspose3d) if is_transposed
                else (nn.Conv2d if spatial_dims == 2 else nn.Conv3d))
            # monai supports per-axis kernel/stride sequences (SegMamba's
            # decoder2 upsamples with strides[0] == [1, 2, 2])
            def _ax(v):
                return tuple(v) if isinstance(v, (tuple, list)) \
                    else (v,) * spatial_dims

            ks, ss = _ax(kernel_size), _ax(stride)
            pad = tuple((k - 1) // 2 for k in ks)
            if is_transposed:
                # monai: padding = (k-1)//2, output_padding chosen so the
                # output is exactly stride * input
                opad = tuple(s + 2 * p - k
                             for s, p, k in zip(ss, pad, ks)) \
                    if output_padding is None else output_padding
                conv = conv_cls(in_ch, out_ch, ks, ss, padding=pad,
                                output_padding=opad, bias=bias)
            else:
                conv = conv_cls(in_ch, out_ch, ks, ss,
                                padding=pad, bias=bias, groups=groups)
            self.add_module("conv", conv)

    def get_conv_layer(spatial_dims, in_channels, out_channels,
                       kernel_size=3, stride=1, act=None, norm=None,
                       dropout=None, bias=True, conv_only=False,
                       is_transposed=False):
        assert act is None and norm is None and not dropout
        return _Convolution(spatial_dims, in_channels, out_channels,
                            kernel_size, stride, bias=bias,
                            is_transposed=is_transposed)

    class UnetResBlock(nn.Module):
        """monai.networks.blocks.dynunet_block.UnetResBlock semantics."""

        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, stride, norm_name, act_name=None,
                     dropout=None):
            super().__init__()
            self.conv1 = get_conv_layer(spatial_dims, in_channels,
                                        out_channels, kernel_size, stride)
            self.conv2 = get_conv_layer(spatial_dims, out_channels,
                                        out_channels, kernel_size, 1)
            self.lrelu = nn.LeakyReLU(0.01, inplace=True)
            self.norm1 = _norm(norm_name, spatial_dims, out_channels)
            self.norm2 = _norm(norm_name, spatial_dims, out_channels)
            self.downsample = (in_channels != out_channels
                               or np.any(np.atleast_1d(stride) != 1))
            if self.downsample:
                self.conv3 = get_conv_layer(spatial_dims, in_channels,
                                            out_channels, 1, stride)
                self.norm3 = _norm(norm_name, spatial_dims, out_channels)

        def forward(self, inp):
            residual = inp
            out = self.lrelu(self.norm1(self.conv1(inp)))
            out = self.norm2(self.conv2(out))
            if self.downsample:
                residual = self.norm3(self.conv3(residual))
            return self.lrelu(out + residual)

    class UnetrBasicBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, stride, norm_name, res_block=True):
            super().__init__()
            assert res_block
            self.layer = UnetResBlock(spatial_dims, in_channels,
                                      out_channels, kernel_size, stride,
                                      norm_name)

        def forward(self, x):
            return self.layer(x)

    class UnetrUpBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, upsample_kernel_size, norm_name,
                     res_block=True):
            super().__init__()
            assert res_block
            self.transp_conv = get_conv_layer(
                spatial_dims, in_channels, out_channels,
                upsample_kernel_size, upsample_kernel_size,
                conv_only=True, is_transposed=True)
            self.conv_block = UnetResBlock(
                spatial_dims, out_channels + out_channels, out_channels,
                kernel_size, 1, norm_name)

        def forward(self, inp, skip):
            out = self.transp_conv(inp)
            out = torch.cat((out, skip), dim=1)
            return self.conv_block(out)

    class UnetOutBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     dropout=None):
            super().__init__()
            self.conv = get_conv_layer(spatial_dims, in_channels,
                                       out_channels, 1, 1)

        def forward(self, x):
            return self.conv(x)

    monai = types.ModuleType("monai")
    m_networks = types.ModuleType("monai.networks")
    m_blocks = types.ModuleType("monai.networks.blocks")
    m_dyn = types.ModuleType("monai.networks.blocks.dynunet_block")
    m_layers = types.ModuleType("monai.networks.layers")
    m_lutils = types.ModuleType("monai.networks.layers.utils")
    m_blocks.UnetOutBlock = UnetOutBlock
    m_blocks.UnetrBasicBlock = UnetrBasicBlock
    m_blocks.UnetrUpBlock = UnetrUpBlock
    m_dyn.get_conv_layer = get_conv_layer
    m_dyn.UnetResBlock = UnetResBlock
    m_dyn.UnetOutBlock = UnetOutBlock
    m_unetr = types.ModuleType("monai.networks.blocks.unetr_block")
    m_unetr.UnetrBasicBlock = UnetrBasicBlock
    m_unetr.UnetrUpBlock = UnetrUpBlock
    m_blocks.unetr_block = m_unetr
    m_lutils.get_norm_layer = _norm

    # ---- segresnet pieces (LightM-UNet, nnUNetTrainer_LightMUNet.py) ----
    def Convolution(spatial_dims, in_channels, out_channels, strides=1,
                    kernel_size=3, bias=True, conv_only=True, groups=1,
                    **kw):
        assert conv_only
        return _Convolution(spatial_dims, in_channels, out_channels,
                            kernel_size, strides, bias=bias, groups=groups)

    def get_act_layer(act):
        name = act[0] if isinstance(act, tuple) else act
        assert str(name).lower() == "relu", act
        return nn.ReLU()

    def seg_get_conv_layer(spatial_dims, in_channels, out_channels,
                           kernel_size=3, stride=1, bias=False):
        return _Convolution(spatial_dims, in_channels, out_channels,
                            kernel_size, stride, bias=bias)

    def get_upsample_layer(spatial_dims, in_channels, upsample_mode=None,
                           scale_factor=2):
        return nn.Upsample(scale_factor=scale_factor, mode="nearest")

    class UpsampleMode(str, _enum.Enum):
        DECONV = "deconv"
        NONTRAINABLE = "nontrainable"
        PIXELSHUFFLE = "pixelshuffle"

    class _DropoutFactory:
        DROPOUT = 0

        def __getitem__(self, key):
            return nn.Dropout if not isinstance(key, tuple) \
                else (lambda p: nn.Dropout(p))

    # ---- bits the SwinT VMUNet3D variant imports at module level ----
    class MLPBlock(nn.Module):
        def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0,
                     act="GELU", dropout_mode="vit"):
            super().__init__()
            self.linear1 = nn.Linear(hidden_size, mlp_dim)
            self.linear2 = nn.Linear(mlp_dim, hidden_size)
            self.fn = nn.GELU()

        def forward(self, x):
            return self.linear2(self.fn(self.linear1(x)))

    def ensure_tuple_rep(v, dim):
        return tuple(v) if isinstance(v, (tuple, list)) else (v,) * dim

    def look_up_option(opt, supported):
        return opt

    def optional_import(module, name=""):
        import importlib
        try:
            mod = importlib.import_module(module)
            return (getattr(mod, name) if name else mod), True
        except ImportError:
            return None, False

    def deprecated_arg(*a, **k):
        def deco(fn):
            return fn
        return deco

    m_blocks.MLPBlock = MLPBlock
    m_blocks.PatchEmbed = None        # imported by the SwinT file, unused
    m_layers.DropPath = sys.modules["timm.models.layers"].DropPath
    m_layers.trunc_normal_ = sys.modules["timm.models.layers"].trunc_normal_
    m_deprecate = types.ModuleType("monai.utils.deprecate_utils")
    m_deprecate.deprecated_arg = deprecated_arg

    m_convs = types.ModuleType("monai.networks.blocks.convolutions")
    m_convs.Convolution = Convolution
    m_seg = types.ModuleType("monai.networks.blocks.segresnet_block")
    m_seg.ResBlock = UnetResBlock           # imported, unused by the model
    m_seg.get_conv_layer = seg_get_conv_layer
    m_seg.get_upsample_layer = get_upsample_layer
    m_fact = types.ModuleType("monai.networks.layers.factories")
    m_fact.Dropout = _DropoutFactory()
    m_lutils.get_act_layer = get_act_layer
    m_utils = types.ModuleType("monai.utils")
    m_utils.UpsampleMode = UpsampleMode
    m_utils.ensure_tuple_rep = ensure_tuple_rep
    m_utils.look_up_option = look_up_option
    m_utils.optional_import = optional_import
    m_utils.deprecate_utils = m_deprecate

    monai.networks = m_networks
    m_networks.blocks = m_blocks
    m_networks.layers = m_layers
    m_blocks.dynunet_block = m_dyn
    m_blocks.convolutions = m_convs
    m_blocks.segresnet_block = m_seg
    m_layers.utils = m_lutils
    m_layers.factories = m_fact
    monai.utils = m_utils
    sys.modules["monai"] = monai
    sys.modules["monai.networks"] = m_networks
    sys.modules["monai.networks.blocks"] = m_blocks
    sys.modules["monai.networks.blocks.dynunet_block"] = m_dyn
    sys.modules["monai.networks.blocks.unetr_block"] = m_unetr
    sys.modules["monai.networks.blocks.convolutions"] = m_convs
    sys.modules["monai.networks.blocks.segresnet_block"] = m_seg
    sys.modules["monai.networks.layers"] = m_layers
    sys.modules["monai.networks.layers.utils"] = m_lutils
    sys.modules["monai.networks.layers.factories"] = m_fact
    sys.modules["monai.utils"] = m_utils
    sys.modules["monai.utils.deprecate_utils"] = m_deprecate


_cache = {}


def load_reference_modules():
    """Returns (mambaskip_module, flagship_model_module) with the
    reference's model classes, exec'd from /root/reference sources."""
    if "mods" in _cache:
        return _cache["mods"]
    _install_shims()

    # MambaSkip.py: everything above its __main__ guard
    src = MAMBASKIP.read_text()
    src = src[: src.index("if __name__ ==")]
    ms = types.ModuleType("ref_mambaskip")
    ms.__file__ = str(MAMBASKIP)
    exec(compile(src, str(MAMBASKIP), "exec"), ms.__dict__)

    # register so the flagship's import resolves to the exec'd module
    pkgs = ["nnunetv2", "nnunetv2.training", "nnunetv2.training.nnUNetTrainer",
            "nnunetv2.training.nnUNetTrainer.variants",
            "nnunetv2.training.nnUNetTrainer.variants.mamba"]
    for p in pkgs:
        sys.modules.setdefault(p, types.ModuleType(p))
    sys.modules[
        "nnunetv2.training.nnUNetTrainer.variants.mamba.MambaSkip"] = ms

    # flagship file: model section only (from its mid-file import block,
    # right after the trainer class, to its __main__ guard). The top-of-file
    # imports the slice relies on are re-established by the prelude.
    src = FLAGSHIP.read_text()
    start = src.index("import sys\nimport torch.utils.checkpoint")
    end = src.index("if __name__ ==")
    prelude = ("import math\nimport torch\nimport numpy as np\n"
               "from torch import nn\nimport torch.nn.functional as F\n")
    fl = types.ModuleType("ref_flagship")
    fl.__file__ = str(FLAGSHIP)
    exec(compile(prelude + src[start:end], str(FLAGSHIP), "exec"),
         fl.__dict__)

    _cache["mods"] = (ms, fl)
    return ms, fl


def load_reference_mednext():
    """Exec the reference MedNeXt net (blocks_new + MedNextV1_new) —
    torch-only sources, no shims needed beyond what's installed."""
    if "mednext" in _cache:
        return _cache["mednext"]
    _install_shims()
    blocks = types.ModuleType("ref_mednext_blocks")
    src = (MEDNEXT_DIR / "blocks_new.py").read_text()
    exec(compile(src, str(MEDNEXT_DIR / "blocks_new.py"), "exec"),
         blocks.__dict__)
    sys.modules.setdefault("nnunetv2.network_architecture",
                           types.ModuleType("nnunetv2.network_architecture"))
    sys.modules.setdefault(
        "nnunetv2.network_architecture.mednextv1",
        types.ModuleType("nnunetv2.network_architecture.mednextv1"))
    sys.modules["nnunetv2.network_architecture.mednextv1.blocks_new"] = blocks

    net_mod = types.ModuleType("ref_mednext")
    src = (MEDNEXT_DIR / "MedNextV1_new.py").read_text()
    if "if __name__ ==" in src:
        src = src[: src.index("if __name__ ==")]
    exec(compile(src, str(MEDNEXT_DIR / "MedNextV1_new.py"), "exec"),
         net_mod.__dict__)
    _cache["mednext"] = net_mod
    return net_mod


def load_reference_mednext_mambaskip():
    """Exec the reference MedNextV1_new_Mambaskip (MSMM over 5 streams)."""
    if "mednext_ms" in _cache:
        return _cache["mednext_ms"]
    load_reference_modules()     # registers the MambaSkip module + shims
    load_reference_mednext()     # registers blocks_new
    net_mod = types.ModuleType("ref_mednext_mambaskip")
    path = MEDNEXT_DIR / "MedNextV1_new_Mambaskip.py"
    src = path.read_text()
    if "if __name__ ==" in src:
        src = src[: src.index("if __name__ ==")]
    exec(compile(src, str(path), "exec"), net_mod.__dict__)
    _cache["mednext_ms"] = net_mod
    return net_mod


VMAMBA_DIR = REF_DIR / "variants/mamba/vmamba"


def load_reference_vmamba():
    """Exec the reference VMamba backbone lib (csms6s + csm_triton +
    vmamba) with fake triton / selective_scan_cuda shims. Returns the
    vmamba module (SS2D, VSSBlock, VSSM, ...)."""
    if "vmamba" in _cache:
        return _cache["vmamba"]
    _install_shims()

    pkg = types.ModuleType("refvmamba")
    pkg.__path__ = []
    sys.modules["refvmamba"] = pkg

    for name in ("csm_triton", "csms6s"):
        m = types.ModuleType(f"refvmamba.{name}")
        m.__package__ = "refvmamba"
        src = (VMAMBA_DIR / f"{name}.py").read_text()
        exec(compile(src, str(VMAMBA_DIR / f"{name}.py"), "exec"), m.__dict__)
        sys.modules[f"refvmamba.{name}"] = m
        setattr(pkg, name, m)

    vm = types.ModuleType("refvmamba.vmamba")
    vm.__package__ = "refvmamba"
    src = (VMAMBA_DIR / "vmamba.py").read_text()
    if "if __name__ ==" in src:
        src = src[: src.index("if __name__ ==")]
    exec(compile(src, str(VMAMBA_DIR / "vmamba.py"), "exec"), vm.__dict__)
    _cache["vmamba"] = vm
    return vm


MSVM = REF_DIR / "variants/mamba/nnUNetTrainer_MSVM_UNet.py"


def load_reference_msvm():
    """Exec the reference MSVM-UNet file (vendored VSSM + MSVM decoder).

    The file does not compile as shipped: it carries a mid-file
    ``from __future__ import annotations`` (line 68, a SyntaxError), so we
    strip that line and exec from the section below the (nnunetv2-importing)
    trainer class. CrossScanTriton/CrossMergeTriton are rebound to the
    file's own torch CrossScan/CrossMerge fallbacks (same math; the fake
    triton shim cannot execute kernels)."""
    if "msvm" in _cache:
        return _cache["msvm"]
    _install_shims()

    src = MSVM.read_text()
    src = src.replace("from __future__ import annotations", "")
    start = src.index("# triton cross scan")
    mod = types.ModuleType("ref_msvm")
    mod.__file__ = str(MSVM)
    exec(compile(src[start:], str(MSVM), "exec"), mod.__dict__)
    # the v05 forward binds these at SS2D construction time
    mod.CrossScanTriton = mod.CrossScan
    mod.CrossMergeTriton = mod.CrossMerge
    mod.CrossScanTriton1b1 = mod.CrossScan_Ab_1direction
    _cache["msvm"] = mod
    return mod


def _install_dna_shims():
    """dynamic_network_architectures building blocks (not installed in this
    environment, nor vendored by the reference). These follow the public
    library's module structure and state_dict naming (convs.N.conv/.norm,
    conv1/conv2/skip.{0,1}) so converted checkpoints keep working; the
    conv-block math is the standard conv->InstanceNorm->LeakyReLU /
    residual BasicBlockD composition."""
    import torch
    import torch.nn as nn

    if "dynamic_network_architectures" in sys.modules:
        return
    _install_shims()

    def _pad(k):
        return [(i - 1) // 2 for i in k] if isinstance(k, (tuple, list)) \
            else (k - 1) // 2

    class ConvDropoutNormReLU(nn.Module):
        def __init__(self, conv_op, in_ch, out_ch, kernel, stride, conv_bias,
                     norm_op=None, norm_op_kwargs=None, dropout_op=None,
                     dropout_op_kwargs=None, nonlin=None, nonlin_kwargs=None,
                     nonlin_first=False):
            super().__init__()
            self.conv = conv_op(in_ch, out_ch, kernel, stride,
                                padding=_pad(kernel), bias=conv_bias)
            if dropout_op is not None:
                self.dropout = dropout_op(**(dropout_op_kwargs or {}))
            if norm_op is not None:
                self.norm = norm_op(out_ch, **(norm_op_kwargs or {}))
            if nonlin is not None:
                self.nonlin = nonlin(**(nonlin_kwargs or {}))

        def forward(self, x):
            x = self.conv(x)
            if hasattr(self, "dropout"):
                x = self.dropout(x)
            if hasattr(self, "norm"):
                x = self.norm(x)
            if hasattr(self, "nonlin"):
                x = self.nonlin(x)
            return x

    class StackedConvBlocks(nn.Module):
        def __init__(self, num_convs, conv_op, in_ch, out_ch, kernel,
                     initial_stride, conv_bias=False, norm_op=None,
                     norm_op_kwargs=None, dropout_op=None,
                     dropout_op_kwargs=None, nonlin=None, nonlin_kwargs=None,
                     nonlin_first=False):
            super().__init__()
            if not isinstance(out_ch, (tuple, list)):
                out_ch = [out_ch] * num_convs
            convs = [ConvDropoutNormReLU(
                conv_op, in_ch, out_ch[0], kernel, initial_stride, conv_bias,
                norm_op, norm_op_kwargs, dropout_op, dropout_op_kwargs,
                nonlin, nonlin_kwargs)]
            for i in range(1, num_convs):
                convs.append(ConvDropoutNormReLU(
                    conv_op, out_ch[i - 1], out_ch[i], kernel, 1, conv_bias,
                    norm_op, norm_op_kwargs, dropout_op, dropout_op_kwargs,
                    nonlin, nonlin_kwargs))
            self.convs = nn.Sequential(*convs)
            self.output_channels = out_ch[-1]

        def forward(self, x):
            return self.convs(x)

        def compute_conv_feature_map_size(self, input_size):
            return 0

    class BasicBlockD(nn.Module):
        # public dynamic_network_architectures keyword names (UMamba*
        # instantiates with input_channels=/output_channels=/kernel_size=)
        def __init__(self, conv_op, input_channels, output_channels,
                     kernel_size, stride,
                     conv_bias=False, norm_op=None, norm_op_kwargs=None,
                     dropout_op=None, dropout_op_kwargs=None, nonlin=None,
                     nonlin_kwargs=None, stochastic_depth_p=0.0,
                     squeeze_excitation=False,
                     squeeze_excitation_reduction_ratio=1. / 16):
            super().__init__()
            in_ch, out_ch, kernel = input_channels, output_channels, \
                kernel_size
            self.conv1 = ConvDropoutNormReLU(
                conv_op, in_ch, out_ch, kernel, stride, conv_bias, norm_op,
                norm_op_kwargs, dropout_op, dropout_op_kwargs, nonlin,
                nonlin_kwargs)
            self.conv2 = ConvDropoutNormReLU(
                conv_op, out_ch, out_ch, kernel, 1, conv_bias, norm_op,
                norm_op_kwargs, dropout_op, dropout_op_kwargs, None, None)
            self.nonlin2 = nonlin(**(nonlin_kwargs or {})) \
                if nonlin is not None else nn.Identity()
            stride_l = stride if isinstance(stride, (tuple, list)) \
                else [stride]
            if in_ch != out_ch or any(i != 1 for i in stride_l):
                self.skip = nn.Sequential(
                    conv_op(in_ch, out_ch, 1, stride, bias=False),
                    norm_op(out_ch, **(norm_op_kwargs or {})))
            else:
                self.skip = nn.Identity()

        def forward(self, x):
            residual = self.skip(x)
            out = self.conv2(self.conv1(x))
            return self.nonlin2(out + residual)

    class BottleneckD(nn.Module):
        pass

    class StackedResidualBlocks(nn.Module):
        def __init__(self, n_blocks, conv_op, input_channels,
                     output_channels, kernel_size, initial_stride,
                     conv_bias=False, norm_op=None, norm_op_kwargs=None,
                     dropout_op=None, dropout_op_kwargs=None, nonlin=None,
                     nonlin_kwargs=None, block=BasicBlockD,
                     bottleneck_channels=None, stochastic_depth_p=0.0,
                     squeeze_excitation=False,
                     squeeze_excitation_reduction_ratio=1. / 16):
            super().__init__()
            if not isinstance(output_channels, (tuple, list)):
                output_channels = [output_channels] * n_blocks
            blocks = [block(conv_op, input_channels, output_channels[0],
                            kernel_size, initial_stride, conv_bias, norm_op,
                            norm_op_kwargs, dropout_op, dropout_op_kwargs,
                            nonlin, nonlin_kwargs)]
            for i in range(1, n_blocks):
                blocks.append(block(
                    conv_op, output_channels[i - 1], output_channels[i],
                    kernel_size, 1, conv_bias, norm_op, norm_op_kwargs,
                    dropout_op, dropout_op_kwargs, nonlin, nonlin_kwargs))
            self.blocks = nn.Sequential(*blocks)
            self.output_channels = output_channels[-1]

        def forward(self, x):
            return self.blocks(x)

        def compute_conv_feature_map_size(self, input_size):
            return 0

    def get_matching_convtransp(conv_op):
        return {nn.Conv2d: nn.ConvTranspose2d,
                nn.Conv3d: nn.ConvTranspose3d}[conv_op]

    def get_matching_pool_op(conv_op, adaptive=False, pool_type="max"):
        d = {"max": {nn.Conv2d: nn.MaxPool2d, nn.Conv3d: nn.MaxPool3d},
             "avg": {nn.Conv2d: nn.AvgPool2d, nn.Conv3d: nn.AvgPool3d}}
        return d[pool_type][conv_op]

    def get_matching_instancenorm(conv_op):
        return {nn.Conv2d: nn.InstanceNorm2d,
                nn.Conv3d: nn.InstanceNorm3d}[conv_op]

    def convert_dim_to_conv_op(dim):
        return {1: nn.Conv1d, 2: nn.Conv2d, 3: nn.Conv3d}[dim]

    def convert_conv_op_to_dim(conv_op):
        return {nn.Conv1d: 1, nn.Conv2d: 2, nn.Conv3d: 3}[conv_op]

    def maybe_convert_scalar_to_list(conv_op, scalar):
        if isinstance(scalar, (tuple, list)):
            return list(scalar)
        return [scalar] * convert_conv_op_to_dim(conv_op)

    def init_last_bn_before_add_to_0(module):
        pass

    class InitWeights_He:
        def __init__(self, neg_slope=1e-2):
            self.neg_slope = neg_slope

        def __call__(self, module):
            pass

    class PlainConvEncoder(nn.Module):
        pass

    class UNetDecoder(nn.Module):
        pass

    dna = types.ModuleType("dynamic_network_architectures")
    bb = types.ModuleType("dynamic_network_architectures.building_blocks")
    helper = types.ModuleType(
        "dynamic_network_architectures.building_blocks.helper")
    helper.get_matching_convtransp = get_matching_convtransp
    helper.get_matching_pool_op = get_matching_pool_op
    helper.get_matching_instancenorm = get_matching_instancenorm
    helper.convert_dim_to_conv_op = convert_dim_to_conv_op
    helper.convert_conv_op_to_dim = convert_conv_op_to_dim
    helper.maybe_convert_scalar_to_list = maybe_convert_scalar_to_list
    simple = types.ModuleType(
        "dynamic_network_architectures.building_blocks.simple_conv_blocks")
    simple.StackedConvBlocks = StackedConvBlocks
    simple.ConvDropoutNormReLU = ConvDropoutNormReLU
    residual = types.ModuleType(
        "dynamic_network_architectures.building_blocks.residual")
    residual.BasicBlockD = BasicBlockD
    residual.BottleneckD = BottleneckD
    residual.StackedResidualBlocks = StackedResidualBlocks
    pce = types.ModuleType(
        "dynamic_network_architectures.building_blocks.plain_conv_encoder")
    pce.PlainConvEncoder = PlainConvEncoder
    ud = types.ModuleType(
        "dynamic_network_architectures.building_blocks.unet_decoder")
    ud.UNetDecoder = UNetDecoder
    wi = types.ModuleType(
        "dynamic_network_architectures.initialization.weight_init")
    wi.init_last_bn_before_add_to_0 = init_last_bn_before_add_to_0
    wi.InitWeights_He = InitWeights_He
    init_pkg = types.ModuleType(
        "dynamic_network_architectures.initialization")
    for name, m in {
        "dynamic_network_architectures": dna,
        "dynamic_network_architectures.building_blocks": bb,
        "dynamic_network_architectures.building_blocks.helper": helper,
        "dynamic_network_architectures.building_blocks.simple_conv_blocks":
            simple,
        "dynamic_network_architectures.building_blocks.residual": residual,
        "dynamic_network_architectures.building_blocks.plain_conv_encoder":
            pce,
        "dynamic_network_architectures.building_blocks.unet_decoder": ud,
        "dynamic_network_architectures.initialization": init_pkg,
        "dynamic_network_architectures.initialization.weight_init": wi,
    }.items():
        sys.modules[name] = m

    # ------- mamba_ssm.Mamba module class (slow path, exact math) -------
    import math

    import torch.nn.functional as F

    mamba_mod = sys.modules["mamba_ssm"]
    sel_fn = sys.modules[
        "mamba_ssm.ops.selective_scan_interface"].selective_scan_fn

    class Mamba(nn.Module):
        """mamba_ssm.modules.mamba_simple.Mamba param structure + the
        use_fast_path=False forward. bimamba_type='v3' adds the SegMamba
        fork's backward (_b) and inter-slice (_s) branches (tri-orientated
        Mamba, summed before the shared out_proj)."""

        def __init__(self, d_model, d_state=16, d_conv=4, expand=2,
                     dt_rank="auto", conv_bias=True, bias=False,
                     use_fast_path=True, layer_idx=None, bimamba_type=None,
                     nslices=None, **kw):
            super().__init__()
            self.d_model = d_model
            self.d_state = d_state
            self.d_conv = d_conv
            self.d_inner = int(expand * d_model)
            self.dt_rank = math.ceil(d_model / 16) if dt_rank == "auto" \
                else dt_rank
            self.bimamba_type = bimamba_type
            self.nslices = nslices
            self.in_proj = nn.Linear(d_model, 2 * self.d_inner, bias=bias)
            self.conv1d = nn.Conv1d(self.d_inner, self.d_inner, d_conv,
                                    groups=self.d_inner, padding=d_conv - 1,
                                    bias=conv_bias)
            self.x_proj = nn.Linear(self.d_inner,
                                    self.dt_rank + 2 * d_state, bias=False)
            self.dt_proj = nn.Linear(self.dt_rank, self.d_inner, bias=True)
            A = torch.arange(1, d_state + 1, dtype=torch.float32
                             ).repeat(self.d_inner, 1)
            self.A_log = nn.Parameter(torch.log(A))
            self.D = nn.Parameter(torch.ones(self.d_inner))
            self.out_proj = nn.Linear(self.d_inner, d_model, bias=bias)
            if bimamba_type == "v3":
                for sfx in ("b", "s"):
                    setattr(self, f"conv1d_{sfx}",
                            nn.Conv1d(self.d_inner, self.d_inner, d_conv,
                                      groups=self.d_inner,
                                      padding=d_conv - 1, bias=conv_bias))
                    setattr(self, f"x_proj_{sfx}",
                            nn.Linear(self.d_inner,
                                      self.dt_rank + 2 * d_state,
                                      bias=False))
                    setattr(self, f"dt_proj_{sfx}",
                            nn.Linear(self.dt_rank, self.d_inner, bias=True))
                    setattr(self, f"A_{sfx}_log",
                            nn.Parameter(torch.log(A.clone())))
                    setattr(self, f"D_{sfx}",
                            nn.Parameter(torch.ones(self.d_inner)))

        def _branch(self, x, z, conv1d, x_proj, dt_proj, A_log, D):
            L = x.shape[-1]
            x = F.silu(conv1d(x)[..., :L])
            x_dbl = x_proj(x.transpose(1, 2))                 # (B, L, R+2N)
            dt, Bs, Cs = torch.split(
                x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1)
            dt = torch.einsum("blr,dr->bdl", dt, dt_proj.weight)
            A = -torch.exp(A_log.float())
            return sel_fn(x, dt, A, Bs.transpose(1, 2).unsqueeze(1),
                          Cs.transpose(1, 2).unsqueeze(1), D=D,
                          z=z, delta_bias=dt_proj.bias,
                          delta_softplus=True)

        def forward(self, hidden_states):
            B_, L, _ = hidden_states.shape
            xz = self.in_proj(hidden_states).transpose(1, 2)  # (B, 2D, L)
            x, z = xz.chunk(2, dim=1)
            y = self._branch(x, z, self.conv1d, self.x_proj, self.dt_proj,
                             self.A_log, self.D)
            if self.bimamba_type == "v3":
                y_b = self._branch(x.flip(-1), z.flip(-1), self.conv1d_b,
                                   self.x_proj_b, self.dt_proj_b,
                                   self.A_b_log, self.D_b).flip(-1)
                ns = self.nslices
                x_s = torch.stack(x.chunk(ns, dim=-1), dim=-1).flatten(-2)
                z_s = torch.stack(z.chunk(ns, dim=-1), dim=-1).flatten(-2)
                y_s = self._branch(x_s, z_s, self.conv1d_s, self.x_proj_s,
                                   self.dt_proj_s, self.A_s_log, self.D_s)
                y_s = y_s.reshape(B_, self.d_inner, L // ns, ns
                                  ).transpose(-1, -2).flatten(-2)
                y = y + y_b + y_s
            return self.out_proj(y.transpose(1, 2).to(hidden_states.dtype))

    mamba_mod.Mamba = Mamba


SWIN_UMAMBA = REF_DIR / "variants/mamba/nnUNetTrainerSwinUMambaScratch.py"
SWIN_UMAMBA_D = REF_DIR / "variants/mamba/nnUNetTrainerSwinUMambaDScratch.py"


def _load_swin_umamba_file(path, cache_key):
    """Exec a SwinUMamba trainer file's model section (from the model-part
    imports to the nnunetv2-dependent get_*_from_plans), stripping the
    nnunetv2 imports the model classes never use."""
    if cache_key in _cache:
        return _cache[cache_key]
    _install_dna_shims()

    src = path.read_text()
    start = src.index("import re\nimport time\nimport math")
    end = src.index("def get_swin_umamba")
    body = src[start:end]
    for line in (
        "from nnunetv2.utilities.plans_handling.plans_handler import "
        "ConfigurationManager, PlansManager",
        "from nnunetv2.utilities.network_initialization import "
        "InitWeights_He",
    ):
        body = body.replace(line, "")
    mod = types.ModuleType(f"ref_{cache_key}")
    mod.__file__ = str(path)
    exec(compile(body, str(path), "exec"), mod.__dict__)
    _cache[cache_key] = mod
    return mod


def load_reference_swin_umamba():
    return _load_swin_umamba_file(SWIN_UMAMBA, "swin_umamba")


def load_reference_swin_umamba_d():
    return _load_swin_umamba_file(SWIN_UMAMBA_D, "swin_umamba_d")


LKM = REF_DIR / "variants/mamba/nnUNetTrainer_LKM_UNet.py"


def load_reference_lkm():
    """Exec the reference LKM-UNet model section (below the trainer class,
    above the nnunetv2-annotated get_lkmunet_from_plans) with
    dynamic_network_architectures + mamba_ssm.Mamba shims."""
    if "lkm" in _cache:
        return _cache["lkm"]
    _install_dna_shims()

    src = LKM.read_text()
    start = src.index("import numpy as np\nimport torch\nfrom torch import nn")
    end = src.index("def get_lkmunet_from_plans")
    mod = types.ModuleType("ref_lkm")
    mod.__file__ = str(LKM)
    exec(compile(src[start:end], str(LKM), "exec"), mod.__dict__)
    _cache["lkm"] = mod
    return mod


UMAMBA_DIR = REF_DIR / "variants/mamba"


def load_reference_umamba(which: str):
    """Exec a reference U-Mamba net file (UMambaBot_2d/3d.py or
    UMambaEnc_2d/3d.py) up to its nnunetv2-dependent get_*_from_plans,
    with dynamic_network_architectures + mamba_ssm.Mamba shims.
    ``which`` in {'bot_2d', 'bot_3d', 'enc_2d', 'enc_3d'}."""
    key = f"umamba_{which}"
    if key in _cache:
        return _cache[key]
    _install_dna_shims()

    suffix = "SS3D" if which.endswith("ss3d") else which[-2:]
    path = UMAMBA_DIR / f"UMamba{which[:3].capitalize()}_{suffix}.py"
    src = path.read_text()
    for line in (
        "from nnunetv2.utilities.plans_handling.plans_handler import "
        "ConfigurationManager, PlansManager",
        "from nnunetv2.utilities.network_initialization import "
        "InitWeights_He",
    ):
        src = src.replace(line, "")
    src = src[: src.index("def get_umamba_")]
    if which.endswith("ss3d"):
        # newer torch rejects the SS3D forward's aliased in-place writes
        import re as _re3
        src = _re3.sub(r"= (out_y\[:, \d+\])\.view", r"= \1.clone().view",
                       src)
    mod = types.ModuleType(f"ref_{key}")
    mod.__file__ = str(path)
    exec(compile(src, str(path), "exec"), mod.__dict__)
    _cache[key] = mod
    return mod


SEGMAMBA = UMAMBA_DIR / "nnUNetTrainer_SegMamba.py"


def load_reference_segmamba():
    """Exec the reference SegMamba model section (everything from the MONAI
    copyright header down: LayerNorm/MambaLayer/GSC/MambaEncoder/SegMamba),
    skipping the nnunetv2-dependent trainer class above it. Uses the
    mamba_ssm shim's bimamba_type='v3' tri-orientated branches."""
    if "segmamba" in _cache:
        return _cache["segmamba"]
    _install_dna_shims()

    src = SEGMAMBA.read_text()
    src = src[src.index("# Copyright (c) MONAI"):]
    mod = types.ModuleType("ref_segmamba")
    mod.__file__ = str(SEGMAMBA)
    exec(compile(src, str(SEGMAMBA), "exec"), mod.__dict__)
    _cache["segmamba"] = mod
    return mod


LIGHTM = UMAMBA_DIR / "nnUNetTrainer_LightMUNet.py"


def load_reference_lightm():
    """Exec the reference LightM-UNet model section (everything from the
    second `from __future__` import down: get_dwconv_layer/MambaLayer/
    ResMambaBlock/ResUpBlock/LightMUNet), skipping the nnunetv2-dependent
    trainer class above it. Uses the monai segresnet shims."""
    if "lightm" in _cache:
        return _cache["lightm"]
    _install_dna_shims()

    src = LIGHTM.read_text()
    src = src[src.rindex("from __future__ import annotations"):]
    mod = types.ModuleType("ref_lightm")
    mod.__file__ = str(LIGHTM)
    exec(compile(src, str(LIGHTM), "exec"), mod.__dict__)
    _cache["lightm"] = mod
    return mod


NNMAMBA = UMAMBA_DIR / "nnUNetTrainer_nnMamba.py"


def load_reference_nnmamba():
    """Exec the reference nnMamba model section (from its torch imports
    down to the __main__ guard)."""
    if "nnmamba" in _cache:
        return _cache["nnmamba"]
    _install_dna_shims()

    src = NNMAMBA.read_text()
    src = src[src.index("import torch\nimport torch.nn as nn"):]
    src = src[: src.index('if __name__ == "__main__"')]
    mod = types.ModuleType("ref_nnmamba")
    mod.__file__ = str(NNMAMBA)
    exec(compile(src, str(NNMAMBA), "exec"), mod.__dict__)
    _cache["nnmamba"] = mod
    return mod


ULTRALIGHT = UMAMBA_DIR / "nnUNetTrainer_UltraLightVMUNet.py"


def load_reference_ultralight():
    """Exec the reference UltraLight VM-UNet model section (from its torch
    imports down)."""
    if "ultralight" in _cache:
        return _cache["ultralight"]
    _install_dna_shims()

    src = ULTRALIGHT.read_text()
    src = src[src.index("import torch\nfrom torch import nn"):]
    mod = types.ModuleType("ref_ultralight")
    mod.__file__ = str(ULTRALIGHT)
    exec(compile(src, str(ULTRALIGHT), "exec"), mod.__dict__)
    _cache["ultralight"] = mod
    return mod


VMUNET_FILE = UMAMBA_DIR / "nnUNetTrainer_VMUNet.py"
MAMBAUNET_FILE = UMAMBA_DIR / "nnUNetTrainer_MambaUNet.py"


def _install_fvcore_shim():
    if "fvcore" in sys.modules:
        return
    fv = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")
    for name in ("FlopCountAnalysis", "flop_count_str", "flop_count",
                 "parameter_count"):
        setattr(fvnn, name, lambda *a, **k: None)
    fv.nn = fvnn
    sys.modules["fvcore"] = fv
    sys.modules["fvcore.nn"] = fvnn


def load_reference_vmunet():
    """Exec the reference VM-UNet model section (VSSM/VMUNet; the file's
    trailing MambaUnet-with-config section is cut at its second
    `from __future__` block)."""
    if "vmunet" in _cache:
        return _cache["vmunet"]
    _install_dna_shims()

    src = VMUNET_FILE.read_text()
    src = src[src.index("import time\nimport math"):]
    mod = types.ModuleType("ref_vmunet")
    mod.__file__ = str(VMUNET_FILE)
    exec(compile(src, str(VMUNET_FILE), "exec"), mod.__dict__)
    _cache["vmunet"] = mod
    return mod


def load_reference_mamba_unet():
    """Exec the reference Mamba-UNet model section (Swin-UNet-style VSSM)."""
    if "mamba_unet" in _cache:
        return _cache["mamba_unet"]
    _install_dna_shims()
    _install_fvcore_shim()

    src = MAMBAUNET_FILE.read_text()
    src = src[src.index("import time\nimport math"):
              src.index("from __future__ import absolute_import")]
    mod = types.ModuleType("ref_mamba_unet")
    mod.__file__ = str(MAMBAUNET_FILE)
    exec(compile(src, str(MAMBAUNET_FILE), "exec"), mod.__dict__)
    _cache["mamba_unet"] = mod
    return mod


VMUNET3D_FILE = UMAMBA_DIR / "nnUNetTrainer_VMUNet3D.py"


def load_reference_vmunet3d(which: str = ""):
    """Exec a reference VM-UNet-3D model section (PatchEmbed3D /
    PatchMerging3D / 12-direction SS3D / ConvolutionalGLU VSSBlocks /
    VSSM / VSSM_UNETR). ``which`` in {"", "_woinit", "_woinit_new",
    "_woinit_new_SwinT"} selects the variant file."""
    key = f"vmunet3d{which}"
    if key in _cache:
        return _cache[key]
    _install_dna_shims()

    path = UMAMBA_DIR / f"nnUNetTrainer_VMUNet3D{which}.py"
    src = path.read_text()
    src = src[src.index("import time\nimport math"):]
    # the SwinT variant references np below the cut point; its numpy
    # import sits above it in the trainer section
    src = "import numpy as np\n" + src
    if 'if __name__ ==' in src:
        src = src[: src.index("if __name__ ==")]
    # newer torch rejects the reference's aliased in-place writes
    # (out_y[:, k] = out_y[:, k].view(...).permute(...)); cloning the RHS
    # source is numerically identical
    import re as _re2
    src = _re2.sub(r"= (out_y\[:, \d+\])\.view", r"= \1.clone().view", src)
    mod = types.ModuleType(f"ref_{key}")
    mod.__file__ = str(path)
    exec(compile(src, str(path), "exec"), mod.__dict__)
    _cache[key] = mod
    return mod


MLLA_UNET = REF_DIR / "nnUNetTrainer_MLLA_UNet.py"


def load_reference_mlla_unet():
    """Exec the reference MLLA_UNet baseline model section
    (nnUNetTrainer_MLLA_UNet.py:89-850: Mlp/ConvLayer/FinalPatchExpand_X4/
    RoPE/LinearAttention/MLLABlock/PatchMerging/PatchExpand/BasicLayer/
    Stem/MLLA_UNet), skipping the nnunetv2-dependent trainer class."""
    if "mlla_unet" in _cache:
        return _cache["mlla_unet"]
    _install_shims()

    src = MLLA_UNET.read_text()
    src = src[src.index("import torch\nimport torch.nn as nn\n"
                        "import torch.utils.checkpoint"):]
    src = src[: src.index("if __name__ ==")]
    mod = types.ModuleType("ref_mlla_unet")
    mod.__file__ = str(MLLA_UNET)
    exec(compile(src, str(MLLA_UNET), "exec"), mod.__dict__)
    _cache["mlla_unet"] = mod
    return mod


TRANSUNET = REF_DIR / "nnUNetTrainerTransUNet.py"


def load_reference_transunet():
    """Exec the reference TransUNet model section
    (nnUNetTrainerTransUNet.py:70-803: ViT configs, StdConv2d/ResNetV2
    hybrid backbone, ViT encoder, DecoderCup, VisionTransformer),
    skipping the nnunetv2-dependent trainer class. ml_collections and
    scipy are real in this environment."""
    if "transunet" in _cache:
        return _cache["transunet"]
    _install_shims()

    src = TRANSUNET.read_text()
    src = src[src.index("import ml_collections"):]
    src = src[: src.index("if __name__ ==")]
    mod = types.ModuleType("ref_transunet")
    mod.__file__ = str(TRANSUNET)
    # the slice uses file-top imports (:9-10) before re-importing at :363
    import torch
    mod.torch = torch
    mod.nn = torch.nn
    exec(compile(src, str(TRANSUNET), "exec"), mod.__dict__)
    _cache["transunet"] = mod
    return mod


def load_reference_swin_unetr():
    """Compose monai's SwinUNETR (2D) from the reference's OWN vendored
    monai swin code: nnUNetTrainerSwinUNETR_2d.py:38-46 builds
    ``monai.networks.nets.SwinUNETR`` directly, and the reference vendors
    monai's swin internals with the 2D branches intact in
    nnUNetTrainer_VMUNet3D_woinit_new_SwinT.py:588-1097 (get_window_size /
    window_partition / window_reverse / compute_mask / WindowAttention /
    SwinTransformerBlock / BasicLayer). Only the pieces the reference does
    not vendor are shimmed to monai semantics here: MLPBlock (the vendored
    block swaps in ConvolutionalGLU; its load_from at :1060-1090 documents
    monai's mlp linear1/linear2 naming), PatchEmbed, PatchMergingV2 (= v1
    for 2D), the SwinTransformer wrapper with proj_out normalization, and
    the SwinUNETR encoder/decoder wiring on the shimmed
    UnetrBasicBlock/UnetrUpBlock/UnetOutBlock."""
    if "swin_unetr" in _cache:
        return _cache["swin_unetr"]
    V = load_reference_vmunet3d("_woinit_new_SwinT")
    import itertools

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from monai.networks.blocks import (UnetOutBlock, UnetrBasicBlock,
                                       UnetrUpBlock)

    class MLPBlock(nn.Module):
        """monai MLPBlock, dropout_mode='swin' (drop2 is drop1)."""

        def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0):
            super().__init__()
            self.linear1 = nn.Linear(hidden_size, mlp_dim)
            self.linear2 = nn.Linear(mlp_dim, hidden_size)
            self.fn = nn.GELU()
            self.drop1 = nn.Dropout(dropout_rate)
            self.drop2 = self.drop1

        def forward(self, x):
            return self.drop2(self.linear2(self.drop1(self.fn(
                self.linear1(x)))))

    class PatchMergingV2(nn.Module):
        def __init__(self, dim, norm_layer=nn.LayerNorm, spatial_dims=2):
            super().__init__()
            assert spatial_dims == 2
            self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
            self.norm = norm_layer(4 * dim)

        def forward(self, x):
            b, h, w, c = x.shape
            if h % 2 == 1 or w % 2 == 1:
                x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
            x = torch.cat(
                [x[:, j::2, i::2, :]
                 for i, j in itertools.product(range(2), range(2))], -1)
            return self.reduction(self.norm(x))

    class PatchEmbed(nn.Module):
        def __init__(self, patch_size, in_chans, embed_dim):
            super().__init__()
            self.patch_size = patch_size
            self.proj = nn.Conv2d(in_chans, embed_dim, patch_size,
                                  patch_size)

        def forward(self, x):
            _, _, h, w = x.shape
            assert h % self.patch_size[0] == 0 \
                and w % self.patch_size[1] == 0
            return self.proj(x)

    class BasicLayer(V.BasicLayer):
        """monai BasicLayer: the vendored blocks (with monai's MLP put
        back) + trailing downsample, channel-first in/out."""

        def __init__(self, dim, depth, num_heads, window_size, drop_path,
                     mlp_ratio=4.0, qkv_bias=True, drop=0.0,
                     attn_drop=0.0, norm_layer=nn.LayerNorm,
                     downsample=None, use_checkpoint=False):
            super().__init__(dim=dim, depth=depth, num_heads=num_heads,
                             window_size=window_size, drop_path=drop_path,
                             mlp_ratio=mlp_ratio, qkv_bias=qkv_bias,
                             drop=drop, attn_drop=attn_drop,
                             norm_layer=norm_layer,
                             use_checkpoint=use_checkpoint)
            for blk in self.blocks:
                blk.mlp = MLPBlock(dim, int(dim * mlp_ratio), drop)
            self.downsample = None
            if downsample is not None:
                self.downsample = downsample(
                    dim=dim, norm_layer=norm_layer,
                    spatial_dims=len(window_size))

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)            # b c h w -> b h w c
            x = super().forward(x)
            if self.downsample is not None:
                x = self.downsample(x)
            return x.permute(0, 3, 1, 2).contiguous()

    class SwinTransformer(nn.Module):
        def __init__(self, in_chans, embed_dim, window_size, patch_size,
                     depths, num_heads, mlp_ratio=4.0, qkv_bias=True,
                     drop_rate=0.0, attn_drop_rate=0.0,
                     drop_path_rate=0.0, norm_layer=nn.LayerNorm,
                     use_checkpoint=False):
            super().__init__()
            self.num_layers = len(depths)
            self.patch_embed = PatchEmbed(patch_size, in_chans, embed_dim)
            self.pos_drop = nn.Dropout(drop_rate)
            dpr = [x.item()
                   for x in torch.linspace(0, drop_path_rate, sum(depths))]
            for i in range(self.num_layers):
                layer = BasicLayer(
                    dim=int(embed_dim * 2 ** i), depth=depths[i],
                    num_heads=num_heads[i], window_size=window_size,
                    drop_path=dpr[sum(depths[:i]):sum(depths[:i + 1])],
                    mlp_ratio=mlp_ratio, qkv_bias=qkv_bias,
                    drop=drop_rate, attn_drop=attn_drop_rate,
                    norm_layer=norm_layer, downsample=PatchMergingV2,
                    use_checkpoint=use_checkpoint)
                setattr(self, f"layers{i + 1}", nn.ModuleList([layer]))

        def proj_out(self, x, normalize=False):
            if normalize:
                n, ch, h, w = x.shape
                x = x.permute(0, 2, 3, 1)
                x = F.layer_norm(x, [ch])
                x = x.permute(0, 3, 1, 2)
            return x

        def forward(self, x, normalize=True):
            x0 = self.pos_drop(self.patch_embed(x))
            x0_out = self.proj_out(x0, normalize)
            x1 = self.layers1[0](x0.contiguous())
            x1_out = self.proj_out(x1, normalize)
            x2 = self.layers2[0](x1.contiguous())
            x2_out = self.proj_out(x2, normalize)
            x3 = self.layers3[0](x2.contiguous())
            x3_out = self.proj_out(x3, normalize)
            x4 = self.layers4[0](x3.contiguous())
            x4_out = self.proj_out(x4, normalize)
            return [x0_out, x1_out, x2_out, x3_out, x4_out]

    class SwinUNETR(nn.Module):
        def __init__(self, img_size, in_channels, out_channels,
                     depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                     feature_size=24, norm_name="instance",
                     drop_rate=0.0, attn_drop_rate=0.0,
                     dropout_path_rate=0.0, normalize=True,
                     use_checkpoint=False, spatial_dims=2):
            super().__init__()
            assert spatial_dims == 2 and feature_size % 12 == 0
            fs = feature_size
            self.normalize = normalize
            self.swinViT = SwinTransformer(
                in_channels, fs, (7, 7), (2, 2), depths, num_heads,
                4.0, True, drop_rate, attn_drop_rate, dropout_path_rate,
                nn.LayerNorm, use_checkpoint)
            self.encoder1 = UnetrBasicBlock(2, in_channels, fs, 3, 1,
                                            norm_name, res_block=True)
            self.encoder2 = UnetrBasicBlock(2, fs, fs, 3, 1, norm_name,
                                            res_block=True)
            self.encoder3 = UnetrBasicBlock(2, 2 * fs, 2 * fs, 3, 1,
                                            norm_name, res_block=True)
            self.encoder4 = UnetrBasicBlock(2, 4 * fs, 4 * fs, 3, 1,
                                            norm_name, res_block=True)
            self.encoder10 = UnetrBasicBlock(2, 16 * fs, 16 * fs, 3, 1,
                                             norm_name, res_block=True)
            self.decoder5 = UnetrUpBlock(2, 16 * fs, 8 * fs, 3, 2,
                                         norm_name, res_block=True)
            self.decoder4 = UnetrUpBlock(2, 8 * fs, 4 * fs, 3, 2,
                                         norm_name, res_block=True)
            self.decoder3 = UnetrUpBlock(2, 4 * fs, 2 * fs, 3, 2,
                                         norm_name, res_block=True)
            self.decoder2 = UnetrUpBlock(2, 2 * fs, fs, 3, 2,
                                         norm_name, res_block=True)
            self.decoder1 = UnetrUpBlock(2, fs, fs, 3, 2,
                                         norm_name, res_block=True)
            self.out = UnetOutBlock(2, fs, out_channels)

        def forward(self, x_in):
            hidden = self.swinViT(x_in, self.normalize)
            enc0 = self.encoder1(x_in)
            enc1 = self.encoder2(hidden[0])
            enc2 = self.encoder3(hidden[1])
            enc3 = self.encoder4(hidden[2])
            dec4 = self.encoder10(hidden[4])
            dec3 = self.decoder5(dec4, hidden[3])
            dec2 = self.decoder4(dec3, enc3)
            dec1 = self.decoder3(dec2, enc2)
            dec0 = self.decoder2(dec1, enc1)
            out = self.decoder1(dec0, enc0)
            return self.out(out)

    mod = types.ModuleType("ref_swin_unetr")
    mod.SwinUNETR = SwinUNETR
    _cache["swin_unetr"] = mod
    return mod
