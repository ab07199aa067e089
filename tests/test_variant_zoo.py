"""Variant zoo: SegMamba, LightM-UNet, UltraLight-VMUNet, nnMamba, SwinUNETR."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def _run(module, x):
    v = module.init({"params": KEY, "dropout": KEY}, x)
    return module.apply(v, x)


def test_segmamba_3d(rng):
    """Faithful SegMamba (3D, tri-orientated Mamba, UNETR decoder, no DS).
    num_slices_list shrunk so every stage's token count divides; the
    reference's hardcoded [64,32,16,8] is exercised by the torch-parity
    test at a (64,16,16) patch."""
    from mlagg_unet_tpu.models.mamba_variants import SegMamba

    m = SegMamba(num_classes=2, depths=(1, 1, 1, 1), feat_size=(4, 8, 8, 8),
                 hidden_size=8, num_slices_list=(8, 4, 2, 1))
    out = _run(m, jnp.asarray(rng.randn(1, 8, 16, 16, 1).astype(np.float32)))
    assert out.shape == (1, 8, 16, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lightm_unet(rng):
    from mlagg_unet_tpu.models.mamba_variants import LightMUNet

    m = LightMUNet(num_classes=2, init_filters=8)
    out = _run(m, jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32)))
    assert out.shape == (1, 32, 32, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ultralight_vmunet(rng):
    from mlagg_unet_tpu.models.mamba_variants import UltraLightVMUNet

    m = UltraLightVMUNet(num_classes=2)
    out = _run(m, jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)))
    assert out.shape == (1, 64, 64, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_nnmamba(rng):
    from mlagg_unet_tpu.models.mamba_variants import NNMamba

    m = NNMamba(num_classes=3, channels=16,
                strides=((1, 1), (2, 2), (2, 2), (2, 2)))
    out = _run(m, jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32)))
    assert out.shape == (1, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_swin_unetr(rng):
    from mlagg_unet_tpu.models.swin_unetr import SwinUNETR

    m = SwinUNETR(num_classes=3, feature_size=8, depths=(1, 1, 1, 1),
                  num_heads=(2, 2, 4, 4), window_size=4)
    out = _run(m, jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32)))
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_swin_window_roundtrip(rng):
    from mlagg_unet_tpu.models.swin_unetr import (
        window_partition,
        window_reverse,
    )

    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 4)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_all_registry_builders_instantiate():
    """Every registered trainer's network builder must produce a module that
    runs a tiny forward (2D where applicable)."""
    from mlagg_unet_tpu.training.registry import (
        NETWORK_BUILDERS,
        TRAINER_REGISTRY,
    )

    class FakeCfg:
        patch_size = [16, 16]
        UNet_base_num_features = 4
        unet_max_num_features = 32
        pool_op_kernel_sizes = [[1, 1], [2, 2]]
        conv_kernel_sizes = [[3, 3], [3, 3]]
        n_conv_per_stage_encoder = [1, 1]
        n_conv_per_stage_decoder = [1]

    for name in ("plans_unet", "umamba_bot", "umamba_enc"):
        net = NETWORK_BUILDERS[name](FakeCfg(), 1, 2, True)
        x = jnp.zeros((1, 16, 16, 1), jnp.float32)
        v = net.init({"params": KEY, "dropout": KEY}, x)
        outs = net.apply(v, x)
        assert outs[0].shape == (1, 16, 16, 2)


def test_mlla_unet_baseline(rng):
    from mlagg_unet_tpu.models.mlla_unet import MLLAUNet

    m = MLLAUNet(num_classes=3, embed_dim=8, depths=(1, 1, 1, 1),
                 depths_decoder=(1, 1, 1, 1), num_heads=(2, 2, 4, 4))
    x = jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32))
    out = _run(m, x)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_rope_orthogonality(rng):
    """RoPE preserves norms (pure rotation)."""
    from mlagg_unet_tpu.models.mlla_unet import apply_rope, rope_rotations

    x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    rot = jnp.asarray(rope_rotations(4, 4, 8))
    y = apply_rope(x, rot)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


def test_transunet(rng):
    """Shrunk R50-ViT hybrid (width>=32 — GN(32) needs >=32 channels)."""
    from mlagg_unet_tpu.models.transunet import TransUNet

    m = TransUNet(num_classes=2, hidden_size=64, mlp_dim=128, num_heads=4,
                  num_layers=1, resnet_units=(1, 1, 1), width=32,
                  decoder_channels=(32, 16, 16, 8))
    out = _run(m, jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32)))
    assert out.shape == (1, 32, 32, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_swin_umamba(rng):
    from mlagg_unet_tpu.models.swin_umamba import SwinUMamba

    m = SwinUMamba(num_classes=2, feat_size=(4, 8, 16, 32, 64),
                   hidden_size=64, vssm_depths=(1, 1, 1, 1),
                   deep_supervision=True)
    outs = _run(m, jnp.asarray(rng.randn(1, 64, 64, 1).astype(np.float32)))
    assert outs[0].shape == (1, 64, 64, 2)


def test_swin_umamba_d(rng):
    from mlagg_unet_tpu.models.swin_umamba import SwinUMambaD

    m = SwinUMambaD(num_classes=2, dims=(8, 16, 32, 64),
                    deep_supervision=True)
    outs = _run(m, jnp.asarray(rng.randn(1, 64, 64, 1).astype(np.float32)))
    assert outs[0].shape == (1, 64, 64, 2)


def test_swin_tunet(rng):
    from mlagg_unet_tpu.models.more_variants import SwinTUNet

    m = SwinTUNet(num_classes=2, embed_dim=8, depths=(1, 1, 1, 1),
                  num_heads=(2, 2, 4, 4), window_size=4)
    out = _run(m, jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32)))
    assert out.shape == (1, 32, 32, 2)


def test_umamba_ss3d_modes(rng):
    """UMambaBot/Enc_SS3D: the faithful UMambaUNet trunk with 12-direction
    VSS blocks (d_state=1, ConvGLU mlp) at the bottleneck / after every
    stage (UMambaBot_SS3D.py:806-821, UMambaEnc_SS3D.py:645-660)."""
    from mlagg_unet_tpu.models.umamba import UMambaUNet

    for mode in ("bot_ss3d", "enc_ss3d"):
        m = UMambaUNet(num_classes=2, n_stages=2,
                       features_per_stage=(4, 8),
                       conv_kernel_sizes=((3, 3, 3),) * 2,
                       pool_op_kernel_sizes=((1, 1, 1), (2, 2, 2)),
                       n_conv_per_stage_encoder=(1, 1),
                       n_conv_per_stage_decoder=(1,),
                       deep_supervision=False, mamba_mode=mode)
        out = _run(m, jnp.asarray(rng.randn(1, 4, 8, 8, 1
                                            ).astype(np.float32)))
        assert out.shape == (1, 4, 8, 8, 2), mode
        assert bool(jnp.all(jnp.isfinite(out))), mode


def test_lkm_unet(rng):
    from mlagg_unet_tpu.models.lkm_unet import LKMUNet

    m = LKMUNet(num_classes=2, n_stages=3, features_per_stage=(4, 8, 16),
                kernel_sizes=((3, 3),) * 3,
                strides=((1, 1), (2, 2), (2, 2)),
                n_conv_per_stage=(1, 1, 1), n_conv_per_stage_decoder=(1, 1),
                deep_supervision=False)
    out = _run(m, jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32)))
    assert out.shape == (1, 16, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lkm_unet_3d(rng):
    """3D path: BiPixel per-axis periods (5p,7p,6p) + BiWindow 3D pooling."""
    from mlagg_unet_tpu.models.lkm_unet import LKMUNet

    m = LKMUNet(num_classes=2, n_stages=2, features_per_stage=(4, 8),
                kernel_sizes=((3, 3, 3),) * 2,
                strides=((1, 1, 1), (2, 2, 2)),
                n_conv_per_stage=(1, 1), n_conv_per_stage_decoder=(1,),
                deep_supervision=False)
    out = _run(m, jnp.asarray(rng.randn(1, 8, 8, 8, 1).astype(np.float32)))
    assert out.shape == (1, 8, 8, 8, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_msvm_unet(rng):
    from mlagg_unet_tpu.models.msvm_unet import MSVMUNet

    m = MSVMUNet(num_classes=2, dims=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    out = _run(m, jnp.asarray(rng.randn(1, 32, 32, 1).astype(np.float32)))
    assert out.shape == (1, 32, 32, 2)


def test_vmunet3d_scan12_roundtrip(rng):
    from mlagg_unet_tpu.models.vmunet3d import _merge12_3d, _scan12_3d

    x = jnp.asarray(rng.randn(1, 3, 4, 5, 2).astype(np.float32))
    ys = _scan12_3d(x)
    assert ys.shape == (1, 12, 2, 60)
    merged = _merge12_3d(ys, 3, 4, 5)
    expected = 12.0 * jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(1, 2, 60)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(expected),
                               rtol=1e-5)


def test_vmunet3d(rng):
    from mlagg_unet_tpu.models.vmunet3d import VMUNet3D

    m = VMUNet3D(num_classes=2, dims=(4, 8, 16, 32),
                 depths=(1, 1, 1, 1),
                 strides=((2, 2, 2), (1, 2, 2), (2, 2, 2), (1, 1, 1)))
    out = _run(m, jnp.asarray(rng.randn(1, 4, 16, 16, 1).astype(np.float32)))
    assert out.shape == (1, 4, 16, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vmunet3d_swint(rng):
    from mlagg_unet_tpu.models.vmunet3d import VMUNet3D

    m = VMUNet3D(num_classes=2, dims=(4, 8, 16, 32),
                 depths=(1, 1, 1, 2), num_heads=4, window_size=(2, 2, 2),
                 strides=((2, 2, 2), (1, 2, 2), (2, 2, 2), (1, 1, 1)),
                 last_stage_swin=True)
    out = _run(m, jnp.asarray(rng.randn(1, 4, 16, 16, 1).astype(np.float32)))
    assert out.shape == (1, 4, 16, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))
